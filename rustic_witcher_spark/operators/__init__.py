from rustic_witcher_spark.operators import cdc, dedup, filters, multimodal, similarity, text, transforms

__all__ = ["cdc", "dedup", "filters", "multimodal", "similarity", "text", "transforms"]

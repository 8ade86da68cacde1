from rustic_witcher_spark.operators import cdc, dedup, filters, similarity, text, transforms

__all__ = ["cdc", "dedup", "filters", "similarity", "text", "transforms"]

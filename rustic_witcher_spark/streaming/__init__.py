from rustic_witcher_spark.streaming import windows

__all__ = ["windows"]

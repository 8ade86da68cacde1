from rustic_witcher_spark.streaming import quota, stateful, windows

__all__ = ["quota", "stateful", "windows"]

from rustic_witcher_spark.streaming import stateful, windows

__all__ = ["stateful", "windows"]

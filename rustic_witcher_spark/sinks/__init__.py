from rustic_witcher_spark.sinks import jdbc, parquet, s3copy

__all__ = ["jdbc", "parquet", "s3copy"]

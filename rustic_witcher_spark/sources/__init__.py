from rustic_witcher_spark.sources import parquet
from rustic_witcher_spark.sources.parquet import FileClass, classify_file, list_table_files, read_table_files

__all__ = ["parquet", "FileClass", "classify_file", "list_table_files", "read_table_files"]

from rustic_witcher_spark.plans.pipeline import anonymize_table, pipeline_oracle_sql

__all__ = ["anonymize_table", "pipeline_oracle_sql"]

"""rustic_witcher_spark — a PySpark-native data-export & anonymization engine.

Built from scratch on the public Spark DataFrame API, with the query and
data-processing capabilities of the reference ETL/anonymization pipeline
(bluegroundltd/rustic-witcher): TOML-config-driven per-table filters,
deterministic seeded column anonymization, DMS LOAD/CDC Parquet handling,
Parquet/JDBC sinks — plus scale-oriented extensions (dedup, similarity
search, text analysis, windowed event analytics) designed for 100 TB
clusters.

Design stance (see SURVEY.md §7):
- DataFrame/SQL only; no RDDs, no custom Catalyst rules.
- Anonymization is expressed as pure Catalyst expressions derived from
  ``md5(seed|salt|value)`` — JVM-side (whole-stage codegen), deterministic
  per (seed, value), partitioning-invariant, and reproducible in ANSI SQL
  so a DuckDB oracle can verify every operator.
- Python UDFs only where built-ins genuinely can't express the semantics.
"""

__version__ = "0.1.0"

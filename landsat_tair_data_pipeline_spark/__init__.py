"""landsat_tair_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline daniel8an/landsat-tair-data-pipeline (a single-node
pandas/numpy/torch ETL, see /root/reference), plus the relational,
streaming, and LLM-data-pipeline operators the driver contract mandates.

Design stance (SURVEY.md §7): a library of composable ``DataFrame ->
DataFrame`` transformations with explicit schemas; declarative plans so
Catalyst/AQE handle pushdown, pruning, join selection, and skew; Pandas
UDFs only where built-in operators genuinely can't express the semantics.
"""

__version__ = "0.1.0"

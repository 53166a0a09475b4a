"""creatorops_lakehouse_spark — a PySpark-native analytics engine.

A brand-new implementation of the query and data-processing capabilities of
the reference medallion lakehouse (niveditaganesh22/creatorops-lakehouse):
Bronze NDJSON ingest -> Silver contract-validated event log -> Gold KPIs,
plus large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, broadcast joins for dimensions, AQE for skew, partitioned Parquet
storage (Delta Lake is the documented production table format; delta-spark is
not installed in this environment so the table layer is format-pluggable —
see sources/tables.py).
"""

__version__ = "0.1.0"

"""PySpark-native analytics engine with the query/data-processing surface of
byungjun0689/aws-glue-etl-sample-hist (a Glue medallion ETL: JDBC->bronze
parquet -> silver denormalized join -> gold KPI marts), rebuilt Spark-first
and extended with LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
  session     SparkSession factory (AQE, UTC, dynamic partition overwrite)
  catalog     table registry over the testdata star schema + retail fixtures
  io          sources (parquet/csv/jdbc) and sinks (partitioned, file-count policy)
  functions   scalar function surface (string dates, presto-compatible dow, ...)
  operators   joins / aggregates / sort / dedup / similarity / text / multimodal
  plans       pipeline DAG runner + medallion (bronze/silver/gold) jobs --
              the reference's 7-job Step Functions DAG re-expressed
  streaming   structured-streaming ingestion, windowed aggregation, and
              stateful sessionization
  sql         SQL entry point: the reference's Athena query set via spark.sql

Reference-shaped retail semantics (fan-out joins, null keys, Korean labels)
are pinned end-to-end in tests/test_retail_parity.py; the full declared query
surface lives in queries.py with DuckDB oracle twins in oracles.py.
"""

__version__ = "0.1.0"

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
  plans       pipeline DAG runner + medallion (bronze/silver/gold) jobs
  streaming   structured-streaming ingestion & windowed aggregation
  jobs        the 7 reference jobs re-expressed over retail-shaped fixtures
"""

__version__ = "0.1.0"

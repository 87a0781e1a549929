from .sinks import WriterPolicy, write_partitioned  # noqa: F401
from .sources import read_csv, read_jdbc, read_parquet  # noqa: F401

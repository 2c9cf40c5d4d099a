from windflow_spark.sources.tables import (
    iceberg_available,
    read_table,
    stream_table,
    write_sink,
)

__all__ = ["iceberg_available", "read_table", "stream_table", "write_sink"]

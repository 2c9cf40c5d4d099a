"""Source/sink layer: Iceberg when the runtime is present, parquet
otherwise (identical plan shapes downstream — only the scan/commit
implementation differs).

Production posture (north rule: "streaming Iceberg source ... exactly-
once Iceberg sink"): a streaming read of an Iceberg table gives
snapshot-incremental batches; the Iceberg sink commits atomically per
epoch, which together with the query checkpoint is exactly-once. The
local container has no Iceberg runtime jar, so these paths are gated by
:func:`iceberg_available` and fall back to the parquet file source /
file-manifest sink, which provide the same exactly-once contract for
the tests (FIXTURES.md F1 note).

Iceberg source config (documented for cluster deployment):
  spark.sql.catalog.<cat>               org.apache.iceberg.spark.SparkCatalog
  spark.sql.catalog.<cat>.type          hadoop | hive | rest
  spark.sql.catalog.<cat>.warehouse     <path>
  readStream.format("iceberg").load("<cat>.db.transcripts")
  writeStream.format("iceberg").option("checkpointLocation", ...)
      .toTable("<cat>.db.out")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available() -> bool:
    # deliberately uncached: a False probed before any active session (or
    # before Iceberg conf is applied) must not stick once an
    # Iceberg-capable session starts; the Class.forName probe is cheap
    try:
        from pyspark.sql import SparkSession as S

        spark = S.getActiveSession()
        if spark is None:
            return False
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    """Batch read of a named table: Iceberg catalog table if configured,
    else the sf_dir parquet file."""
    if iceberg_available():
        try:
            return spark.read.format("iceberg").load(name)
        except Exception:
            pass
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def stream_table(
    spark: SparkSession,
    name: str,
    path: str,
    schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming read: Iceberg snapshot-incremental if available, else
    the parquet file-stream source (directory)."""
    if iceberg_available():
        try:
            return spark.readStream.format("iceberg").load(name)
        except Exception:
            pass
    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def write_sink(df: DataFrame, path_or_table: str, checkpoint: str, once: bool = True):
    """Exactly-once streaming sink: Iceberg table commit if available,
    else parquet file sink (checkpointed manifest — also exactly-once)."""
    fmt = "iceberg" if iceberg_available() else "parquet"
    w = (
        df.writeStream.format(fmt)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if once:
        w = w.trigger(availableNow=True)
    if fmt == "iceberg":
        return w.toTable(path_or_table)
    return w.option("path", path_or_table).start()

"""Loading helpers for the driver-provided synthetic tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _pin_utc(spark: SparkSession) -> None:
    """The driver may hand us a session it built itself; timestamp
    formatting must agree with the (timezone-naive) DuckDB oracle, so
    pin the session timezone on every table load.  Idempotent and
    cheap; a no-op on sessions from our own get_spark."""
    try:
        if spark.conf.get("spark.sql.session.timeZone") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
    except AnalysisException:
        # Conf marked non-modifiable on this session (e.g. a driver-built
        # session with a static SQLConf); formatting parity then depends
        # on the caller having pinned UTC themselves.
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _pin_utc(spark)
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as TIMESTAMP(NANOS) which Spark 4 only
    reads via the nanosAsLong legacy conf; normalize to TimestampType
    (microsecond truncation) regardless of which way it was read."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except AnalysisException:
        # Non-modifiable at runtime on this session; the dtype dispatch
        # below handles whichever way the file was read.
        pass
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    dtype = dict(df.dtypes).get("ts")
    from pyspark.sql import functions as F

    if dtype in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        # Spark 4 infers TIMESTAMP_NTZ from this parquet; event-time ops
        # (unix_micros, withWatermark) require TIMESTAMP.  Exact under the
        # pinned-UTC session (_pin_utc): wall-clock == instant.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    if not names:
        names = TESTDATA_TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}

"""Table sources — parquet now, Iceberg/Delta behind capability gates.

The engine targets Iceberg-style tables (BASELINE.json input_hint): at
production scale the documents table is an Iceberg table partitioned by
a time bucket (partition pruning for the incremental window, S1) and
sorted within files by the S2 cell id (Hilbert clustering -> spatial
scan pruning). The sandbox image ships no Iceberg/Delta jars, so those
formats are import-try gated; parquet carries the same schema and all
tests/benches.

Time travel (S2 snapshot scan, reference overpass.py:92-98) maps to
`VERSION AS OF` on Iceberg; the engine's `elements_history` table with
[valid_from, valid_to) intervals is the format-agnostic equivalent used
everywhere here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    # NB: attribute access on spark._jvm returns a lazy JavaPackage even
    # for missing classes — an actual Class.forName is required
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def read_table(spark: SparkSession, location: str, fmt: str = "auto") -> DataFrame:
    """Read a table by location; 'auto' prefers Iceberg when its runtime
    is on the classpath and the location is a catalog table name."""
    if fmt == "iceberg" or (fmt == "auto" and "/" not in location):
        if not iceberg_available(spark):
            if fmt == "iceberg":
                raise RuntimeError(
                    "Iceberg runtime not on the classpath; add "
                    "iceberg-spark-runtime to spark.jars.packages"
                )
        else:
            return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def snapshot_as_of(spark: SparkSession, location: str, timestamp_ms: int) -> DataFrame:
    """Iceberg time travel (S2); raises without the runtime."""
    if not iceberg_available(spark):
        raise RuntimeError(
            "time travel needs the Iceberg runtime; use the elements_history "
            "interval table (operators/guilt.py) in this environment"
        )
    return (
        spark.read.format("iceberg").option("as-of-timestamp", str(timestamp_ms)).load(location)
    )

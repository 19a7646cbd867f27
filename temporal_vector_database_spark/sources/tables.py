"""Readers for the driver-generated parquet tables (TESTDATA.md).

These replace the reference's HDF5 group traversal
(``storage/storage_engine.py:94-103,377-415``) with columnar parquet scans —
predicate pushdown, column pruning and partition pruning come from
Catalyst/the parquet reader for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DRIVER_TABLES = (
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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table from ``<sf_dir>/<name>.parquet``."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load ``events.parquet`` and expose integer time columns ``ts_ns`` /
    ``ts_ms`` (nanoseconds / milliseconds since epoch) so all downstream
    time math is integer and therefore oracle-exact.

    The driver has generated ``ts`` as parquet TIMESTAMP(NANOS) (which
    Spark's vectorized reader only accepts as a raw long via the legacy
    flag) in some rounds and TIMESTAMP(MICROS) in others — adapt to
    whichever physical type is on disk, AND to whichever logical type
    the session reads it as (``inferTimestampNTZ`` on → NTZ, off → LTZ).

    Every branch is session-TZ-free: the LTZ branch's ``unix_micros`` is
    instant→epoch (no TZ), and the NTZ branch reconstructs epoch micros
    from the naive FIELDS (date diff + hour/minute/fractional-second,
    all field extractions on naive values). An ``ntz.cast("timestamp")``
    here would silently re-interpret the naive fields in the SESSION
    timezone — the bug class that kept ``version_rollup`` red for two
    rounds — so it is deliberately absent."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        ns = F.col("ts")
    elif ts_type == "timestamp_ntz":
        days = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        # extract(SECOND) carries the microsecond fraction as DECIMAL(8,6)
        us = (
            days.cast("long") * F.lit(86_400_000_000)
            + (F.hour("ts").cast("long") * F.lit(3600) + F.minute("ts").cast("long") * F.lit(60))
            * F.lit(1_000_000)
            + (F.expr("extract(SECOND FROM ts)") * F.lit(1_000_000)).cast("long")
        )
        ns = us * F.lit(1000)
    else:
        ns = F.unix_micros(F.col("ts")) * F.lit(1000)
    return df.withColumn("ts_ns", ns.cast("long")).withColumn(
        "ts_ms", F.expr("ts_ns div 1000000").cast("long")
    )


def write_versions_bucketed(
    versions: DataFrame, table_name: str, buckets: int = 256
) -> None:
    """Persist a ``versions`` table bucketed by ``content_id``, sorted by
    ``(content_id, seq)``.

    At cluster scale this is THE layout decision for the engine: every
    temporal operator windows/groups/joins on ``content_id``, and a
    bucketed table lets Catalyst drop the hash exchange entirely
    (verified: the governing-base window plan goes from 1 Exchange to 0 —
    see SCALE.md). Local sort order additionally gives near-sequential
    delta-chain reads within each bucket file.
    """
    (
        versions.write.mode("overwrite")
        .bucketBy(buckets, "content_id")
        .sortBy("content_id", "seq")
        .saveAsTable(table_name)
    )


VERSIONS_FORMATS = ("parquet", "orc", "json")


def write_versions_as(versions: DataFrame, path: str, format: str = "parquet") -> None:
    """Persist a ``versions`` table in any supported format.

    Parquet is the primary layout (columnar, predicate pushdown, the
    bucketed variant above). ORC is the drop-in columnar alternative
    (same pushdown story). JSON is the interchange/debug sink — row
    oriented, no pushdown, but the nested arrays and the metadata map
    survive round-trips losslessly given the schema on read. CSV is
    deliberately unsupported: flat text cannot carry array<double>
    columns without inventing an encoding.
    """
    if format not in VERSIONS_FORMATS:
        raise ValueError(f"unsupported versions format: {format!r} (use {VERSIONS_FORMATS})")
    versions.write.mode("overwrite").format(format).save(path)


def read_versions_as(
    spark: SparkSession, path: str, format: str = "parquet", schema=None
) -> DataFrame:
    """Read a ``versions`` table written by ``write_versions_as``.

    JSON needs the explicit schema to keep exact types (int vs long,
    timestamp vs string); self-describing formats ignore it.
    """
    if format not in VERSIONS_FORMATS:
        raise ValueError(f"unsupported versions format: {format!r} (use {VERSIONS_FORMATS})")
    reader = spark.read.format(format)
    if schema is not None:
        reader = reader.schema(schema)
    elif format == "json":
        raise ValueError("JSON read requires the versions schema (types are not self-describing)")
    return reader.load(path)


def register_driver_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Expose every driver table (and the fixture ``versions`` table) as a
    temp view so users can work in pure ``spark.sql`` — the same names the
    DuckDB oracle uses, making any oracle SQL in this repo runnable
    against Spark verbatim (modulo dialect). Returns the view names."""
    from temporal_vector_database_spark.sources.fixtures import ensure_fixtures

    names = []
    for t in DRIVER_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        df = load_events(spark, sf_dir) if t == "events" else spark.read.parquet(path)
        df.createOrReplaceTempView(t)
        names.append(t)
    fix = ensure_fixtures(sf_dir)
    spark.read.parquet(os.path.join(fix, "versions.parquet")).createOrReplaceTempView(
        "versions"
    )
    names.append("versions")
    return names


def write_events_partitioned(events: DataFrame, path: str) -> None:
    """Time-partitioned event layout: one directory per UTC day
    (``day_id = ts_ms div 86400000`` — integer epoch math, session-TZ
    free like everything else in this engine). THE layout decision for
    an append-mostly event table at 100 TB: time-range queries prune to
    the matching day directories at planning time (zero I/O outside the
    range), daily ingest appends one new partition, and retention is a
    partition drop instead of a rewrite.

    ``events`` must carry ``ts_ms`` (see :func:`load_events`).
    """
    from pyspark.sql import functions as F

    ev = events.withColumn("day_id", F.expr("ts_ms div 86400000").cast("int"))
    ev.write.mode("overwrite").partitionBy("day_id").parquet(path)


def read_events_range(spark: SparkSession, path: str, start_ms: int, end_ms: int) -> DataFrame:
    """Read ``[start_ms, end_ms)`` from a :func:`write_events_partitioned`
    layout. The ``day_id`` predicate is derived from the range so Spark
    prunes partitions statically (plan-pinned in tests); the exact
    ``ts_ms`` bounds then filter within the boundary days."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    return df.where(
        (F.col("day_id") >= int(start_ms // 86_400_000))
        & (F.col("day_id") <= int((end_ms - 1) // 86_400_000))
        & (F.col("ts_ms") >= start_ms)
        & (F.col("ts_ms") < end_ms)
    )


def zorder_value(col_a, col_b, bits: int = 21):
    """Morton (Z-order) interleave of two non-negative integer columns —
    pure JVM bit math (shift/and/or), no UDF. ``bits`` low bits of each
    key are interleaved (a in even positions, b in odd), so sorting by
    the result clusters rows that are close in BOTH dimensions."""
    from pyspark.sql import functions as F

    a = col_a.cast("long")
    b = col_b.cast("long")
    z = F.lit(0).cast("long")
    for i in range(int(bits)):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_events_zordered(events: DataFrame, path: str, n_files: int = 16, bits: int = 8) -> None:
    """Z-order-clustered event layout: rows sorted by the Morton
    interleave of (user_id, day) and range-partitioned into ``n_files``
    files. The multi-dimensional complement of the day-partitioned
    layout: parquet row-group/file zone maps (min/max stats) become
    tight in BOTH ``user_id`` AND ``ts_ms``, so a (user, time-window)
    query skips most files on footer statistics alone — the standard
    Delta/Iceberg OPTIMIZE ZORDER story, expressed with
    ``repartitionByRange`` + within-partition sort. At 100 TB pick
    n_files so files land near the 128 MB - 1 GB sweet spot.

    Both keys are min-max scaled to ``bits`` bits BEFORE interleaving —
    raw interleave of unequal ranges degenerates to a sort on whichever
    key has the higher set bits (the classic Z-order pitfall; measured:
    unscaled clustering was no better than a time sort on the test
    data). The two scale scalars come from one tiny agg (a query
    router, not a data collect).

    ``events`` must carry ``ts_ms`` (see :func:`load_events`).
    """
    from pyspark.sql import functions as F

    day = F.expr("ts_ms div 86400000")
    lo_u, hi_u, lo_d, hi_d = (
        events.agg(
            F.min("user_id"), F.max("user_id"), F.min(day), F.max(day)
        ).first()
    )
    top = (1 << int(bits)) - 1

    def scaled(col, lo, hi):
        span = max(1, int(hi) - int(lo))
        return ((col.cast("long") - int(lo)) * top) / span

    ev = events.withColumn(
        "_z",
        zorder_value(
            F.floor(scaled(F.col("user_id"), lo_u, hi_u)),
            F.floor(scaled(day, lo_d, hi_d)),
            bits=int(bits),
        ),
    )
    (
        ev.repartitionByRange(int(n_files), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_events_user_window(
    spark: SparkSession, path: str, user_lo: int, user_hi: int, start_ms: int, end_ms: int
) -> DataFrame:
    """Read a (user range x time range) window from any event layout.
    On a :func:`write_events_zordered` layout both predicates prune at
    the parquet-footer level (zone maps are tight in both dimensions);
    results are exact regardless of layout — the layout only changes
    how much I/O the filters can skip."""
    from pyspark.sql import functions as F

    return spark.read.parquet(path).where(
        (F.col("user_id") >= int(user_lo))
        & (F.col("user_id") <= int(user_hi))
        & (F.col("ts_ms") >= int(start_ms))
        & (F.col("ts_ms") < int(end_ms))
    )

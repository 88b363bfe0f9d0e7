"""SparkSession builder with scale-sane defaults.

The reference pins a LEGACY time parser and hand-tunes parallelism per-op
(reference ``G_2_rf_nordd.py:10-21``, ``rdd.repartition(10)`` everywhere —
SURVEY.md §4). The engine instead sets cluster-level knobs once: AQE on
(runtime coalescing + skew-join handling), Arrow on (vectorized
Python<->JVM), UTC session timezone, and a shuffle-partition count sized to
the local core count. On a real cluster, ``shuffle_partitions`` should be
~2-3x total executor cores; callers override via ``configs``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults applied to every engine session. Each is safe at 100 TB scale:
#: AQE re-plans shuffles at runtime (coalesce tiny partitions, split skewed
#: ones), Arrow keeps any Python crossing vectorized, and the broadcast
#: threshold lets Catalyst turn small-dim joins into broadcast-hash joins.
ENGINE_DEFAULTS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python UDTFs exchange rows via Arrow (ArrowEvalPythonUDTF), never
    # the row-serialized BatchEvalPython path the plan audit bans.
    "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Parquet vectorized reader + filter pushdown are default-on; pin them so a
    # misconfigured cluster profile can't silently disable the fast path.
    "spark.sql.parquet.filterPushdown": "true",
    # Parquet TIMESTAMP(NANOS) has no Spark type; read as long and let the
    # source layer normalize to microsecond TimestampType (sources/io.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Engine timestamp semantics are a single type: UTC TimestampType.
    # Without this, parquet micros with isAdjustedToUTC=false arrive as
    # TIMESTAMP_NTZ — a second timestamp type that unix_micros()/numeric
    # casts reject and that would fork every downstream expression.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Spark's historical default writes TimestampType as INT96 — a
    # deprecated physical type with no logical-type annotation that
    # footer-sniffing readers (streaming unit detection, external engines)
    # can't interpret. The engine always writes TIMESTAMP_MICROS, matching
    # its single-timestamp-type semantics end to end.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
}


def default_parallelism() -> int:
    """Shuffle-partition default: the harness exports SPARK_GRAFT_CPUS for
    local runs; fall back to the machine's core count."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env and env.isdigit():
        return int(env)
    return os.cpu_count() or 8


def get_session(
    app_name: str = "big_data_analysis_for_stock_market_data_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    legacy_time_parser: bool = False,
    configs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Parameters
    ----------
    master : ``local[N]`` for tests/bench; ``None`` defers to spark-submit
        (cluster deploys must not hardcode a master — reference hardcoded
        ``yarn`` at ``G_2_rf_nordd.py:17``).
    shuffle_partitions : post-shuffle partition count before AQE coalescing.
    legacy_time_parser : compat flag replicating the reference's pinned
        ``spark.sql.legacy.timeParserPolicy=LEGACY`` (``G_2_rf_nordd.py:21``);
        the engine default is the modern parser.
    configs : extra/overriding Spark confs, applied last.
    """
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    conf: dict[str, str] = dict(ENGINE_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    if master or not os.environ.get("SPARK_MASTER"):
        # local mode: the driver JVM hosts all executor threads, but Spark's
        # default heap is 1g — 32 concurrent tasks starve execution memory
        # (observed UNABLE_TO_ACQUIRE_MEMORY). Only effective at JVM launch;
        # a cluster deploy sets executor memory through spark-submit.
        conf.setdefault("spark.driver.memory", "24g")
    if legacy_time_parser:
        conf["spark.sql.legacy.timeParserPolicy"] = "LEGACY"
    if configs:
        conf.update(configs)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""SparkSession factory tuned for this engine.

Scale posture (100 TB / 1000-executor design; local[32] for tests):
- AQE on (runtime coalesce, skew-join splitting, broadcast conversion).
- Arrow on (every heavy scalar function here is a pandas UDF).
- shuffle.partitions sized for local runs; on a real cluster this is set
  per-job via spark-submit conf (the code never assumes a value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def tune_for_input_size(spark: SparkSession, approx_rows: int) -> None:
    """Set runtime confs by input size. AQE's per-shuffle re-optimization
    costs ~0.5-1 s per exchange — a pure win at TB scale, a 6× slowdown on
    kB-scale fixture runs (measured: 596 s → 98 s with AQE off at fixture
    scale). Both knobs are runtime-settable, so this works on a session we
    did not create (e.g. the driver's)."""
    if approx_rows < 1_000_000:
        # Latency-bound regime: per-task overhead dominates per-task compute,
        # so MORE tasks per stage is strictly worse (measured at sf0.1:
        # 16 partitions → 236 s, 64 partitions → 576 s on local[32] in the
        # serialized-job regime; re-validated after job fusion — see
        # BENCH/BASELINE.md). AQE off for the same reason (per-exchange
        # re-planning is serial driver time). At ≥1M rows AQE + default
        # partitioning win. SPARK_GRAFT_SHUFFLE_OVERRIDE pins an explicit
        # value for scaling experiments.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        override = os.environ.get("SPARK_GRAFT_SHUFFLE_OVERRIDE")
        parts = int(override) if override else min(16, max(4, approx_rows // 2000))
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    else:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def get_spark(
    app_name: str = "table_annotation_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # broadcast sides are deliberately computed subtrees (small dims
        # derived from lazily-checkpointed intermediates); their first
        # evaluation can pull a long upstream chain, so the 5-min default
        # timeout is too tight under load
        .config("spark.sql.broadcastTimeout", "3600")
        # shuffle/spill files on tmpfs when available: the flagship writes
        # ~50k small shuffle blocks per run; on an overlayfs /tmp that is
        # 45-75% kernel time (measured via top %sy), on tmpfs it is memory
        .config(
            "spark.local.dir",
            "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()

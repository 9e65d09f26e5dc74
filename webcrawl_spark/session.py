"""SparkSession factory with the engine's tuned defaults.

Scale posture (100 TB / 1000-executor target, exercised on local[N]):
- AQE on (runtime coalesce, skew-join splitting) — the frontier's per-host
  grouping is inherently skewed; AQE is the backstop behind explicit salting.
- Arrow on for all pandas UDFs (the extraction kernels are Arrow-batched).
- Arrow batches capped: HTML payloads are tens of KB per row, so the default
  10k-row batches would balloon executor memory; 1024 rows ≈ tens of MB.
- shuffle.partitions defaults sized for local runs; cluster deployments
  override via spark-submit --conf (AQE coalesces down as needed).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_CONFS"]

def _default_driver_mem() -> str:
    """min(32g, ~2/3 of physical RAM), floor 2g: big local-mode rounds need
    the heap (see the spark.driver.memory note below), but a 32g default
    would swap/OOM-kill out-of-the-box on smaller hosts. Explicit override:
    SPARK_GRAFT_DRIVER_MEM."""
    try:
        pages = os.sysconf("SC_PHYS_PAGES")
        page_size = os.sysconf("SC_PAGE_SIZE")
        total_gb = pages * page_size / (1 << 30)
    except (ValueError, OSError, AttributeError):
        total_gb = 12.0
    return f"{max(2, min(32, int(total_gb * 2 / 3)))}g"


DEFAULT_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "1024",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.session.timeZone": "UTC",
    # local mode runs everything in the driver JVM, so this IS the executor
    # heap: at 8g, 32 concurrent tasks' Arrow buffers + a multi-GB cached
    # corpus GC-thrash — measured 100k-fetch rounds ran SLOWER at local[32]
    # than local[8] until the heap was raised (BENCH.md big-round table).
    # Default adapts to the host (min(32g, 2/3 RAM)); big-round benchmarks
    # pin SPARK_GRAFT_DRIVER_MEM=32g. Clusters size executors via
    # spark-submit instead.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                                          _default_driver_mem()),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "webcrawl-spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or (
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in {**DEFAULT_CONFS, **(extra_confs or {})}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

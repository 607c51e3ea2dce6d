"""SparkSession factory tuned for the KG-construction workload.

Local mode here; the same config block is what we'd pass to spark-submit on
a real cluster (AQE on, Arrow on, skew-join on, UTC, explicit shuffle
parallelism). See SURVEY.md §4.3.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tera_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all local cores. Shuffle
    partitions default to the core count — right-sized for local mode; on a
    real cluster this knob scales with executor count (and AQE coalesces
    down at runtime anyway).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 4)

    # Make tera_spark importable by python workers/daemon (the warm daemon
    # module below is resolved by the worker python, whose PYTHONPATH does
    # not automatically include the repo).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = repo_root + (os.pathsep + pp if pp else "")

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("TERA_SPARK_DRIVER_MEM", "8g"))
        # Pin the heap: Xms=Xmx + AlwaysPreTouch commits every heap page at
        # JVM startup. Without it, G1 grows/uncommits the heap continuously
        # and every (re)committed page faults on first touch — measured on
        # this microVM host as >60% of ALL cpu burned in kernel time during
        # 32-thread runs (page-fault exits dominate). One-time pretouch
        # moves that cost to startup. Real clusters set the same pair for
        # the same reason.
        .config(
            "spark.driver.extraJavaOptions",
            "-Xms"
            + os.environ.get("TERA_SPARK_DRIVER_MEM", "8g")
            + " -XX:+AlwaysPreTouch -XX:-ShrinkHeapInSteps",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Fork UDF workers from a daemon that has pandas/pyarrow already
        # imported (COW-warm) — kills the per-worker cold-import stampede
        # on wide-parallelism UDF stages. See tera_spark/warm_daemon.py.
        .config("spark.python.daemon.module", "tera_spark.warm_daemon")
        .config("spark.python.worker.reuse", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

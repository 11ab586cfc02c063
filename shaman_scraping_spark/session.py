"""SparkSession builder with engine defaults.

Defaults are chosen for the 100 TB design point but work on local[N]:
AQE on (runtime join-strategy + skew-split), shuffle partitions sized
to cores in local mode, Arrow enabled for the pandas-UDF surface.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "shaman_scraping_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    in the sandbox.  Pass ``"submit"`` (or None under spark-submit,
    detected via the spark.master system conf) to let spark-submit's
    ``--master`` own the session — the builder then never overrides it,
    so ``spark-submit --py-files … --master <cluster>`` runs the engine
    on exactly the cluster it names (tools/submit_crawl.py).
    """
    under_submit = False
    if master is None or master == "submit":
        from pyspark import SparkConf

        under_submit = master == "submit" or SparkConf().contains(
            "spark.master"
        )
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = (
            SparkConf().get("spark.master", f"local[{cpus}]")
            if under_submit else f"local[{cpus}]"
        )
    if shuffle_partitions is None:
        # local[N] → N is a thread count; 2×cores keeps partitions small
        # enough to overlap while avoiding tiny-task overhead at test SF.
        # On a real cluster this is overridden (and AQE coalesces anyway).
        try:
            n = int(master.split("[")[1].rstrip("]").replace("*", "32"))
        except (IndexError, ValueError):
            n = 32
        shuffle_partitions = max(8, 2 * n)

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # batch sizes are PAYLOAD-aware: pages carry ~10-100KB html
        # binaries, so row-count-based defaults explode per-task memory
        # (4096-row columnar batches x 50KB = 200MB/task; 10k-row Arrow
        # batches = 500MB/task -> executor OOM on heavy corpora)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.parquet.columnarReaderBatchSize", "1024")
        # 32MB input splits: fat-payload scans pipeline JVM decode with
        # the Python UDF stage far better at fine granularity (measured
        # 1.6x on the full-corpus extract pass vs the 128MB default)
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # high-thread local mode + Arrow/parquet JNI critical sections
        # starve G1's GCLocker (default 2 allocation retries → task
        # failures "Retried waiting for GCLocker too often" and long
        # stalls at local[32] with 50KB binary rows); raising the
        # retry budget is the standard mitigation on Java 17
        # -Xss8m: the URL-canonicalization Catalyst expression is a
        # deep tree; streaming plans that embed it twice (gate + batch
        # side) overflowed the default thread stack during analysis
        .config("spark.driver.extraJavaOptions",
                "-XX:+UnlockDiagnosticVMOptions "
                "-XX:GCLockerRetryAllocationCount=64 -Xss8m "
                + os.environ.get("SPARK_GRAFT_EXTRA_JAVA", ""))
        .config("spark.executor.extraJavaOptions",
                "-XX:+UnlockDiagnosticVMOptions "
                "-XX:GCLockerRetryAllocationCount=64 -Xss8m "
                + os.environ.get("SPARK_GRAFT_EXTRA_JAVA", ""))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    if not under_submit:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

"""SparkSession factory with scale-oriented defaults.

The reference engine (GraphScope GAE) relies on hand-tuned native code;
here Catalyst/AQE does the equivalent work when the session is
configured for it (SURVEY.md §4.1).  These defaults are what we'd ship
to a 1000-executor cluster, minus the cluster-manager specifics:

- AQE on (runtime coalesce + skew-join splitting), since every
  superstep of an iterative graph app is a join + shuffle-agg whose
  ideal partitioning depends on frontier size;
- Arrow on, since the mining pipeline and a few custom ops use
  pandas UDFs (Arrow batches, never per-row Python);
- shuffle partitions sized to the local core count for tests; on a
  real cluster this is set to ~2-3x total cores via spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # graph state is re-read every superstep; keep broadcast threshold
    # default but make broadcasts explicit in code via F.broadcast().
    "spark.sql.autoBroadcastJoinThreshold": "10485760",
    # ~128 MB scan partitions: the parquet-side default that keeps a
    # 100 TB scan at ~800k tasks instead of millions.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "graphscope-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default
    ``local[*]``).  ``shuffle_partitions`` defaults to the parallelism
    level so each superstep's shuffle produces one wave of tasks.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(DEFAULT_CONFS)
    if shuffle_partitions is None:
        # one shuffle wave per superstep on local mode
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "*"
        # local[N,maxFailures] is valid Spark syntax — take the core
        # count field; fall back to cpu_count on anything unparsable
        n = n.split(",", 1)[0].strip()
        try:
            shuffle_partitions = os.cpu_count() if n in ("*", "") else int(n)
        except ValueError:
            shuffle_partitions = os.cpu_count()
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

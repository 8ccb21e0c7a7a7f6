"""SparkSession factory with scale-appropriate defaults.

Defaults chosen for the 100TB design point, scaled down for local[N]
testing: AQE on (runtime re-plan + skew-join splitting), shuffle
partitions sized to cores locally (cluster deployments override via
spark-submit conf), Arrow enabled for the vectorized pandas UDF paths,
and map-key LAST_WIN so per-document id->name maps reproduce Python
dict semantics (last assignment wins) from the reference
(`/root/reference/src/knext/utils.py:21` — dict(zip(...))).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python-dict semantics for map_from_entries on duplicate keys
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
    # tiny-file-friendly local defaults; real clusters override
    "spark.sql.files.maxPartitionBytes": "134217728",
    # iterative collect-free superstep chains embed broadcast
    # subtrees whose futures start at job submission — a multi-step
    # chain must not trip the 300s default await
    "spark.sql.broadcastTimeout": "3600",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "knext_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured; on a real cluster pass the
    master via spark-submit and leave this None.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark

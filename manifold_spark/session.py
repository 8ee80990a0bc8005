"""SparkSession factory.

Replaces the reference's session + S3 wiring
(`/root/reference/scripts/el_to_parquet.py:17-38`) with a local-or-cluster
factory. Scale posture: AQE on (runtime coalescing + skew-join splitting),
Arrow transfer on for the few Pandas-UDF paths, UTC session time so date
semantics are deterministic across cluster timezones.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Configs every session gets unless explicitly overridden. These are the
#: settings that matter at 100 TB: AQE re-plans joins/partitions at runtime,
#: skew-join splits hot keys, coalescing removes tiny post-shuffle tasks.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Listing dims are broadcast-sized even at 100 TB fact scale; raise the
    # auto-broadcast threshold a bit above the 10 MB default.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
}


def get_spark(
    app_name: str = "manifold-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master=None`` defers to the environment (spark-submit / existing
    session); tests pass ``local[N]`` and a small ``shuffle_partitions``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if warehouse_dir is not None:
        conf["spark.sql.warehouse.dir"] = warehouse_dir
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def configure_s3(spark: SparkSession, access_key: str, secret_key: str, endpoint: str | None = None) -> SparkSession:
    """Wire S3A credentials into the Hadoop conf (reference S4,
    `el_to_parquet.py:17-38`). No-op cost locally; kept for API parity."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.access.key", access_key)
    hconf.set("fs.s3a.secret.key", secret_key)
    if endpoint:
        hconf.set("fs.s3a.endpoint", endpoint)
    return spark

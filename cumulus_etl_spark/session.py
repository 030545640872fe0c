"""SparkSession factory.

Parity with the reference's embedded-Spark session config
(cumulus_etl/formats/deltalake.py:58-90) but tuned for a real cluster:
AQE on (runtime re-planning, skew-join handling), UTC session timezone
(timestamps-at-rest are strings in the data model; see SURVEY.md §1.2),
Arrow enabled for pandas interchange, and Delta Lake extensions only when
the delta-spark package is actually importable (it is optional).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

try:  # delta-spark is optional; the merge sink falls back to parquet-merge
    from delta import configure_spark_with_delta_pip  # type: ignore

    HAVE_DELTA = True
except ImportError:  # pragma: no cover
    configure_spark_with_delta_pip = None
    HAVE_DELTA = False


def get_spark(
    app_name: str = "cumulus-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Defaults assume local mode for tests; on a cluster, pass ``master=None``
    with ``spark.master`` preconfigured and a shuffle partition count sized
    to ~128MB per task at the target data scale.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime partition coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Deterministic timestamp semantics: data-at-rest is naive/UTC.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for pandas_udf / toPandas interchange (the NLP + multimodal path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Parquet pushdown + pruning: on by default but pinned here as contract.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Runtime bloom-filter pruning on shuffle joins: builds a bloom
        # filter from the small side and pushes it into the big side's
        # scan — at 100TB this skips row groups a static plan can't.
        # (semiJoinReduction deliberately NOT enabled: it planner-loops
        # on broadcast-into-window shapes like the prefix-sum packer.)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Streaming state on RocksDB: the default HDFS-backed provider
        # keeps every key in executor heap — at 100TB stream state
        # (dedup watermarks, sessions, EWMA baselines) that's an OOM,
        # not a design. RocksDB spills to local disk with changelog
        # checkpointing semantics unchanged.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        # Bound single-file read parallelism at 100TB scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Metastore warehouse for bucketed/managed tables; keep out of CWD.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/cumulus-etl-spark-warehouse"),
        )
        .config("spark.ui.enabled", "false")
    )
    if HAVE_DELTA:
        builder = (
            builder.config("spark.sql.extensions", "io.delta.sql.DeltaSparkSqlExtension")
            .config("spark.sql.catalog.spark_catalog", "org.apache.spark.sql.delta.catalog.DeltaCatalog")
            .config("spark.databricks.delta.schema.autoMerge.enabled", "true")
        )
        builder = configure_spark_with_delta_pip(builder)
    for k, v in s3a_conf().items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def s3a_conf(
    kms_key: str | None = None, region: str | None = None
) -> dict[str, str]:
    """S3A filesystem options, parity with the reference's S3 session
    tuning (cumulus_etl/formats/deltalake.py:234-250): default-chain
    credentials (so ~/.aws/credentials works, not just env vars), SSE-KMS
    at rest, explicit region/key when provided. Args fall back to the
    CUMULUS_S3_KMS_KEY / AWS_REGION environment variables; everything is
    inert unless an s3a:// path is actually used."""
    kms_key = kms_key or os.environ.get("CUMULUS_S3_KMS_KEY")
    region = region or os.environ.get("AWS_REGION") or os.environ.get("AWS_DEFAULT_REGION")
    conf = {
        "spark.hadoop.fs.s3a.aws.credentials.provider": (
            "software.amazon.awssdk.auth.credentials.DefaultCredentialsProvider"
        ),
        "spark.hadoop.fs.s3a.sse.enabled": "true",
        "spark.hadoop.fs.s3a.server-side-encryption-algorithm": "SSE-KMS",
    }
    if os.environ.get("CUMULUS_S3_MAGIC_COMMITTER") == "1":
        # scale hygiene for object-store writes: the S3A magic committer
        # avoids rename-based commits. Opt-in because it needs the
        # spark-hadoop-cloud jars on the classpath.
        conf.update(
            {
                "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
                "spark.sql.sources.commitProtocolClass": (
                    "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
                ),
                "spark.sql.parquet.output.committer.class": (
                    "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
                ),
            }
        )
    if kms_key:
        conf["spark.hadoop.fs.s3a.server-side-encryption.key"] = kms_key
    if region:
        conf["spark.hadoop.fs.s3a.endpoint.region"] = region
    return conf

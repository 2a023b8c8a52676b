"""Object-store backends via s3a — Cloudflare R2 parity recipe (S6).

The reference ships an R2Repository (src/repository/R2Repository.ts:50-54:
``bucket.list({prefix})`` + key sort for listing, get/put for content).
Spark's native equivalent is the hadoop-aws ``s3a://`` filesystem: R2 is
S3-API-compatible, so the whole listing/reading surface — glob expansion,
executor-side listing, parquet/text scans — comes from the scheme; the only
R2-specific part is the endpoint wiring this module encapsulates::

    from staticql_spark.sources.object_store import r2_hadoop_conf, configure_object_store
    configure_object_store(spark, r2_hadoop_conf(
        account_id="<ACCOUNT>",             # -> https://<ACCOUNT>.r2.cloudflarestorage.com
        access_key="...", secret_key="...",
        bucket="my-corpus",                  # optional: per-bucket override keys
    ))
    sql = define(config)(base_dir="s3a://my-corpus/content", spark=spark)

R2 quirks encoded here: path-style addressing (R2 has no virtual-host
buckets on custom endpoints), region literal ``auto``, and SSL on. The
same helper covers any S3-compatible store (minio, Ceph RGW) by passing
``endpoint=`` explicitly instead of ``account_id``.

Listing parity note: R2Repository.listFiles trims the glob at the first
``*`` and prefix-lists; s3a does full glob matching server-assisted by
prefix — a strict superset of the reference's behavior.
"""

from __future__ import annotations


def r2_hadoop_conf(
    account_id: str | None = None,
    *,
    endpoint: str | None = None,
    access_key: str,
    secret_key: str,
    bucket: str | None = None,
    path_style: bool = True,
) -> dict[str, str]:
    """Hadoop configuration map for an R2 (or any S3-compatible) endpoint.

    Exactly one of ``account_id`` (Cloudflare's endpoint scheme) or
    ``endpoint`` (full URL, e.g. ``https://minio.local:9000``) is required.
    With ``bucket``, keys are emitted as per-bucket overrides
    (``fs.s3a.bucket.<name>.*``) so one session can mix stores.
    """
    if (account_id is None) == (endpoint is None):
        raise ValueError("pass exactly one of account_id or endpoint")
    if endpoint is None:
        endpoint = f"https://{account_id}.r2.cloudflarestorage.com"
    scope = f"fs.s3a.bucket.{bucket}." if bucket else "fs.s3a."
    conf = {
        f"{scope}endpoint": endpoint,
        f"{scope}access.key": access_key,
        f"{scope}secret.key": secret_key,
        f"{scope}path.style.access": str(path_style).lower(),
        f"{scope}endpoint.region": "auto",
    }
    # credentials provider is not a per-bucket key on older hadoop-aws;
    # keep it global and static (R2 has no instance-profile metadata)
    conf["fs.s3a.aws.credentials.provider"] = (
        "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
    )
    return conf


def configure_object_store(spark, conf: dict[str, str]) -> None:
    """Apply a hadoop conf map to a live session (runtime-settable keys:
    s3a filesystem instances are created lazily per-URI, so setting these
    before the first ``s3a://`` access is sufficient — no restart)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hconf.set(k, v)

"""R2/s3a endpoint-override recipe (S6 parity with R2Repository.ts).

Offline: no network, no object store — verifies the conf plumbing lands in
the live session's hadoopConfiguration (what s3a filesystem instances read
at first access) and the endpoint derivation/per-bucket scoping rules.
"""

from __future__ import annotations

import pytest

from staticql_spark.sources.object_store import configure_object_store, r2_hadoop_conf


def test_r2_conf_derives_cloudflare_endpoint():
    conf = r2_hadoop_conf(account_id="abc123", access_key="AK", secret_key="SK")
    assert conf["fs.s3a.endpoint"] == "https://abc123.r2.cloudflarestorage.com"
    assert conf["fs.s3a.path.style.access"] == "true"
    assert conf["fs.s3a.endpoint.region"] == "auto"
    assert conf["fs.s3a.access.key"] == "AK"
    assert conf["fs.s3a.secret.key"] == "SK"


def test_r2_conf_per_bucket_scope_and_explicit_endpoint():
    conf = r2_hadoop_conf(
        endpoint="https://minio.local:9000",
        access_key="AK",
        secret_key="SK",
        bucket="corpus",
    )
    assert conf["fs.s3a.bucket.corpus.endpoint"] == "https://minio.local:9000"
    assert conf["fs.s3a.bucket.corpus.access.key"] == "AK"
    # credentials provider stays global (not a per-bucket key)
    assert "fs.s3a.aws.credentials.provider" in conf
    assert not any(k.startswith("fs.s3a.bucket.corpus.aws") for k in conf)


def test_r2_conf_requires_exactly_one_endpoint_source():
    with pytest.raises(ValueError):
        r2_hadoop_conf(access_key="AK", secret_key="SK")
    with pytest.raises(ValueError):
        r2_hadoop_conf(
            account_id="a", endpoint="https://x", access_key="AK", secret_key="SK"
        )


def test_configure_object_store_reaches_hadoop_conf(spark):
    conf = r2_hadoop_conf(account_id="acct9", access_key="AK9", secret_key="SK9")
    configure_object_store(spark, conf)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "https://acct9.r2.cloudflarestorage.com"
    assert hconf.get("fs.s3a.path.style.access") == "true"
    assert hconf.get("fs.s3a.endpoint.region") == "auto"

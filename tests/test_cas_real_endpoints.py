"""Real-endpoint certification for the object-store CAS adapters
(sources/manifest.py S3Cas / GcsCas / DynamoCas).

The adapters are exercised continuously against contract-faithful
fakes (tests/fake_aws.py — 412/409 conditional puts, paginated LIST,
stale Dynamo reads). This suite re-runs the SAME multi-writer protocol
tests against the real services, so a deployment can prove its
endpoint honors the consistency contract BEFORE trusting it with
commits. It self-skips — honestly, per backend — unless the operator
provides an endpoint:

    SCLERA_S3_BUCKET=<bucket>      # + AWS creds in the environment;
                                   # optional SCLERA_S3_PREFIX
    SCLERA_DYNAMO_TABLE=<table>    # partition key 'pk' (S)
    SCLERA_GCS_BUCKET=<bucket>     # + GOOGLE_APPLICATION_CREDENTIALS

Run:  python -m pytest tests/test_cas_real_endpoints.py -v

This container has no network and no cloud credentials, so here every
test skips (documented; same policy as test_jdbc_interop.py). The
README's deployment checklist points operators at this suite.
"""

from __future__ import annotations

import os
import uuid

import pytest

from sclera_spark.sources.manifest import DynamoCas, GcsCas, S3Cas

# the protocol tests are reused verbatim — they only consume the
# (spark, cas, host_a, host_b) tuple their cas_env fixture yields
from tests.test_manifest_cas import (
    test_claim_conflict_recomputes_from_new_snapshot as _t_claim_conflict,
)
from tests.test_manifest_cas import (
    test_live_foreign_claim_fails_loudly_then_recovers as _t_foreign_claim,
)
from tests.test_manifest_cas import (
    test_two_hosts_race_no_lost_updates as _t_race,
)

_BACKENDS = ["s3", "dynamo", "gcs"]


def _real_cas(kind: str):
    """A pointer store on the REAL service, or a skip explaining what
    to set. Prefixes/keys are uuid-fresh per run so concurrent CI runs
    (and leftover state) cannot collide."""
    run = uuid.uuid4().hex[:12]
    if kind == "s3":
        bucket = os.environ.get("SCLERA_S3_BUCKET")
        if not bucket:
            pytest.skip(
                "real-S3 CAS certification needs SCLERA_S3_BUCKET (+ AWS "
                "credentials); the adapter is otherwise covered by the "
                "contract-faithful fake in tests/fake_aws.py"
            )
        boto3 = pytest.importorskip("boto3")
        prefix = os.environ.get("SCLERA_S3_PREFIX", "sclera-cas-cert/")
        return S3Cas(
            boto3.client("s3"), bucket, prefix=f"{prefix}{run}/"
        )
    if kind == "dynamo":
        table = os.environ.get("SCLERA_DYNAMO_TABLE")
        if not table:
            pytest.skip(
                "real-DynamoDB CAS certification needs SCLERA_DYNAMO_TABLE "
                "(partition key 'pk', type S) + AWS credentials"
            )
        boto3 = pytest.importorskip("boto3")
        return DynamoCas(boto3.client("dynamodb"), table)
    if kind == "gcs":
        bucket = os.environ.get("SCLERA_GCS_BUCKET")
        if not bucket:
            pytest.skip(
                "real-GCS CAS certification needs SCLERA_GCS_BUCKET + "
                "GOOGLE_APPLICATION_CREDENTIALS"
            )
        storage = pytest.importorskip("google.cloud.storage")
        return GcsCas(
            storage.Client(), bucket, prefix=f"sclera-cas-cert/{run}/"
        )
    raise AssertionError(kind)


@pytest.fixture(params=_BACKENDS)
def real_cas_env(spark, tmp_path, request):
    from sclera_spark.sources.manifest import CasManifestTable

    cas = _real_cas(request.param)
    path = str(tmp_path / "tbl")
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    host_a = CasManifestTable.create_cas(df, path, cas)
    host_b = CasManifestTable(path, cas)
    return spark, cas, host_a, host_b


def test_real_endpoint_races_lose_no_updates(real_cas_env):
    """4 writers x 3 commits against the real store: dense version
    chain, no lost updates — the fake-suite race, for real."""
    _t_race(real_cas_env)


def test_real_endpoint_foreign_claim_recovery(real_cas_env):
    _t_foreign_claim(real_cas_env)


def test_real_endpoint_conflict_recompute(real_cas_env, monkeypatch):
    _t_claim_conflict(real_cas_env, monkeypatch)


def test_real_endpoint_raw_cas_semantics(real_cas_env):
    """Direct pointer-store semantics on the live endpoint: get on a
    fresh key, put-if-absent wins once, the loser sees the winner."""
    _, cas, _, _ = real_cas_env
    key = f"cert-{uuid.uuid4().hex[:8]}"
    assert cas.get(key) is None
    assert cas.cas(key, None, 1)
    assert not cas.cas(key, None, 1)  # same transition cannot win twice
    assert cas.get(key) == 1
    assert cas.cas(key, 1, 2) and cas.get(key) == 2


def test_real_endpoint_blob_contract(real_cas_env, tmp_path):
    """r14: the blob API (the CAS multi-table transaction journal's
    substrate) against the live endpoint — reuses the fake-suite
    contract test verbatim."""
    from tests.test_manifest_cas import test_blob_api_contract as _t

    _t(real_cas_env, tmp_path)


def test_real_endpoint_group_commit(real_cas_env, tmp_path):
    """r14: an actual two-table CAS group commit with the journal
    object in the live store, plus crash-after-journal recovery —
    reuses the fake-suite tests verbatim."""
    import pytest as _pytest

    from tests.test_manifest_cas import (
        test_cas_group_commit_atomic as _t_atomic,
    )

    _t_atomic(real_cas_env, tmp_path)


def test_real_endpoint_group_crash_recovery(
    real_cas_env, tmp_path, monkeypatch
):
    from tests.test_manifest_cas import (
        test_cas_group_commit_crash_after_journal_recovers as _t_crash,
    )

    _t_crash(real_cas_env, tmp_path, monkeypatch)

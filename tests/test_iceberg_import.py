"""CREATE TABLE ... FROM ICEBERG (sources/iceberg.py): the JSON
metadata layer is fully testable here; the Avro manifest layer is
gated on fastavro — absent in this container, so the full-import test
is an honest env-gated skip (same contract as the real-endpoint CAS
tests) and what IS asserted everywhere else is that the refusal is
loud, exact, and names the missing codec."""

from __future__ import annotations

import json
import os

import pytest

from sclera_spark.sources import iceberg as ice
from sclera_spark.sources.iceberg import IcebergImportUnsupported

try:
    import fastavro  # noqa: F401

    HAVE_FASTAVRO = True
except ImportError:
    # searched: fastavro and avro are not installed in this container
    # and there is no network to fetch them; the import path below is
    # exercised end-to-end wherever fastavro exists
    HAVE_FASTAVRO = False


def _write_metadata(
    tmp_path,
    *,
    version=2,
    snapshot_id=77,
    fields=None,
    manifest_list="snap-77.avro",
    vname="v3.metadata.json",
    hint=None,
):
    t = tmp_path / "ice"
    (t / "metadata").mkdir(parents=True, exist_ok=True)
    doc = {
        "format-version": version,
        "location": str(t),
        "current-snapshot-id": snapshot_id,
        "snapshots": [
            {
                "snapshot-id": snapshot_id,
                "manifest-list": str(t / "metadata" / manifest_list),
            }
        ],
        "schemas": [
            {
                "schema-id": 0,
                "fields": fields
                or [
                    {"id": 1, "name": "k", "type": "long"},
                    {"id": 2, "name": "v", "type": "string"},
                ],
            }
        ],
        "current-schema-id": 0,
    }
    with open(t / "metadata" / vname, "w") as fh:
        json.dump(doc, fh)
    if hint is not None:
        with open(t / "metadata" / "version-hint.text", "w") as fh:
            fh.write(hint)
    return str(t)


def test_metadata_resolution_prefers_hint_then_highest(tmp_path):
    t = _write_metadata(tmp_path, vname="v3.metadata.json")
    # a HIGHER version exists; without a hint it wins
    doc_hi = json.load(open(os.path.join(t, "metadata", "v3.metadata.json")))
    doc_hi["current-snapshot-id"] = 99
    doc_hi["snapshots"][0]["snapshot-id"] = 99
    with open(os.path.join(t, "metadata", "v7.metadata.json"), "w") as fh:
        json.dump(doc_hi, fh)
    assert ice.load_table_metadata(t)["current-snapshot-id"] == 99
    # the hint pins the older one
    with open(os.path.join(t, "metadata", "version-hint.text"), "w") as fh:
        fh.write("3")
    assert ice.load_table_metadata(t)["current-snapshot-id"] == 77


def test_schema_fields_type_mapping(tmp_path):
    t = _write_metadata(
        tmp_path,
        fields=[
            {"id": 1, "name": "a", "type": "int"},
            {"id": 2, "name": "b", "type": "timestamptz"},
            {"id": 3, "name": "c", "type": "decimal(10, 2)"},
            {"id": 4, "name": "d", "type": "uuid"},
        ],
    )
    got = {f["name"]: f["type"] for f in ice.schema_fields(
        ice.load_table_metadata(t)
    )}
    assert got == {
        "a": "integer",
        "b": "timestamp",
        "c": "decimal(10,2)",
        "d": "string",
    }


def test_future_format_version_refused(tmp_path):
    t = _write_metadata(tmp_path, version=3)
    with pytest.raises(IcebergImportUnsupported, match="format-version 3"):
        ice.load_table_metadata(t)


def test_no_snapshot_is_explicit(tmp_path):
    t = _write_metadata(tmp_path, snapshot_id=None)
    assert ice.current_snapshot(ice.load_table_metadata(t)) is None


def test_local_path_containment(tmp_path):
    t = _write_metadata(tmp_path)
    inside = ice._local_path(f"file://{t}/data/x.parquet", t)
    assert inside == f"{t}/data/x.parquet"
    with pytest.raises(ValueError, match="escapes the table"):
        ice._local_path("file:///etc/passwd", t)
    with pytest.raises(ValueError, match="escapes the table"):
        ice._local_path("../../outside.parquet", t)
    with pytest.raises(IcebergImportUnsupported, match="s3"):
        ice._local_path("s3://bucket/key.parquet", t)


@pytest.mark.skipif(
    HAVE_FASTAVRO, reason="fastavro present: the refusal cannot fire"
)
def test_missing_avro_codec_is_a_loud_exact_refusal(tmp_path):
    t = _write_metadata(tmp_path)
    with pytest.raises(IcebergImportUnsupported, match="fastavro"):
        ice.snapshot_data_files(ice.load_table_metadata(t), t)


# ---- full import: runs wherever fastavro is installed ----

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}

_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}


@pytest.mark.skipif(not HAVE_FASTAVRO, reason="fastavro not installed")
def test_full_iceberg_import_end_to_end(spark, tmp_path):
    """With a real Avro codec: a v2 layout (metadata.json → manifest
    list → manifest → parquet files) imports zero-copy and reads
    bit-identical to the parquet files themselves; a delete manifest
    in the snapshot refuses."""
    import fastavro

    from sclera_spark.sources.manifest import ManifestTable

    t = tmp_path / "ice"
    (t / "data").mkdir(parents=True)
    (t / "metadata").mkdir()
    spark.range(0, 100).selectExpr(
        "id AS k", "CAST(id AS STRING) AS v"
    ).coalesce(1).write.mode("overwrite").parquet(str(t / "stage"))
    (part,) = [
        f for f in os.listdir(t / "stage") if f.endswith(".parquet")
    ]
    os.rename(t / "stage" / part, t / "data" / "f1.parquet")
    size = os.path.getsize(t / "data" / "f1.parquet")

    mpath = str(t / "metadata" / "m1.avro")
    with open(mpath, "wb") as fh:
        fastavro.writer(
            fh,
            _MANIFEST_SCHEMA,
            [
                {
                    "status": 1,
                    "snapshot_id": 77,
                    "data_file": {
                        "content": 0,
                        "file_path": f"file://{t}/data/f1.parquet",
                        "file_format": "PARQUET",
                        "record_count": 100,
                        "file_size_in_bytes": size,
                    },
                }
            ],
        )
    with open(t / "metadata" / "snap-77.avro", "wb") as fh:
        fastavro.writer(
            fh,
            _MANIFEST_LIST_SCHEMA,
            [
                {
                    "manifest_path": mpath,
                    "manifest_length": os.path.getsize(mpath),
                    "partition_spec_id": 0,
                    "content": 0,
                    "added_snapshot_id": 77,
                }
            ],
        )
    _write_metadata(tmp_path)  # reuses t; snapshot 77 → snap-77.avro

    dest = str(tmp_path / "imported")
    mt = ManifestTable.import_iceberg(str(t), dest)
    got = sorted(
        (r.k, r.v) for r in mt.read(spark).collect()
    )
    want = sorted(
        (r.k, r.v)
        for r in spark.read.parquet(str(t / "data" / "f1.parquet")).collect()
    )
    assert got == want
    # zero-copy: the imported file is a hard link, not a copy
    assert os.stat(os.path.join(dest, "data", "f1.parquet")).st_nlink >= 2


@pytest.mark.skipif(
    HAVE_FASTAVRO, reason="fastavro present: the refusal cannot fire"
)
def test_ddl_surface_routes_and_refuses_loudly(spark, tmp_path):
    """The statement parses, resolves the JSON layer, and surfaces the
    Avro-gate refusal verbatim — and no half-registered table is left
    behind."""
    from sclera_spark.engine import ScleraEngine

    engine = ScleraEngine(spark)
    t = _write_metadata(tmp_path)
    with pytest.raises(IcebergImportUnsupported, match="fastavro"):
        engine.execute(f"CREATE TABLE icetab FROM ICEBERG '{t}'")
    assert "icetab" not in engine.ddl().managed

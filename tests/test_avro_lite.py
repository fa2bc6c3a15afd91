"""sources/avro_lite.py — the bundled pure-Python Avro Object Container
File reader. Two oracle layers:

- spec vectors: the zig-zag varint examples printed in the Avro
  specification itself (https://avro.apache.org/docs/1.12.0/specification/
  "Binary Encoding": 0->00, -1->01, 1->02, -2->03, 2->04, -64->7f,
  64->80 01).
- the Apache Avro JAVA library bundled with the Spark distribution: an
  independent canonical ENCODER writes container files (all primitive
  types, unions, enums, arrays, maps, nested records, null + deflate
  codecs) that avro_lite must decode value-exactly.
"""

from __future__ import annotations

import json
import os

import pytest

from sclera_spark.sources import avro_lite
from sclera_spark.sources.avro_lite import AvroLiteError, _Decoder


def test_zigzag_spec_vectors():
    for raw, want in [
        (b"\x00", 0),
        (b"\x01", -1),
        (b"\x02", 1),
        (b"\x03", -2),
        (b"\x04", 2),
        (b"\x7f", -64),
        (b"\x80\x01", 64),
        (b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff\x01", 2**63 - 1),
        (b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01", -(2**63)),
    ]:
        assert _Decoder(raw).long() == want, raw


def test_truncation_and_bad_magic_are_loud():
    with pytest.raises(AvroLiteError, match="truncated"):
        _Decoder(b"\x80").long()  # continuation bit, no next byte
    import io

    with pytest.raises(AvroLiteError, match="magic"):
        list(avro_lite.reader(io.BytesIO(b"NOPE" + b"\x00" * 32)))


def test_undefined_named_type_is_loud():
    dr = avro_lite._DatumReader()
    with pytest.raises(AvroLiteError, match="undefined named type"):
        dr.datum(_Decoder(b"\x00"), "mystery_record")


def _write_java_avro(spark, path, schema_json, json_rows, codec=None):
    """Encode rows with the Apache Avro JAVA library (Avro-JSON datum
    encoding in, canonical binary container out)."""
    jvm = spark._jvm
    parser = jvm.org.apache.avro.Schema.Parser()
    schema = parser.parse(json.dumps(schema_json))
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    if codec == "deflate":
        dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    dfw.create(schema, jvm.java.io.File(path))
    for row in json_rows:
        dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(
            schema, json.dumps(row)
        )
        dfw.append(reader.read(None, dec))
    dfw.close()


_SCHEMA = {
    "type": "record",
    "name": "everything",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "l", "type": "long"},
        {"name": "i", "type": "int"},
        {"name": "b", "type": "boolean"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "by", "type": "bytes"},
        {"name": "u", "type": ["null", "long"], "default": None},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "a", "type": {"type": "array", "items": "int"}},
        {
            "name": "e",
            "type": {"type": "enum", "name": "E", "symbols": ["X", "Y"]},
        },
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [{"name": "v", "type": "double"}],
            },
        },
        {"name": "again", "type": "inner"},  # named-type reference
        {
            "name": "fx",
            "type": {"type": "fixed", "name": "F8", "size": 3},
        },
    ],
}

_ROWS = [
    {
        "s": "héllo",
        "l": 2**40 + 3,
        "i": -7,
        "b": True,
        "f": 1.5,
        "d": -2.25,
        "by": "\u0001\u00ff",
        "u": {"long": 99},
        "m": {"k1": "v1", "k2": "v2"},
        "a": [1, -2, 3],
        "e": "Y",
        "nested": {"v": 3.5},
        "again": {"v": -4.5},
        "fx": "abc",
    },
    {
        "s": "",
        "l": -9,
        "i": 0,
        "b": False,
        "f": 0.0,
        "d": 0.0,
        "by": "",
        "u": None,
        "m": {},
        "a": [],
        "e": "X",
        "nested": {"v": 0.0},
        "again": {"v": 0.0},
        "fx": "xyz",
    },
]

_WANT = [
    dict(
        _ROWS[0],
        by=b"\x01\xff",
        u=99,
        fx=b"abc",
    ),
    dict(_ROWS[1], by=b"", u=None, fx=b"xyz"),
]


@pytest.mark.parametrize("codec", [None, "deflate"])
def test_decodes_java_encoded_container_value_exactly(spark, tmp_path, codec):
    path = str(tmp_path / f"t_{codec}.avro")
    _write_java_avro(spark, path, _SCHEMA, _ROWS, codec)
    got = avro_lite.read_file(path)
    assert len(got) == 2
    for g, w in zip(got, _WANT):
        for k, v in w.items():
            if k == "f":  # float32 round-trip
                assert abs(g[k] - v) < 1e-6
            else:
                assert g[k] == v, (codec, k, g[k], v)
    assert avro_lite.schema_of(path)["name"] == "everything"


def test_sync_marker_mismatch_is_loud(spark, tmp_path):
    path = str(tmp_path / "t.avro")
    _write_java_avro(spark, path, _SCHEMA, _ROWS)
    blob = bytearray(open(path, "rb").read())
    blob[-1] ^= 0xFF  # corrupt the trailing sync marker
    corrupt = str(tmp_path / "corrupt.avro")
    open(corrupt, "wb").write(bytes(blob))
    with pytest.raises(AvroLiteError, match="sync marker"):
        avro_lite.read_file(corrupt)


def test_vendored_fixture_bytes_decode(tmp_path):
    """The committed fixture files (written by the Java encoder via
    tools/gen_iceberg_avro_fixture.py) decode to the exact records the
    Iceberg replay expects — pinning the VENDORED bytes, not just
    freshly-generated ones."""
    fixdir = os.path.join(
        os.path.dirname(__file__), "fixtures", "iceberg_avro"
    )
    mlist = avro_lite.read_file(
        os.path.join(fixdir, "manifest_list.avro")
    )
    assert [r["manifest_path"] for r in mlist] == ["metadata/m1.avro"]
    assert mlist[0]["content"] == 0
    assert mlist[0]["added_snapshot_id"] == 77
    assert mlist[0]["partitions"][0]["lower_bound"] == b"\x00\x01"
    entries = avro_lite.read_file(os.path.join(fixdir, "m1.avro"))
    assert [e["status"] for e in entries] == [1, 1, 2]
    assert [e["data_file"]["file_path"] for e in entries] == [
        "data/f1.parquet",
        "data/f2.parquet",
        "data/gone.parquet",
    ]
    assert all(
        e["data_file"]["file_format"] == "PARQUET" for e in entries
    )
    dele = avro_lite.read_file(
        os.path.join(fixdir, "manifest_list_deletes.avro")
    )
    assert dele[0]["content"] == 1
    # r14: snappy DECODES (pure-Python raw-block decoder, CRC32
    # verified) — snappy-java's bytes are the canonical vector; the
    # snappy list must yield the identical records as the null-codec one
    snap = avro_lite.read_file(
        os.path.join(fixdir, "manifest_list_snappy.avro")
    )
    assert snap == mlist
    # the full-snappy chain: a snappy manifest's entries match the
    # deflate manifest's (multi-record blocks exercise back-references
    # across the repetitive entry structs)
    snap_entries = avro_lite.read_file(
        os.path.join(fixdir, "m1_snappy.avro")
    )
    assert snap_entries == entries
    allsnap = avro_lite.read_file(
        os.path.join(fixdir, "manifest_list_allsnappy.avro")
    )
    assert [r["manifest_path"] for r in allsnap] == ["metadata/m1_snappy.avro"]
    # r14: the FULL Avro 1.12 codec matrix decodes — zstd (pyarrow or
    # the pure-Python RFC 8878 decoder), bzip2 and xz (stdlib); the
    # Java-encoder bytes are the canonical vectors for each
    for name in (
        "manifest_list_zstd.avro",
        "manifest_list_bzip2.avro",
        "manifest_list_xz.avro",
    ):
        got = avro_lite.read_file(os.path.join(fixdir, name))
        assert got == mlist, name
    # ...including zstd through the pure-Python fallback path
    orig = avro_lite._pa_codec
    avro_lite._pa_codec = lambda _n: None
    try:
        got = avro_lite.read_file(
            os.path.join(fixdir, "manifest_list_zstd.avro")
        )
        assert got == mlist
    finally:
        avro_lite._pa_codec = orig
    # an UNKNOWN codec name stays a loud refusal
    with pytest.raises(AvroLiteError, match="lz4hc"):
        avro_lite.reader(
            __import__("io").BytesIO(_unknown_codec_container())
        ).__next__()


def _unknown_codec_container() -> bytes:
    """A structurally-valid Avro container whose avro.codec names a
    codec that does not exist — built by hand with the spec's binary
    encoding, for pinning the unknown-codec refusal now that every
    real Avro 1.12 codec decodes."""
    import json as _json

    def _varint(v: int) -> bytes:
        z = (v << 1) ^ (v >> 63) if v < 0 else v << 1
        out = bytearray()
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    def _bytes(b: bytes) -> bytes:
        return _varint(len(b)) + b

    schema = _json.dumps({"type": "record", "name": "r", "fields": []}).encode()
    meta = (
        _varint(2)
        + _bytes(b"avro.schema") + _bytes(schema)
        + _bytes(b"avro.codec") + _bytes(b"lz4hc")
        + _varint(0)
    )
    sync = b"\x01" * 16
    block = _varint(1) + _varint(4) + b"\x00\x00\x00\x00" + sync
    return b"Obj\x01" + meta + sync + block


def test_snappy_hostile_input_refuses():
    """The snappy decoder refuses corrupt/hostile blocks loudly:
    CRC mismatch, out-of-range copy offsets, truncated literals,
    preamble/output length mismatch, and length-bomb preambles — and
    round-trips overlapping-copy (RLE) encodings correctly."""
    import struct
    import zlib as _zlib

    from sclera_spark.sources.avro_lite import (
        AvroLiteError,
        _decompress,
        _snappy_decompress,
    )

    # hand-built valid block: literal 'abcd' + overlapping copy
    # (offset 2, len 6) -> abcd + cdcdcd (byte-wise RLE semantics)
    body = bytes([10]) + b"\x0c" + b"abcd" + bytes([(2 << 2) | 1, 2])
    assert _snappy_decompress(body) == b"abcdcdcdcd"
    # through the Avro codec layer: CRC verified
    crc = struct.pack(">I", _zlib.crc32(b"abcdcdcdcd") & 0xFFFFFFFF)
    assert _decompress("snappy", body + crc) == b"abcdcdcdcd"
    with pytest.raises(AvroLiteError, match="CRC32"):
        _decompress("snappy", body + b"\x00\x00\x00\x00")
    with pytest.raises(AvroLiteError, match="trailer"):
        _decompress("snappy", b"\x01\x00")
    # copy offset past the produced output
    with pytest.raises(AvroLiteError, match="offset out of range"):
        _snappy_decompress(bytes([6]) + b"\x04ab" + bytes([(3 << 2) | 1, 9]))
    # zero offset
    with pytest.raises(AvroLiteError, match="offset out of range"):
        _snappy_decompress(bytes([6]) + b"\x04ab" + bytes([(3 << 2) | 1, 0]))
    # truncated literal
    with pytest.raises(AvroLiteError, match="literal truncated"):
        _snappy_decompress(bytes([4]) + b"\x0cab")
    # output shorter than preamble claims
    with pytest.raises(AvroLiteError, match="preamble claims"):
        _snappy_decompress(bytes([9]) + b"\x0c" + b"abcd")
    # output exceeding preamble
    with pytest.raises(AvroLiteError, match="exceeds"):
        _snappy_decompress(bytes([2]) + b"\x0c" + b"abcd")
    # length-bomb preamble refuses before allocating
    bomb = b"\xff\xff\xff\xff\x0f"  # ~4 GiB claim
    with pytest.raises(AvroLiteError, match="cap"):
        _snappy_decompress(bomb)
    # overlong varint
    with pytest.raises(AvroLiteError, match="overlong"):
        _snappy_decompress(b"\x80\x80\x80\x80\x80\x80\x01")


def test_hostile_counts_and_sizes_refuse():
    """Corrupt/hostile containers must refuse, not spin: zero-width
    datums make block counts legitimately unbounded by input size, so
    a loop-bomb count hits a hard cap; negative counts/sizes/lengths
    are refused outright."""
    import io
    import json as _json

    def _varint(v):
        # zig-zag encode
        z = (v << 1) ^ (v >> 63) if v < 0 else v << 1
        out = bytearray()
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    schema = _json.dumps({"type": "record", "name": "r", "fields": []})
    header = (
        b"Obj\x01"
        + _varint(2)  # metadata map: 2 pairs
        + _varint(len("avro.schema")) + b"avro.schema"
        + _varint(len(schema)) + schema.encode()
        + _varint(len("avro.codec")) + b"avro.codec"
        + _varint(4) + b"null"
        + _varint(0)  # map terminator
        + b"S" * 16  # sync
    )
    # data block: 10^12 zero-width records in 0 bytes -> cap refusal
    bomb = header + _varint(10**12) + _varint(0) + b"S" * 16
    with pytest.raises(AvroLiteError, match="cap"):
        list(avro_lite.reader(io.BytesIO(bomb)))
    # negative block size -> refusal
    neg = header + _varint(1) + _varint(-5)
    with pytest.raises(AvroLiteError, match="negative"):
        list(avro_lite.reader(io.BytesIO(neg)))


def test_chained_blocks_hit_container_budget():
    """A per-block cap alone is bypassable by CHAINING at-cap blocks of
    zero-width records (~20 hostile bytes per block buys unbounded
    decode work); the shared container budget — proportional to input
    bytes — must refuse the chain."""
    import io
    import json as _json

    def _varint(v):
        z = (v << 1) ^ (v >> 63) if v < 0 else v << 1
        out = bytearray()
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    schema = _json.dumps({"type": "record", "name": "r", "fields": []})
    header = (
        b"Obj\x01"
        + _varint(2)
        + _varint(len("avro.schema")) + b"avro.schema"
        + _varint(len(schema)) + schema.encode()
        + _varint(len("avro.codec")) + b"avro.codec"
        + _varint(4) + b"null"
        + _varint(0)
        + b"S" * 16
    )
    # each block stays UNDER the per-block cap but the chain's total
    # item claim dwarfs what the byte count can legitimately encode
    block = _varint(99_000_000) + _varint(0) + b"S" * 16
    bomb = header + block * 50
    with pytest.raises(AvroLiteError, match="byte size"):
        list(avro_lite.reader(io.BytesIO(bomb)))
    # the same chaining inside ONE datum: an array of nulls split
    # across many sub-cap blocks
    arr_schema = _json.dumps({"type": "array", "items": "null"})
    header2 = (
        b"Obj\x01"
        + _varint(2)
        + _varint(len("avro.schema")) + b"avro.schema"
        + _varint(len(arr_schema)) + arr_schema.encode()
        + _varint(len("avro.codec")) + b"avro.codec"
        + _varint(4) + b"null"
        + _varint(0)
        + b"S" * 16
    )
    arr_bomb = (
        header2
        + _varint(1)  # one record in the data block
        + _varint(len(block) * 50)  # claimed block byte size
        + (_varint(99_000_000) * 200 + _varint(0))  # chained array blocks
        + b"S" * 16
    )
    with pytest.raises(AvroLiteError):
        list(avro_lite.reader(io.BytesIO(arr_bomb)))


def test_deflate_bomb_refuses_at_inflate_cap():
    """A deflate block claiming gigabytes from a few kilobytes must
    refuse at the inflation ceiling instead of allocating its claim."""
    import io
    import json as _json
    import zlib

    def _varint(v):
        z = (v << 1) ^ (v >> 63) if v < 0 else v << 1
        out = bytearray()
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    schema = _json.dumps(
        {"type": "record", "name": "r",
         "fields": [{"name": "b", "type": "bytes"}]}
    )
    header = (
        b"Obj\x01"
        + _varint(2)
        + _varint(len("avro.schema")) + b"avro.schema"
        + _varint(len(schema)) + schema.encode()
        + _varint(len("avro.codec")) + b"avro.codec"
        + _varint(7) + b"deflate"
        + _varint(0)
        + b"S" * 16
    )
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    payload = co.compress(b"\x00" * (avro_lite._MAX_INFLATE + (1 << 20)))
    payload += co.flush()
    bomb = header + _varint(1) + _varint(len(payload)) + payload + b"S" * 16
    with pytest.raises(AvroLiteError, match="inflates past"):
        list(avro_lite.reader(io.BytesIO(bomb)))

"""Minimal pure-Python Apache Avro Object Container File reader.

Implements exactly the PUBLIC Avro 1.x specification
(https://avro.apache.org/docs/1.12.0/specification/ — file format:
"Object Container Files"; encodings: "Binary Encoding"), enough to read
Iceberg's manifest-list and manifest files (sources/iceberg.py) without
a third-party codec. Reading uses the embedded WRITER schema and yields
plain dicts for records — the same shape ``fastavro.reader`` yields —
so the Iceberg replay code is byte-for-byte agnostic about which reader
decoded it.

Scope (deliberate):
- decode-only; no writer (fixtures are generated with the Apache Avro
  JAVA library bundled in the Spark distribution — an independent,
  canonical encoder — see tests/test_iceberg_import.py).
- codecs: the FULL Avro 1.12 matrix (r14) — ``null``, ``deflate``
  (raw zlib), ``snappy`` (CRC32-verified; pyarrow's C decoder when the
  build has it, else the bundled pure-Python raw-block decoder),
  ``zstandard`` (pyarrow when available, else the bundled pure-Python
  RFC 8878 decoder in sources/zstd_lite.py), ``bzip2`` and ``xz``
  (Python stdlib, output-ceiling guarded). Unknown codec names refuse
  loudly.
- logical types are returned as their RAW underlying values (Iceberg's
  replay only touches strings/longs/ints, where raw == logical).

Every branch below maps 1:1 to a spec clause; nothing is inferred from
observed bytes. Round-12 verdict task 2 ("bundle a minimal pure-Python
Avro record reader for the two schemas Iceberg uses") is the charter.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, BinaryIO, Iterator

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}


class AvroLiteError(ValueError):
    """Malformed container bytes or an unsupported (but recognized)
    feature — always raised with the exact reason."""


class _Budget:
    """Container-wide decoded-item budget, shared by every decoder a
    single container spawns (header, data blocks, nested array/map
    block series). A PER-BLOCK cap alone is bypassable by chaining
    at-cap blocks of zero-width datums (empty records, nulls — legal
    encodings that consume no input bytes), making decode work
    unbounded by input size; charging one shared budget sized from the
    input length closes that: total items a container may claim is
    proportional to the bytes it actually shipped."""

    __slots__ = ("remaining",)

    def __init__(self, remaining: int):
        self.remaining = remaining

    def charge(self, n: int) -> None:
        self.remaining -= n
        if self.remaining < 0:
            raise AvroLiteError(
                "avro: container claims more items than its byte size "
                "can legitimately encode — refusing a corrupt or "
                "hostile container"
            )


def _budget_for(nbytes: int) -> _Budget:
    # 64 items/byte is generous headroom for zero-width datums inside
    # real rows; a hostile 2 KB loop-bomb still caps at ~128k items
    return _Budget(max(1_000_000, 64 * nbytes))


class _Decoder:
    """Spec 'Binary Encoding' primitive decoders over a byte buffer."""

    def __init__(self, buf: bytes, budget: _Budget | None = None):
        self._b = buf
        self._pos = 0
        self.budget = budget

    def eof(self) -> bool:
        return self._pos >= len(self._b)

    def read(self, n: int) -> bytes:
        if n < 0:
            raise AvroLiteError("avro: negative read length")
        if self._pos + n > len(self._b):
            raise AvroLiteError(
                f"avro: truncated input (need {n} bytes at offset "
                f"{self._pos}, have {len(self._b) - self._pos})"
            )
        out = self._b[self._pos : self._pos + n]
        self._pos += n
        return out

    def long(self) -> int:
        """Zig-zag varint (spec: int and long encodings)."""
        shift = 0
        acc = 0
        while True:
            byte = self.read(1)[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 70:
                raise AvroLiteError("avro: varint longer than 10 bytes")
        return (acc >> 1) ^ -(acc & 1)

    def boolean(self) -> bool:
        return self.read(1) != b"\x00"

    def float_(self) -> float:
        return struct.unpack("<f", self.read(4))[0]

    def double(self) -> float:
        return struct.unpack("<d", self.read(8))[0]

    def bytes_(self) -> bytes:
        n = self.long()
        if n < 0:
            raise AvroLiteError("avro: negative bytes/string length")
        return self.read(n)

    def string(self) -> str:
        return self.bytes_().decode("utf-8")


def _named(schema: dict) -> list[str]:
    """The names a named schema (record/enum/fixed) is referencable by:
    fullname (namespace-qualified), plus the short name (spec: names)."""
    name = schema.get("name")
    if not name:
        return []
    ns = schema.get("namespace")
    out = [name]
    if ns and "." not in name:
        out.append(f"{ns}.{name}")
    return out


class _DatumReader:
    """Reads one datum of the (writer) ``schema``; records become dicts,
    enums their symbol string, unions their branch value."""

    def __init__(self):
        self._types: dict[str, Any] = {}

    def register(self, schema: Any) -> None:
        if isinstance(schema, dict):
            for n in _named(schema):
                self._types[n] = schema
            t = schema.get("type")
            if t == "record":
                for f in schema.get("fields", []):
                    self.register(f["type"])
            elif t in ("array",):
                self.register(schema["items"])
            elif t in ("map",):
                self.register(schema["values"])
        elif isinstance(schema, list):
            for branch in schema:
                self.register(branch)

    def datum(self, dec: _Decoder, schema: Any) -> Any:
        if isinstance(schema, str):
            if schema in _PRIMITIVES:
                return self._primitive(dec, schema)
            named = self._types.get(schema)
            if named is None:
                raise AvroLiteError(
                    f"avro: reference to undefined named type {schema!r}"
                )
            return self.datum(dec, named)
        if isinstance(schema, list):  # union: long index, then branch
            idx = dec.long()
            if not 0 <= idx < len(schema):
                raise AvroLiteError(
                    f"avro: union index {idx} out of range "
                    f"({len(schema)} branches)"
                )
            return self.datum(dec, schema[idx])
        t = schema["type"]
        if t in _PRIMITIVES:
            return self._primitive(dec, t)
        if t == "record":
            return {
                f["name"]: self.datum(dec, f["type"])
                for f in schema["fields"]
            }
        if t == "enum":
            idx = dec.long()
            symbols = schema["symbols"]
            if not 0 <= idx < len(symbols):
                raise AvroLiteError(
                    f"avro: enum index {idx} out of range for "
                    f"{schema.get('name')!r}"
                )
            return symbols[idx]
        if t == "fixed":
            return dec.read(int(schema["size"]))
        if t == "array":
            return self._blocks(dec, lambda: self.datum(dec, schema["items"]))
        if t == "map":
            out: dict[str, Any] = {}

            def _pair():
                # key MUST decode before the value (Python subscript
                # assignment evaluates the RHS first — don't inline)
                key = dec.string()
                out[key] = self.datum(dec, schema["values"])

            self._blocks(dec, _pair, collect=False)
            return out
        raise AvroLiteError(f"avro: unsupported schema type {t!r}")

    @staticmethod
    def _primitive(dec: _Decoder, t: str) -> Any:
        if t == "null":
            return None
        if t == "boolean":
            return dec.boolean()
        if t in ("int", "long"):
            return dec.long()
        if t == "float":
            return dec.float_()
        if t == "double":
            return dec.double()
        if t == "bytes":
            return dec.bytes_()
        return dec.string()  # "string"

    # zero-width datums (null type, empty records) make item counts
    # legitimately unbounded by input size, so counts get a hard cap —
    # far above any real manifest, small enough that corrupt/malicious
    # bytes cannot spin the decode loop for hours
    MAX_BLOCK_ITEMS = 100_000_000

    @classmethod
    def _blocks(cls, dec: _Decoder, item, collect: bool = True):
        """Array/map block series (spec): count per block, 0 terminates;
        a NEGATIVE count means |count| items preceded by a byte size."""
        out = [] if collect else None
        while True:
            n = dec.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                size = dec.long()  # block byte size: present, unused
                if size < 0:
                    raise AvroLiteError("avro: negative block byte size")
            if n > cls.MAX_BLOCK_ITEMS:
                raise AvroLiteError(
                    f"avro: block claims {n} items (cap "
                    f"{cls.MAX_BLOCK_ITEMS}) — refusing a corrupt or "
                    "hostile container"
                )
            if dec.budget is not None:
                dec.budget.charge(n)
            for _ in range(n):
                v = item()
                if collect:
                    out.append(v)


_MAX_INFLATE = 1 << 30  # 1 GiB per block: far past any real manifest


def _snappy_decompress(data: bytes) -> bytes:
    """Pure-Python snappy RAW-format decoder (the block format, not the
    framing format) — implements the public format description
    (github.com/google/snappy format_description.txt) exactly:
    little-endian-varint uncompressed-length preamble, then a tag-byte
    stream of literals and back-references. Back-references may overlap
    their own output (offset < length copies bytes as they appear —
    the format's RLE idiom). Used for Avro's ``snappy`` codec, the
    most common encoding of Iceberg manifests in the wild; hostile
    input refuses loudly (length bombs, out-of-range offsets,
    truncation) instead of allocating its claim."""
    pos = 0
    n = len(data)
    # preamble: PLAIN varint32 (no zig-zag), little-endian 7-bit groups
    result_len = 0
    shift = 0
    while True:
        if pos >= n:
            raise AvroLiteError("avro: snappy preamble truncated")
        b = data[pos]
        pos += 1
        result_len |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 31:
            raise AvroLiteError("avro: snappy preamble varint overlong")
    if result_len > _MAX_INFLATE:
        raise AvroLiteError(
            f"avro: snappy block claims {result_len} uncompressed bytes "
            f"(cap {_MAX_INFLATE}) — refusing a corrupt or hostile "
            "container"
        )
    out = bytearray()
    while pos < n:
        tag = data[pos]
        pos += 1
        ttype = tag & 3
        if ttype == 0:  # literal
            ln = (tag >> 2) + 1
            if ln > 60:
                nb = ln - 60  # 1-4 length bytes, little-endian
                if pos + nb > n:
                    raise AvroLiteError("avro: snappy literal-length truncated")
                ln = int.from_bytes(data[pos : pos + nb], "little") + 1
                pos += nb
            if pos + ln > n:
                raise AvroLiteError("avro: snappy literal truncated")
            out += data[pos : pos + ln]
            pos += ln
        else:
            if ttype == 1:  # copy, 1-byte offset: len 4-11, off 11 bits
                ln = 4 + ((tag >> 2) & 0x7)
                if pos >= n:
                    raise AvroLiteError("avro: snappy copy offset truncated")
                off = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif ttype == 2:  # copy, 2-byte little-endian offset
                ln = (tag >> 2) + 1
                if pos + 2 > n:
                    raise AvroLiteError("avro: snappy copy offset truncated")
                off = int.from_bytes(data[pos : pos + 2], "little")
                pos += 2
            else:  # copy, 4-byte little-endian offset
                ln = (tag >> 2) + 1
                if pos + 4 > n:
                    raise AvroLiteError("avro: snappy copy offset truncated")
                off = int.from_bytes(data[pos : pos + 4], "little")
                pos += 4
            if off == 0 or off > len(out):
                raise AvroLiteError(
                    "avro: snappy copy offset out of range (corrupt block)"
                )
            start = len(out) - off
            if off >= ln:  # non-overlapping: one slice
                out += out[start : start + ln]
            else:  # overlapping: byte-wise (the spec's RLE semantics)
                for i in range(ln):
                    out.append(out[start + i])
        if len(out) > result_len:
            raise AvroLiteError(
                "avro: snappy output exceeds its preamble length "
                "(corrupt block)"
            )
    if len(out) != result_len:
        raise AvroLiteError(
            f"avro: snappy block decoded to {len(out)} bytes but its "
            f"preamble claims {result_len} (corrupt block)"
        )
    return bytes(out)


def _pa_codec(name: str):
    """pyarrow's bundled codec when available (the FAST path — C-level
    snappy/zstd; pyarrow is a hard dependency of this engine, but its
    codec set is build-dependent, so availability is probed and the
    pure-Python spec decoders below remain the fallback)."""
    try:
        import pyarrow as pa

        if pa.Codec.is_available(name):
            return pa.Codec(name)
    except Exception:
        pass
    return None


def _snappy_preamble_length(data: bytes) -> int | None:
    """The snappy raw-format preamble (plain little-endian varint32):
    the declared uncompressed length, or None if malformed — used to
    hand pyarrow's C decoder its required decompressed_size."""
    n = 0
    shift = 0
    for i, b in enumerate(data[:5]):
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n
        shift += 7
    return None


def _decompress(codec: str, block: bytes) -> bytes:
    if codec in ("null", ""):
        return block
    if codec == "deflate":
        # spec: raw DEFLATE stream, no zlib header (RFC 1951).
        # Decompress with an output ceiling: a deflate bomb must refuse
        # loudly, not allocate its claim.
        d = zlib.decompressobj(-15)
        out = d.decompress(block, _MAX_INFLATE)
        if d.unconsumed_tail:
            raise AvroLiteError(
                f"avro: deflate block inflates past {_MAX_INFLATE} "
                "bytes — refusing a corrupt or hostile container"
            )
        return out + d.flush()
    if codec == "snappy":
        # Avro spec ("Required Codecs: snappy"): each block is the
        # snappy-compressed bytes followed by the 4-byte BIG-endian
        # CRC32 of the UNCOMPRESSED data. pyarrow's C snappy when the
        # build has it, else the pure-Python raw-block decoder; the
        # CRC is verified either way.
        if len(block) < 4:
            raise AvroLiteError(
                "avro: snappy block too short for its CRC32 trailer"
            )
        # pyarrow's C decoder needs the decompressed size up front —
        # the snappy preamble varint carries it
        size = _snappy_preamble_length(block[:-4])
        pac = _pa_codec("snappy") if size is not None else None
        if pac is not None and size <= _MAX_INFLATE:
            try:
                out = bytes(pac.decompress(block[:-4], decompressed_size=size))
            except Exception as exc:
                raise AvroLiteError(
                    f"avro: snappy block failed to decode: {exc}"
                ) from exc
        else:
            out = _snappy_decompress(block[:-4])
        if zlib.crc32(out) & 0xFFFFFFFF != int.from_bytes(block[-4:], "big"):
            raise AvroLiteError(
                "avro: snappy block CRC32 mismatch (corrupt container)"
            )
        return out
    if codec == "zstandard":
        # Avro spec name for zstd; each block is one zstd frame (no
        # extra trailer). pyarrow's C zstd when available, else the
        # pure-Python RFC 8878 decoder (sources/zstd_lite.py, r14 —
        # fuzz-pinned against both the JVM and pyarrow encoders).
        from sclera_spark.sources.zstd_lite import (
            ZstdError,
            decompress,
            frame_content_size,
        )

        # pyarrow's C decoder needs the decompressed size up front —
        # the frame header usually declares it; headers without it
        # take the pure-Python path (which tracks size as it decodes)
        size = frame_content_size(block)
        pac = _pa_codec("zstd") if size is not None else None
        if pac is not None and size <= _MAX_INFLATE:
            try:
                return bytes(pac.decompress(block, decompressed_size=size))
            except Exception as exc:
                raise AvroLiteError(
                    f"avro: zstandard block failed to decode: {exc}"
                ) from exc
        try:
            return decompress(block, max_output=_MAX_INFLATE)
        except ZstdError as exc:
            raise AvroLiteError(f"avro: {exc}") from exc
    if codec == "bzip2":
        # Avro optional codec; the block is one complete bz2 stream —
        # Python stdlib, decoded with an output ceiling (bomb guard)
        import bz2

        d = bz2.BZ2Decompressor()
        try:
            out = d.decompress(block, _MAX_INFLATE)
        except OSError as exc:
            raise AvroLiteError(f"avro: bzip2 block corrupt: {exc}") from exc
        if not d.eof:
            # either truncated input or output capped at the ceiling —
            # both are refusals, never partial data
            raise AvroLiteError(
                "avro: bzip2 block truncated or inflates past "
                f"{_MAX_INFLATE} bytes — refusing"
            )
        return out
    if codec == "xz":
        # Avro optional codec; one complete .xz stream — Python stdlib
        import lzma

        d = lzma.LZMADecompressor(format=lzma.FORMAT_XZ)
        try:
            out = d.decompress(block, _MAX_INFLATE)
        except lzma.LZMAError as exc:
            raise AvroLiteError(f"avro: xz block corrupt: {exc}") from exc
        if not d.eof:
            raise AvroLiteError(
                "avro: xz block truncated or inflates past "
                f"{_MAX_INFLATE} bytes — refusing"
            )
        return out
    raise AvroLiteError(
        f"avro: codec {codec!r} is not an Avro 1.12 codec this reader "
        "knows (supported: null, deflate, snappy, zstandard, bzip2, xz)"
    )


def reader(fh: BinaryIO) -> Iterator[dict]:
    """Iterate the records of an Avro Object Container File — the same
    call shape as ``fastavro.reader(fh)``."""
    head = fh.read()
    if head[:4] != MAGIC:
        raise AvroLiteError(
            "avro: bad magic — not an Avro object container file"
        )
    budget = _budget_for(len(head))
    dec = _Decoder(head, budget)
    dec.read(4)
    dr = _DatumReader()
    # file metadata: a map<bytes> (spec: file header)
    meta: dict[str, bytes] = {}

    def _pair():
        key = dec.string()  # key decodes before value
        meta[key] = dec.bytes_()

    _DatumReader._blocks(dec, _pair, collect=False)
    try:
        schema = json.loads(meta["avro.schema"])
    except KeyError:
        raise AvroLiteError("avro: header carries no avro.schema")
    codec = meta.get("avro.codec", b"null").decode()
    dr.register(schema)
    sync = dec.read(16)
    while not dec.eof():
        count = dec.long()
        size = dec.long()
        if count < 0 or size < 0:
            raise AvroLiteError(
                "avro: negative data-block count/size (corrupt container)"
            )
        if count > _DatumReader.MAX_BLOCK_ITEMS:
            raise AvroLiteError(
                f"avro: data block claims {count} records (cap "
                f"{_DatumReader.MAX_BLOCK_ITEMS}) — refusing a corrupt "
                "or hostile container"
            )
        block = _decompress(codec, dec.read(size))
        if len(block) > size:
            # a compressed block's decompressed bytes are legitimately
            # shipped data: extend the byte-proportional item budget by
            # the inflation (the inflation itself is capped in
            # _decompress, so this cannot grow without bound)
            budget.remaining += 64 * (len(block) - size)
        budget.charge(count)
        bd = _Decoder(block, budget)
        for _ in range(count):
            yield dr.datum(bd, schema)
        if not bd.eof():
            raise AvroLiteError(
                "avro: data block has trailing bytes after the declared "
                "record count"
            )
        if dec.read(16) != sync:
            raise AvroLiteError("avro: sync marker mismatch (corrupt block)")


def read_file(path: str) -> list[dict]:
    with open(path, "rb") as fh:
        return list(reader(fh))


def schema_of(path: str) -> Any:
    """The embedded writer schema of an OCF (for tests/diagnostics)."""
    with io.open(path, "rb") as fh:
        head = fh.read()
    dec = _Decoder(head, _budget_for(len(head)))
    if dec.read(4) != MAGIC:
        raise AvroLiteError("avro: bad magic")
    meta: dict[str, bytes] = {}

    def _pair():
        key = dec.string()  # key decodes before value
        meta[key] = dec.bytes_()

    _DatumReader._blocks(dec, _pair, collect=False)
    return json.loads(meta["avro.schema"])

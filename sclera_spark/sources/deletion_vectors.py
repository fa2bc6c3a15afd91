"""Delta Lake deletion-vector parsing (PUBLIC format only).

Implements exactly what `FROM DELTA ... MATERIALIZE DELETION VECTORS`
needs: decode a `deletionVector` descriptor from the public Delta
commit protocol (delta-io PROTOCOL.md, "Deletion Vectors") into the
set of masked row positions of one data file, and purge those
positions out of a parquet file with bounded memory.

Format, per the public spec:

- The descriptor carries ``storageType`` ('u' relative file, 'p'
  absolute file, 'i' inline), ``pathOrInlineDv``, optional ``offset``,
  ``sizeInBytes`` (length of the serialized bitmap) and
  ``cardinality`` (number of masked rows).
- 'u': ``pathOrInlineDv`` is ``[<random prefix>]<z85 uuid>`` — the
  last 20 chars are a Z85-encoded 16-byte UUID; the DV lives at
  ``<table>/[<prefix>/]deletion_vector_<uuid>.bin``.
- 'i': ``pathOrInlineDv`` is the Z85-encoded serialized bitmap itself.
- DV files start with a 1-byte format version (= 1); at ``offset``
  sits ``<dataSize: int32 big-endian><bitmap bytes><crc32 of bitmap
  bytes: int32 big-endian>``.
- The bitmap is a RoaringBitmapArray in the spec's "portable" format:
  ``<magic 1681511377: int32 LE><number of 32-bit bitmaps: int64 LE>``
  then each bitmap in the standard 32-bit roaring portable format
  (RoaringFormatSpec: cookie 12346/12347, descriptive headers, then
  array / bitset / run containers, everything little-endian); bitmap
  ``i`` holds positions ``[i * 2^32, (i+1) * 2^32)``.

Everything here is parsed by hand from those public documents — no
delta-spark / RoaringBitmap dependency. Unknown cookies, bad magic or
a checksum mismatch raise loudly (an import must never silently keep
rows the source table deleted).
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

# ZeroMQ Z85 alphabet, as used by the Delta spec for DV paths/inline.
_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_REV = {c: i for i, c in enumerate(_Z85)}


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError(f"Z85 string length {len(s)} is not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        acc = 0
        for c in s[i : i + 5]:
            try:
                acc = acc * 85 + _Z85_REV[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}")
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(b: bytes) -> str:
    if len(b) % 4:
        raise ValueError(f"Z85 input length {len(b)} is not a multiple of 4")
    out = []
    for i in range(0, len(b), 4):
        acc = int.from_bytes(b[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, r = divmod(acc, 85)
            chunk.append(_Z85[r])
        out += reversed(chunk)
    return "".join(out)


_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4


def _parse_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One standard 32-bit RoaringBitmap (portable format) starting at
    ``pos``; returns (sorted values, next offset)."""
    (cookie32,) = struct.unpack_from("<i", buf, pos)
    cookie = cookie32 & 0xFFFF
    if cookie == _SERIAL_COOKIE_RUN:
        size = (cookie32 >> 16) + 1
        pos += 4
        nbytes = (size + 7) // 8
        run_flags = buf[pos : pos + nbytes]
        pos += nbytes
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((size + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"unknown roaring cookie {cookie}")
    keys: list[int] = []
    cards: list[int] = []
    for i in range(size):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys.append(k)
        cards.append(c + 1)
        pos += 4
    if has_offsets:
        pos += 4 * size  # container offsets: we read sequentially
    values: list[int] = []
    for i in range(size):
        base = keys[i] << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + v for v in range(start, start + length + 1))
        elif cards[i] > 4096:
            # bitset container: 2^16 bits = 8 KiB
            for w in range(4096):
                (word,) = struct.unpack_from("<Q", buf, pos + 8 * w)
                while word:
                    low = word & -word
                    values.append(base + 64 * w + low.bit_length() - 1)
                    word ^= low
            pos += 8192
        else:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            values.extend(base + v for v in vals)
    return values, pos


def parse_bitmap_array(buf: bytes) -> list[int]:
    """Serialized RoaringBitmapArray (Delta portable format) -> sorted
    list of 64-bit positions."""
    if len(buf) < 12:
        raise ValueError("deletion vector bitmap too short")
    magic, nmaps = struct.unpack_from("<iq", buf, 0)
    if magic != _MAGIC:
        raise ValueError(
            f"deletion vector magic {magic} != {_MAGIC}: not a portable "
            "RoaringBitmapArray"
        )
    pos = 12
    out: list[int] = []
    for i in range(nmaps):
        vals, pos = _parse_roaring32(buf, pos)
        out.extend((i << 32) | v for v in vals)
    return out


def serialize_bitmap_array(positions: list[int]) -> bytes:
    """Inverse of :func:`parse_bitmap_array` (array containers only —
    enough to author test fixtures and round-trip our own parse)."""
    by_map: dict[int, dict[int, list[int]]] = {}
    for p in sorted(set(positions)):
        by_map.setdefault(p >> 32, {}).setdefault((p >> 16) & 0xFFFF, []).append(
            p & 0xFFFF
        )
    nmaps = (max(by_map) + 1) if by_map else 0
    out = bytearray(struct.pack("<iq", _MAGIC, nmaps))
    for m in range(nmaps):
        conts = by_map.get(m, {0: []})
        keys = sorted(conts)
        size = len(keys)
        out += struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, size)
        for k in keys:
            out += struct.pack("<HH", k, max(0, len(conts[k]) - 1))
        # container offsets, relative to the start of THIS bitmap's
        # serialization (always present for the NO_RUN cookie):
        # cookie+size (8) + descriptive headers (4*size) + offsets
        # (4*size) precede the first container
        running = 8 + 4 * size + 4 * size
        for k in keys:
            out += struct.pack("<i", running)
            running += 2 * len(conts[k])
        for k in keys:
            out += struct.pack(f"<{len(conts[k])}H", *conts[k])
    return bytes(out)


def descriptor_positions(table_dir: str, dv: dict) -> list[int]:
    """Masked row positions named by one ``deletionVector`` descriptor
    (public Delta protocol)."""
    st = dv.get("storageType")
    raw = dv.get("pathOrInlineDv") or ""
    if st == "i":
        data = z85_decode(raw)
        data = data[: int(dv.get("sizeInBytes", len(data)))]
        positions = parse_bitmap_array(data)
    elif st in ("u", "p"):
        if st == "u":
            if len(raw) < 20:
                raise ValueError(f"DV path {raw!r}: no Z85 uuid suffix")
            prefix, enc = raw[:-20], raw[-20:]
            u = _uuid.UUID(bytes=z85_decode(enc))
            rel = f"deletion_vector_{u}.bin"
            if prefix:
                rel = os.path.join(prefix, rel)
            path = os.path.join(table_dir, rel)
        else:
            if "://" in raw:
                raise ValueError(
                    f"DV at object-store URI {raw!r}: only local files "
                    "can be materialized here"
                )
            path = raw
        with open(path, "rb") as fh:
            blob = fh.read()
        if not blob or blob[0] != 1:
            raise ValueError(
                f"DV file {path!r}: unsupported format version "
                f"{blob[0] if blob else '<empty>'}"
            )
        off = int(dv.get("offset", 1))
        (dsize,) = struct.unpack_from(">i", blob, off)
        data = blob[off + 4 : off + 4 + dsize]
        (crc,) = struct.unpack_from(">i", blob, off + 4 + dsize)
        if (zlib.crc32(data) & 0xFFFFFFFF) != (crc & 0xFFFFFFFF):
            raise ValueError(f"DV file {path!r}: checksum mismatch")
        positions = parse_bitmap_array(data)
    else:
        raise ValueError(f"unknown DV storageType {st!r}")
    card = dv.get("cardinality")
    if card is not None and int(card) != len(positions):
        raise ValueError(
            f"DV cardinality {card} != decoded positions {len(positions)}"
        )
    return positions


def write_dv_file(path: str, positions: list[int]) -> dict:
    """Author a DV file in the public on-disk layout (test fixtures /
    round-trip pins). Returns the descriptor fields that locate it
    ('p' storage, absolute path)."""
    data = serialize_bitmap_array(positions)
    with open(path, "wb") as fh:
        fh.write(b"\x01")
        fh.write(struct.pack(">i", len(data)))
        fh.write(data)
        fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    return {
        "storageType": "p",
        "pathOrInlineDv": path,
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": len(set(positions)),
    }


def purge_parquet(src: str, dst: str, positions: list[int]) -> int:
    """Copy ``src`` to ``dst`` dropping the rows at the given file
    positions — streaming per row-group batch, so driver memory is
    bounded by one Arrow batch regardless of file size. Returns the
    number of rows dropped (must equal ``len(positions)``; a DV naming
    positions past EOF is corrupt and raises)."""
    import numpy as np
    import pyarrow.parquet as pq

    mask_set = np.asarray(sorted(set(positions)), dtype=np.int64)
    pf = pq.ParquetFile(src)
    writer = None
    base = 0
    dropped = 0
    try:
        for batch in pf.iter_batches():
            n = batch.num_rows
            lo = np.searchsorted(mask_set, base)
            hi = np.searchsorted(mask_set, base + n)
            if hi > lo:
                keep = np.ones(n, dtype=bool)
                keep[mask_set[lo:hi] - base] = False
                import pyarrow as pa

                batch = pa.table(batch).filter(pa.array(keep)).combine_chunks()
                dropped += int(hi - lo)
            if writer is None:
                writer = pq.ParquetWriter(dst, batch.schema)
            writer.write(batch)
            base += n
    finally:
        if writer is not None:
            writer.close()
    if dropped != len(mask_set):
        raise ValueError(
            f"DV for {src!r} names {len(mask_set)} positions but only "
            f"{dropped} fall inside the file ({base} rows): corrupt vector"
        )
    return dropped

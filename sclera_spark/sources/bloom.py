"""Per-file Bloom filter indexes for manifest tables — equality
skipping on UNCLUSTERED columns (Delta Lake's bloom filter index
shape). Min/max stats prune range probes on clustered columns; a point
probe on a column whose values are scattered across every file (a user
id, an order key probed by customer) keeps everything. A per-file
Bloom filter answers "might this file contain value v?" from driver-
side metadata, so `WHERE user_id = X` opens only the files whose
filter fires — at 100 TB, a handful instead of all of them.

Two pieces:

1. A pure-Python XXH64 (``xxh64_long`` / ``xxh64_bytes``) implementing
   the public xxHash specification (https://xxhash.com, XXH64) with
   Spark's conventions — seed 42, integers promoted to long, doubles
   via their IEEE-754 bits with -0.0 normalized — byte-for-byte equal
   to ``pyspark.sql.functions.xxhash64``. That equality IS the design:
   the filter bits are built DISTRIBUTED by a Spark job using the
   JVM's xxhash64, and probed on the DRIVER by this kernel; a fuzz
   suite pins the two against each other (tests/test_bloom.py).
2. Filter build/probe: standard Bloom double hashing
   (Kirsch-Mitzenmacher: g_i = h1 + i*h2 mod m) with h1 =
   xxhash64(col) and h2 = xxhash64(col, col) (Spark's multi-argument
   form chains the first hash as the next seed — reproduced driver-
   side). Filters live as sidecar JSONs under
   ``_sclera_log/blooms/<datafile>.json``, immutable with their data
   file, inherited across commits for free and vacuumed with it.
"""

from __future__ import annotations

import base64
import math
import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_long(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 64-bit integer — Spark's XxHash64 hashLong path
    (an 8-byte input taken directly from the long). Returns the SIGNED
    64-bit value Spark's ``xxhash64`` column function yields."""
    value &= _M64
    hash_ = (seed + _P5 + 8) & _M64
    k1 = _rotl((value * _P2) & _M64, 31) * _P1 & _M64
    hash_ ^= k1
    hash_ = (_rotl(hash_, 27) * _P1 + _P4) & _M64
    h = _fmix(hash_)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of a byte string (Spark hashes strings as their UTF-8
    bytes through this path). Signed 64-bit result."""
    length = len(data)
    pos = 0
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while pos + 32 <= length:
            (a, b, c, d) = struct.unpack_from("<qqqq", data, pos)
            v1 = (_rotl((v1 + a * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + b * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + c * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + d * _P2) & _M64, 31) * _P1) & _M64
            pos += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + length) & _M64
    while pos + 8 <= length:
        (k,) = struct.unpack_from("<q", data, pos)
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        pos += 8
    if pos + 4 <= length:
        (k,) = struct.unpack_from("<I", data, pos)
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < length:
        h ^= (data[pos] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        pos += 1
    h = _fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_int(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 32-bit integer — Spark's hashInt path (INT, SHORT,
    BYTE and FLOAT-bits columns hash through the 4-byte finalizer, NOT
    promoted to long; pinned against F.xxhash64 in the tests)."""
    hash_ = (seed + _P5 + 4) & _M64
    hash_ ^= ((value & 0xFFFFFFFF) * _P1) & _M64
    hash_ = (_rotl(hash_, 23) * _P2 + _P3) & _M64
    h = _fmix(hash_)
    return h - (1 << 64) if h >= (1 << 63) else h


def _double_bits(v: float) -> int:
    if v == 0.0:
        v = 0.0  # normalize -0.0, as Spark does
    return struct.unpack("<q", struct.pack("<d", v))[0]


def _float_bits(v: float) -> int:
    if v == 0.0:
        v = 0.0
    return struct.unpack("<i", struct.pack("<f", v))[0]


def spark_hash_pair(value, spark_type: str) -> tuple[int, int] | None:
    """(h1, h2) for a probe value against a column of ``spark_type``
    (the Catalyst typeName the sidecar recorded at build time): h1 =
    xxhash64(v), h2 = xxhash64(v, v) — Spark's multi-argument form
    chains the first result as the next seed, reproduced here. None =
    unhashable driver-side (wrong probe type, NaN, or a type this
    kernel doesn't cover — date/timestamp) — callers never prune
    then."""
    if isinstance(value, bool):
        return None
    if spark_type in ("integer", "short", "byte"):
        if not isinstance(value, int):
            return None
        h1 = xxh64_int(value)
        h2 = xxh64_int(value, seed=h1 & _M64)
        return h1, h2
    if spark_type == "long":
        if not isinstance(value, int):
            return None
        h1 = xxh64_long(value)
        h2 = xxh64_long(value, seed=h1 & _M64)
        return h1, h2
    if spark_type == "float":
        if not isinstance(value, (int, float)) or value != value:
            return None
        bits = _float_bits(float(value))
        h1 = xxh64_int(bits)
        h2 = xxh64_int(bits, seed=h1 & _M64)
        return h1, h2
    if spark_type == "double":
        if not isinstance(value, (int, float)) or value != value:
            return None
        bits = _double_bits(float(value))
        h1 = xxh64_long(bits)
        h2 = xxh64_long(bits, seed=h1 & _M64)
        return h1, h2
    if spark_type == "string":
        if not isinstance(value, str):
            return None
        raw = value.encode("utf-8")
        h1 = xxh64_bytes(raw)
        h2 = xxh64_bytes(raw, seed=h1 & _M64)
        return h1, h2
    return None


# column types the bloom tier indexes (hashable on both sides)
BLOOMABLE_TYPES = {"integer", "short", "byte", "long", "float", "double", "string"}


def bloom_params(expected_n: int, fpp: float) -> tuple[int, int]:
    """(m bits — multiple of 64, k hashes) for the target false-
    positive rate; the standard optimal sizing."""
    expected_n = max(1, expected_n)
    m = int(math.ceil(-expected_n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, round(m / expected_n * math.log(2)))
    return m, min(k, 16)


def bits_for(h1: int, h2: int, m: int, k: int) -> list[int]:
    """Double-hashed bit positions. h2 is forced odd so the probe
    sequence cycles through all of m (m is a power-of-two multiple of
    64 often enough that an even h2 would halve coverage)."""
    h1 &= _M64
    h2 = (h2 | 1) & _M64
    return [((h1 + i * h2) & _M64) % m for i in range(k)]


def might_contain(bloom: dict, value) -> bool:
    """Driver-side probe of a sidecar filter dict {"m","k","t","b"}.
    True = maybe present (or unhashable value — never prune on a
    filter we cannot probe); False = DEFINITELY absent."""
    pair = spark_hash_pair(value, bloom.get("t", ""))
    if pair is None:
        return True
    bits = base64.b64decode(bloom["b"])
    for pos in bits_for(pair[0], pair[1], int(bloom["m"]), int(bloom["k"])):
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def build_blooms(spark, file_paths: list[str], columns: list[str], fpp: float):
    """Distributed build of {data file name: {column: {"m","k","t","b"}}}
    for the given parquet files, as a TWO-PHASE fold:

    1. (m, k) per file come from the parquet footers' row counts
       (driver metadata reads — the same footers stats collection
       opens), so bitmap sizing never needs a whole file in memory.
    2. ``mapInPandas`` folds each Arrow batch into per-(file, column)
       PARTIAL bitmaps accumulated per task — executor memory is one
       Arrow batch plus the bitmaps, never a file's full hash columns
       (the pre-r10 shape pinned a whole imported multi-GB file in one
       pandas frame).
    3. A grouped OR-merge unions the partials per file (bloom insertion
       is a bitwise OR, so the union over any batch split is byte-equal
       to the single-pass build — property-pinned in test_bloom.py).

    Nothing here scales with table size — only with the rows being
    committed, exactly like stats collection."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    df = spark.read.parquet(*file_paths)
    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    present = [
        c
        for c in columns
        if c in df.columns and types[c] in BLOOMABLE_TYPES
    ]
    if not present:
        return {}
    # phase 1: footer row counts -> per-file bitmap parameters
    params: dict[str, tuple[int, int]] = {}
    for p in file_paths:
        n = pq.ParquetFile(p).metadata.num_rows
        params[os.path.basename(p)] = bloom_params(max(n, 1), fpp)

    sel = [F.col("_metadata.file_path").alias("_file")]
    for c in present:
        sel.append(F.xxhash64(F.col(c)).alias(f"_h1_{c}"))
        sel.append(F.xxhash64(F.col(c), F.col(c)).alias(f"_h2_{c}"))
        sel.append(F.col(c).isNull().alias(f"_n_{c}"))
    hashed = df.select(*sel)

    from urllib.parse import urlparse

    def _name(uri: str) -> str:
        return os.path.basename(urlparse(uri).path)

    def fold_partials(batches):
        # phase 2: one partial bitmap per (file, column) PER TASK
        acc: dict[tuple, np.ndarray] = {}
        for pdf in batches:
            for fname, grp in pdf.groupby(pdf["_file"].map(_name)):
                mk = params.get(fname)
                if mk is None:
                    continue  # foreign file in the read (never listed)
                m, k = mk
                for c in present:
                    mask = ~grp[f"_n_{c}"].to_numpy()
                    h1 = grp[f"_h1_{c}"].to_numpy(dtype=np.uint64)[mask]
                    h2 = (
                        grp[f"_h2_{c}"].to_numpy(dtype=np.uint64)[mask]
                        | np.uint64(1)
                    )
                    bits = acc.get((fname, c))
                    if bits is None:
                        bits = acc[(fname, c)] = np.zeros(
                            m // 8, dtype=np.uint8
                        )
                    for i in range(k):
                        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
                        np.bitwise_or.at(
                            bits,
                            (pos >> np.uint64(3)).astype(np.int64),
                            np.left_shift(
                                np.uint8(1),
                                (pos & np.uint64(7)).astype(np.uint8),
                            ),
                        )
        if acc:
            yield pd.DataFrame(
                {
                    "file": [f for f, _ in acc],
                    "col": [c for _, c in acc],
                    "bits": [v.tobytes() for v in acc.values()],
                }
            )

    def or_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        # phase 3: union the task partials of one (file, column)
        bits = np.frombuffer(pdf["bits"].iloc[0], dtype=np.uint8).copy()
        for b in pdf["bits"].iloc[1:]:
            bits |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame(
            {
                "file": [pdf["file"].iloc[0]],
                "col": [pdf["col"].iloc[0]],
                "b64": [base64.b64encode(bits.tobytes()).decode()],
            }
        )

    rows = (
        hashed.mapInPandas(
            fold_partials, "file string, col string, bits binary"
        )
        .groupBy("file", "col")
        .applyInPandas(or_merge, "file string, col string, b64 string")
        .collect()
    )
    result: dict[str, dict] = {}
    for r in rows:
        m, k = params[r["file"]]
        result.setdefault(r["file"], {})[r["col"]] = {
            "m": m,
            "k": k,
            "t": types[r["col"]],
            "b": r["b64"],
        }
    # a zero-row file produces no partials: give it all-zero bitmaps
    # (it definitely contains no value — probes prune it), so every
    # listed file gets a sidecar and backfill converges
    for fname, (m, k) in params.items():
        for c in present:
            result.setdefault(fname, {}).setdefault(
                c,
                {
                    "m": m,
                    "k": k,
                    "t": types[c],
                    "b": base64.b64encode(bytes(m // 8)).decode(),
                },
            )
    return result

"""Pure-Python Zstandard decoder (sources/zstd_lite.py, RFC 8878):

- fuzz against pyarrow's bundled C zstd encoder (always available in
  this environment — structured/random/repetitive/tiny payloads);
- fuzz against the JVM's zstd-jni encoder across 10 compression levels
  (a SECOND independent canonical encoder — levels change which format
  features appear: predefined vs FSE_Compressed tables, 1- vs 4-stream
  Huffman, treeless repeats, RLE blocks);
- the predefined match-length decode table verified STATE BY STATE
  against the reference decoder via hand-crafted single-sequence
  frames (the probe that caught the wrong ML default distribution);
- hostile input refusals (bad magic, truncation, dictionaries, bombs,
  checksum mismatch, reserved types);
- the snappy raw-format decoder (avro_lite) cross-checked against
  pyarrow's C snappy on the same payloads.
"""

from __future__ import annotations

import random

import pytest

import sclera_spark.sources.zstd_lite as zl
from sclera_spark.sources.zstd_lite import ZstdError, decompress


def _payloads(seed: int, n_trials: int):
    rng = random.Random(seed)
    for trial in range(n_trials):
        kind = trial % 6
        n = rng.choice([0, 1, 5, 100, 1000, 20000, 300000])
        if kind == 0:
            data = bytes(rng.randrange(256) for _ in range(min(n, 5000)))
        elif kind == 1:
            data = (
                b"hello world, this is a repetitive corpus line. "
                * (n // 40 + 1)
            )[:n]
        elif kind == 2:
            data = bytes(rng.randrange(4) for _ in range(n))
        elif kind == 3:
            words = [b"alpha", b"beta", b"gamma", b"delta12345", b"x"]
            data = b" ".join(
                rng.choice(words) for _ in range(n // 4 + 1)
            )[:n]
        elif kind == 4:
            data = bytes([trial % 256]) * n
        else:
            base = bytes(rng.randrange(256) for _ in range(50))
            data = (base * (n // 50 + 1))[:n]
        yield trial, data


def test_zstd_fuzz_vs_pyarrow():
    import pyarrow as pa

    zc = pa.Codec("zstd")
    for trial, data in _payloads(7, 120):
        comp = zc.compress(bytes(data), asbytes=True)
        got = decompress(comp)
        assert got == data, f"trial {trial}: {len(got)} vs {len(data)}"


def test_zstd_fuzz_vs_jvm_all_levels(spark):
    """zstd-jni (native libzstd in the Spark distribution) at 10
    levels — high levels emit FSE_Compressed sequence tables and
    4-stream Huffman literals, low levels predefined tables and RLE."""
    jvm = spark.sparkContext._jvm
    Z = jvm.com.github.luben.zstd.Zstd
    rng = random.Random(11)
    for trial, data in _payloads(11, 120):
        level = rng.choice([1, 2, 3, 5, 6, 9, 12, 17, 19, 22])
        comp = bytes(Z.compress(bytearray(data), level))
        got = decompress(comp)
        assert got == data, f"trial {trial} level {level}"


def test_predefined_ml_table_state_by_state():
    """Extract the predefined match-length decode table from the
    REFERENCE decoder by probing hand-crafted single-sequence frames
    (literals 'AB', ll=2, offset=rep1, ml_state swept; extra bits
    zero), and assert our FSE-built table assigns the same ML code to
    every reachable state. This probe is what caught the wrong ML
    default distribution during development — kept as the regression
    pin."""
    import pyarrow as pa

    zc = pa.Codec("zstd")

    def make_frame(blob: bytes, content_size: int) -> bytes:
        bh = (len(blob) << 3) | (2 << 1) | 1
        return (
            bytes([0x28, 0xB5, 0x2F, 0xFD, 0x20, content_size])
            + bh.to_bytes(3, "little")
            + blob
        )

    def make_seq_bits(ll_state, of_state, ml_state):
        v = 1  # sentinel
        v = (v << 6) | ll_state
        v = (v << 5) | of_state
        v = (v << 6) | ml_state
        return v.to_bytes(3, "little")

    t = zl._PREDEFINED["ml"]
    checked = 0
    for state in range(64):
        blob = bytes([0x10, 65, 66, 0x01, 0x00]) + make_seq_bits(
            24, 0, state
        )
        base = None
        for cs in range(2, 200):
            try:
                zc.decompress(make_frame(blob, cs), cs)
            except Exception:
                continue
            base = cs - 2
            break
        if base is None:
            continue  # base too large for a 1-byte FCS probe
        code = t.symbols[state]
        assert zl._ML_BASE[code] == base, (
            f"state {state}: our code {code} (base {zl._ML_BASE[code]}) "
            f"vs reference base {base}"
        )
        checked += 1
    assert checked >= 50  # nearly every state is probe-reachable


def test_frame_content_size():
    import pyarrow as pa

    zc = pa.Codec("zstd")
    data = b"some content that compresses" * 10
    comp = zc.compress(data, asbytes=True)
    assert zl.frame_content_size(comp) == len(data)
    assert zl.frame_content_size(b"\x00\x01\x02") is None
    assert zl.frame_content_size(b"nope" * 3) is None


def test_zstd_hostile_inputs_refuse():
    import pyarrow as pa

    zc = pa.Codec("zstd")
    good = zc.compress(b"payload payload payload", asbytes=True)
    with pytest.raises(ZstdError, match="magic"):
        decompress(b"\x00\x00\x00\x00" + good[4:])
    with pytest.raises(ZstdError, match="truncated"):
        decompress(good[:5])
    with pytest.raises(ZstdError):
        decompress(good[:-2])  # truncated tail
    # content-size bomb: cap enforced before any allocation
    with pytest.raises(ZstdError, match="cap|ceiling"):
        decompress(good, max_output=4)
    # corrupt a content byte inside the block: either the stream
    # structure breaks or the decoded size disagrees with the header
    bad = bytearray(good)
    bad[-3] ^= 0xFF
    with pytest.raises(ZstdError):
        decompress(bytes(bad))
    # dictionary refusal: frame header with Dictionary_ID_flag = 1
    frame = bytearray(good)
    fhd = frame[4]
    frame[4] = fhd | 0x01  # 1-byte dictionary id
    frame.insert(5, 7)  # dict id 7 (before window/FCS fields)
    with pytest.raises(ZstdError, match="dictionary"):
        decompress(bytes(frame))


def test_zstd_checksummed_frame(spark):
    """zstd-jni can emit the optional XXH64 content checksum — verify
    both the happy path (checksum verified via the repo's pure-Python
    XXH64) and the corruption path."""
    jvm = spark.sparkContext._jvm
    try:
        ctx = jvm.com.github.luben.zstd.ZstdCompressCtx()
        ctx.setChecksum(True)
        ctx.setLevel(3)
        comp = bytes(ctx.compress(bytearray(b"checksummed content " * 50)))
    except Exception:
        pytest.skip("zstd-jni ZstdCompressCtx unavailable")
    assert comp[4] & 0x04  # checksum flag actually set
    assert decompress(comp) == b"checksummed content " * 50
    bad = bytearray(comp)
    bad[-1] ^= 0x01  # flip a checksum bit
    with pytest.raises(ZstdError, match="checksum"):
        decompress(bytes(bad))


def test_skippable_frames_are_skipped():
    import pyarrow as pa

    zc = pa.Codec("zstd")
    comp = zc.compress(b"actual content", asbytes=True)
    skip = (0x184D2A53).to_bytes(4, "little") + (7).to_bytes(4, "little") + b"x" * 7
    assert decompress(skip + comp) == b"actual content"
    assert zl.frame_content_size(skip + comp) == len(b"actual content")
    with pytest.raises(ZstdError, match="truncated"):
        decompress(skip[:6])


def test_snappy_vs_pyarrow():
    """The pure-Python snappy raw-format decoder (avro_lite) decodes
    pyarrow's C snappy output exactly."""
    import pyarrow as pa

    from sclera_spark.sources.avro_lite import _snappy_decompress

    sc = pa.Codec("snappy")
    for trial, data in _payloads(13, 60):
        comp = sc.compress(bytes(data), asbytes=True)
        assert _snappy_decompress(comp) == data, f"trial {trial}"


def test_huffman_table_log_bomb_refuses():
    """r14 review pin: hostile Huffman weights (the format caps code
    lengths at 11) must refuse as ZstdError BEFORE allocating the
    claimed table — never escape as MemoryError."""
    with pytest.raises(ZstdError, match="cap"):
        zl._huf_from_weights([61])
    with pytest.raises(ZstdError, match="cap"):
        zl._huf_from_weights([12] * 40)  # table log past 11
    # a legitimate max-size table (log exactly 11) still builds
    t = zl._huf_from_weights([10, 10])
    assert t.max_bits == 11

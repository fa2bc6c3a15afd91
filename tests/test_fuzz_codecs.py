"""Fuzz family 12 (pure-Python): media codec round-trips.

The r6 decoders (GIF LZW, baseline JPEG, BMP) and their fixture
encoders are hand-written from the public specs — each seed randomizes
image shape and content and asserts the decode invariants:

- GIF: EXACT pixel recovery for any content (LZW is lossless),
  including shapes that cross sub-block boundaries and force
  dictionary growth through all code widths;
- BMP: exact recovery incl. stride padding and bottom-up rows;
- JPEG gray: constant-block images recover exactly; arbitrary content
  stays within the flat-quantizer error envelope; mean error small;
- JPEG color (4:4:4 and 4:2:0): gray-neutral constants exact; smooth
  gradients within the chroma-subsampling envelope.

No SparkSession — this family runs in milliseconds per seed.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from sclera_spark.llm.jpeg import decode_jpeg, encode_jpeg_gray, encode_jpeg_rgb
from sclera_spark.llm.multimodal import (
    bmp_pixel_bytes,
    decode_bmp,
    decode_gif,
    gif_pixel_bytes,
)

N_SEEDS = 40


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_fuzz_gif_and_bmp_lossless(seed):
    rng = np.random.default_rng(100 + seed)
    h, w = int(rng.integers(1, 70)), int(rng.integers(1, 70))
    kind = seed % 3
    if kind == 0:
        px = rng.integers(0, 256, (h, w)).astype(np.uint8)  # noise
    elif kind == 1:
        px = np.full((h, w), int(rng.integers(0, 256)), np.uint8)  # runs
    else:  # few distinct values -> long LZW phrases
        px = rng.choice(
            np.array([0, 85, 170, 255], np.uint8), size=(h, w)
        )
    out = decode_gif(gif_pixel_bytes(px))
    assert out.shape == (h, w, 3)
    assert (out == px[..., None]).all()

    rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    back = decode_bmp(bmp_pixel_bytes(rgb))
    assert (back == rgb).all()


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_fuzz_jpeg_round_trip_envelopes(seed):
    rng = np.random.default_rng(500 + seed)
    r = random.Random(500 + seed)
    h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))

    # constant blocks: exact for ANY value grid
    bh, bw = (h + 7) // 8, (w + 7) // 8
    blocks = rng.integers(0, 256, (bh, bw)).astype(np.uint8)
    px = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)[:h, :w]
    out = decode_jpeg(encode_jpeg_gray(px))[:, :, 0]
    assert (out == px).all()

    # arbitrary gray: flat-q error envelope; every other seed routes
    # through RESTART MARKERS (random interval) — decode must be
    # identical to the no-DRI encoding of the same pixels
    px = rng.integers(0, 256, (h, w)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_gray(px))[:, :, 0]
    err = np.abs(out.astype(int) - px.astype(int))
    assert err.max() <= 48 and err.mean() < 8
    ri = int(rng.integers(1, 5))
    out_rst = decode_jpeg(encode_jpeg_gray(px, restart_interval=ri))[:, :, 0]
    assert (out_rst == out).all(), (seed, ri)

    # color: gray-neutral constant exact; gradient inside envelope
    v = int(rng.integers(0, 256))
    const = np.full((h, w, 3), v, np.uint8)
    sub = r.random() < 0.5
    out = decode_jpeg(encode_jpeg_rgb(const, subsample=sub))
    assert (out == v).all(), (seed, v, sub)

    yy, xx = np.mgrid[0:h, 0:w]
    grad = np.stack(
        [(xx * 3 % 256), (yy * 5 % 256), ((xx + yy) * 2 % 256)], axis=2
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_rgb(grad, subsample=sub))
    err = np.abs(out.astype(int) - grad.astype(int))
    assert err.max() <= (24 if sub else 12), (seed, sub, err.max())


# ---------------------------------------------- progressive JPEG (r7)
# The progressive encoder emits the SAME quantized coefficients as the
# baseline encoder, so the two encodings of one image must decode to
# IDENTICAL pixels — a bit-exact pin on every §G scan path (DC
# first/refine, AC first with EOB runs, AC refinement correction bits)
# against the already-fuzzed baseline decoder.


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_fuzz_jpeg_progressive_equals_baseline(seed):
    from sclera_spark.llm.jpeg import (
        encode_jpeg_gray_progressive,
        encode_jpeg_rgb_progressive,
    )

    rng = np.random.default_rng(7000 + seed)
    h = int(rng.integers(8, 41))
    w = int(rng.integers(8, 41))
    kind = seed % 4
    if kind == 0:  # smooth gradient (long EOB runs, sparse AC)
        px = (
            np.add.outer(np.arange(h) * 3, np.arange(w) * 2) % 256
        ).astype(np.uint8)
        base, prog = encode_jpeg_gray(px), encode_jpeg_gray_progressive(px)
    elif kind == 1:  # full-range noise (dense AC, ZRL + refinement)
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        base, prog = encode_jpeg_gray(px), encode_jpeg_gray_progressive(px)
    elif kind == 2:  # color 4:4:4
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        base, prog = encode_jpeg_rgb(px), encode_jpeg_rgb_progressive(px)
    else:  # color 4:2:0 (subsampled grids + interleaved DC scans)
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        base = encode_jpeg_rgb(px, subsample=True)
        prog = encode_jpeg_rgb_progressive(px, subsample=True)
    got_b = decode_jpeg(base)
    got_p = decode_jpeg(prog)
    assert got_p.shape == got_b.shape
    assert np.array_equal(got_p, got_b), (
        f"seed {seed}: progressive decode diverged from baseline "
        f"(maxdiff {np.abs(got_p.astype(int) - got_b.astype(int)).max()})"
    )


def test_jpeg_progressive_constant_blocks_bit_exact():
    """Constant 8x8 blocks survive the progressive path bit-exactly
    (lone DC coefficient, flat q=8) — the property the driver-graded
    closed-form oracle rides."""
    from sclera_spark.llm.jpeg import encode_jpeg_gray_progressive

    vals = np.array([[0, 64], [128, 255]], dtype=np.uint8)
    px = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    out = decode_jpeg(encode_jpeg_gray_progressive(px))[:, :, 0]
    assert np.array_equal(out, px)


def test_jpeg_progressive_sparse_and_extremes():
    """Directed shapes: all-zero AC bands (pure EOB-run scans), a single
    hot pixel (long zero runs + ZRL in refinement), odd dimensions."""
    from sclera_spark.llm.jpeg import encode_jpeg_gray_progressive

    for px in (
        np.full((17, 23), 128, np.uint8),
        np.zeros((9, 9), np.uint8),
        np.full((8, 8), 255, np.uint8),
    ):
        assert np.array_equal(
            decode_jpeg(encode_jpeg_gray_progressive(px)),
            decode_jpeg(encode_jpeg_gray(px)),
        )
    hot = np.zeros((24, 24), np.uint8)
    hot[11, 13] = 255
    assert np.array_equal(
        decode_jpeg(encode_jpeg_gray_progressive(hot)),
        decode_jpeg(encode_jpeg_gray(hot)),
    )


# ------------------------------------------------ Adam7 interlaced PNG (r7)


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_fuzz_png_adam7_lossless(seed):
    """Adam7-interlaced PNGs must decode to exactly the pixels a
    non-interlaced encoding carries — PNG is lossless, so both paths
    are bit-exact against the source array (incl. sizes smaller than a
    pass's 8x8 tile, where some passes are empty)."""
    from sclera_spark.llm.multimodal import decode_png, png_bytes_with_pixels

    rng = np.random.default_rng(8100 + seed)
    h = int(rng.integers(1, 40))
    w = int(rng.integers(1, 40))
    ch = [1, 2, 3, 4][seed % 4]
    px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    ft = 2 if seed % 3 == 0 else 0
    inter = decode_png(png_bytes_with_pixels(px, filter_type=ft, interlace=True))
    plain = decode_png(png_bytes_with_pixels(px, filter_type=ft))
    assert np.array_equal(inter, px.reshape(h, w, ch))
    assert np.array_equal(inter, plain)


# --------------------------------------------------- 12-bit JPEG (r7)


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_jpeg_12bit_sequential_and_progressive(seed):
    """12-bit precision (T.81 extended sequential SOF1 + progressive
    SOF2): both encodings of one image must decode identically, and
    the 8-bit presentation must sit within 1 LSB of the ideal >>4
    downshift (flat q=8 at 12-bit scale is half an 8-bit unit)."""
    from sclera_spark.llm.jpeg import (
        encode_jpeg_gray12,
        encode_jpeg_gray12_progressive,
    )

    rng = np.random.default_rng(9100 + seed)
    h = int(rng.integers(8, 33))
    w = int(rng.integers(8, 33))
    px = rng.integers(0, 4096, (h, w), dtype=np.uint16)
    seq = decode_jpeg(encode_jpeg_gray12(px))
    prog = decode_jpeg(encode_jpeg_gray12_progressive(px))
    assert np.array_equal(seq, prog), f"seed {seed}: SOF1 vs SOF2 diverge"
    ideal = np.round(px / 16.0).astype(int)
    assert np.abs(seq[:, :, 0].astype(int) - ideal).max() <= 1


def test_jpeg_12bit_constant_blocks_exact():
    from sclera_spark.llm.jpeg import encode_jpeg_gray12

    vals = np.array([[0, 1024], [2048, 4095]], dtype=np.uint16)
    px = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    out = decode_jpeg(encode_jpeg_gray12(px))[:, :, 0]
    want = np.clip(np.round(px / 16.0), 0, 255).astype(np.uint8)
    assert np.array_equal(out, want)


def test_jpeg_12bit_baseline_marker_rejected():
    """A 12-bit BASELINE (SOF0) frame is spec-invalid (T.81 B.2.2) and
    must be refused rather than mis-decoded."""
    from sclera_spark.llm.jpeg import encode_jpeg_gray12

    buf = bytearray(encode_jpeg_gray12(np.zeros((8, 8), np.uint16)))
    i = buf.find(b"\xff\xc1")
    buf[i + 1] = 0xC0  # lie: claim baseline
    with pytest.raises(ValueError, match="baseline JPEG is 8-bit"):
        decode_jpeg(bytes(buf))


# r8: ARITHMETIC entropy coding (T.81 Annex D QM-coder). The arithmetic
# encoders share quantization with the huffman ones, so decodes must be
# bit-identical — one fuzz family pins every coder path (sequential,
# progressive scan scripts, restarts, 12-bit) against the huffman
# decoders that are themselves pinned above. External libjpeg streams
# are pinned separately in test_jpeg_arith.py.


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_fuzz_jpeg_arithmetic_equals_huffman(seed):
    from sclera_spark.llm.jpeg import (
        encode_jpeg_gray12,
        encode_jpeg_gray_progressive,
    )
    from sclera_spark.llm.jpeg_arith import (
        encode_jpeg_gray12_arith,
        encode_jpeg_gray_arith,
        encode_jpeg_gray_arith_progressive,
        encode_jpeg_rgb_arith,
        encode_jpeg_rgb_arith_progressive,
    )
    from sclera_spark.llm.jpeg import encode_jpeg_rgb_progressive

    rng = np.random.default_rng(9000 + seed)
    h = int(rng.integers(8, 41))
    w = int(rng.integers(8, 41))
    kind = seed % 6
    if kind == 0:  # gray sequential, noise
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        a, b = encode_jpeg_gray(px), encode_jpeg_gray_arith(px)
    elif kind == 1:  # gray sequential with restarts (coder re-init)
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        rsti = int(rng.integers(1, 4))
        a = encode_jpeg_gray(px, restart_interval=rsti)
        b = encode_jpeg_gray_arith(px, restart_interval=rsti)
    elif kind == 2:  # gray progressive (QM DC/AC first+refine scans)
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        a = encode_jpeg_gray_progressive(px)
        b = encode_jpeg_gray_arith_progressive(px)
    elif kind == 3:  # color 4:4:4 sequential
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        a, b = encode_jpeg_rgb(px), encode_jpeg_rgb_arith(px)
    elif kind == 4:  # color progressive (4:4:4 / 4:2:0 alternating)
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        sub = bool(seed % 2)
        a = encode_jpeg_rgb_progressive(px, subsample=sub)
        b = encode_jpeg_rgb_arith_progressive(px, subsample=sub)
    else:  # 12-bit (SOF1 vs SOF9 sequential; SOF2 vs SOF10 progressive)
        from sclera_spark.llm.jpeg import encode_jpeg_gray12_progressive
        from sclera_spark.llm.jpeg_arith import (
            encode_jpeg_gray12_arith_progressive,
        )

        px = rng.integers(0, 4096, (h, w), dtype=np.uint16)
        if seed % 2:
            a = encode_jpeg_gray12_progressive(px)
            b = encode_jpeg_gray12_arith_progressive(px)
        else:
            a, b = encode_jpeg_gray12(px), encode_jpeg_gray12_arith(px)
    da, db = decode_jpeg(a), decode_jpeg(b)
    assert da.shape == db.shape
    assert np.array_equal(da, db), (
        f"seed {seed} kind {kind}: arithmetic decode diverged "
        f"(maxdiff {np.abs(da.astype(int) - db.astype(int)).max()})"
    )

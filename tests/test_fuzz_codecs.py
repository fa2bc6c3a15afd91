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

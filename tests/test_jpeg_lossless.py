"""Lossless JPEG (T.81 Annex H, SOF3 — llm/jpeg_lossless.py). The
oracle is the definition: decode(encode(px)) must equal px EXACTLY at
native precision for every predictor, precision, geometry, restart
interval and component count. (No external twin: this container's
libjpeg-turbo 2.1.5 predates lossless support — stated in the module
docstring.)"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sclera_spark.llm.jpeg import decode_jpeg
from sclera_spark.llm.jpeg_lossless import (
    decode_scan_lossless,
    encode_jpeg_lossless,
)


def _raw_samples(data: bytes) -> tuple[np.ndarray, int]:
    """Decode via the public marker walk but capture NATIVE-precision
    samples (decode_jpeg presents uint8)."""
    qt = {}
    huff = {}
    pos = 2
    frame = None
    restart_interval = 0
    while True:
        m = data[pos + 1]
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4 : pos + 2 + ln]
        if m == 0xC4:
            cls, tid = seg[0] >> 4, seg[0] & 0x0F
            bits = list(seg[1:17])
            vals = list(seg[17 : 17 + sum(bits)])
            tab = {}
            code, k = 0, 0
            for L in range(1, 17):
                for _ in range(bits[L - 1]):
                    tab[(L, code)] = vals[k]
                    code += 1
                    k += 1
                code <<= 1
            huff[(cls, tid)] = tab
        elif m == 0xC3:
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = [
                {"id": seg[6 + 3 * c], "h": 1, "v": 1, "tq": 0}
                for c in range(nc)
            ]
            frame = {"h": fh, "w": fw, "comps": comps, "prec_raw": prec}
        elif m == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:
            ns = seg[0]
            scan = [
                (frame["comps"][c], seg[2 + 2 * c] >> 4, 0) for c in range(ns)
            ]
            frame["ll_predictor"] = seg[1 + 2 * ns]
            frame["ll_pt"] = seg[3 + 2 * ns] & 0x0F
            return (
                decode_scan_lossless(
                    data, pos + 2 + ln, frame, scan, huff, restart_interval
                ),
                frame["prec_raw"],
            )
        pos += 2 + ln


@pytest.mark.parametrize("predictor", range(1, 8))
def test_exact_roundtrip_all_predictors(predictor):
    rng = np.random.default_rng(100 + predictor)
    for shape, prec in [
        ((9, 13), 8), ((16, 16, 3), 8), ((1, 7), 8), ((5, 1), 8),
        ((7, 5), 16), ((8, 11), 12), ((4, 4), 2),
    ]:
        px = rng.integers(0, 1 << prec, shape).astype(np.int64)
        data = encode_jpeg_lossless(px, predictor=predictor, precision=prec)
        got, gprec = _raw_samples(data)
        assert gprec == prec
        exp = px if px.ndim == 3 else px[..., None]
        assert np.array_equal(got, exp), (predictor, shape, prec)


def test_restart_intervals_roundtrip():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 65536, (12, 10)).astype(np.int64)
    for rsti in (1, 3, 7):
        data = encode_jpeg_lossless(
            px, predictor=5, precision=16, restart_interval=rsti
        )
        got, _ = _raw_samples(data)
        assert np.array_equal(got, px[..., None]), rsti


def test_point_transform_drops_low_bits_exactly():
    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, (6, 9)).astype(np.int64)
    data = encode_jpeg_lossless(px, predictor=4, precision=8, point_transform=2)
    got, _ = _raw_samples(data)
    assert np.array_equal(got, ((px >> 2) << 2)[..., None])


def test_public_decode_presents_uint8():
    rng = np.random.default_rng(9)
    px8 = rng.integers(0, 256, (5, 5), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_lossless(px8))
    assert out.dtype == np.uint8 and np.array_equal(out, px8[..., None])
    px16 = rng.integers(0, 65536, (5, 5)).astype(np.int64)
    out16 = decode_jpeg(encode_jpeg_lossless(px16, precision=16))
    exp = np.clip((px16 + 128) >> 8, 0, 255).astype(np.uint8)
    assert np.array_equal(out16, exp[..., None])


def test_fuzz_roundtrip_geometry_and_content():
    rng = np.random.default_rng(10)
    for seed in range(30):
        h = int(rng.integers(1, 25))
        w = int(rng.integers(1, 25))
        nc = int(rng.choice([1, 3]))
        prec = int(rng.choice([2, 4, 8, 10, 12, 16]))
        pred = int(rng.integers(1, 8))
        rsti = int(rng.choice([0, 0, 2, 5]))
        kind = seed % 3
        if kind == 0:
            px = rng.integers(0, 1 << prec, (h, w) if nc == 1 else (h, w, nc))
        elif kind == 1:  # constant (all-zero diffs)
            px = np.full((h, w) if nc == 1 else (h, w, nc), (1 << prec) - 1)
        else:  # extreme alternation (max-magnitude diffs)
            px = np.indices((h, w)).sum(axis=0) % 2 * ((1 << prec) - 1)
            if nc == 3:
                px = np.stack([px, (1 << prec) - 1 - px, px], axis=2)
        px = px.astype(np.int64)
        data = encode_jpeg_lossless(
            px, predictor=pred, precision=prec, restart_interval=rsti
        )
        got, _ = _raw_samples(data)
        exp = px if px.ndim == 3 else px[..., None]
        assert np.array_equal(got, exp), (seed, h, w, nc, prec, pred, rsti)

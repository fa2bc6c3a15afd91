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


def _bits_to_entropy(bitstr: str) -> bytes:
    """Pack a hand-derived bit string into entropy-coded bytes with
    T.81 byte stuffing (0x00 after any 0xFF) and 1-padding."""
    bitstr = bitstr + "1" * (-len(bitstr) % 8)
    out = bytearray()
    for i in range(0, len(bitstr), 8):
        b = int(bitstr[i : i + 8], 2)
        out.append(b)
        if b == 0xFF:
            out.append(0x00)
    return bytes(out)


def _sof3_stream(
    w: int, h: int, predictor: int, entropy: bytes
) -> bytes:
    """A minimal single-component SOF3 stream assembled BY HAND from
    the T.81 marker structure — no call into our encoder — carrying
    the SPEC'S OWN Huffman table (Annex K Table K.3, the typical
    luminance DC table: BITS 0 1 5 1 1 1 1 1 1 0..., HUFFVAL 0..11),
    which our encoder never emits (it builds adaptive tables)."""
    k3_bits = bytes(
        [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    )
    k3_vals = bytes(range(12))
    return b"".join(
        [
            b"\xff\xd8",  # SOI
            b"\xff\xc3",  # SOF3 (lossless, huffman)
            struct.pack(">HBHHB", 11, 8, h, w, 1),  # len P Y X Nf
            bytes([1, 0x11, 0]),  # C=1, H=V=1, Tq=0
            b"\xff\xc4",  # DHT class 0 id 0: Table K.3
            struct.pack(">H", 2 + 1 + 16 + 12),
            b"\x00" + k3_bits + k3_vals,
            b"\xff\xda",  # SOS
            struct.pack(">HB", 8, 1),  # len, Ns=1
            bytes([1, 0x00]),  # Cs=1, Td=0/Ta=0
            bytes([predictor, 0, 0]),  # Ss=predictor, Se=0, Ah/Al=0
            entropy,
            b"\xff\xd9",  # EOI
        ]
    )


def test_hand_assembled_spec_stream_predictor1():
    """External-style pin breaking the own-encoder-only loop: the
    entropy bits below are derived BY HAND from T.81 Annex H for the
    2x2 image [[128,130],[127,126]], predictor 1, with the spec's
    Table K.3 codes (cat0='00', cat1='010', cat2='011', ...):

      (0,0) pred 2^7=128, diff  0 -> cat0        : 00
      (0,1) first line, Ra=128, diff +2 -> cat2  : 011 + 10
      (1,0) first col,  Rb=128, diff -1 -> cat1  : 010 + 0
      (1,1) Ra=127,             diff -1 -> cat1  : 010 + 0

    15 bits, 1-padded to 0x1C 0x89. Our decoder must reproduce the
    image exactly from a stream no code of ours produced."""
    entropy = _bits_to_entropy("00" + "01110" + "0100" + "0100")
    assert entropy == bytes([0x1C, 0x89])
    out = decode_jpeg(_sof3_stream(2, 2, 1, entropy))
    assert np.array_equal(
        out, np.array([[128, 130], [127, 126]], np.uint8)[..., None]
    )


def test_hand_assembled_spec_stream_predictor7():
    """Same construction for predictor 7 ((Ra+Rb)>>1) on a 3x2 image
    exercising Rb/Rc-adjacent paths and multi-category codes:

      image [[200,100,50],[100,150,100]]
      (0,0) pred 128, diff  +72 -> cat7: 11110 + 1001000
      (0,1) Ra=200,  diff -100 -> cat7: 11110 + 0011011
      (0,2) Ra=100,  diff  -50 -> cat6: 1110  + 001101
      (1,0) Rb=200,  diff -100 -> cat7: 11110 + 0011011
      (1,1) (Ra+Rb)>>1=100, diff +50 -> cat6: 1110 + 110010
      (1,2) (150+50)>>1=100, diff  0 -> cat0: 00
    """
    bits = (
        "11110" "1001000"
        "11110" "0011011"
        "1110" "001101"
        "11110" "0011011"
        "1110" "110010"
        "00"
    )
    out = decode_jpeg(_sof3_stream(3, 2, 7, _bits_to_entropy(bits)))
    assert np.array_equal(
        out,
        np.array([[200, 100, 50], [100, 150, 100]], np.uint8)[..., None],
    )


def test_hand_assembled_stream_reencodes_to_same_pixels():
    """Closing the loop the other way: our ENCODER's stream for the
    hand image decodes to the same pixels the hand stream carries —
    two independently-constructed streams, one semantic."""
    px = np.array([[200, 100, 50], [100, 150, 100]], np.uint8)
    ours = decode_jpeg(encode_jpeg_lossless(px, predictor=7))
    bits = (
        "11110" "1001000" "11110" "0011011" "1110" "001101"
        "11110" "0011011" "1110" "110010" "00"
    )
    hand = decode_jpeg(_sof3_stream(3, 2, 7, _bits_to_entropy(bits)))
    assert np.array_equal(ours, hand)


# ---- SOFB: arithmetic-coded lossless (Annex H over the QM-coder) ----


def _raw_samples_arith(data: bytes) -> tuple[np.ndarray, int]:
    """Native-precision decode of a SOFB stream (marker walk mirroring
    _raw_samples, dispatching to decode_scan_lossless_arith)."""
    from sclera_spark.llm.jpeg_lossless import decode_scan_lossless_arith

    cond: dict = {}
    pos = 2
    frame = None
    restart_interval = 0
    while True:
        m = data[pos + 1]
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4 : pos + 2 + ln]
        if m == 0xCB:
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = [
                {"id": seg[6 + 3 * c], "h": 1, "v": 1, "tq": 0}
                for c in range(nc)
            ]
            frame = {"h": fh, "w": fw, "comps": comps, "prec_raw": prec}
        elif m == 0xCC:
            i = 0
            while i + 1 < len(seg):
                cond[(seg[i] >> 4, seg[i] & 0x0F)] = seg[i + 1]
                i += 2
        elif m == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:
            ns = seg[0]
            scan = [
                (frame["comps"][c], seg[2 + 2 * c] >> 4, 0)
                for c in range(ns)
            ]
            frame["ll_predictor"] = seg[1 + 2 * ns]
            frame["ll_pt"] = seg[3 + 2 * ns] & 0x0F
            return (
                decode_scan_lossless_arith(
                    data, pos + 2 + ln, frame, scan, cond, restart_interval
                ),
                frame["prec_raw"],
            )
        pos += 2 + ln


@pytest.mark.parametrize("predictor", range(1, 8))
def test_arith_exact_roundtrip_all_predictors(predictor):
    from sclera_spark.llm.jpeg_lossless import encode_jpeg_lossless_arith

    rng = np.random.default_rng(300 + predictor)
    for shape, prec in [
        ((9, 13), 8), ((16, 16, 3), 8), ((1, 7), 8), ((5, 1), 8),
        ((7, 5), 16), ((8, 11), 12), ((4, 4), 2),
    ]:
        px = rng.integers(0, 1 << prec, shape).astype(np.int64)
        data = encode_jpeg_lossless_arith(
            px, predictor=predictor, precision=prec
        )
        got, gprec = _raw_samples_arith(data)
        assert gprec == prec
        exp = px if px.ndim == 3 else px[..., None]
        assert np.array_equal(got, exp), (predictor, shape, prec)


def test_arith_restart_and_point_transform():
    from sclera_spark.llm.jpeg_lossless import encode_jpeg_lossless_arith

    rng = np.random.default_rng(31)
    px = rng.integers(0, 65536, (12, 10)).astype(np.int64)
    for rsti in (1, 3, 7):
        data = encode_jpeg_lossless_arith(
            px, predictor=5, precision=16, restart_interval=rsti
        )
        got, _ = _raw_samples_arith(data)
        assert np.array_equal(got, px[..., None]), rsti
    px8 = rng.integers(0, 256, (6, 9)).astype(np.int64)
    data = encode_jpeg_lossless_arith(
        px8, predictor=4, precision=8, point_transform=2
    )
    got, _ = _raw_samples_arith(data)
    assert np.array_equal(got, ((px8 >> 2) << 2)[..., None])


def test_arith_extreme_diffs_mod_wraparound():
    """Max-amplitude oscillation at precision 16: every difference is
    near +/-65535, exercising the mod-2**16 wrap and the deepest width
    chains of the magnitude coder."""
    from sclera_spark.llm.jpeg_lossless import encode_jpeg_lossless_arith

    px = np.zeros((4, 6), np.int64)
    px[::2, ::2] = 65535
    px[1::2, 1::2] = 65535
    for predictor in (1, 2, 4, 7):
        data = encode_jpeg_lossless_arith(
            px, predictor=predictor, precision=16
        )
        got, _ = _raw_samples_arith(data)
        assert np.array_equal(got, px[..., None]), predictor


def test_arith_cross_pinned_against_huffman_lossless():
    """Same image through BOTH lossless entropy backends: the Huffman
    (SOF3) and arithmetic (SOFB) decoders must reconstruct identical
    native-precision samples — the predictor/wraparound semantics are
    shared, only the difference coder differs. The QM-coder itself is
    externally pinned in test_jpeg_arith.py; this ties the lossless
    statistical model to the already-pinned Annex-K SOF3 semantics."""
    from sclera_spark.llm.jpeg_lossless import encode_jpeg_lossless_arith

    rng = np.random.default_rng(77)
    for prec, shape in [(8, (11, 7, 3)), (12, (9, 14)), (16, (6, 6))]:
        px = rng.integers(0, 1 << prec, shape).astype(np.int64)
        for predictor in (1, 4, 6):
            h_raw, _ = _raw_samples(
                encode_jpeg_lossless(px, predictor=predictor, precision=prec)
            )
            a_raw, _ = _raw_samples_arith(
                encode_jpeg_lossless_arith(
                    px, predictor=predictor, precision=prec
                )
            )
            assert np.array_equal(h_raw, a_raw)


def test_arith_public_decode_and_smaller_than_huffman_on_smooth():
    from sclera_spark.llm.jpeg_lossless import encode_jpeg_lossless_arith

    rng = np.random.default_rng(78)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_lossless_arith(px))
    assert out.dtype == np.uint8 and np.array_equal(out, px)
    # on a smooth gradient the adaptive QM-coder should not LOSE badly
    # to the static Huffman SSSS table (sanity on compression ratio)
    grad = (
        np.arange(64)[None, :] + np.arange(64)[:, None]
    ).astype(np.int64) % 256
    a = len(encode_jpeg_lossless_arith(grad, predictor=4, precision=8))
    h = len(encode_jpeg_lossless(grad, predictor=4, precision=8))
    assert a < h * 1.1


def test_arith_fuzz_roundtrip():
    from sclera_spark.llm.jpeg_lossless import encode_jpeg_lossless_arith

    rng = np.random.default_rng(79)
    for _ in range(20):
        h = int(rng.integers(1, 20))
        w = int(rng.integers(1, 20))
        nc = int(rng.choice([1, 3]))
        prec = int(rng.choice([2, 4, 8, 12, 16]))
        predictor = int(rng.integers(1, 8))
        rsti = int(rng.choice([0, 0, 1, 5]))
        shape = (h, w) if nc == 1 else (h, w, nc)
        if rng.random() < 0.3:
            px = rng.choice(
                [0, (1 << prec) - 1, 1 << (prec - 1)], size=shape
            ).astype(np.int64)
        else:
            px = rng.integers(0, 1 << prec, shape).astype(np.int64)
        data = encode_jpeg_lossless_arith(
            px, predictor=predictor, precision=prec, restart_interval=rsti
        )
        got, _ = _raw_samples_arith(data)
        exp = px if px.ndim == 3 else px[..., None]
        assert np.array_equal(got, exp), (h, w, nc, prec, predictor, rsti)

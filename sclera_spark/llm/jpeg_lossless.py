"""Lossless JPEG (ITU-T T.81 Annex H, SOF3): predictive coding with
huffman-coded differences — the last JPEG process family, closing the
multimodal tier's codec matrix (baseline/extended/progressive huffman,
sequential/progressive arithmetic, 12-bit, and now lossless).

Annex H is small: each sample is predicted from its causal neighbors
Ra (left), Rb (above), Rc (above-left) via one of seven selectors
(SOS.Ss); the prediction DIFFERENCE, taken modulo 2**16, is coded
exactly like a DC coefficient (SSSS category + magnitude bits, with
the special category 16 = difference 32768 carrying no extra bits).
First sample predicts 2**(P-Pt-1); the rest of the first line predicts
from Ra, the first column from Rb; restarts reset prediction.

Verification story (tests/test_jpeg_lossless.py): LOSSLESS means the
roundtrip oracle is exact — decode(encode(px)) == px bit-for-bit for
every image, precision 2..16, every predictor, restart intervals, gray
and interleaved color. That equality is a far stronger self-pin than
the DCT paths enjoy; what it cannot prove is interop with OTHER
encoders' streams, and this container's libjpeg-turbo (2.1.5) predates
lossless support (added in 3.0), so no external twin exists — stated
honestly here rather than implied.
"""

from __future__ import annotations

import struct

import numpy as np

from sclera_spark.llm.jpeg import (
    _BitReader,
    _canonical_codes,
    _bit_writer,
    _huff_decode,
    _extend,
    _seg,
)

# SSSS 0..16 (16 = diff 32768, no magnitude bits): 17 symbols at 5 bits
_LL_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_LL_VALS = list(range(17))


def _predict(ra: int, rb: int, rc: int, sel: int) -> int:
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"invalid lossless predictor {sel}")


def encode_jpeg_lossless(
    px,
    predictor: int = 4,
    precision: int | None = None,
    point_transform: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """SOF3 lossless JPEG from (h, w) or (h, w, 3) integer samples.
    ``precision`` defaults to 8 for uint8 input, else 16. Components
    are coded interleaved (one sample per component per MCU), the only
    layout the decoder needs for 1x1 sampling."""
    arr = np.asarray(px)
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else 16
    if not 2 <= precision <= 16:
        raise ValueError("lossless precision must be in 2..16")
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, nc = arr.shape
    arr = arr.astype(np.int64) >> point_transform
    codes = _canonical_codes(_LL_BITS, _LL_VALS)

    data, put, flush = _bit_writer()
    default_pred = 1 << (precision - point_transform - 1)

    def emit_diff(d: int) -> None:
        d &= 0xFFFF  # modulo 2**16 (H.1.2.1)
        if d >= 0x8000:
            d -= 0x10000
        if d == -32768 or d == 32768:
            c, ln = codes[16]
            put(c, ln)
            return
        size = 0 if d == 0 else int(abs(d)).bit_length()
        c, ln = codes[size]
        put(c, ln)
        if size:
            put(d if d >= 0 else d + (1 << size) - 1, size)

    rst = 0
    samples_done = 0
    # restart_interval counts MCUs = sample positions (all components)
    for y in range(h):
        for x in range(w):
            if (
                restart_interval
                and samples_done
                and samples_done % restart_interval == 0
            ):
                flush()
                data += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                # prediction restarts: next sample acts like image start
            start = (
                restart_interval
                and samples_done
                and samples_done % restart_interval == 0
            )
            for ci in range(nc):
                v = int(arr[y, x, ci])
                if start or (y == 0 and x == 0):
                    pred = default_pred
                elif y == 0:
                    pred = int(arr[y, x - 1, ci])
                elif x == 0 or start:
                    pred = int(arr[y - 1, x, ci])
                else:
                    pred = _predict(
                        int(arr[y, x - 1, ci]),
                        int(arr[y - 1, x, ci]),
                        int(arr[y - 1, x - 1, ci]),
                        predictor,
                    )
                emit_diff(v - pred)
            samples_done += 1
    flush()

    out = bytearray(b"\xff\xd8")
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(nc))
    out += _seg(0xFFC3, struct.pack(">BHHB", precision, h, w, nc) + comps)
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_LL_BITS) + bytes(_LL_VALS))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    scan = bytes([nc]) + b"".join(bytes([i + 1, 0x00]) for i in range(nc))
    out += _seg(0xFFDA, scan + bytes([predictor, 0, point_transform]))
    out += data
    out += b"\xff\xd9"
    return bytes(out)


def decode_scan_lossless(content, pos, frame, scan, huff, restart_interval):
    """Decode one SOF3 scan; returns (h, w, nc) int64 samples at native
    precision (the caller shapes presentation)."""
    fh, fw = frame["h"], frame["w"]
    nc = len(scan)
    sel = frame["ll_predictor"]
    pt = frame["ll_pt"]
    prec = frame["prec_raw"]
    default_pred = 1 << (prec - pt - 1)
    out = np.zeros((fh, fw, nc), np.int64)
    reader = _BitReader(content, pos)
    tabs = [huff[(0, dct)] for _, dct, _ in scan]
    samples_done = 0
    restarted = False
    for y in range(fh):
        for x in range(fw):
            if (
                restart_interval
                and samples_done
                and samples_done % restart_interval == 0
            ):
                reader.sync_restart()
                restarted = True
            for ci in range(nc):
                size = _huff_decode(reader, tabs[ci])
                if size == 16:
                    d = 32768
                else:
                    d = _extend(reader.bits(size), size) if size else 0
                if restarted or (y == 0 and x == 0):
                    pred = default_pred
                elif y == 0:
                    pred = int(out[y, x - 1, ci])
                elif x == 0:
                    pred = int(out[y - 1, x, ci])
                else:
                    pred = _predict(
                        int(out[y, x - 1, ci]),
                        int(out[y - 1, x, ci]),
                        int(out[y - 1, x - 1, ci]),
                        sel,
                    )
                out[y, x, ci] = (pred + d) & 0xFFFF
            restarted = False
            samples_done += 1
    # undo the point transform (low bits lost by design), clamp to P bits
    out = (out << pt) & ((1 << prec) - 1)
    return out


def present_uint8(samples: np.ndarray, prec: int) -> np.ndarray:
    """Downshift native-precision lossless samples to the uint8 output
    contract (presentation only; callers needing full precision use the
    raw samples)."""
    if prec <= 8:
        return np.clip(samples, 0, 255).astype(np.uint8)
    shift = prec - 8
    return np.clip((samples + (1 << (shift - 1))) >> shift, 0, 255).astype(
        np.uint8
    )


# ---- arithmetic-coded lossless (SOFB, T.81 Annex H over the §F QM-coder)

_LL_ARITH_BINS = 158  # 25 contexts x 4 decision bins + 2 x (15 X + 14 M)


def _ll_class(d: int, L: int, U: int) -> int:
    """5-way difference classification for the 2-D lossless context
    (T.81 H.1.2.2.1): zero, +small, -small, +large, -large, with the
    small/large boundary derived from the DC conditioning bounds L/U
    exactly as the DC model classifies its previous difference."""
    if d == 0:
        return 0
    sign = 1 if d < 0 else 0
    sz = (d if d > 0 else -d) - 1
    m = (1 << (sz.bit_length() - 1)) if sz else 0
    if m < (1 << L) >> 1:
        return 0
    if m > (1 << U) >> 1:
        return 3 + sign
    return 1 + sign


def _ll_arith_encode(enc, area, d: int, ca: int, cb: int) -> None:
    """One prediction difference through the lossless statistical model:
    the (class(Da), class(Db)) pair selects a 4-bin decision cluster
    (zero / sign / Sz>=1-given-sign), the width chain runs in one of
    two X-bin sets chosen by whether Db classified large, and each
    magnitude category owns one M bin at the +14 stagger — the same
    decision tree as the DC coder (jpeg_arith._dc_encode), re-homed on
    the two-dimensional context."""
    st = 4 * (ca + 5 * cb)
    if d == 0:
        enc.encode(area, st, 0)
        return
    enc.encode(area, st, 1)
    sign = 1 if d < 0 else 0
    enc.encode(area, st + 1, sign)
    st = 4 * (ca + 5 * cb) + 2 + sign
    sz = (d if d > 0 else -d) - 1
    m = 0
    if sz:
        enc.encode(area, st, 1)
        m = 1
        st = 100 if cb < 3 else 129  # X1 of the Db-selected set
        v2 = sz
        while v2 >> 1:
            v2 >>= 1
            enc.encode(area, st, 1)
            m <<= 1
            if m == 0x8000:
                raise ValueError("lossless arithmetic magnitude overflow")
            st += 1
    enc.encode(area, st, 0)  # terminate the width chain
    st += 14  # the category's M bin
    mm = m
    while mm > 1:
        mm >>= 1
        enc.encode(area, st, 1 if (sz & mm) else 0)


def _ll_arith_decode(dec, area, ca: int, cb: int) -> int:
    st = 4 * (ca + 5 * cb)
    if dec.decode(area, st) == 0:
        return 0
    sign = dec.decode(area, st + 1)
    st = 4 * (ca + 5 * cb) + 2 + sign
    m = dec.decode(area, st)
    if m:
        st = 100 if cb < 3 else 129
        while dec.decode(area, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("lossless arithmetic magnitude overflow")
            st += 1
    v = m
    st += 14
    while m > 1:
        m >>= 1
        if dec.decode(area, st):
            v |= m
    v += 1
    return -v if sign else v


def _ll_wrap(d: int) -> int:
    """Differences are taken modulo 2**16 (H.1.2.1) into (-32768,
    32768]: sample reconstruction is mod-2**16 either way, and keeping
    the domain one-sided caps the width chain inside the bin table."""
    d &= 0xFFFF
    return d - 0x10000 if d > 0x8000 else d


def encode_jpeg_lossless_arith(
    px,
    predictor: int = 4,
    precision: int | None = None,
    point_transform: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """SOFB (lossless ARITHMETIC) JPEG from (h, w) or (h, w, 3) integer
    samples: Annex-H prediction identical to the SOF3 encoder above,
    with the differences QM-coded under the 25-context lossless
    statistical model instead of Huffman SSSS codes.

    Verification story: as with SOF3 (see module docstring), the
    roundtrip oracle is exact — decode(encode(px)) == px for every
    precision/predictor/restart layout — and the predictor semantics
    are cross-pinned against the Huffman path (both decoders must
    reconstruct identical samples for the same image). No external
    encoder for this process exists in this container (libjpeg-turbo
    gained lossless in 3.0, and never arithmetic-lossless), so interop
    beyond the QM-coder itself (which IS externally pinned, see
    test_jpeg_arith.py) is stated honestly rather than implied."""
    from sclera_spark.llm.jpeg_arith import ArithEncoder

    arr = np.asarray(px)
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else 16
    if not 2 <= precision <= 16:
        raise ValueError("lossless precision must be in 2..16")
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, nc = arr.shape
    arr = arr.astype(np.int64) >> point_transform
    default_pred = 1 << (precision - point_transform - 1)
    L, U = 0, 1  # spec-default DC conditioning (no DAC segment emitted)

    enc = ArithEncoder()
    areas = [bytearray(_LL_ARITH_BINS) for _ in range(nc)]
    diffs = np.zeros((h, w, nc), np.int64)
    data = bytearray()
    rst = 0
    samples_done = 0
    restarted = False
    for y in range(h):
        for x in range(w):
            if (
                restart_interval
                and samples_done
                and samples_done % restart_interval == 0
            ):
                data += enc.flush()
                data += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                enc = ArithEncoder()
                areas = [bytearray(_LL_ARITH_BINS) for _ in range(nc)]
                restarted = True
            for ci in range(nc):
                v = int(arr[y, x, ci])
                if restarted or (y == 0 and x == 0):
                    pred = default_pred
                elif y == 0:
                    pred = int(arr[y, x - 1, ci])
                elif x == 0:
                    pred = int(arr[y - 1, x, ci])
                else:
                    pred = _predict(
                        int(arr[y, x - 1, ci]),
                        int(arr[y - 1, x, ci]),
                        int(arr[y - 1, x - 1, ci]),
                        predictor,
                    )
                d = _ll_wrap(v - pred)
                diffs[y, x, ci] = d
                da = 0 if x == 0 or restarted else int(diffs[y, x - 1, ci])
                db = 0 if y == 0 or restarted else int(diffs[y - 1, x, ci])
                _ll_arith_encode(
                    enc,
                    areas[ci],
                    d,
                    _ll_class(da, L, U),
                    _ll_class(db, L, U),
                )
            restarted = False
            samples_done += 1
    data += enc.flush()

    out = bytearray(b"\xff\xd8")
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(nc))
    out += _seg(0xFFCB, struct.pack(">BHHB", precision, h, w, nc) + comps)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    scan = bytes([nc]) + b"".join(bytes([i + 1, 0x00]) for i in range(nc))
    out += _seg(0xFFDA, scan + bytes([predictor, 0, point_transform]))
    out += data
    out += b"\xff\xd9"
    return bytes(out)


def decode_scan_lossless_arith(
    content, pos, frame, scan, cond, restart_interval
):
    """Decode one SOFB scan; returns (h, w, nc) int64 samples at native
    precision (the caller shapes presentation, as for SOF3)."""
    from sclera_spark.llm.jpeg_arith import ArithDecoder, _dc_cond

    fh, fw = frame["h"], frame["w"]
    nc = len(scan)
    sel = frame["ll_predictor"]
    pt = frame["ll_pt"]
    prec = frame["prec_raw"]
    default_pred = 1 << (prec - pt - 1)
    out = np.zeros((fh, fw, nc), np.int64)
    diffs = np.zeros((fh, fw, nc), np.int64)
    # per-component conditioning bounds from the scan's DC table id
    bounds = [_dc_cond(cond, tdc) for _, tdc, _ in scan]
    dec = ArithDecoder(content, pos)
    areas = [bytearray(_LL_ARITH_BINS) for _ in range(nc)]
    samples_done = 0
    restarted = False
    for y in range(fh):
        for x in range(fw):
            if (
                restart_interval
                and samples_done
                and samples_done % restart_interval == 0
            ):
                pos2 = dec.sync_restart(content)
                dec = ArithDecoder(content, pos2)
                areas = [bytearray(_LL_ARITH_BINS) for _ in range(nc)]
                restarted = True
            for ci in range(nc):
                L, U = bounds[ci]
                da = 0 if x == 0 or restarted else int(diffs[y, x - 1, ci])
                db = 0 if y == 0 or restarted else int(diffs[y - 1, x, ci])
                d = _ll_arith_decode(
                    dec,
                    areas[ci],
                    _ll_class(da, L, U),
                    _ll_class(db, L, U),
                )
                diffs[y, x, ci] = d
                if restarted or (y == 0 and x == 0):
                    pred = default_pred
                elif y == 0:
                    pred = int(out[y, x - 1, ci])
                elif x == 0:
                    pred = int(out[y - 1, x, ci])
                else:
                    pred = _predict(
                        int(out[y, x - 1, ci]),
                        int(out[y - 1, x, ci]),
                        int(out[y - 1, x - 1, ci]),
                        sel,
                    )
                out[y, x, ci] = (pred + d) & 0xFFFF
            restarted = False
            samples_done += 1
    out = (out << pt) & ((1 << prec) - 1)
    return out

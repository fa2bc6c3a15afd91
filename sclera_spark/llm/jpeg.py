"""JPEG (ITU-T T.81 / ISO 10918-1) codec in pure Python+numpy.

r6 closed the engine's LAST declared multimodal stub with baseline
sequential decode; r7 adds PROGRESSIVE DCT (T.81 §G — the web's
dominant JPEG flavor). Everything here derives from the public JPEG
specification: marker segments, huffman entropy coding (tables read
from the file's own DHT segments — nothing hard-coded in the decoder),
zigzag (generated from its anti-diagonal definition), dequantization,
8x8 type-II DCT as an orthonormal matrix product, JFIF YCbCr, and box
chroma upsampling for subsampled scans.

decode_jpeg supports 8-bit samples, 1 or 3 components, arbitrary h/v
sampling factors (4:4:4, 4:2:2, 4:2:0), restart markers, and BOTH DCT
modes:
- baseline/extended sequential (SOF0/SOF1): single scan, as in r6;
- progressive (SOF2): multi-scan spectral selection + successive
  approximation — DC first/refine (interleaved or not), AC first with
  EOB-run coding, and the §G.1.2.3 AC refinement correction-bit
  algorithm, with per-scan restart-interval support. Coefficients
  accumulate across scans and are reconstructed once at EOI.
Arithmetic-coded and 12-bit variants still raise a clear error (they
fall back to decoded_real=0 in the feature path).

encode_jpeg_gray / encode_jpeg_rgb emit valid baseline JPEGs;
encode_jpeg_gray_progressive / encode_jpeg_rgb_progressive emit the
SAME quantized coefficients through a 6-scan progressive script
(DC first Al=1 → DC refine → per-component AC first/refine over two
spectral bands), so progressive and baseline encodings of one image
must decode IDENTICALLY — the bit-exact equivalence the test suite
pins on random images. Quantization is lossy in general, but an image
of CONSTANT 8x8 blocks survives bit-exactly when each (value-128)*8 is
a multiple of the DC quantization step: the DCT of a constant block is
a lone DC coefficient, so the round trip is exact arithmetic — that is
what lets the driver-graded entry put REAL JPEG decode (now including
progressive scans) under a closed-form SQL oracle (same trick as the
PNG gradient fixtures).
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------- shared


def _zigzag() -> list[tuple[int, int]]:
    """Anti-diagonal zigzag scan order: diagonal s runs (0,s)->(s,0)
    when s is odd (row increasing) and (s,0)->(0,s) when even."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(s + 1) if i < 8 and s - i < 8]
        order.extend(diag if s % 2 == 1 else diag[::-1])
    return order


_ZZ = _zigzag()

_T = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)

# flat quantization table (all steps = 8): keeps constant blocks exact
# (DC = (v-128)*8 is always a multiple of 8) and bounds gradient error
_QTAB = np.full(64, 8, dtype=np.uint8)


# -------------------------------------------------------------- encoder
# Simple (non-optimal, spec-valid) huffman tables for the encoder: code
# lengths chosen so every DC category and every (run,size) symbol used
# below exists. The DECODER never assumes these — it builds tables from
# the DHT bytes in the file.

# all 16 DC size categories at 5 bits (kraft 16/32 — valid), covering
# 12-bit sample precision (DC diffs to ±32767 need categories to 15)
_ENC_DC_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(16))
# AC: EOB (0x00), ZRL (0xF0) and (run 0-15, size 1-14 — sizes 11-14
# only arise at 12-bit precision): everything beyond a few short
# symbols sits at 12 bits — valid as long as the kraft sum holds
# (lengths assigned canonically below)
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 15)
] + [
    # EOBn symbols (run, size=0) for progressive AC scans: EOB runs of
    # 2^r .. 2^(r+1)-1 blocks (T.81 §G.1.2.2); EOB0 is 0x00 above
    (r << 4) for r in range(1, 15)
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical construction."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _enc_ac_tables() -> tuple[list[int], list[int]]:
    """Assign 4 bits to EOB, 16 bits to nothing: put EOB+small sizes
    short, everything else at 12 bits (162 symbols fit: 2^12 space)."""
    short = [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0xF0]
    rest = [v for v in _ENC_AC_VALS if v not in short]
    bits = [0] * 16
    bits[3] = len(short)  # all short symbols at 4 bits (7 < 16 ok)
    bits[11] = len(rest)  # remainder at 12 bits
    return bits, short + rest


def _bit_writer():
    buf = bytearray()
    acc = {"v": 0, "n": 0}

    def put(code: int, length: int):
        acc["v"] = (acc["v"] << length) | (code & ((1 << length) - 1))
        acc["n"] += length
        while acc["n"] >= 8:
            acc["n"] -= 8
            byte = (acc["v"] >> acc["n"]) & 0xFF
            buf.append(byte)
            if byte == 0xFF:
                buf.append(0x00)  # byte stuffing

    def flush():
        if acc["n"]:
            pad = 8 - acc["n"]
            put((1 << pad) - 1, pad)  # pad with 1-bits per spec

    return buf, put, flush


def _category(v: int) -> int:
    return 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()


def _mag_bits(v: int, size: int) -> int:
    # negative magnitudes are stored as value-1 in `size` bits (T.81 F1.2.1)
    return v if v >= 0 else v + (1 << size) - 1


def _encode_block(put, blk, q, prev_dc, dc_codes, ac_codes, center=128.0) -> int:
    coef = _T @ (blk.astype(np.float64) - center) @ _T.T
    zq = np.round(coef / q).astype(np.int64)
    zz = [int(zq[i, j]) for i, j in _ZZ]
    diff = zz[0] - prev_dc
    size = _category(diff)
    c, ln = dc_codes[size]
    put(c, ln)
    if size:
        put(_mag_bits(diff, size), size)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            put(c, ln)
            run -= 16
        size = _category(v)
        c, ln = ac_codes[(run << 4) | size]
        put(c, ln)
        put(_mag_bits(v, size), size)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]
        put(c, ln)
    return zz[0]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _encode_frame(
    planes, sampling, h, w, restart_interval: int = 0, prec: int = 8
) -> bytes:
    """Shared sequential encoder: ``planes`` are full-resolution-per-
    component (already subsampled) uint8 — or uint16 when ``prec`` is
    12 — arrays; ``sampling`` their (h, v) factors. One quant + one
    huffman table pair for all. ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that many MCUs (byte-aligned, DC
    predictors reset). ``prec=12`` emits an EXTENDED SEQUENTIAL frame
    (SOF1 — baseline is 8-bit only per T.81 B.2.2) with samples
    centered at 2048."""
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_bits, ac_vals = _enc_ac_tables()
    ac_codes = _canonical_codes(ac_bits, ac_vals)
    q = _QTAB.reshape(8, 8).astype(np.float64)

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (sh, sv) in zip(planes, sampling):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )

    data, put, flush = _bit_writer()
    preds = [0] * len(planes)
    mcu_idx = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                flush()  # byte-align, then the restart marker
                data += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            for ci, (p, (sh, sv)) in enumerate(zip(padded, sampling)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        preds[ci] = _encode_block(
                            put, p[y0 : y0 + 8, x0 : x0 + 8], q,
                            preds[ci], dc_codes, ac_codes,
                            center=float(1 << (prec - 1)),
                        )
            mcu_idx += 1
    flush()

    nc = len(planes)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(int(_QTAB[k]) for k in range(64)))
    comps = b"".join(
        bytes([i + 1, (sh << 4) | sv, 0])
        for i, (sh, sv) in enumerate(sampling)
    )
    out += _seg(
        0xFFC0 if prec == 8 else 0xFFC1,
        struct.pack(">BHHB", prec, h, w, nc) + comps,
    )
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    scan = bytes([nc]) + b"".join(bytes([i + 1, 0x00]) for i in range(nc))
    out += _seg(0xFFDA, scan + bytes([0, 63, 0]))
    out += data
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------- progressive encoder


def _quantize_blocks(plane: np.ndarray, center: float = 128.0) -> np.ndarray:
    """(nby, nbx, 64) int32 zigzag-ordered quantized coefficients of an
    8-multiple-padded plane — the shared input of every progressive
    scan encoder."""
    q = _QTAB.reshape(8, 8).astype(np.float64)
    nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.zeros((nby, nbx, 64), np.int32)
    for by in range(nby):
        for bx in range(nbx):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = _T @ (blk.astype(np.float64) - center) @ _T.T
            zq = np.round(coef / q).astype(np.int64)
            out[by, bx] = [int(zq[i, j]) for i, j in _ZZ]
    return out


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shifted right (truncation toward
    zero, T.81 §G.1.2.2)."""
    return (abs(int(v)) >> al) * (1 if v >= 0 else -1)


def _flush_eob(state, put, ac_codes) -> None:
    """Emit the pending EOBn symbol (+ extension bits) and the
    correction bits buffered against the run (refinement scans)."""
    if state["eobrun"] > 0:
        eb = state["eobrun"]
        r = eb.bit_length() - 1
        c, ln = ac_codes[r << 4]
        put(c, ln)
        if r:
            put(eb - (1 << r), r)
        state["eobrun"] = 0
    for b in state["ebits"]:
        put(b, 1)
    state["ebits"] = []


def _enc_ac_first_block(put, ac_codes, zz, ss, se, al, state) -> None:
    vals = [_pt_ac(zz[k], al) for k in range(ss, se + 1)]
    if not any(vals):
        state["eobrun"] += 1
        if state["eobrun"] == 32767:
            _flush_eob(state, put, ac_codes)
        return
    _flush_eob(state, put, ac_codes)
    run = 0
    last_nz = max(i for i, v in enumerate(vals) if v)
    for i in range(last_nz + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            put(c, ln)
            run -= 16
        size = _category(v)
        c, ln = ac_codes[(run << 4) | size]
        put(c, ln)
        put(_mag_bits(v, size), size)
        run = 0
    if last_nz < se - ss:
        state["eobrun"] = 1  # trailing zeros: this block starts an EOB run


def _enc_ac_refine_block(put, ac_codes, zz, ss, se, al, state) -> None:
    """§G.1.2.3 (figure G.7) AC successive-approximation refinement:
    previously-significant coefficients send one correction bit (the
    next magnitude bit); newly-significant ones (|v| >> Al == 1) are
    run-length coded over zero-history positions with a sign bit;
    correction bits buffer until the next emitted symbol (or fold into
    the EOB run)."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = -1
    for i, a in enumerate(absv):
        if a == 1:
            eob = i  # last NEWLY-significant position
    run = 0
    br: list[int] = []
    for i, a in enumerate(absv):
        if a == 0:
            run += 1
            continue
        while run > 15 and i <= eob:
            _flush_eob(state, put, ac_codes)
            c, ln = ac_codes[0xF0]
            put(c, ln)
            run -= 16
            for b in br:
                put(b, 1)
            br = []
        if a > 1:  # previously significant: correction bit only
            br.append(a & 1)
            continue
        _flush_eob(state, put, ac_codes)
        c, ln = ac_codes[(run << 4) | 1]
        put(c, ln)
        put(1 if zz[ss + i] >= 0 else 0, 1)  # sign: 1 = positive
        for b in br:
            put(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        state["eobrun"] += 1
        state["ebits"].extend(br)
        if state["eobrun"] == 32767:
            _flush_eob(state, put, ac_codes)


def _encode_frame_progressive(planes, sampling, h, w, prec: int = 8) -> bytes:
    """Progressive (SOF2) encoder emitting the SAME quantized
    coefficients as :func:`_encode_frame`, reorganized into a 6-scan
    script: interleaved DC first (Al=1) + DC refine, then per component
    AC first and AC refine over two spectral bands (1-5, 6-63). Shares
    the baseline huffman/quant tables; decoding a progressive encode
    must therefore equal decoding the baseline encode bit-for-bit."""
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_bits, ac_vals = _enc_ac_tables()
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    coefs = []
    for p, (sh, sv) in zip(planes, sampling):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        padded = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        coefs.append(_quantize_blocks(padded, center=float(1 << (prec - 1))))

    nc = len(planes)

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int, data: bytes) -> bytes:
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            # one DC table (class 0 id 0) + one AC table (class 1 id 0)
            hdr += bytes([cid + 1, 0x00])
        return _seg(0xFFDA, hdr + bytes([ss, se, (ah << 4) | al])) + data

    scans = []

    # scan 1: DC first, all components interleaved, Al=1
    data, put, flush = _bit_writer()
    preds = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(sampling):
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(coefs[ci][my * sv + by, mx * sh + bx, 0]) >> 1
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        size = _category(diff)
                        c, ln = dc_codes[size]
                        put(c, ln)
                        if size:
                            put(_mag_bits(diff, size), size)
    flush()
    scans.append(sos(list(range(nc)), 0, 0, 0, 1, bytes(data)))

    # scan 2: DC refine (Ah=1, Al=0) — one bit per block, same order
    data, put, flush = _bit_writer()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(sampling):
                for by in range(sv):
                    for bx in range(sh):
                        put(int(coefs[ci][my * sv + by, mx * sh + bx, 0]) & 1, 1)
    flush()
    scans.append(sos(list(range(nc)), 0, 0, 1, 0, bytes(data)))

    # per component: AC first + refine over two bands (non-interleaved;
    # block grid = ceil(component samples / 8), top-left of the padded
    # grid — T.81 A.2.2)
    bands = [(1, 5), (6, 63)]
    for ah_al, enc in ((0, _enc_ac_first_block), (1, _enc_ac_refine_block)):
        for ci, (sh, sv) in enumerate(sampling):
            nbx = (-(-(w * sh) // hmax) + 7) // 8
            nby = (-(-(h * sv) // vmax) + 7) // 8
            for ss, se in bands:
                data, put, flush = _bit_writer()
                state = {"eobrun": 0, "ebits": []}
                for by in range(nby):
                    for bx in range(nbx):
                        enc(
                            put, ac_codes, coefs[ci][by, bx], ss, se,
                            1 if ah_al == 0 else 0, state,
                        )
                _flush_eob(state, put, ac_codes)
                flush()
                al = 1 if ah_al == 0 else 0
                scans.append(sos([ci], ss, se, ah_al, al, bytes(data)))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(int(_QTAB[k]) for k in range(64)))
    comps = b"".join(
        bytes([i + 1, (sh << 4) | sv, 0]) for i, (sh, sv) in enumerate(sampling)
    )
    out += _seg(0xFFC2, struct.pack(">BHHB", prec, h, w, nc) + comps)
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    for s in scans:
        out += s
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray_progressive(px) -> bytes:
    """Valid progressive (SOF2) single-component JPEG from (h, w) uint8:
    decodes identically to encode_jpeg_gray of the same image."""
    px = np.asarray(px, dtype=np.uint8)
    return _encode_frame_progressive([px], [(1, 1)], *px.shape)


def encode_jpeg_gray12_progressive(px12) -> bytes:
    """12-bit progressive (SOF2) grayscale: decodes identically to the
    12-bit extended-sequential encoding of the same image."""
    px12 = np.asarray(px12, dtype=np.uint16)
    if px12.max(initial=0) > 4095:
        raise ValueError("12-bit samples must be <= 4095")
    return _encode_frame_progressive([px12], [(1, 1)], *px12.shape, prec=12)


def encode_jpeg_rgb_progressive(px, subsample: bool = False) -> bytes:
    """Valid progressive 3-component JPEG (JFIF YCbCr, optionally
    4:2:0): decodes identically to encode_jpeg_rgb of the same image."""
    px = np.asarray(px, dtype=np.uint8).astype(np.float64)
    h, w = px.shape[:2]
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    y, cb, cr = (np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, cb, cr))
    if not subsample:
        return _encode_frame_progressive([y, cb, cr], [(1, 1)] * 3, h, w)

    def down(p):
        pe = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge").astype(np.float64)
        q4 = pe.reshape(pe.shape[0] // 2, 2, pe.shape[1] // 2, 2).mean(axis=(1, 3))
        return np.clip(np.round(q4), 0, 255).astype(np.uint8)

    return _encode_frame_progressive(
        [y, down(cb), down(cr)], [(2, 2), (1, 1), (1, 1)], h, w
    )


def encode_jpeg_gray(px, restart_interval: int = 0) -> bytes:
    """Valid baseline single-component JPEG from a (h, w) uint8 array."""
    px = np.asarray(px, dtype=np.uint8)
    return _encode_frame([px], [(1, 1)], *px.shape, restart_interval=restart_interval)


def encode_jpeg_gray12(px12) -> bytes:
    """Valid 12-bit extended-sequential (SOF1) grayscale JPEG from a
    (h, w) uint16 array of 0..4095 samples — the fixture ground truth
    for the high-precision decode path (medical/scientific JPEGs)."""
    px12 = np.asarray(px12, dtype=np.uint16)
    if px12.max(initial=0) > 4095:
        raise ValueError("12-bit samples must be <= 4095")
    return _encode_frame([px12], [(1, 1)], *px12.shape, prec=12)


def encode_jpeg_rgb(px, subsample: bool = False) -> bytes:
    """Valid baseline 3-component JPEG from (h, w, 3) uint8 RGB — JFIF
    YCbCr, 4:4:4 or (``subsample=True``) 4:2:0 with box-averaged
    chroma."""
    px = np.asarray(px, dtype=np.uint8).astype(np.float64)
    h, w = px.shape[:2]
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    y, cb, cr = (np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, cb, cr))
    if not subsample:
        return _encode_frame([y, cb, cr], [(1, 1)] * 3, h, w)
    # 4:2:0: box-average 2x2 chroma (pad odd dims by edge first)
    def down(p):
        pe = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge").astype(np.float64)
        q4 = pe.reshape(pe.shape[0] // 2, 2, pe.shape[1] // 2, 2).mean(axis=(1, 3))
        return np.clip(np.round(q4), 0, 255).astype(np.uint8)

    return _encode_frame(
        [y, down(cb), down(cr)], [(2, 2), (1, 1), (1, 1)], h, w
    )


# -------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first entropy-segment reader: un-stuffs FF 00, stops at any
    other marker, handles RSTn via reset()."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        b = self.buf
        if self.pos >= len(b):
            raise EOFError("truncated JPEG scan")
        c = b[self.pos]
        if c == 0xFF:
            nxt = b[self.pos + 1] if self.pos + 1 < len(b) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _Restart()
            else:
                raise EOFError("marker inside scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | c
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self):
        """Skip to just after the RSTn marker and clear the bit buffer."""
        b = self.buf
        while self.pos + 1 < len(b):
            if b[self.pos] == 0xFF and 0xD0 <= b[self.pos + 1] <= 0xD7:
                self.pos += 2
                self.acc = 0
                self.n = 0
                return
            self.pos += 1
        raise EOFError("no restart marker found")


class _Restart(Exception):
    pass


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 17:
        code = (code << 1) | reader.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in JPEG scan")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline or progressive JPEG to (h, w, channels) uint8
    (1 = grayscale, 3 = RGB via JFIF YCbCr)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> {(len, code): sym}
    cond: dict[tuple[int, int], int] = {}  # DAC: (class, id) -> Cs value
    frame = None
    prog: _ProgState | None = None
    restart_interval = 0
    pos = 2
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            pos += 1
            continue
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", content, pos + 2)
        seg = content[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                step = 64 * (2 if prec else 1)
                raw = seg[i + 1 : i + 1 + step]
                tab = (
                    np.frombuffer(raw, ">u2").astype(np.float64)
                    if prec
                    else np.frombuffer(raw, np.uint8).astype(np.float64)
                )
                qt[tid] = tab
                i += 1 + step
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nsym = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nsym])
                tab = {}
                code, k = 0, 0
                for l in range(1, 17):
                    for _ in range(bits[l - 1]):
                        tab[(l, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(cls, tid)] = tab
                i += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec not in (8, 12):
                raise ValueError(f"unsupported JPEG sample precision {prec}")
            if prec == 12 and marker == 0xC0:
                raise ValueError("baseline JPEG is 8-bit only (T.81 B.2.2)")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = {
                "h": fh, "w": fw, "comps": comps,
                "prog": marker in (0xC2, 0xCA), "prec": prec,
                "arith": marker in (0xC9, 0xCA),
            }
        elif marker == 0xCC:  # DAC: arithmetic conditioning (T.81 B.2.4.3)
            i = 0
            while i + 1 < len(seg):
                cond[(seg[i] >> 4, seg[i] & 0x0F)] = seg[i + 1]
                i += 2
        elif marker in (0xC3, 0xCB):  # lossless (T.81 Annex H): P 2..16
            # 0xC3 = huffman-coded differences, 0xCB = QM-arithmetic
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if not 2 <= prec <= 16:
                raise ValueError(f"invalid lossless precision {prec}")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = {
                "h": fh, "w": fw, "comps": comps, "prog": False,
                "lossless": True, "prec_raw": prec,
                "arith": marker == 0xCB,
            }
        elif marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG mode (differential/hierarchical)"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tabs >> 4, tabs & 0x0F))
            arith = frame.get("arith", False)
            if frame.get("lossless"):
                from sclera_spark.llm.jpeg_lossless import (
                    decode_scan_lossless,
                    decode_scan_lossless_arith,
                    present_uint8,
                )

                frame["ll_predictor"] = seg[1 + 2 * ns]
                frame["ll_pt"] = seg[3 + 2 * ns] & 0x0F
                if frame.get("arith"):
                    samples = decode_scan_lossless_arith(
                        content, pos + 2 + ln, frame, scan, cond,
                        restart_interval,
                    )
                else:
                    samples = decode_scan_lossless(
                        content, pos + 2 + ln, frame, scan, huff,
                        restart_interval,
                    )
                return present_uint8(samples, frame["prec_raw"])
            if not frame["prog"]:
                if arith:
                    from sclera_spark.llm.jpeg_arith import decode_scan_arith

                    return decode_scan_arith(
                        content, pos + 2 + ln, frame, scan, qt, cond,
                        restart_interval,
                    )
                return _decode_scan(
                    content, pos + 2 + ln, frame, scan, qt, huff, restart_interval
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if prog is None:
                prog = _ProgState(frame)
            if arith:
                from sclera_spark.llm.jpeg_arith import prog_decode_scan_arith

                pos = prog_decode_scan_arith(
                    prog, content, pos + 2 + ln, scan, ss, se, ah, al,
                    restart_interval, cond,
                )
            else:
                pos = prog.decode_scan(
                    content, pos + 2 + ln, scan, ss, se, ah, al,
                    restart_interval, huff,
                )
            continue
        pos += 2 + ln
    if prog is not None:
        return prog.reconstruct(qt)
    raise ValueError("JPEG has no scan data")


def _finish_samples(outs, prec: int) -> np.ndarray:
    """Level-shift + color-convert decoded component planes to the
    uint8 output contract. 12-bit samples (center 2048) downshift to
    8-bit presentation (>>4 with rounding) — the native-precision path
    is reachable via the planes themselves for callers that need it."""
    center = float(1 << (prec - 1))
    scale = float(1 << (prec - 8))
    if len(outs) == 1:
        g = np.clip(np.round((outs[0] + center) / scale), 0, 255).astype(np.uint8)
        return g[..., None]
    y, cb, cr = (o + center for o in outs)
    r = y + 1.402 * (cr - center)
    g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
    b = y + 1.772 * (cb - center)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb / scale), 0, 255).astype(np.uint8)


def _decode_scan(content, pos, frame, scan, qt, huff, restart_interval):
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)

    planes = []
    for comp, _, _ in scan:
        planes.append(
            np.zeros((mcuy * comp["v"] * 8, mcux * comp["h"] * 8), np.float64)
        )
    preds = [0] * len(scan)
    reader = _BitReader(content, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                preds = [0] * len(scan)
            try:
                for ci, (comp, dct, act) in enumerate(scan):
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = _decode_block(
                                reader, huff[(0, dct)], huff[(1, act)],
                                qt[comp["tq"]], preds, ci,
                            )
                            y0 = (my * comp["v"] + by) * 8
                            x0 = (mx * comp["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            except _Restart:
                reader.sync_restart()
                preds = [0] * len(scan)
                continue
            mcu_count += 1

    outs = []
    for ci, (comp, _, _) in enumerate(scan):
        p = planes[ci]
        # upsample subsampled components to full MCU resolution (box)
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        outs.append(p[:fh, :fw])
    return _finish_samples(outs, frame.get("prec", 8))


def _decode_block(reader, dc_tab, ac_tab, q, preds, ci):
    zz = np.zeros(64, np.float64)
    size = _huff_decode(reader, dc_tab)
    diff = _extend(reader.bits(size), size) if size else 0
    preds[ci] += diff
    zz[0] = preds[ci]
    k = 1
    while k < 64:
        sym = _huff_decode(reader, ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(reader.bits(size), size)
        k += 1
    coef = np.zeros((8, 8), np.float64)
    for idx, (i, j) in enumerate(_ZZ):
        coef[i, j] = zz[idx] * q[idx]
    return _T.T @ coef @ _T


# ---------------------------------------------- progressive decoder state


class _ProgState:
    """Accumulated DCT coefficients across a progressive JPEG's scans
    (T.81 §G). Each component owns an int32 (blocks_y, blocks_x, 64)
    zigzag-ordered array covering the interleaved MCU-padded grid;
    non-interleaved scans address its top-left ceil(samples/8) region.
    ``reconstruct`` dequantizes + inverse-DCTs every block once, at the
    end — progressive refinement only ever touches coefficients."""

    def __init__(self, frame: dict):
        self.frame = frame
        comps = frame["comps"]
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        self.mcux = (frame["w"] + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (frame["h"] + 8 * self.vmax - 1) // (8 * self.vmax)
        self.coef = {
            c["id"]: np.zeros(
                (self.mcuy * c["v"], self.mcux * c["h"], 64), np.int32
            )
            for c in comps
        }
        self.eobrun = 0

    def _nb(self, comp: dict) -> tuple[int, int]:
        """Non-interleaved block grid: ceil(component samples / 8)
        (T.81 A.2.2)."""
        sx = -(-self.frame["w"] * comp["h"] // self.hmax)
        sy = -(-self.frame["h"] * comp["v"] // self.vmax)
        return (sy + 7) // 8, (sx + 7) // 8

    # ---- scan dispatch ----

    def decode_scan(
        self, content, pos, scan, ss, se, ah, al, restart_interval, huff
    ) -> int:
        """Decode one SOS's entropy data into the coefficient state;
        returns the stream position of the next marker."""
        reader = _BitReader(content, pos)
        self.eobrun = 0
        if ss == 0:
            self._dc_scan(reader, scan, ah, al, restart_interval, huff)
        else:
            if len(scan) != 1:
                raise ValueError("progressive AC scan must be non-interleaved")
            if ah == 0:
                self._ac_first_scan(
                    reader, scan[0], ss, se, al, restart_interval, huff
                )
            else:
                self._ac_refine_scan(
                    reader, scan[0], ss, se, al, restart_interval, huff
                )
        return _next_marker(content, reader.pos)

    # ---- DC scans (interleaved or single-component) ----

    def _dc_scan(self, reader, scan, ah, al, restart_interval, huff):
        preds = [0] * len(scan)
        units = 0

        def block(ci, comp, dct, by, bx):
            c = self.coef[comp["id"]]
            if ah == 0:
                size = _huff_decode(reader, huff[(0, dct)])
                diff = _extend(reader.bits(size), size) if size else 0
                preds[ci] += diff
                c[by, bx, 0] = preds[ci] << al
            else:  # refinement: one magnitude bit at position al
                if reader.bit():
                    c[by, bx, 0] |= 1 << al

        if len(scan) > 1:  # interleaved MCU order
            for my in range(self.mcuy):
                for mx in range(self.mcux):
                    if restart_interval and units and units % restart_interval == 0:
                        reader.sync_restart()
                        preds = [0] * len(scan)
                    try:
                        for ci, (comp, dct, _) in enumerate(scan):
                            for by in range(comp["v"]):
                                for bx in range(comp["h"]):
                                    block(
                                        ci, comp, dct,
                                        my * comp["v"] + by, mx * comp["h"] + bx,
                                    )
                    except _Restart:
                        reader.sync_restart()
                        preds = [0] * len(scan)
                        continue
                    units += 1
        else:
            comp, dct, _ = scan[0]
            nby, nbx = self._nb(comp)
            for by in range(nby):
                for bx in range(nbx):
                    if restart_interval and units and units % restart_interval == 0:
                        reader.sync_restart()
                        preds = [0]
                    try:
                        block(0, comp, dct, by, bx)
                    except _Restart:
                        reader.sync_restart()
                        preds = [0]
                        continue
                    units += 1

    # ---- AC scans (always single-component) ----

    def _ac_first_scan(self, reader, sc, ss, se, al, restart_interval, huff):
        comp, _, act = sc
        tab = huff[(1, act)]
        c = self.coef[comp["id"]]
        nby, nbx = self._nb(comp)
        units = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and units and units % restart_interval == 0:
                    reader.sync_restart()
                    self.eobrun = 0
                try:
                    if self.eobrun > 0:
                        self.eobrun -= 1
                    else:
                        k = ss
                        while k <= se:
                            sym = _huff_decode(reader, tab)
                            r, s = sym >> 4, sym & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                self.eobrun = (1 << r) - 1
                                if r:
                                    self.eobrun += reader.bits(r)
                                break
                            k += r
                            if k > se:
                                raise ValueError("AC run past band end")
                            c[by, bx, k] = _extend(reader.bits(s), s) << al
                            k += 1
                except _Restart:
                    reader.sync_restart()
                    self.eobrun = 0
                    continue
                units += 1

    def _ac_refine_scan(self, reader, sc, ss, se, al, restart_interval, huff):
        """§G.1.2.3 correction-bit decoding (figure G.7 mirror of the
        encoder above): nonzero-history coefficients absorb one
        correction bit each; zero-history runs position the newly-
        significant ±2^Al values; EOB runs carry correction bits for
        every remaining nonzero coefficient of their blocks."""
        comp, _, act = sc
        tab = huff[(1, act)]
        c = self.coef[comp["id"]]
        nby, nbx = self._nb(comp)
        p1, m1 = 1 << al, -1 << al
        units = 0

        def correct(bz, k):
            v = int(c[bz[0], bz[1], k])
            if reader.bit() and (v & p1) == 0:
                c[bz[0], bz[1], k] = v + (p1 if v >= 0 else m1)

        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and units and units % restart_interval == 0:
                    reader.sync_restart()
                    self.eobrun = 0
                try:
                    k = ss
                    if self.eobrun == 0:
                        while k <= se:
                            sym = _huff_decode(reader, tab)
                            r, s = sym >> 4, sym & 0x0F
                            if s == 0:
                                if r != 15:  # EOBn: run starts here
                                    self.eobrun = 1 << r
                                    if r:
                                        self.eobrun += reader.bits(r)
                                    break
                                val = 0  # ZRL: skip 16 zero-history slots
                            else:
                                if s != 1:
                                    raise ValueError(
                                        "AC refinement size must be 1"
                                    )
                                val = p1 if reader.bit() else m1
                            while k <= se:
                                if c[by, bx, k] != 0:
                                    correct((by, bx), k)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val and k <= se:
                                c[by, bx, k] = val
                            k += 1
                    if self.eobrun > 0:
                        while k <= se:
                            if c[by, bx, k] != 0:
                                correct((by, bx), k)
                            k += 1
                        self.eobrun -= 1
                except _Restart:
                    reader.sync_restart()
                    self.eobrun = 0
                    continue
                units += 1

    # ---- final reconstruction ----

    def reconstruct(self, qt) -> np.ndarray:
        frame = self.frame
        fh, fw = frame["h"], frame["w"]
        zi = np.array([i for i, _ in _ZZ])
        zj = np.array([j for _, j in _ZZ])
        outs = []
        for comp in frame["comps"]:
            cf = self.coef[comp["id"]].astype(np.float64)
            deq = cf * qt[comp["tq"]][None, None, :]
            nby, nbx = deq.shape[:2]
            mats = np.zeros((nby, nbx, 8, 8))
            mats[:, :, zi, zj] = deq
            blocks = np.einsum("ij,abjk,kl->abil", _T.T, mats, _T)
            plane = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
            ry, rx = self.vmax // comp["v"], self.hmax // comp["h"]
            if ry > 1 or rx > 1:
                plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
            outs.append(plane[:fh, :fw])
        return _finish_samples(outs, frame.get("prec", 8))


def _next_marker(content: bytes, pos: int) -> int:
    """Position of the next REAL marker at/after ``pos`` (skips stuffed
    FF00 and restart markers) — where the surrounding segment walk
    resumes after a progressive scan's entropy data."""
    n = len(content)
    while pos + 1 < n:
        if content[pos] == 0xFF:
            nxt = content[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n

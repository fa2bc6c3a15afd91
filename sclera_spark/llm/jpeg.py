"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) codec in pure Python+numpy.

r6: closes the engine's LAST declared multimodal stub. Everything here
derives from the public JPEG specification: marker segments, huffman
entropy coding (tables read from the file's own DHT segments — nothing
hard-coded in the decoder), zigzag (generated from its anti-diagonal
definition), dequantization, 8x8 type-II DCT as an orthonormal matrix
product, JFIF YCbCr, and box chroma upsampling for subsampled scans.

decode_jpeg supports baseline sequential DCT: 8-bit samples, 1 or 3
components, arbitrary h/v sampling factors (4:4:4, 4:2:2, 4:2:0),
restart markers. Progressive/arithmetic/12-bit variants raise a clear
error (they fall back to decoded_real=0 in the feature path).

encode_jpeg_gray emits valid single-component baseline JPEGs — the
fixture ground truth. Quantization is lossy in general, but an image of
CONSTANT 8x8 blocks survives bit-exactly when each (value-128)*8 is a
multiple of the DC quantization step: the DCT of a constant block is a
lone DC coefficient, so the round trip is exact arithmetic — that is
what lets the driver-graded entry put REAL JPEG decode under a
closed-form SQL oracle (same trick as the PNG gradient fixtures).
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

_ENC_DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
# AC: EOB (0x00), ZRL (0xF0) and (run 0-15, size 1-10): give everything
# a fixed 9-bit code except a few short ones — valid as long as the
# kraft sum holds (lengths assigned canonically below)
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
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


def _encode_block(put, blk, q, prev_dc, dc_codes, ac_codes) -> int:
    coef = _T @ (blk.astype(np.float64) - 128.0) @ _T.T
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


def _encode_frame(planes, sampling, h, w, restart_interval: int = 0) -> bytes:
    """Shared baseline encoder: ``planes`` are full-resolution-per-
    component (already subsampled) uint8 arrays; ``sampling`` their
    (h, v) factors. One quant + one huffman table pair for all.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (byte-aligned, DC predictors reset) — exercises the
    decoder's restart path."""
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
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, nc) + comps)
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    scan = bytes([nc]) + b"".join(bytes([i + 1, 0x00]) for i in range(nc))
    out += _seg(0xFFDA, scan + bytes([0, 63, 0]))
    out += data
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray(px, restart_interval: int = 0) -> bytes:
    """Valid baseline single-component JPEG from a (h, w) uint8 array."""
    px = np.asarray(px, dtype=np.uint8)
    return _encode_frame([px], [(1, 1)], *px.shape, restart_interval=restart_interval)


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
    """Decode a baseline JPEG to (h, w, channels) uint8 (1 = grayscale,
    3 = RGB via JFIF YCbCr)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> {(len, code): sym}
    frame = None
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
        elif marker == 0xC0 or marker == 0xC1:
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic) unsupported")
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
            return _decode_scan(
                content, pos + 2 + ln, frame, scan, qt, huff, restart_interval
            )
        pos += 2 + ln
    raise ValueError("JPEG has no scan data")


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
    if len(outs) == 1:
        g = np.clip(np.round(outs[0] + 128.0), 0, 255).astype(np.uint8)
        return g[..., None]
    y, cb, cr = (o + 128.0 for o in outs)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


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

"""JPEG arithmetic entropy coding (ITU-T T.81 Annex D QM-coder with the
Annex F.1.4 / G.1.3.3 statistical models) — decode AND encode, pure
Python + numpy.

This closes the last decoded_real=0 flavor of the multimodal tier
(llm/jpeg.py handles baseline/extended/progressive Huffman; this module
adds SOF9 extended-sequential-arithmetic and SOF10
progressive-arithmetic). Reference parity target: the reference has no
image codec at all — this tier exists for the multimodal
training-pipeline surface (SURVEY §2.10-ext).

Sources: the public T.81 spec — Table D.3 (Qe values + probability
estimation state machine, transcribed below), §D.1 encoder / §D.2
decoder procedures (conditional MPS/LPS exchange, renormalization,
byte stuffing), Table F.4 statistics-bin layout, §F.1.4.1/.4.4.1 DC and
§F.1.4.2/.4.4.2 AC conditioning, §G.1.3.3 progressive approximation.
Byte-level conventions (0xFF 0x00 byte stuffing in the entropy stream,
zero-fed decoding past a marker, per-restart re-initialization of
coder AND statistics) verified empirically against libjpeg-turbo's
independent codec in tests/test_jpeg_arith.py — every stream either
implementation emits, the other must decode to identical pixels.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- QM table
# T.81 Table D.3: (Qe, NLPS, NMPS, SWITCH) for the 113 adaptation
# states, plus index 113: the non-adaptive ~0.5 "fixed" bin used for
# sign decisions (never transitions, never switches).
_QM = [
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
    (0x5A1D, 113, 113, 0),  # index 113: fixed ~0.5 bin (sign decisions)
]

_FIXED = 113


class ArithEncoder:
    """T.81 §D.1 encoder. Interval convention: after ``A -= Qe`` the MPS
    owns the bottom sub-interval of size A and the LPS the top one of
    size Qe, swapped (conditional exchange) when A < Qe so the MPS
    always gets the larger. C accumulates interval bases; bytes emerge
    at bit 19 (3 spacer bits; CT starts at 11 so the first byte is
    fraction bits 8..15), carries propagate into already-emitted bytes,
    and 0x00 byte stuffing after 0xFF happens at flush()."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.raw = bytearray()

    def _byteout(self) -> None:
        t = self.c >> 19
        self.c &= 0x7FFFF
        if t > 0xFF:
            j = len(self.raw) - 1
            while j >= 0 and self.raw[j] == 0xFF:
                self.raw[j] = 0
                j -= 1
            if j >= 0:
                self.raw[j] += 1
            t &= 0xFF
        self.raw.append(t)

    def _renorm(self) -> None:
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a >= 0x8000:
                return

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        sv = st[i]
        qe, nlps, nmps, sw = _QM[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if bit == mps:
            if self.a >= 0x8000:
                return
            if self.a < qe:  # exchange: MPS takes the top (Qe) interval
                self.c += self.a
                self.a = qe
            st[i] = (mps << 7) | nmps
        else:
            if self.a >= qe:  # normal: LPS top
                self.c += self.a
                self.a = qe
            if sw:
                mps ^= 1
            st[i] = (mps << 7) | nlps
        self._renorm()

    def encode_fixed(self, bit: int) -> None:
        st = bytearray([_FIXED])
        self.encode(st, 0, bit)

    def flush(self) -> bytes:
        """§D.1.8 termination: pick the in-interval value with the most
        trailing zero bits, push the remaining register bytes, trim
        trailing zeros (the decoder zero-feeds past the marker), stuff
        0x00 after every 0xFF."""
        t = (self.c + self.a - 1) & ~0xFFFF
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        while self.raw and self.raw[-1] == 0:
            self.raw.pop()
        out = bytearray()
        for b in self.raw:
            out.append(b)
            if b == 0xFF:
                out.append(0)
        return bytes(out)


class ArithDecoder:
    """T.81 §D.2 decoder, eager-renormalization form: ``c`` is the code
    value's window at the current interval scale (init: the first 16
    fraction bits), ``a`` the interval. 0xFF 0x00 unstuffs to 0xFF; any
    other 0xFF-marker stops the byte feed and supplies zeros (markers
    mid-scan are legal in arithmetic JPEG)."""

    def __init__(self, data: bytes, pos: int):
        self._data = data
        self._pos = pos
        self._n = len(data)
        self.marker_at: int | None = None
        self._cur = 0
        self._nbits = 0
        self.a = 0x10000
        self.c = (self._next_byte() << 8) | self._next_byte()

    def _next_byte(self) -> int:
        if self.marker_at is not None:
            return 0
        if self._pos >= self._n:
            self.marker_at = self._n
            return 0
        b = self._data[self._pos]
        if b == 0xFF:
            nxt = self._data[self._pos + 1] if self._pos + 1 < self._n else 0xD9
            if nxt == 0x00:
                self._pos += 2
                return 0xFF
            self.marker_at = self._pos
            return 0
        self._pos += 1
        return b

    def _next_bit(self) -> int:
        if self._nbits == 0:
            self._cur = self._next_byte()
            self._nbits = 8
        self._nbits -= 1
        return (self._cur >> self._nbits) & 1

    def decode(self, st: bytearray, i: int) -> int:
        sv = st[i]
        qe, nlps, nmps, sw = _QM[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if self.c < self.a:
            if self.a >= 0x8000:
                return mps
            if self.a < qe:  # conditional exchange: bottom is the MPS's
                bit = 1 - mps
                if sw:
                    mps ^= 1
                st[i] = (mps << 7) | nlps
            else:
                bit = mps
                st[i] = (mps << 7) | nmps
        else:
            self.c -= self.a
            if self.a < qe:
                bit = mps
                st[i] = (mps << 7) | nmps
            else:
                bit = 1 - mps
                if sw:
                    mps ^= 1
                st[i] = (mps << 7) | nlps
            self.a = qe
        while self.a < 0x8000:
            self.a <<= 1
            self.c = (self.c << 1) | self._next_bit()
        return bit

    def decode_fixed(self) -> int:
        st = bytearray([_FIXED])
        return self.decode(st, 0)

    def sync_restart(self, data: bytes) -> int:
        """Find the restart marker at/after the current read position and
        return the position just past it (the scan then re-inits both
        the coder and the statistics, per §F.2.4.3.4)."""
        pos = self.marker_at if self.marker_at is not None else self._pos
        n = len(data)
        while pos + 1 < n:
            if data[pos] == 0xFF and 0xD0 <= data[pos + 1] <= 0xD7:
                return pos + 2
            pos += 1
        raise ValueError("expected restart marker in arithmetic scan")


# ------------------------------------------------------ statistical models
# Bin layout per T.81 Table F.4 / the conditioning of §F.1.4: DC uses a
# 64-byte area per table (20 contexts + staggered X/M magnitude bins at
# offset 20/+14); AC a 256-byte area (3 bins per coefficient index +
# X/M chains at 189 for k <= Kx, 217 above).


class _Stats:
    def __init__(self, ncomp: int):
        self.dc: dict[int, bytearray] = {}
        self.ac: dict[int, bytearray] = {}
        self.dc_context = [0] * ncomp
        self.last_dc = [0] * ncomp

    def dc_area(self, tid: int) -> bytearray:
        return self.dc.setdefault(tid, bytearray(64))

    def ac_area(self, tid: int) -> bytearray:
        return self.ac.setdefault(tid, bytearray(256))

    def reset(self) -> None:
        for a in self.dc.values():
            a[:] = bytes(len(a))
        for a in self.ac.values():
            a[:] = bytes(len(a))
        self.dc_context = [0] * len(self.dc_context)
        self.last_dc = [0] * len(self.last_dc)


def _dc_cond(cond: dict, tid: int) -> tuple[int, int]:
    # Cs = (U << 4) | L; spec default L=0, U=1 -> 0x10 (T.81 F.1.4.4.1.2)
    v = cond.get((0, tid), 0x10)
    return v & 0x0F, v >> 4


def _ac_cond(cond: dict, tid: int) -> int:
    return cond.get((1, tid), 5)  # default Kx=5


# ---- DC coefficient (F.1.4.1 encode / F.2.4.2 decode) ----


def _dc_decode(dec, stats, ci, tid, cond) -> int:
    L, U = _dc_cond(cond, tid)
    area = stats.dc_area(tid)
    st = stats.dc_context[ci]
    if dec.decode(area, st) == 0:
        stats.dc_context[ci] = 0
        return 0
    sign = dec.decode(area, st + 1)
    st += 2 + sign
    m = dec.decode(area, st)
    if m:
        st = 20  # X1 bin
        while dec.decode(area, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            st += 1
    # conditioning category for the NEXT block (F.1.4.4.1.2)
    if m < (1 << L) >> 1:
        stats.dc_context[ci] = 0
    elif m > (1 << U) >> 1:
        stats.dc_context[ci] = 12 + sign * 4
    else:
        stats.dc_context[ci] = 4 + sign * 4
    v = m
    st += 14  # M bins
    while m > 1:
        m >>= 1
        if dec.decode(area, st):
            v |= m
    v += 1
    return -v if sign else v


def _dc_encode(enc, stats, ci, tid, cond, diff) -> None:
    L, U = _dc_cond(cond, tid)
    area = stats.dc_area(tid)
    st = stats.dc_context[ci]
    if diff == 0:
        enc.encode(area, st, 0)
        stats.dc_context[ci] = 0
        return
    enc.encode(area, st, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(area, st + 1, sign)
    st += 2 + sign
    sz = (diff if diff > 0 else -diff) - 1
    m = 0
    if sz:
        enc.encode(area, st, 1)  # Sz >= 1 (mirrors decode's first m)
        m = 1
        st = 20  # X1 bin
        v2 = sz
        while v2 >> 1:
            v2 >>= 1
            enc.encode(area, st, 1)
            m <<= 1
            st += 1
    enc.encode(area, st, 0)  # terminate the width chain
    if m < (1 << L) >> 1:
        stats.dc_context[ci] = 0
    elif m > (1 << U) >> 1:
        stats.dc_context[ci] = 12 + sign * 4
    else:
        stats.dc_context[ci] = 4 + sign * 4
    st += 14  # M bin for this magnitude category
    mm = m
    while mm > 1:
        mm >>= 1
        enc.encode(area, st, 1 if (sz & mm) else 0)


# ---- AC coefficients, sequential / progressive-first (F.1.4.2 / G) ----


def _ac_decode_band(dec, stats, tid, cond, zz, ss, se, al) -> None:
    """Decode AC coefficients for zigzag band [ss, se] into ``zz``
    (values shifted left by ``al``; al=0 for sequential)."""
    kx = _ac_cond(cond, tid)
    area = stats.ac_area(tid)
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(area, st):  # EOB
            return
        while dec.decode(area, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC run past band end")
        sign = dec.decode_fixed()
        st += 2
        m = dec.decode(area, st)
        if m:
            if dec.decode(area, st):  # second decision on the same bin
                m = 2
                st = 189 if k <= kx else 217
                while dec.decode(area, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arithmetic AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        while m > 1:
            m >>= 1
            if dec.decode(area, st):
                v |= m
        v += 1
        zz[k] = (-v if sign else v) << al
        k += 1


def _ac_encode_band(enc, stats, tid, cond, zz, ss, se, al) -> None:
    kx = _ac_cond(cond, tid)
    area = stats.ac_area(tid)
    ke = ss - 1  # index of last coefficient nonzero at this stage
    for k in range(se, ss - 1, -1):
        t = int(zz[k])
        if (t if t >= 0 else -t) >> al:
            ke = k
            break
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(area, st, 0)  # not EOB
        while True:
            t = int(zz[k])
            v = (t >> al) if t >= 0 else -((-t) >> al)
            if v:
                break
            enc.encode(area, st + 1, 0)
            st += 3
            k += 1
        enc.encode(area, st + 1, 1)
        sign = 1 if v < 0 else 0
        enc.encode_fixed(sign)
        st += 2
        sz = (v if v > 0 else -v) - 1
        m = 0
        if sz:
            enc.encode(area, st, 1)
            m = 1
            v2 = sz
            if v2 >> 1:
                v2 >>= 1
                enc.encode(area, st, 1)  # second decision, same bin
                m = 2
                st = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(area, st, 1)
                    m <<= 1
                    st += 1
        enc.encode(area, st, 0)  # terminate the width chain
        st += 14
        mm = m
        while mm > 1:
            mm >>= 1
            enc.encode(area, st, 1 if (sz & mm) else 0)
        k += 1
    if k <= se:
        st = 3 * (k - 1)
        enc.encode(area, st, 1)  # EOB


# ---- AC refinement (G.1.3.3 / §G.2) ----


def _ac_refine_decode(dec, stats, tid, zz, ss, se, al) -> None:
    area = stats.ac_area(tid)
    p1 = 1 << al
    m1 = -1 << al
    kex = 0
    for k in range(se, ss - 1, -1):
        if zz[k]:
            kex = k
            break
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(area, st):
            return
        while True:
            if zz[k]:  # previously nonzero: correction bit
                if dec.decode(area, st + 2):
                    zz[k] += m1 if zz[k] < 0 else p1
                break
            if dec.decode(area, st + 1):  # newly nonzero
                zz[k] = m1 if dec.decode_fixed() else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC refine run past band end")
        k += 1


def _ac_refine_encode(enc, stats, tid, zz, ss, se, ah, al) -> None:
    area = stats.ac_area(tid)
    ke = 0
    for k in range(se, ss - 1, -1):
        t = int(zz[k])
        if (t if t >= 0 else -t) >> al:
            ke = k
            break
    kex = 0
    for k in range(ke, ss - 1, -1):
        t = int(zz[k])
        if (t if t >= 0 else -t) >> ah:
            kex = k
            break
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(area, st, 0)  # not EOB
        while True:
            t = int(zz[k])
            sign = 1 if t < 0 else 0
            mag = (-t if t < 0 else t) >> al
            if mag:
                if mag >> 1:  # previously nonzero: correction bit
                    enc.encode(area, st + 2, mag & 1)
                else:  # newly nonzero
                    enc.encode(area, st + 1, 1)
                    enc.encode_fixed(sign)
                break
            enc.encode(area, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if k <= se:
        st = 3 * (k - 1)
        enc.encode(area, st, 1)  # EOB


# ------------------------------------------------------- sequential decode


def decode_scan_arith(content, pos, frame, scan, qt, cond, restart_interval):
    """Sequential arithmetic scan (SOF9) — mirrors jpeg._decode_scan's
    MCU walk with the QM entropy layer; returns the finished image."""
    from sclera_spark.llm import jpeg as _j

    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * comp["v"] * 8, mcux * comp["h"] * 8), np.float64)
        for comp, _, _ in scan
    ]
    stats = _Stats(len(scan))
    dec = ArithDecoder(content, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                pos2 = dec.sync_restart(content)
                dec = ArithDecoder(content, pos2)
                stats.reset()
            for ci, (comp, dct, act) in enumerate(scan):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, np.int64)
                        stats.last_dc[ci] += _dc_decode(dec, stats, ci, dct, cond)
                        zz[0] = stats.last_dc[ci]
                        _ac_decode_band(dec, stats, act, cond, zz, 1, 63, 0)
                        q = qt[comp["tq"]]
                        coef = np.zeros((8, 8), np.float64)
                        for idx, (i, j) in enumerate(_j._ZZ):
                            coef[i, j] = zz[idx] * q[idx]
                        blk = _j._T.T @ coef @ _j._T
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1
    outs = []
    for ci, (comp, _, _) in enumerate(scan):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        outs.append(p[:fh, :fw])
    return _j._finish_samples(outs, frame.get("prec", 8))


# ------------------------------------------------------ progressive decode


def prog_decode_scan_arith(
    prog, content, pos, scan, ss, se, ah, al, restart_interval, cond
) -> int:
    """One progressive-arithmetic SOS (SOF10) into the shared _ProgState
    coefficient arrays; returns the next marker position."""
    stats = _Stats(len(scan))
    dec = ArithDecoder(content, pos)

    def maybe_restart(units):
        nonlocal dec
        if restart_interval and units and units % restart_interval == 0:
            pos2 = dec.sync_restart(content)
            dec = ArithDecoder(content, pos2)
            stats.reset()

    if ss == 0:
        units = 0
        if len(scan) > 1:
            for my in range(prog.mcuy):
                for mx in range(prog.mcux):
                    maybe_restart(units)
                    for ci, (comp, dct, _) in enumerate(scan):
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                _prog_dc_block(
                                    dec, stats, ci, dct, cond, prog,
                                    comp, my * comp["v"] + by,
                                    mx * comp["h"] + bx, ah, al,
                                )
                    units += 1
        else:
            comp, dct, _ = scan[0]
            nby, nbx = prog._nb(comp)
            for by in range(nby):
                for bx in range(nbx):
                    maybe_restart(units)
                    _prog_dc_block(
                        dec, stats, 0, dct, cond, prog, comp, by, bx, ah, al
                    )
                    units += 1
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        comp, _, act = scan[0]
        c = prog.coef[comp["id"]]
        nby, nbx = prog._nb(comp)
        units = 0
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart(units)
                zz = c[by, bx]
                if ah == 0:
                    _ac_decode_band(dec, stats, act, cond, zz, ss, se, al)
                else:
                    _ac_refine_decode(dec, stats, act, zz, ss, se, al)
                units += 1
    nxt = dec.marker_at if dec.marker_at is not None else dec._pos
    return _next_marker_pos(content, nxt)


def _prog_dc_block(dec, stats, ci, dct, cond, prog, comp, by, bx, ah, al):
    c = prog.coef[comp["id"]]
    if ah == 0:
        stats.last_dc[ci] += _dc_decode(dec, stats, ci, dct, cond)
        c[by, bx, 0] = stats.last_dc[ci] << al
    else:
        if dec.decode_fixed():
            c[by, bx, 0] |= 1 << al


def _next_marker_pos(content: bytes, pos: int) -> int:
    n = len(content)
    while pos + 1 < n:
        if content[pos] == 0xFF and content[pos + 1] not in (0x00,):
            return pos
        pos += 1
    return n


# ------------------------------------------------------------- encoders


def _encode_frame_arith(planes, sampling, h, w, restart_interval=0, prec=8):
    """Sequential arithmetic encoder (SOF9 frame, DAC defaults):
    interleaved MCU order, one quant table, per-restart coder+stats
    re-init, RSTn markers between intervals."""
    from sclera_spark.llm import jpeg as _j

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
    q = _j._QTAB.reshape(8, 8).astype(np.float64)
    center = float(1 << (prec - 1))
    cond: dict = {}

    stats = _Stats(len(planes))
    enc = ArithEncoder()
    data = bytearray()
    mcu_idx = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                data += enc.flush()
                data += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                enc = ArithEncoder()
                stats.reset()
            for ci, (p, (sh, sv)) in enumerate(zip(padded, sampling)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = p[y0 : y0 + 8, x0 : x0 + 8]
                        coef = _j._T @ (blk.astype(np.float64) - center) @ _j._T.T
                        zq = np.round(coef / q).astype(np.int64)
                        zz = np.array(
                            [int(zq[i, j]) for i, j in _j._ZZ], np.int64
                        )
                        diff = int(zz[0]) - stats.last_dc[ci]
                        _dc_encode(enc, stats, ci, 0, cond, diff)
                        stats.last_dc[ci] = int(zz[0])
                        _ac_encode_band(enc, stats, 0, cond, zz, 1, 63, 0)
            mcu_idx += 1
    data += enc.flush()

    nc = len(planes)
    out = bytearray(b"\xff\xd8")
    out += _j._seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += _j._seg(0xFFDB, bytes([0]) + bytes(int(_j._QTAB[k]) for k in range(64)))
    comps = b"".join(
        bytes([i + 1, (sh << 4) | sv, 0]) for i, (sh, sv) in enumerate(sampling)
    )
    out += _j._seg(0xFFC9, struct.pack(">BHHB", prec, h, w, nc) + comps)
    # DAC: DC table 0 Cs=(U<<4)|L=0x10 (defaults), AC table 0 Kx=5
    out += _j._seg(0xFFCC, bytes([0x00, 0x10, 0x10, 0x05]))
    if restart_interval:
        out += _j._seg(0xFFDD, struct.pack(">H", restart_interval))
    scan = bytes([nc]) + b"".join(bytes([i + 1, 0x00]) for i in range(nc))
    out += _j._seg(0xFFDA, scan + bytes([0, 63, 0]))
    out += data
    out += b"\xff\xd9"
    return bytes(out)


def _encode_frame_arith_progressive(planes, sampling, h, w, prec=8):
    """Progressive arithmetic encoder (SOF10): the same 6-scan spectral
    selection / successive approximation script as the Huffman
    progressive encoder (jpeg._encode_frame_progressive) — DC first
    (Al=1) + DC refine, AC 1-5 then 6-63 first (Al=1), two AC refine
    scans — with QM entropy coding per scan (statistics reset at every
    SOS, per T.81 G.1.3.3)."""
    from sclera_spark.llm import jpeg as _j

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    center = float(1 << (prec - 1))
    cond: dict = {}
    nc = len(planes)

    # quantized zigzag blocks per component on the padded MCU grid
    blocks = []
    for p, (sh, sv) in zip(planes, sampling):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        pp = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        blocks.append(_j._quantize_blocks(pp, center=center))

    def nb(ci):
        sh, sv = sampling[ci]
        sx = -(-w * sh // hmax)
        sy = -(-h * sv // vmax)
        return (sy + 7) // 8, (sx + 7) // 8

    def dc_scan(ah, al):
        stats = _Stats(nc)
        enc = ArithEncoder()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    sh, sv = sampling[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            zz0 = int(blocks[ci][my * sv + by, mx * sh + bx, 0])
                            if ah == 0:
                                diff = (zz0 >> al) - stats.last_dc[ci]
                                _dc_encode(enc, stats, ci, 0, cond, diff)
                                stats.last_dc[ci] = zz0 >> al
                            else:
                                enc.encode_fixed((zz0 >> al) & 1)
        return enc.flush()

    def ac_scan(ci, ss, se, ah, al):
        stats = _Stats(1)
        enc = ArithEncoder()
        nby, nbx = nb(ci)
        for by in range(nby):
            for bx in range(nbx):
                zz = blocks[ci][by, bx]
                if ah == 0:
                    _ac_encode_band(enc, stats, 0, cond, zz, ss, se, al)
                else:
                    _ac_refine_encode(enc, stats, 0, zz, ss, se, ah, al)
        return enc.flush()

    def sos(comp_ids, ss, se, ah, al, data):
        scan = bytes([len(comp_ids)]) + b"".join(
            bytes([cid, 0x00]) for cid in comp_ids
        )
        return _j._seg(
            0xFFDA, scan + bytes([ss, se, (ah << 4) | al])
        ) + data

    out = bytearray(b"\xff\xd8")
    out += _j._seg(0xFFE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += _j._seg(0xFFDB, bytes([0]) + bytes(int(_j._QTAB[k]) for k in range(64)))
    comps = b"".join(
        bytes([i + 1, (sh << 4) | sv, 0]) for i, (sh, sv) in enumerate(sampling)
    )
    out += _j._seg(0xFFCA, struct.pack(">BHHB", prec, h, w, nc) + comps)
    out += _j._seg(0xFFCC, bytes([0x00, 0x10, 0x10, 0x05]))
    all_ids = list(range(1, nc + 1))
    out += sos(all_ids, 0, 0, 0, 1, dc_scan(0, 1))
    for ci in range(nc):
        out += sos([ci + 1], 1, 5, 0, 1, ac_scan(ci, 1, 5, 0, 1))
        out += sos([ci + 1], 6, 63, 0, 1, ac_scan(ci, 6, 63, 0, 1))
    out += sos(all_ids, 0, 0, 1, 0, dc_scan(1, 0))
    for ci in range(nc):
        out += sos([ci + 1], 1, 5, 1, 0, ac_scan(ci, 1, 5, 1, 0))
        out += sos([ci + 1], 6, 63, 1, 0, ac_scan(ci, 6, 63, 1, 0))
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------- public wrappers


def encode_jpeg_gray_arith(px, restart_interval: int = 0) -> bytes:
    """Extended-sequential ARITHMETIC (SOF9) grayscale JPEG from a
    (h, w) uint8 array."""
    px = np.asarray(px, dtype=np.uint8)
    return _encode_frame_arith(
        [px], [(1, 1)], *px.shape, restart_interval=restart_interval
    )


def encode_jpeg_rgb_arith(px, subsample: bool = False) -> bytes:
    """Sequential-arithmetic 3-component JPEG (JFIF YCbCr, 4:4:4 or
    4:2:0)."""
    from sclera_spark.llm import jpeg as _j

    y, cb, cr, h, w = _rgb_planes(px)
    if not subsample:
        return _encode_frame_arith([y, cb, cr], [(1, 1)] * 3, h, w)
    return _encode_frame_arith(
        [y, _down2(cb, h, w), _down2(cr, h, w)],
        [(2, 2), (1, 1), (1, 1)], h, w,
    )


def encode_jpeg_gray_arith_progressive(px) -> bytes:
    """Progressive ARITHMETIC (SOF10) grayscale JPEG."""
    px = np.asarray(px, dtype=np.uint8)
    return _encode_frame_arith_progressive([px], [(1, 1)], *px.shape)


def encode_jpeg_rgb_arith_progressive(px, subsample: bool = False) -> bytes:
    y, cb, cr, h, w = _rgb_planes(px)
    if not subsample:
        return _encode_frame_arith_progressive([y, cb, cr], [(1, 1)] * 3, h, w)
    return _encode_frame_arith_progressive(
        [y, _down2(cb, h, w), _down2(cr, h, w)],
        [(2, 2), (1, 1), (1, 1)], h, w,
    )


def _rgb_planes(px):
    px = np.asarray(px, dtype=np.uint8).astype(np.float64)
    h, w = px.shape[:2]
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    y, cb, cr = (
        np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, cb, cr)
    )
    return y, cb, cr, h, w


def _down2(p, h, w):
    pe = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge").astype(np.float64)
    q4 = pe.reshape(pe.shape[0] // 2, 2, pe.shape[1] // 2, 2).mean(axis=(1, 3))
    return np.clip(np.round(q4), 0, 255).astype(np.uint8)


def encode_jpeg_gray12_arith(px12) -> bytes:
    """12-bit extended-sequential ARITHMETIC (SOF9) grayscale JPEG —
    the remaining T.81 precision flavor (samples centered at 2048)."""
    px12 = np.asarray(px12, dtype=np.uint16)
    if px12.max(initial=0) > 4095:
        raise ValueError("12-bit samples must be <= 4095")
    return _encode_frame_arith([px12], [(1, 1)], *px12.shape, prec=12)


def encode_jpeg_gray12_arith_progressive(px12) -> bytes:
    """12-bit progressive ARITHMETIC (SOF10) grayscale JPEG — completes
    the precision x scan-script x entropy-coding matrix."""
    px12 = np.asarray(px12, dtype=np.uint16)
    if px12.max(initial=0) > 4095:
        raise ValueError("12-bit samples must be <= 4095")
    return _encode_frame_arith_progressive([px12], [(1, 1)], *px12.shape, prec=12)

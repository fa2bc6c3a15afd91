"""Minimal pure-Python Zstandard DECOMPRESSOR (RFC 8878, public spec).

Implements exactly the published Zstandard format — frame header,
raw/RLE/compressed blocks, Huffman-coded literals (direct and
FSE-compressed weight tables, 1- and 4-stream), FSE-coded sequences
(predefined, RLE, FSE_Compressed and Repeat modes), repeat offsets, and
the optional XXH64 content checksum (verified via the repo's existing
pure-Python XXH64 in sources/bloom.py) — enough to read Avro containers
whose ``avro.codec`` is ``zstandard`` (sources/avro_lite.py), the other
common Iceberg manifest encoding besides snappy/deflate.

Scope (deliberate):
- decompression only; no dictionaries (``Dictionary_ID != 0`` refuses
  loudly — Avro/Iceberg writers do not use them), no multi-frame
  concatenation beyond skippable frames, no long-distance windows past
  the output produced so far (an Avro block is one self-contained
  frame, so matches never reference data before the frame).
- every refusal names its reason; hostile input (window bombs, bad
  magic, truncated streams, oversized claims) refuses instead of
  allocating its claim.

Each decoding step maps 1:1 to an RFC 8878 section, cited inline.
Correctness is pinned by fuzz against the JVM's zstd encoder (the
zstd-jni library bundled with the Spark distribution writes the test
vectors — an independent, canonical implementation) in
tests/test_zstd_lite.py.
"""

from __future__ import annotations

__all__ = ["ZstdError", "decompress", "frame_content_size"]

MAGIC = 0xFD2FB528
SKIPPABLE_LO = 0x184D2A50  # 16 magics: 0x184D2A50..5F (RFC 3.1.2)

_MAX_OUTPUT_DEFAULT = 1 << 30  # 1 GiB — far past any real Avro block
_MAX_WINDOW = 1 << 27  # 128 MiB window cap (spec recommends >= 8 MB)


class ZstdError(ValueError):
    """Malformed/unsupported zstd bytes — always raised with the reason."""


# ---------------------------------------------------------------------------
# backward bitstream (RFC 4.1: "Bitstreams are read backward")


class _BackBits:
    """Backward bit reader over a byte slice: a 1-bit sentinel tops the
    final byte, and reads consume from just below the current position
    downward. Bits are extracted from a small byte-slice window per
    read (O(1) per read — a whole-stream big-int would make decoding
    O(n^2) in block size). Reads past the start zero-fill and drive
    ``pos`` negative — FSE callers treat that as corruption, Huffman
    callers as stream end (both per the reference decoder's
    semantics)."""

    __slots__ = ("b", "pos")

    def __init__(self, data: bytes):
        if not data:
            raise ZstdError("zstd: empty bitstream")
        last = data[-1]
        if last == 0:
            raise ZstdError("zstd: bitstream final byte has no sentinel bit")
        self.b = data
        self.pos = 8 * (len(data) - 1) + last.bit_length() - 1

    def _bits_at(self, p: int, n: int) -> int:
        # value of bit window [p, p+n) of the little-endian stream,
        # zero-filling below position 0
        if p >= 0:
            chunk = int.from_bytes(self.b[p >> 3 : (p + n + 7) >> 3], "little")
            return (chunk >> (p & 7)) & ((1 << n) - 1)
        if p <= -n:
            return 0
        avail = n + p  # bits [0, avail) of the stream, shifted up by -p
        chunk = int.from_bytes(self.b[0 : (avail + 7) >> 3], "little")
        return (chunk & ((1 << avail) - 1)) << -p

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.pos -= n
        return self._bits_at(self.pos, n)

    def peek(self, n: int) -> int:
        return self._bits_at(self.pos - n, n)

    def skip(self, n: int) -> None:
        self.pos -= n


# ---------------------------------------------------------------------------
# FSE (RFC 4.1.1)


class _FseTable:
    __slots__ = ("symbols", "nbits", "base", "al")

    def __init__(self, symbols, nbits, base, al):
        self.symbols = symbols
        self.nbits = nbits
        self.base = base
        self.al = al


def _fse_from_freqs(freqs: list[int], al: int) -> _FseTable:
    """Build the decode table from normalized frequencies (-1 = the
    'less than one' probability), RFC 4.1.1 spread + state rules."""
    size = 1 << al
    symbols = [0] * size
    high = size - 1
    for s, f in enumerate(freqs):
        if f == -1:
            symbols[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, f in enumerate(freqs):
        if f <= 0:
            continue
        for _ in range(f):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ZstdError("zstd: FSE table spread did not complete (corrupt)")
    counters = [f if f > 0 else 1 for f in freqs]
    nbits = [0] * size
    base = [0] * size
    for i in range(size):
        s = symbols[i]
        x = counters[s]
        counters[s] += 1
        nb = al - (x.bit_length() - 1)
        nbits[i] = nb
        base[i] = (x << nb) - size
    return _FseTable(symbols, nbits, base, al)


def _fse_read_distribution(
    data: bytes, off: int, max_al: int, max_symbol: int
) -> tuple[list[int], int, int]:
    """Parse an FSE table description (RFC 4.1.1 "FSE Table
    Description"): forward bitstream, 4-bit accuracy-log field, then
    variable-width probabilities with 2-bit zero-repeat flags.
    Returns (freqs, accuracy_log, next_offset)."""
    if off >= len(data):
        raise ZstdError("zstd: truncated FSE table description")
    bitpos = 0

    def read_bits(n: int) -> int:
        nonlocal bitpos
        end_byte = off + (bitpos + n + 7) // 8
        if end_byte > len(data):
            raise ZstdError("zstd: truncated FSE table description")
        chunk = int.from_bytes(data[off:end_byte], "little")
        v = (chunk >> bitpos) & ((1 << n) - 1)
        bitpos += n
        return v

    al = read_bits(4) + 5
    if al > max_al:
        raise ZstdError(
            f"zstd: FSE accuracy log {al} exceeds the format maximum {max_al}"
        )
    remaining = 1 << al
    freqs: list[int] = []
    while remaining > 0 and len(freqs) <= max_symbol:
        # probability value in [0, remaining+1] (prob = value - 1),
        # variable-width: small values save the top bit (RFC 4.1.1
        # "FSE Table Description" — read full width, rewind one bit
        # when the low bits fall under the threshold)
        nbits = (remaining + 1).bit_length()
        val = read_bits(nbits)
        lower_mask = (1 << (nbits - 1)) - 1
        threshold = (1 << nbits) - 1 - (remaining + 1)
        if (val & lower_mask) < threshold:
            bitpos -= 1  # rewind: the short form used nbits-1 bits
            val &= lower_mask
        elif val > lower_mask:
            val -= threshold
        prob = val - 1
        freqs.append(prob)
        if prob == -1:
            remaining -= 1
        else:
            remaining -= prob
        if prob == 0:
            # 2-bit repeat flags: how many MORE zero-prob symbols
            while True:
                rep = read_bits(2)
                freqs.extend([0] * rep)
                if rep != 3:
                    break
    if remaining != 0:
        raise ZstdError("zstd: FSE probabilities do not sum to table size")
    if len(freqs) > max_symbol + 1:
        raise ZstdError(
            f"zstd: FSE table describes symbol {len(freqs) - 1} past the "
            f"format maximum {max_symbol}"
        )
    nxt = off + (bitpos + 7) // 8
    return freqs, al, nxt


# ---------------------------------------------------------------------------
# Huffman literals (RFC 4.2)


class _HufTable:
    __slots__ = ("symbols", "nbits", "max_bits")

    def __init__(self, symbols, nbits, max_bits):
        self.symbols = symbols
        self.nbits = nbits
        self.max_bits = max_bits


_HUF_MAX_BITS = 11  # RFC 4.2.1: Huffman code lengths are capped at 11


def _huf_from_weights(weights: list[int]) -> _HufTable:
    """Canonical Huffman decode table from explicit weights plus the
    implied last weight (RFC 4.2.1). Weight/table-log bombs refuse
    BEFORE any allocation: the format caps code lengths at 11 bits, so
    a table past 2^11 cells (or any weight past 11) is hostile — a
    crafted FSE weight stream could otherwise demand a multi-TiB
    table."""
    if any(w > _HUF_MAX_BITS for w in weights):
        raise ZstdError(
            f"zstd: Huffman weight past the format cap {_HUF_MAX_BITS} "
            "— refusing a corrupt or hostile container"
        )
    total = sum(1 << (w - 1) for w in weights if w > 0)
    if total == 0:
        raise ZstdError("zstd: Huffman weights are all zero")
    max_bits = total.bit_length()
    if max_bits > _HUF_MAX_BITS:
        raise ZstdError(
            f"zstd: Huffman table log {max_bits} exceeds the format cap "
            f"{_HUF_MAX_BITS} — refusing a corrupt or hostile container"
        )
    left = (1 << max_bits) - total
    if left & (left - 1):
        raise ZstdError("zstd: Huffman weights leave a non-power-of-2 gap")
    weights = weights + [left.bit_length()]
    if len(weights) > 256:
        raise ZstdError("zstd: more than 256 Huffman symbols")
    size = 1 << max_bits
    symbols = bytearray(size)
    nbits = bytearray(size)
    code = 0
    for w in range(1, max_bits + 1):  # longest codes (lowest weight) first
        cells = 1 << (w - 1)
        bits = max_bits + 1 - w
        for sym, sw in enumerate(weights):
            if sw != w:
                continue
            if code + cells > size:
                raise ZstdError("zstd: Huffman weights overflow the table")
            for i in range(code, code + cells):
                symbols[i] = sym
                nbits[i] = bits
            code += cells
    if code != size:
        raise ZstdError("zstd: Huffman weights do not fill the table")
    return _HufTable(bytes(symbols), bytes(nbits), max_bits)


def _huf_read_weights(data: bytes, off: int) -> tuple[list[int], int]:
    """Huffman tree description (RFC 4.2.1.1): direct 4-bit weights, or
    an FSE-compressed weight stream with two interleaved states."""
    if off >= len(data):
        raise ZstdError("zstd: truncated Huffman tree description")
    header = data[off]
    off += 1
    if header >= 128:
        n = header - 127
        nbytes = (n + 1) // 2
        if off + nbytes > len(data):
            raise ZstdError("zstd: truncated direct Huffman weights")
        weights = []
        for i in range(n):
            b = data[off + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return weights, off + nbytes
    # FSE-compressed weights: header = compressed size
    if off + header > len(data):
        raise ZstdError("zstd: truncated FSE-compressed Huffman weights")
    blob = data[off : off + header]
    freqs, al, dist_end = _fse_read_distribution(blob, 0, 6, 255)
    table = _fse_from_freqs(freqs, al)
    bits = _BackBits(blob[dist_end:])
    s1 = bits.read(al)
    s2 = bits.read(al)
    if bits.pos < 0:
        raise ZstdError("zstd: Huffman weight bitstream too short")
    weights: list[int] = []
    while True:
        weights.append(table.symbols[s1])
        s1 = table.base[s1] + bits.read(table.nbits[s1])
        if bits.pos < 0:
            weights.append(table.symbols[s2])
            break
        weights.append(table.symbols[s2])
        s2 = table.base[s2] + bits.read(table.nbits[s2])
        if bits.pos < 0:
            weights.append(table.symbols[s1])
            break
        if len(weights) > 255:
            raise ZstdError("zstd: more than 255 explicit Huffman weights")
    if len(weights) > 255:
        raise ZstdError("zstd: more than 255 explicit Huffman weights")
    return weights, off + header


def _huf_decode_stream(
    table: _HufTable, data: bytes, n_out: int
) -> bytearray:
    bits = _BackBits(data)
    out = bytearray(n_out)
    symbols = table.symbols
    nbits = table.nbits
    mb = table.max_bits
    for i in range(n_out):
        idx = bits.peek(mb)
        out[i] = symbols[idx]
        bits.skip(nbits[idx])
        if bits.pos < -mb:
            raise ZstdError("zstd: Huffman literal stream exhausted early")
    return out


# ---------------------------------------------------------------------------
# sequences (RFC 4.1.2): code tables + predefined distributions

_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]

# RFC 8878 "Default Distributions"
_LL_DEFAULT = [
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1,
]  # AL 6
_ML_DEFAULT = [
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, -1, -1, -1, -1, -1, -1, -1,
]  # AL 6 — verified state-by-state against the reference decoder
# (probe harness in tests/test_zstd_lite.py extracts base values per
# state from hand-crafted single-sequence frames)
_OF_DEFAULT = [
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, -1, -1, -1, -1, -1,
]  # AL 5

_LL_MAX_AL, _OF_MAX_AL, _ML_MAX_AL = 9, 8, 9
_LL_MAX_SYM, _OF_MAX_SYM, _ML_MAX_SYM = 35, 31, 52

_PREDEFINED = {
    "ll": _fse_from_freqs(_LL_DEFAULT, 6),
    "ml": _fse_from_freqs(_ML_DEFAULT, 6),
    "of": _fse_from_freqs(_OF_DEFAULT, 5),
}


class _RleTable:
    """Degenerate 'table' for RLE mode: one symbol, zero update bits."""

    __slots__ = ("symbols", "nbits", "base", "al")

    def __init__(self, symbol: int):
        self.symbols = [symbol]
        self.nbits = [0]
        self.base = [0]
        self.al = 0


def _read_seq_table(
    data: bytes, off: int, mode: int, kind: str, prev
):
    """One sequence-code table per its 2-bit compression mode
    (RFC 4.1.2.1): 0 predefined, 1 RLE, 2 FSE_Compressed, 3 Repeat."""
    if mode == 0:
        return _PREDEFINED[kind], off
    if mode == 1:
        if off >= len(data):
            raise ZstdError("zstd: truncated RLE sequence table")
        sym = data[off]
        max_sym = {"ll": _LL_MAX_SYM, "of": _OF_MAX_SYM, "ml": _ML_MAX_SYM}[kind]
        if sym > max_sym:
            raise ZstdError(f"zstd: RLE {kind} symbol {sym} out of range")
        return _RleTable(sym), off + 1
    if mode == 2:
        max_al = {"ll": _LL_MAX_AL, "of": _OF_MAX_AL, "ml": _ML_MAX_AL}[kind]
        max_sym = {"ll": _LL_MAX_SYM, "of": _OF_MAX_SYM, "ml": _ML_MAX_SYM}[kind]
        freqs, al, off = _fse_read_distribution(data, off, max_al, max_sym)
        return _fse_from_freqs(freqs, al), off
    if prev is None:
        raise ZstdError(
            f"zstd: {kind} table Repeat mode with no previous table"
        )
    return prev, off


# ---------------------------------------------------------------------------
# frame decoding


class _FrameCtx:
    """Cross-block state within one frame: the treeless-literals
    Huffman table, the repeatable sequence tables, repeat offsets."""

    def __init__(self):
        self.huf: _HufTable | None = None
        self.ll = self.of = self.ml = None
        self.rep = [1, 4, 8]


def _decode_literals(
    data: bytes, off: int, ctx: _FrameCtx
) -> tuple[bytes, int]:
    """Literals section (RFC 4.2): raw / RLE / Compressed / Treeless."""
    if off >= len(data):
        raise ZstdError("zstd: truncated literals section")
    b0 = data[off]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if sf in (0, 2):
            rsize = b0 >> 3
            off += 1
        elif sf == 1:
            if off + 2 > len(data):
                raise ZstdError("zstd: truncated literals size")
            rsize = (b0 >> 4) | (data[off + 1] << 4)
            off += 2
        else:
            if off + 3 > len(data):
                raise ZstdError("zstd: truncated literals size")
            rsize = (b0 >> 4) | (data[off + 1] << 4) | (data[off + 2] << 12)
            off += 3
        if ltype == 0:
            if off + rsize > len(data):
                raise ZstdError("zstd: truncated raw literals")
            return data[off : off + rsize], off + rsize
        if off >= len(data):
            raise ZstdError("zstd: truncated RLE literal byte")
        return bytes([data[off]]) * rsize, off + 1
    # Compressed (2) / Treeless (3)
    if sf == 0:
        streams = 1
        if off + 3 > len(data):
            raise ZstdError("zstd: truncated literals size")
        v = b0 >> 4 | data[off + 1] << 4 | data[off + 2] << 12
        rsize = v & 0x3FF
        csize = v >> 10
        off += 3
    elif sf == 1:
        streams = 4
        if off + 3 > len(data):
            raise ZstdError("zstd: truncated literals size")
        v = b0 >> 4 | data[off + 1] << 4 | data[off + 2] << 12
        rsize = v & 0x3FF
        csize = v >> 10
        off += 3
    elif sf == 2:
        streams = 4
        if off + 4 > len(data):
            raise ZstdError("zstd: truncated literals size")
        v = b0 >> 4 | data[off + 1] << 4 | data[off + 2] << 12 | data[off + 3] << 20
        rsize = v & 0x3FFF
        csize = v >> 14
        off += 4
    else:
        streams = 4
        if off + 5 > len(data):
            raise ZstdError("zstd: truncated literals size")
        v = (
            b0 >> 4
            | data[off + 1] << 4
            | data[off + 2] << 12
            | data[off + 3] << 20
            | data[off + 4] << 28
        )
        rsize = v & 0x3FFFF
        csize = v >> 18
        off += 5
    end = off + csize
    if end > len(data):
        raise ZstdError("zstd: compressed literals overrun the block")
    blob = data[off:end]
    boff = 0
    if ltype == 2:
        weights, w_end = _huf_read_weights(blob, 0)
        ctx.huf = _huf_from_weights(weights)
        boff = w_end
    elif ctx.huf is None:
        raise ZstdError(
            "zstd: treeless literals with no previous Huffman table"
        )
    table = ctx.huf
    if streams == 1:
        out = _huf_decode_stream(table, blob[boff:], rsize)
        return bytes(out), end
    if boff + 6 > len(blob):
        raise ZstdError("zstd: truncated 4-stream jump table")
    s1 = int.from_bytes(blob[boff : boff + 2], "little")
    s2 = int.from_bytes(blob[boff + 2 : boff + 4], "little")
    s3 = int.from_bytes(blob[boff + 4 : boff + 6], "little")
    boff += 6
    sizes = [s1, s2, s3, len(blob) - boff - s1 - s2 - s3]
    if sizes[3] <= 0:
        raise ZstdError("zstd: 4-stream jump table overruns the section")
    per = (rsize + 3) // 4
    outs = []
    for i, sz in enumerate(sizes):
        want = per if i < 3 else rsize - 3 * per
        if want < 0:
            raise ZstdError("zstd: 4-stream regenerated size underflow")
        outs.append(_huf_decode_stream(table, blob[boff : boff + sz], want))
        boff += sz
    return bytes(b"".join(bytes(o) for o in outs)), end


def _decode_block(
    data: bytes, ctx: _FrameCtx, out: bytearray, max_output: int
) -> None:
    """One compressed block (RFC 4.1): literals + sequences executed
    against the output produced so far."""
    lits, off = _decode_literals(data, 0, ctx)
    if off >= len(data):
        raise ZstdError("zstd: truncated sequences section")
    b0 = data[off]
    if b0 == 0:
        n_seq = 0
        off += 1
    elif b0 < 128:
        n_seq = b0
        off += 1
    elif b0 < 255:
        if off + 2 > len(data):
            raise ZstdError("zstd: truncated sequence count")
        n_seq = ((b0 - 128) << 8) | data[off + 1]
        off += 2
    else:
        if off + 3 > len(data):
            raise ZstdError("zstd: truncated sequence count")
        n_seq = int.from_bytes(data[off + 1 : off + 3], "little") + 0x7F00
        off += 3
    if n_seq == 0:
        if len(out) + len(lits) > max_output:
            raise ZstdError("zstd: output exceeds the configured ceiling")
        out.extend(lits)
        return
    if off >= len(data):
        raise ZstdError("zstd: truncated compression modes byte")
    modes = data[off]
    off += 1
    if modes & 3:
        raise ZstdError("zstd: reserved compression-mode bits set")
    ll_t, off = _read_seq_table(data, off, (modes >> 6) & 3, "ll", ctx.ll)
    of_t, off = _read_seq_table(data, off, (modes >> 4) & 3, "of", ctx.of)
    ml_t, off = _read_seq_table(data, off, (modes >> 2) & 3, "ml", ctx.ml)
    ctx.ll, ctx.of, ctx.ml = ll_t, of_t, ml_t
    bits = _BackBits(data[off:])
    ll_s = bits.read(ll_t.al)
    of_s = bits.read(of_t.al)
    ml_s = bits.read(ml_t.al)
    if bits.pos < 0:
        raise ZstdError("zstd: sequence bitstream too short for init states")
    lit_pos = 0
    rep = ctx.rep
    for i in range(n_seq):
        of_code = of_t.symbols[of_s]
        if of_code > 31:
            raise ZstdError("zstd: offset code out of range")
        of_value = (1 << of_code) + bits.read(of_code)
        ml_code = ml_t.symbols[ml_s]
        ml = _ML_BASE[ml_code] + bits.read(_ML_BITS[ml_code])
        ll_code = ll_t.symbols[ll_s]
        ll = _LL_BASE[ll_code] + bits.read(_LL_BITS[ll_code])
        if bits.pos < 0:
            raise ZstdError("zstd: sequence bitstream exhausted mid-sequence")
        # repeat offsets (RFC 3.1.1.5)
        if of_value > 3:
            offset = of_value - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = of_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:  # ll == 0 and of_value == 3: rep1 - 1
                offset = rep[0] - 1
                if offset == 0:
                    raise ZstdError("zstd: repeat offset underflows to zero")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        if lit_pos + ll > len(lits):
            raise ZstdError("zstd: sequence literal run overruns literals")
        if len(out) + ll + ml > max_output:
            raise ZstdError("zstd: output exceeds the configured ceiling")
        out.extend(lits[lit_pos : lit_pos + ll])
        lit_pos += ll
        if offset > len(out):
            raise ZstdError(
                "zstd: match offset references data before the frame "
                "(dictionary or corrupt input)"
            )
        start = len(out) - offset
        if offset >= ml:
            out.extend(out[start : start + ml])
        else:  # overlapping copy: byte-wise semantics
            for j in range(ml):
                out.append(out[start + j])
        if i + 1 < n_seq:  # last sequence skips the state updates
            ll_s = ll_t.base[ll_s] + bits.read(ll_t.nbits[ll_s])
            ml_s = ml_t.base[ml_s] + bits.read(ml_t.nbits[ml_s])
            of_s = of_t.base[of_s] + bits.read(of_t.nbits[of_s])
            if bits.pos < 0:
                raise ZstdError("zstd: sequence bitstream exhausted early")
    if len(out) + len(lits) - lit_pos > max_output:
        raise ZstdError("zstd: output exceeds the configured ceiling")
    out.extend(lits[lit_pos:])  # last literals (RFC 3.1.1.4)


def frame_content_size(data: bytes) -> int | None:
    """The frame header's declared decompressed size, or None when the
    header omits it (RFC 3.1.1.1) — used to hand pyarrow's C decoder
    its required ``decompressed_size`` without decoding anything.
    Skippable frames before the data frame are skipped."""
    pos = 0
    while True:
        if pos + 4 > len(data):
            return None
        magic = int.from_bytes(data[pos : pos + 4], "little")
        if (magic & 0xFFFFFFF0) == SKIPPABLE_LO:
            if pos + 8 > len(data):
                return None
            pos += 8 + int.from_bytes(data[pos + 4 : pos + 8], "little")
            continue
        if magic != MAGIC:
            return None
        pos += 4
        break
    if pos >= len(data):
        return None
    fhd = data[pos]
    pos += 1
    single = bool(fhd & 0x20)
    fcs_size = (1 if single else 0, 2, 4, 8)[fhd >> 6]
    if fcs_size == 0:
        return None
    if not single:
        pos += 1  # window descriptor
    pos += (0, 1, 2, 4)[fhd & 3]  # dictionary id
    if pos + fcs_size > len(data):
        return None
    size = int.from_bytes(data[pos : pos + fcs_size], "little")
    if fcs_size == 2:
        size += 256
    return size


def decompress(data: bytes, max_output: int = _MAX_OUTPUT_DEFAULT) -> bytes:
    """Decompress one zstd frame (skippable frames before it are
    skipped). Refuses dictionaries, oversized windows/claims, and any
    malformed structure — loudly, by reason."""
    pos = 0
    while True:
        if pos + 4 > len(data):
            raise ZstdError("zstd: truncated frame magic")
        magic = int.from_bytes(data[pos : pos + 4], "little")
        if (magic & 0xFFFFFFF0) == SKIPPABLE_LO:
            if pos + 8 > len(data):
                raise ZstdError("zstd: truncated skippable frame")
            sz = int.from_bytes(data[pos + 4 : pos + 8], "little")
            pos += 8 + sz
            continue
        if magic != MAGIC:
            raise ZstdError(f"zstd: bad frame magic 0x{magic:08x}")
        pos += 4
        break
    if pos >= len(data):
        raise ZstdError("zstd: truncated frame header")
    fhd = data[pos]
    pos += 1
    if fhd & 0x08:
        raise ZstdError("zstd: reserved frame-header bit set")
    single = bool(fhd & 0x20)
    checksum = bool(fhd & 0x04)
    did_size = (0, 1, 2, 4)[fhd & 3]
    fcs_flag = fhd >> 6
    fcs_size = (1 if single else 0, 2, 4, 8)[fcs_flag]
    window = None
    if not single:
        if pos >= len(data):
            raise ZstdError("zstd: truncated window descriptor")
        wd = data[pos]
        pos += 1
        exp = (wd >> 3) + 10
        mant = wd & 7
        window = (1 << exp) + ((1 << exp) >> 3) * mant
        if window > _MAX_WINDOW:
            raise ZstdError(
                f"zstd: window size {window} exceeds the {_MAX_WINDOW} cap"
            )
    if did_size:
        did = int.from_bytes(data[pos : pos + did_size], "little")
        pos += did_size
        if did:
            raise ZstdError(
                f"zstd: frame requires dictionary {did} — dictionaries "
                "are not supported here"
            )
    content_size = None
    if fcs_size:
        if pos + fcs_size > len(data):
            raise ZstdError("zstd: truncated frame content size")
        content_size = int.from_bytes(data[pos : pos + fcs_size], "little")
        if fcs_size == 2:
            content_size += 256
        pos += fcs_size
        if content_size > max_output:
            raise ZstdError(
                f"zstd: frame claims {content_size} bytes "
                f"(cap {max_output}) — refusing a bomb"
            )
    out = bytearray()
    ctx = _FrameCtx()
    while True:
        if pos + 3 > len(data):
            raise ZstdError("zstd: truncated block header")
        bh = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 3:
            raise ZstdError("zstd: reserved block type")
        if btype == 1:  # RLE: bsize = regenerated size, 1 byte follows
            if pos >= len(data):
                raise ZstdError("zstd: truncated RLE block")
            if len(out) + bsize > max_output:
                raise ZstdError("zstd: output exceeds the configured ceiling")
            out.extend(bytes([data[pos]]) * bsize)
            pos += 1
        else:
            if pos + bsize > len(data):
                raise ZstdError("zstd: block overruns the frame")
            blob = data[pos : pos + bsize]
            pos += bsize
            if btype == 0:
                if len(out) + bsize > max_output:
                    raise ZstdError(
                        "zstd: output exceeds the configured ceiling"
                    )
                out.extend(blob)
            else:
                _decode_block(blob, ctx, out, max_output)
        if last:
            break
    if checksum:
        if pos + 4 > len(data):
            raise ZstdError("zstd: truncated content checksum")
        from sclera_spark.sources.bloom import xxh64_bytes

        want = int.from_bytes(data[pos : pos + 4], "little")
        got = xxh64_bytes(bytes(out), seed=0) & 0xFFFFFFFF
        if got != want:
            raise ZstdError("zstd: content checksum mismatch (corrupt frame)")
    if content_size is not None and len(out) != content_size:
        raise ZstdError(
            f"zstd: frame decoded to {len(out)} bytes but its header "
            f"claims {content_size}"
        )
    return bytes(out)

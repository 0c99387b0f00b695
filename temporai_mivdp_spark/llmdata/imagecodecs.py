"""Pure stdlib+numpy decoders for baseline JPEG and GIF.

Closes the last stubbed pixel paths in ``multimodal``: this container has
no PIL/opencv, but both formats are decodable from the public specs with
nothing beyond ``struct``/``numpy`` — baseline (sequential DCT, Huffman)
JPEG per ITU-T T.81 and GIF87a/89a per the GIF spec (LZW with variable
code width). Progressive/arithmetic/12-bit JPEG and animated-GIF frames
beyond the first still raise ``NotImplementedError`` — honestly, as
before; baseline JPEG + first-frame GIF covers the overwhelming share of
web-corpus images.

Decode cost is Python-per-MCU for the Huffman pass (the entropy decode
is inherently serial per scan) with numpy doing dequantize/IDCT/color
per block batch — fine for the Arrow-batched ``mapInPandas`` stage these
feed (decode parallelism comes from Spark partitions, not from within
one image). A 100 TB media sweep should still prefer the header-only
``image_dims`` unless it truly needs pixels.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["jpeg_pixels", "gif_pixels"]


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, ITU-T T.81)
# ---------------------------------------------------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.intp,
)

#: 8x8 IDCT basis: pixel[x] = sum_u C(u)/2 * coef[u] * cos((2x+1)u pi/16)
_IDCT_1D = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for u in range(8)
        ]
        for x in range(8)
    ]
)


def _idct2(block: np.ndarray) -> np.ndarray:
    """2-D type-III DCT of one (or a batch of) 8x8 coefficient block(s):
    separable — two matrix multiplies against the precomputed basis."""
    return _IDCT_1D @ block @ _IDCT_1D.T


class _HuffTable:
    """Canonical JPEG Huffman table as a (code -> value) dict keyed by
    (length, code) — decode walks bit by bit, which is plenty for the
    batch sizes this feeds and has zero table-build cost tricks to get
    wrong."""

    def __init__(self, counts: list[int], symbols: bytes) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lookup[(ln, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, handling the
    0xFF00 byte stuffing and stopping at restart/other markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: caller resyncs
                raise _RestartMarker()
            else:
                raise NotImplementedError(f"unexpected marker 0xFF{nxt:02x} in scan")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Skip to just past the next restart marker (DRI resync)."""
        self.bitbuf = 0
        self.nbits = 0
        while True:
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1

    def decode_huff(self, table: _HuffTable) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.lookup.get((ln, code))
            if v is not None:
                return v
        raise NotImplementedError("invalid Huffman code in JPEG scan")


class _RestartMarker(Exception):
    pass


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map a t-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_pixels(b: bytes) -> np.ndarray:
    """Decode a baseline JFIF/JPEG payload to an (h, w, 3) RGB uint8
    array. Supports 8-bit sequential DCT (SOF0/SOF1), 1 or 3
    components, any sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...),
    restart intervals. Progressive (SOF2) and arithmetic coding raise
    ``NotImplementedError``."""
    if b[:3] != b"\xff\xd8\xff":
        raise NotImplementedError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (seg_len,) = struct.unpack_from(">H", b, i + 2)
        seg = b[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables need extended JPEG")
                tbl = np.zeros(64)
                tbl[_ZIGZAG] = np.frombuffer(seg, np.uint8, 64, p + 1)
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                table = _HuffTable(counts, seg[p + 17 : p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline / ext sequential
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG decodes here")
            comps = []
            for c in range(nc):
                cid, sampling, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "hs": sampling >> 4, "vs": sampling & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG needs a codec lib")
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise NotImplementedError(f"JPEG SOF{marker - 0xC0} not baseline")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise NotImplementedError("JPEG SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel[cs] = (tables >> 4, tables & 0xF)
            return _decode_scan(
                b, i + 2 + seg_len, frame, qt, huff_dc, huff_ac, scan_sel,
                restart_interval,
            )
        i += 2 + seg_len
    raise NotImplementedError("JPEG truncated before SOS")


def _decode_scan(
    b, pos, frame, qt, huff_dc, huff_ac, scan_sel, restart_interval
) -> np.ndarray:
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["vs"] * 8, mcux * c["hs"] * 8)) for c in comps
    ]
    pred = [0] * len(comps)
    reader = _BitReader(b, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_to_marker()
                pred = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    dct, act = scan_sel[c["id"]]
                    for by in range(c["vs"]):
                        for bx in range(c["hs"]):
                            coef = np.zeros(64)
                            t = reader.decode_huff(huff_dc[dct])
                            diff = _extend(reader.read_bits(t), t)
                            pred[ci] += diff
                            coef[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = reader.decode_huff(huff_ac[act])
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r == 15:  # ZRL
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                coef[_ZIGZAG[k]] = _extend(reader.read_bits(s), s)
                                k += 1
                            block = _idct2(coef.reshape(8, 8) * qt[c["tq"]]) + 128.0
                            y0 = (my * c["vs"] + by) * 8
                            x0 = (mx * c["hs"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            except _RestartMarker:
                raise NotImplementedError("restart marker landed mid-MCU")
            mcu_count += 1
    # upsample each plane to full resolution (nearest), crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    return np.clip(np.stack([r, g, bl], axis=2), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# GIF (87a/89a, first frame)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """GIF-variant LZW: variable code width from min+1 up to 12 bits,
    CLEAR resets the table, codes are packed LSB-first."""
    clear = 1 << min_code_size
    end = clear + 1
    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return end
        v = 0
        for k in range(width):
            byte = data[(bitpos + k) >> 3]
            v |= ((byte >> ((bitpos + k) & 7)) & 1) << k
        bitpos += width
        return v

    out: list[int] = []
    table: list[list[int]] = []

    def reset() -> int:
        nonlocal table
        table = [[i] for i in range(clear)] + [[], []]
        return min_code_size + 1

    width = reset()
    prev: list[int] | None = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code == clear:
            width = reset()
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]
        else:
            raise NotImplementedError("corrupt GIF LZW stream")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:n_pixels]


def gif_pixels(b: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/89a payload to (h, w, 3) RGB
    uint8 (transparency flattened onto the palette color; interlaced
    rows reordered). Later animation frames are out of scope — a media
    pipeline samples frames via ``frame_sample_plan`` anyway."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, np.uint8, 3 * n, i).reshape(n, 3)
        i += 3 * n
    while i < len(b):
        block = b[i]
        if block == 0x21:  # extension: skip sub-blocks
            i += 2
            while b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif block == 0x2C:  # image descriptor
            _left, _top, iw, ih, iflags = struct.unpack_from("<HHHHB", b, i + 1)
            i += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(b, np.uint8, 3 * n, i).reshape(n, 3)
                i += 3 * n
            if pal is None:
                raise NotImplementedError("GIF image with no color table")
            min_code = b[i]
            i += 1
            data = bytearray()
            while b[i] != 0:
                ln = b[i]
                data += b[i + 1 : i + 1 + ln]
                i += 1 + ln
            idx = _lzw_decode(bytes(data), min_code, iw * ih)
            arr = np.array(idx, dtype=np.intp).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: 4-pass row order
                rows = (
                    list(range(0, ih, 8))
                    + list(range(4, ih, 8))
                    + list(range(2, ih, 4))
                    + list(range(1, ih, 2))
                )
                out = np.empty_like(arr)
                out[rows] = arr
                arr = out
            return pal[arr]
        elif block == 0x3B:  # trailer
            break
        else:
            raise NotImplementedError(f"unknown GIF block 0x{block:02x}")
    raise NotImplementedError("GIF contained no image data")

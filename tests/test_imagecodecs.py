"""Baseline-JPEG and GIF decoders vs INDEPENDENT test-side encoders.

The encoders here are written from the specs (T.81 / GIF89a) without
looking at the decoder's internals — forward DCT vs inverse, LZW
compressor vs decompressor, canonical Huffman builder vs bit-walk
reader — so a round-trip passing means the decoder truly inverts the
format, not that two copies of the same bug agree.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np
import pytest

from temporai_mivdp_spark.llmdata.imagecodecs import gif_pixels, jpeg_pixels

# ---------------------------------------------------------------------------
# test-side JPEG encoder (baseline, canonical-Huffman-from-frequencies)
# ---------------------------------------------------------------------------

_QL = np.array(  # T.81 Annex K luminance table
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99]
).reshape(8, 8)
_QC = np.array(  # Annex K chrominance table
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32
).reshape(8, 8)

_ZZ = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.intp,
)

_DCT = np.array(
    [[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
      * np.cos((2 * x + 1) * u * np.pi / 16.0) for x in range(8)]
     for u in range(8)]
)  # forward: coef = _DCT @ px @ _DCT.T


def _canonical_huffman(freqs: dict[int, int]):
    """(counts[16], symbols, code_map) — plain heapq Huffman, lengths
    converted to canonical codes ordered by (length, symbol)."""
    if len(freqs) == 1:
        sym = next(iter(freqs))
        counts = [0] * 16
        counts[0] = 1
        return counts, bytes([sym]), {sym: (1, 0)}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for s in freqs}
    while len(heap) > 1:
        fa, _, aa = heapq.heappop(heap)
        fb, _, bb = heapq.heappop(heap)
        for s in aa + bb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, len(depth) + len(heap), aa + bb))
    assert max(depth.values()) <= 16, "test image too complex for naive huffman"
    order = sorted(freqs, key=lambda s: (depth[s], s))
    counts = [0] * 16
    code_map = {}
    code = 0
    prev_len = depth[order[0]]
    for s in order:
        code <<= depth[s] - prev_len
        prev_len = depth[s]
        code_map[s] = (depth[s], code)
        counts[depth[s] - 1] += 1
        code += 1
    return counts, bytes(order), code_map


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length: int, value: int) -> None:
        for k in reversed(range(length)):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def _mag(v: int) -> tuple[int, int]:
    t = int(v != 0 and int(abs(v)).bit_length())
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _encode_blocks(plane: np.ndarray, q: np.ndarray, grid: tuple[int, int],
                   center: float = 128.0):
    """-> list of zigzagged quantized coefficient arrays per 8x8 block,
    padded out to the (block_rows, block_cols) MCU-aligned grid."""
    h, w = plane.shape
    ph, pw = grid[0] * 8, grid[1] * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = []
    for y in range(0, ph, 8):
        for x in range(0, pw, 8):
            coef = _DCT @ (padded[y : y + 8, x : x + 8] - center) @ _DCT.T
            # zigzag stream order: element k is natural index _ZZ[k]
            blocks.append(np.round(coef / q).astype(int).reshape(64)[_ZZ])
    return blocks, ph // 8, pw // 8


def jpeg_bytes(rgb: np.ndarray, subsample: bool = False,
               precision: int = 8, qtables=None) -> bytes:
    """Baseline/extended JFIF encoder: 3-component YCbCr, 4:4:4 or
    (subsample) 4:2:0, per-image canonical Huffman tables. precision=12
    writes an EXTENDED (T.81 SOF0, P=12) stream: input samples span
    [0, 4095], level shift 2048, Annex-K quant tables x16 emitted as
    Pq=1 16-bit DQT entries."""
    center = float(1 << (precision - 1))
    qscale = 1 << (precision - 8)
    rgb = rgb.astype(np.float64)
    # qtables: explicit (luma, chroma) override, used VERBATIM (no
    # precision scaling) — the exact-battery hook

    h, w = rgb.shape[:2]
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + center
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + center
    if subsample:
        ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
        cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        hs = vs = 2
    else:
        hs = vs = 1
    comps = [(1, hs, vs, 0, y), (2, 1, 1, 1, cb), (3, 1, 1, 1, cr)]

    # MCU-interleaved symbol stream (two passes: collect freqs, then emit)
    mcux = -(-w // (8 * hs))
    mcuy = -(-h // (8 * vs))

    planes = {}
    if qtables is not None:
        qs = {0: np.asarray(qtables[0], float), 1: np.asarray(qtables[1], float)}
    else:
        qs = {0: _QL * qscale, 1: _QC * qscale}
    for cid, chs, cvs, tq, plane in comps:
        blocks, by, bx = _encode_blocks(
            plane, qs[tq], (mcuy * cvs, mcux * chs), center
        )
        planes[cid] = (blocks, by, bx)

    def mcu_stream():
        pred = {cid: 0 for cid, *_ in comps}
        for my in range(mcuy):
            for mx in range(mcux):
                for cid, chs, cvs, tq, _ in comps:
                    blocks, by, bx = planes[cid]
                    for v in range(cvs):
                        for u in range(chs):
                            yy, xx = my * cvs + v, mx * chs + u
                            blk = blocks[yy * bx + xx]
                            dc = int(blk[0])
                            diff = dc - pred[cid]
                            pred[cid] = dc
                            yield cid, "dc", diff
                            run = 0
                            for k in range(1, 64):
                                val = int(blk[k])
                                if val == 0:
                                    run += 1
                                    continue
                                while run > 15:
                                    yield cid, "ac", (15, 0)  # ZRL
                                    run -= 16
                                yield cid, "ac", (run, val)
                                run = 0
                            if run:
                                yield cid, "ac", (0, 0)  # EOB

    dcf = {0: {}, 1: {}}
    acf = {0: {}, 1: {}}
    table_of = {1: 0, 2: 1, 3: 1}
    for cid, kind, payload in mcu_stream():
        t = table_of[cid]
        if kind == "dc":
            s, _ = _mag(payload)
            dcf[t][s] = dcf[t].get(s, 0) + 1
        else:
            r, val = payload
            s, _ = _mag(val)
            sym = (r << 4) | s
            acf[t][sym] = acf[t].get(sym, 0) + 1
    hd = {t: _canonical_huffman(f) for t, f in dcf.items() if f}
    ha = {t: _canonical_huffman(f) for t, f in acf.items() if f}

    bw = _BitWriter()
    for cid, kind, payload in mcu_stream():
        t = table_of[cid]
        if kind == "dc":
            s, bits = _mag(payload)
            ln, code = hd[t][2][s]
            bw.write(ln, code)
            if s:
                bw.write(s, bits)
        else:
            r, val = payload
            s, bits = _mag(val)
            ln, code = ha[t][2][(r << 4) | s]
            bw.write(ln, code)
            if s:
                bw.write(s, bits)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    pq = 1 if max(int(q.max()) for q in qs.values()) > 255 else 0
    for tq, q in sorted(qs.items()):
        # DQT stores the table in zigzag order (Pq=1 -> 16-bit entries)
        vals = [int(q.reshape(64)[_ZZ[k]]) for k in range(64)]
        body = bytes([(pq << 4) | tq]) + (
            b"".join(struct.pack(">H", v) for v in vals) if pq else bytes(vals)
        )
        out += seg(0xDB, body)
    sof = struct.pack(">BHHB", precision, h, w, 3)
    for cid, chs, cvs, tq, _ in comps:
        sof += bytes([cid, (chs << 4) | cvs, tq])
    out += seg(0xC0, sof)
    for t, (counts, syms, _) in hd.items():
        out += seg(0xC4, bytes([0x00 | t]) + bytes(counts) + syms)
    for t, (counts, syms, _) in ha.items():
        out += seg(0xC4, bytes([0x10 | t]) + bytes(counts) + syms)
    sos = bytes([3])
    for cid, *_ in comps:
        t = table_of[cid]
        sos += bytes([cid, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# test-side PROGRESSIVE JPEG encoder (spectral selection + successive
# approximation, T.81 G.1.2 — the encode-side EOB-run / correction-bit
# algorithm, written from the spec independently of the decoder)
# ---------------------------------------------------------------------------


def _plan_planes(rgb: np.ndarray, subsample: bool, precision: int = 8):
    """Shared color/downsample/block stage -> per-component quantized
    zigzag blocks on the MCU-padded grid + geometry."""
    center = float(1 << (precision - 1))
    qscale = 1 << (precision - 8)
    rgb = rgb.astype(np.float64)
    # qtables: explicit (luma, chroma) override, used VERBATIM (no
    # precision scaling) — the exact-battery hook

    h, w = rgb.shape[:2]
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + center
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + center
    if subsample:
        ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
        cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        hs = vs = 2
    else:
        hs = vs = 1
    comps = [(1, hs, vs, 0, y), (2, 1, 1, 1, cb), (3, 1, 1, 1, cr)]
    mcux = -(-w // (8 * hs))
    mcuy = -(-h // (8 * vs))
    planes = {}
    for cid, chs, cvs, tq, plane in comps:
        q = (_QL if tq == 0 else _QC) * qscale
        blocks, by, bx = _encode_blocks(plane, q, (mcuy * cvs, mcux * chs), center)
        planes[cid] = (blocks, by, bx)
    return comps, planes, mcux, mcuy, h, w


class _ScanOps:
    """Symbol/bit op recorder: pass 1 counts Huffman freqs, pass 2 emits
    with the canonical tables built from pass 1."""

    def __init__(self):
        self.ops: list[tuple] = []

    def huff(self, tid: int, sym: int) -> None:
        self.ops.append(("h", tid, sym))

    def bits(self, n: int, v: int) -> None:
        if n:
            self.ops.append(("b", n, v))

    def freqs(self) -> dict[int, dict[int, int]]:
        out: dict[int, dict[int, int]] = {}
        for op in self.ops:
            if op[0] == "h":
                out.setdefault(op[1], {})[op[2]] = out.setdefault(op[1], {}).get(op[2], 0) + 1
        return out

    def emit(self, tables: dict[int, dict[int, tuple[int, int]]]) -> bytes:
        bw = _BitWriter()
        for op in self.ops:
            if op[0] == "h":
                ln, code = tables[op[1]][op[2]]
                bw.write(ln, code)
            else:
                bw.write(op[1], op[2])
        return bw.flush()


def _dc_first_ops(comps, planes, mcux, mcuy, al, table_of):
    ops = _ScanOps()
    pred = {cid: 0 for cid, *_ in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, chs, cvs, _tq, _ in comps:
                blocks, _by, bx = planes[cid]
                for v in range(cvs):
                    for u in range(chs):
                        blk = blocks[(my * cvs + v) * bx + (mx * chs + u)]
                        dcv = int(blk[0]) >> al  # point transform: arith shift
                        diff = dcv - pred[cid]
                        pred[cid] = dcv
                        s, mag = _mag(diff)
                        ops.huff(table_of[cid], s)
                        ops.bits(s, mag)
    return ops


def _dc_refine_ops(comps, planes, mcux, mcuy, al):
    ops = _ScanOps()
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, chs, cvs, _tq, _ in comps:
                blocks, _by, bx = planes[cid]
                for v in range(cvs):
                    for u in range(chs):
                        blk = blocks[(my * cvs + v) * bx + (mx * chs + u)]
                        ops.bits(1, (int(blk[0]) >> al) & 1)
    return ops


def _nonint_blocks(planes, cid, chs, cvs, mcux, mcuy, h, w, hmax, vmax):
    """The component's non-interleaved block grid (ceil(size/8)), a
    row-major sub-grid of the MCU-padded block list."""
    blocks, _by, bx = planes[cid]
    ch = -(-h * cvs // vmax)
    cw = -(-w * chs // hmax)
    nby, nbx = -(-ch // 8), -(-cw // 8)
    return [blocks[yy * bx + xx] for yy in range(nby) for xx in range(nbx)]


def _ac_first_ops(blk_list, ss, se, al, tid=0):
    ops = _ScanOps()
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            ops.huff(tid, n << 4)
            ops.bits(n, eobrun - (1 << n))
            eobrun = 0

    for blk in blk_list:
        vals = []
        for k in range(ss, se + 1):
            v = int(blk[k])
            m = abs(v) >> al
            vals.append(m if v >= 0 else -m)
        if not any(vals):
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        last_nz = max(i for i, v in enumerate(vals) if v)
        flush()
        run = 0
        for i, v in enumerate(vals[: last_nz + 1]):
            if v == 0:
                run += 1
                continue
            while run > 15:
                ops.huff(tid, 0xF0)  # ZRL
                run -= 16
            s, mag = _mag(v)
            ops.huff(tid, (run << 4) | s)
            ops.bits(s, mag)
            run = 0
        if last_nz < se - ss:
            eobrun += 1
    flush()
    return ops


def _ac_refine_ops(blk_list, ss, se, al, tid=0):
    """libjpeg-shaped encode_mcu_AC_refine: ZRL folding, correction-bit
    buffering, deferred EOB runs."""
    ops = _ScanOps()
    eobrun = 0
    be: list[int] = []  # correction bits deferred with the pending EOB run

    def flush():
        nonlocal eobrun, be
        if eobrun:
            n = eobrun.bit_length() - 1
            ops.huff(tid, n << 4)
            ops.bits(n, eobrun - (1 << n))
            for bit in be:
                ops.bits(1, bit)
            eobrun = 0
            be = []

    for blk in blk_list:
        temps = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        eob = max((i for i, t in enumerate(temps) if t == 1), default=-1)
        r = 0
        br: list[int] = []
        for i, t in enumerate(temps):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                flush()
                ops.huff(tid, 0xF0)
                r -= 16
                for bit in br:
                    ops.bits(1, bit)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            flush()
            ops.huff(tid, (r << 4) | 1)
            ops.bits(1, 1 if int(blk[ss + i]) > 0 else 0)
            for bit in br:
                ops.bits(1, bit)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF:
                flush()
    flush()
    return ops


def jpeg_progressive_bytes(rgb: np.ndarray, subsample: bool = False,
                           precision: int = 8) -> bytes:
    """Progressive JFIF encoder with a full successive-approximation scan
    script: DC first (Al=1) -> AC first per component/band (Al=1) ->
    DC refine -> AC refine per component/band. Per-scan canonical
    Huffman tables, redefined before each scan."""
    comps, planes, mcux, mcuy, h, w = _plan_planes(rgb, subsample, precision)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    table_of = {1: 0, 2: 1, 3: 1}

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    qscale = 1 << (precision - 8)
    pq = 1 if qscale > 1 else 0
    for tq, q in ((0, _QL * qscale), (1, _QC * qscale)):
        vals = [int(q.reshape(64)[_ZZ[k]]) for k in range(64)]
        body = bytes([(pq << 4) | tq]) + (
            b"".join(struct.pack(">H", v) for v in vals) if pq else bytes(vals)
        )
        out += seg(0xDB, body)
    sof = struct.pack(">BHHB", precision, h, w, 3)
    for cid, chs, cvs, tq, _ in comps:
        sof += bytes([cid, (chs << 4) | cvs, tq])
    out += seg(0xC2, sof)  # SOF2: progressive

    def ac_blocks(cid):
        chs, cvs = next((c[1], c[2]) for c in comps if c[0] == cid)
        return _nonint_blocks(planes, cid, chs, cvs, mcux, mcuy, h, w, hmax, vmax)

    # scan script: (ops, scan_comps, ss, se, ah, al, huff_class or None)
    script = [
        (_dc_first_ops(comps, planes, mcux, mcuy, 1, table_of),
         [(1, 0), (2, 1), (3, 1)], 0, 0, 0, 1, 0x00),
        (_ac_first_ops(ac_blocks(1), 1, 5, 1), [(1, 0)], 1, 5, 0, 1, 0x10),
        (_ac_first_ops(ac_blocks(1), 6, 63, 1), [(1, 0)], 6, 63, 0, 1, 0x10),
        (_ac_first_ops(ac_blocks(2), 1, 63, 1), [(2, 0)], 1, 63, 0, 1, 0x10),
        (_ac_first_ops(ac_blocks(3), 1, 63, 1), [(3, 0)], 1, 63, 0, 1, 0x10),
        (_dc_refine_ops(comps, planes, mcux, mcuy, 0),
         [(1, 0), (2, 1), (3, 1)], 0, 0, 1, 0, None),
        (_ac_refine_ops(ac_blocks(1), 1, 5, 0), [(1, 0)], 1, 5, 1, 0, 0x10),
        (_ac_refine_ops(ac_blocks(1), 6, 63, 0), [(1, 0)], 6, 63, 1, 0, 0x10),
        (_ac_refine_ops(ac_blocks(2), 1, 63, 0), [(2, 0)], 1, 63, 1, 0, 0x10),
        (_ac_refine_ops(ac_blocks(3), 1, 63, 0), [(3, 0)], 1, 63, 1, 0, 0x10),
    ]
    for ops, scan_comps, ss, se, ah, al, huff_class in script:
        tables: dict[int, dict[int, tuple[int, int]]] = {}
        if huff_class is not None:
            for tid, fr in ops.freqs().items():
                counts, syms, code_map = _canonical_huffman(fr)
                out += seg(0xC4, bytes([huff_class | tid]) + bytes(counts) + syms)
                tables[tid] = code_map
        sos = bytes([len(scan_comps)])
        for cid, tid in scan_comps:
            sos += bytes([cid, (tid << 4) | tid])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        out += ops.emit(tables)
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# test-side GIF encoder (LZW compressor)
# ---------------------------------------------------------------------------


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[tuple[int, int]] = []  # (width, code)
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out_bits.append((width, clear))
    cur: tuple[int, ...] = ()
    for px in indices:
        cand = cur + (px,)
        if cand in table:
            cur = cand
            continue
        out_bits.append((width, table[cur]))
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            out_bits.append((width, clear))
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = (px,)
    if cur:
        out_bits.append((width, table[cur]))
    out_bits.append((width, end))
    # pack LSB-first
    buf = bytearray()
    acc = 0
    n = 0
    for w_, code in out_bits:
        acc |= code << n
        n += w_
        while n >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        buf.append(acc & 0xFF)
    return bytes(buf)


def gif_bytes(indices: np.ndarray, palette: np.ndarray, interlace: bool = False) -> bytes:
    h, w = indices.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size_field = max(bits, 1)
    pal_n = 1 << size_field
    pal = np.zeros((pal_n, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_field - 1), 0, 0)
    out += pal.tobytes()
    rows = np.arange(h)
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        px = indices[order]
    else:
        px = indices[rows]
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    min_code = max(2, bits)
    out.append(min_code)
    data = _lzw_encode([int(v) for v in px.reshape(-1)], min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _smooth_rgb(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 128 + 80 * np.sin(xx / 7 + seed) * np.cos(yy / 9)
    g = 128 + 60 * np.cos(xx / 5) * np.sin(yy / 6 + seed)
    b = 128 + 90 * np.sin((xx + yy) / 11)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_444():
    img = _smooth_rgb(24, 21)
    got = jpeg_pixels(jpeg_bytes(img))
    assert got.shape == img.shape
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 4.0 and err.max() < 40


def test_jpeg_roundtrip_420_subsampled():
    img = _smooth_rgb(26, 19, seed=2)
    got = jpeg_pixels(jpeg_bytes(img, subsample=True))
    assert got.shape == img.shape
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 8.0


def test_jpeg_rejects_lossless_arith12_and_truncated():
    """Both arithmetic DCT modes (SOF9/SOF10) decode for real since
    round 8 (tests/test_jpeg_arithmetic.py) and 12-bit Huffman since
    round 9; lossless-arithmetic (SOF11), 12-bit ARITHMETIC, and odd
    precisions are the remaining honest rejections."""
    img = _smooth_rgb(16, 16)
    payload = bytearray(jpeg_bytes(img))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xCB  # rewrite SOF0 -> SOF11 (arithmetic lossless)
    with pytest.raises(NotImplementedError, match="SOF11"):
        jpeg_pixels(bytes(payload))
    payload[sof + 1] = 0xC9  # SOF9 (sequential arithmetic) at 12-bit
    payload[sof + 4] = 12
    with pytest.raises(NotImplementedError, match="12-bit arithmetic"):
        jpeg_pixels(bytes(payload))
    payload[sof + 1] = 0xC0
    payload[sof + 4] = 10  # precision neither 8 nor 12
    with pytest.raises(NotImplementedError, match="8-bit"):
        jpeg_pixels(bytes(payload))
    with pytest.raises(NotImplementedError):
        jpeg_pixels(b"\xff\xd8\xff\xe0only-a-header")


# -- 12-bit extended precision (round 9) ------------------------------------
#
# The x16-TWIN differential is bit-exact BY CONSTRUCTION: scaling every
# sample and quant entry by 2^4 is exact in binary floating point (pure
# exponent shifts through the linear DCT/IDCT, the level shift, and the
# final /16), so the 12-bit decode of (img * 16) must equal the 8-bit
# decode of img on every pixel — any deviation is a 12-bit-path bug
# (DQT Pq=1 parse, SOF precision routing, level shift, output scaling).


def test_jpeg_12bit_twin_matches_8bit_exactly_444_and_420():
    for seed, subsample in ((3, False), (4, True)):
        img = _smooth_rgb(24, 21, seed=seed)
        img12 = img.astype(np.uint16) * 16
        got12 = jpeg_pixels(jpeg_bytes(img12, subsample=subsample, precision=12))
        got8 = jpeg_pixels(jpeg_bytes(img, subsample=subsample))
        assert got12.dtype == np.uint8 and got12.shape == got8.shape
        assert np.array_equal(got12, got8), f"seed={seed} sub={subsample}"


def test_jpeg_12bit_progressive_twin_matches_8bit_exactly():
    img = _smooth_rgb(26, 19, seed=5)
    img12 = img.astype(np.uint16) * 16
    got12 = jpeg_pixels(jpeg_progressive_bytes(img12, precision=12))
    got8 = jpeg_pixels(jpeg_progressive_bytes(img))
    assert np.array_equal(got12, got8)


def test_jpeg_12bit_constant_tiles_decode_exactly():
    """True 12-bit dynamic range under unit quant tables: 8x8-constant
    gray tiles at values ≡ 8 (mod 16) across [8, 4088] — DC-only blocks
    whose coefficients quantize exactly, with inter-tile DC diffs up to
    category 12+ (beyond baseline's 11), decoded to exactly v >> 4."""
    vals = [8, 264, 1032, 2056, 3080, 4088, 8, 4088]  # extremes adjacent
    tiles = np.zeros((8, 8 * len(vals), 3), np.uint16)
    for i, v in enumerate(vals):
        tiles[:, 8 * i : 8 * (i + 1), :] = v
    ones = np.ones((8, 8))
    got = jpeg_pixels(jpeg_bytes(tiles, precision=12, qtables=(ones, ones)))
    want = np.zeros_like(got)
    for i, v in enumerate(vals):
        want[:, 8 * i : 8 * (i + 1), :] = v >> 4
    assert np.array_equal(got, want)


# -- lossless JPEG (SOF3, T.81 Annex H) — round 9 ----------------------------
#
# Test-side encoder written independently from H.1-H.2: per-sample
# prediction (same start-of-scan / first-line / first-column rules the
# spec mandates for every predictor), differences mod 2^16 mapped to
# DC-style magnitude categories (SSSS=16 <=> a difference of exactly
# 32768), per-image canonical Huffman, restart markers between
# row-aligned intervals. Lossless means round-trip assertions are
# EXACT — no tolerance anywhere.


def _lossless_predict(gray, y, x, pred_sel, default, fresh, one_d_row):
    if fresh:
        return default
    if y == one_d_row:  # rest of a scan-start/restart line: 1-D (Ra)
        return int(gray[y, x - 1])
    if x == 0:
        return int(gray[y - 1, 0])
    a, b, c = int(gray[y, x - 1]), int(gray[y - 1, x]), int(gray[y - 1, x - 1])
    return (
        a if pred_sel == 1 else
        b if pred_sel == 2 else
        c if pred_sel == 3 else
        a + b - c if pred_sel == 4 else
        a + ((b - c) >> 1) if pred_sel == 5 else
        b + ((a - c) >> 1) if pred_sel == 6 else
        (a + b) >> 1
    )


def jpeg_lossless_bytes(gray: np.ndarray, precision: int, predictor: int = 1,
                        pt: int = 0, restart_rows: int = 0) -> bytes:
    """Annex-H lossless encoder: ``gray`` holds the POST-point-transform
    samples, each in [0, 2^(precision-pt))."""
    h, w = gray.shape
    default = 1 << (precision - pt - 1)
    restart_interval = restart_rows * w if restart_rows else 0

    segments: list[list[tuple[int, int, int]]] = [[]]  # (cat, nbits, bits)
    fresh, count, one_d_row = True, 0, 0
    for y in range(h):
        for x in range(w):
            if restart_interval and count and count % restart_interval == 0:
                segments.append([])
                fresh = True
            v = int(gray[y, x])
            px = _lossless_predict(
                gray, y, x, predictor, default, fresh, one_d_row
            )
            if fresh:
                one_d_row = y
            fresh = False
            d = (v - px) & 0xFFFF
            s = d - 65536 if d >= 32768 else d
            if s == -32768:
                segments[-1].append((16, 0, 0))
            else:
                cat, bits = _mag(s)
                segments[-1].append((cat, cat, bits))
            count += 1

    freqs: dict[int, int] = {}
    for segm in segments:
        for cat, _, _ in segm:
            freqs[cat] = freqs.get(cat, 0) + 1
    counts, syms, code_map = _canonical_huffman(freqs)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xC4, bytes([0x00]) + bytes(counts) + syms)
    sof = struct.pack(">BHHB", precision, h, w, 1) + bytes([1, 0x11, 0])
    out += seg(0xC3, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([1, 1, 0x00, predictor, 0, pt]))
    for si, segm in enumerate(segments):
        bw = _BitWriter()
        for cat, nbits, bits in segm:
            ln, code = code_map[cat]
            bw.write(ln, code)
            if nbits:
                bw.write(nbits, bits)
        out += bw.flush()
        if si < len(segments) - 1:
            out += bytes([0xFF, 0xD0 + (si % 8)])
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_lossless_rgb_bytes(img: np.ndarray, precision: int, predictor: int = 1,
                            pt: int = 0, restart_rows: int = 0) -> bytes:
    """Annex-H INTERLEAVED 3-component lossless encoder (the DICOM RGB
    shape): one sample per component per MCU at 1:1 sampling, each
    plane predicted independently. Component 1 uses DC table 0 and
    components 2/3 use DC table 1, so a table-routing bug in the
    decoder can't hide. ``img`` is (h, w, 3) post-point-transform."""
    h, w, _ = img.shape
    default = 1 << (precision - pt - 1)
    restart_interval = restart_rows * w if restart_rows else 0

    # (comp_index, cat, nbits, bits) op stream, split at restarts
    segments: list[list[tuple[int, int, int, int]]] = [[]]
    fresh, count, one_d_row = True, 0, 0
    for y in range(h):
        for x in range(w):
            if restart_interval and count and count % restart_interval == 0:
                segments.append([])
                fresh = True
            for ci in range(3):
                plane = img[:, :, ci]
                v = int(plane[y, x])
                px = _lossless_predict(
                    plane, y, x, predictor, default, fresh, one_d_row
                )
                d = (v - px) & 0xFFFF
                s = d - 65536 if d >= 32768 else d
                if s == -32768:
                    segments[-1].append((ci, 16, 0, 0))
                else:
                    cat, bits = _mag(s)
                    segments[-1].append((ci, cat, cat, bits))
            if fresh:
                one_d_row = y
                fresh = False
            count += 1

    freqs: dict[int, dict[int, int]] = {0: {}, 1: {}}
    for segm in segments:
        for ci, cat, _, _ in segm:
            tid = 0 if ci == 0 else 1
            freqs[tid][cat] = freqs[tid].get(cat, 0) + 1
    tables = {tid: _canonical_huffman(freqs[tid]) for tid in (0, 1)}

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tid in (0, 1):
        counts, syms, _ = tables[tid]
        out += seg(0xC4, bytes([tid]) + bytes(counts) + syms)
    sof = struct.pack(">BHHB", precision, h, w, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    out += seg(0xC3, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(
        0xDA,
        bytes([3, 1, 0x00, 2, 0x10, 3, 0x10, predictor, 0, pt]),
    )
    for si, segm in enumerate(segments):
        bw = _BitWriter()
        for ci, cat, nbits, bits in segm:
            _, _, code_map = tables[0 if ci == 0 else 1]
            ln, code = code_map[cat]
            bw.write(ln, code)
            if nbits:
                bw.write(nbits, bits)
        out += bw.flush()
        if si < len(segments) - 1:
            out += bytes([0xFF, 0xD0 + (si % 8)])
    out += b"\xff\xd9"
    return bytes(out)


def _lossless_expected(gray: np.ndarray, precision: int, pt: int) -> np.ndarray:
    full = (gray.astype(np.int64) << pt)
    out = full >> (precision - 8) if precision >= 8 else full << (8 - precision)
    return np.repeat(out.astype(np.uint8)[:, :, None], 3, axis=2)


def test_jpeg_lossless_all_predictors_exact():
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 1 << 12, size=(9, 13), dtype=np.int64)
    for predictor in range(1, 8):
        got = jpeg_pixels(jpeg_lossless_bytes(gray, 12, predictor))
        assert np.array_equal(got, _lossless_expected(gray, 12, 0)), predictor


def test_jpeg_lossless_precisions_point_transform_and_restarts():
    rng = np.random.default_rng(8)
    for precision in (8, 12, 16):
        gray = rng.integers(0, 1 << precision, size=(6, 11), dtype=np.int64)
        got = jpeg_pixels(jpeg_lossless_bytes(gray, precision, 4))
        assert np.array_equal(got, _lossless_expected(gray, precision, 0))
    # point transform: samples span 2^(P-Pt); decoder shifts back up
    gray = rng.integers(0, 1 << 10, size=(5, 7), dtype=np.int64)
    got = jpeg_pixels(jpeg_lossless_bytes(gray, 12, 5, pt=2))
    assert np.array_equal(got, _lossless_expected(gray, 12, 2))
    # restart markers every 2 rows reset prediction on both sides
    gray = rng.integers(0, 1 << 12, size=(8, 9), dtype=np.int64)
    got = jpeg_pixels(jpeg_lossless_bytes(gray, 12, 7, restart_rows=2))
    assert np.array_equal(got, _lossless_expected(gray, 12, 0))


def test_jpeg_lossless_stray_restart_degrades_not_crashes():
    """A stray RSTn byte pair inside a lossless scan must surface as
    NotImplementedError (the malformed-payload class decode_image's
    crawl mode catches), never escape as an internal exception."""
    gray = np.arange(35, dtype=np.int64).reshape(5, 7) * 100
    payload = bytearray(jpeg_lossless_bytes(gray, 12, 4))
    sos = payload.find(b"\xff\xda")
    payload[sos + 10 : sos + 10] = b"\xff\xd3"  # inject RST3 mid-scan
    with pytest.raises(NotImplementedError):
        jpeg_pixels(bytes(payload))


def test_jpeg_lossless_category16_and_rejections():
    # first sample 0 at P=16: diff = (0 - 32768) mod 2^16 = 32768 -> SSSS=16
    gray = np.zeros((2, 3), np.int64)
    gray[1, 2] = 65535
    got = jpeg_pixels(jpeg_lossless_bytes(gray, 16, 1))
    assert np.array_equal(got, _lossless_expected(gray, 16, 0))

    payload = bytearray(jpeg_lossless_bytes(gray, 16, 1))
    sos = payload.find(b"\xff\xda")
    # SOS layout: FF DA len(2) ns cs tables Ss Se AhAl
    payload[sos + 7] = 0  # predictor selector (Ss) 0 is invalid
    with pytest.raises(NotImplementedError, match="predictor"):
        jpeg_pixels(bytes(payload))
    payload[sos + 7] = 1
    payload[sos + 5] = 9  # component selector matches nothing
    with pytest.raises(NotImplementedError, match="unknown component"):
        jpeg_pixels(bytes(payload))


# -- multi-component lossless (interleaved SOF3, round 10) --------------------


def _rgb_ramp(h, w, seed=0):
    """Distinct per-channel content so a plane-order or table-routing
    bug cannot cancel out."""
    rng = np.random.default_rng(seed)
    base = np.arange(h * w, dtype=np.int64).reshape(h, w)
    return np.stack(
        [(base * 7 + 13) % 256, (base * 3 + 101) % 256,
         rng.integers(0, 256, (h, w), np.int64)],
        axis=2,
    )


def test_jpeg_lossless_rgb_all_predictors_exact():
    img = _rgb_ramp(6, 9, seed=11)
    for predictor in range(1, 8):
        got = jpeg_pixels(jpeg_lossless_rgb_bytes(img, 8, predictor))
        assert got.shape == (6, 9, 3)
        assert np.array_equal(got, img.astype(np.uint8)), predictor


def test_jpeg_lossless_rgb_precision_pt_and_restarts():
    img = _rgb_ramp(5, 8, seed=3) * 16  # 12-bit range
    got = jpeg_pixels(jpeg_lossless_rgb_bytes(img, 12, 4))
    assert np.array_equal(got, (img >> 4).astype(np.uint8))
    # point transform: samples are post-Pt, reconstruction shifts back
    img2 = _rgb_ramp(5, 8, seed=4) * 4  # 10-bit post-Pt at P=12, Pt=2
    got = jpeg_pixels(jpeg_lossless_rgb_bytes(img2, 12, 5, pt=2))
    assert np.array_equal(got, ((img2 << 2) >> 4).astype(np.uint8))
    # restart interval mid-image: per-MCU resync, H.2.1 line rule
    img3 = _rgb_ramp(7, 6, seed=5)
    got = jpeg_pixels(jpeg_lossless_rgb_bytes(img3, 8, 7, restart_rows=2))
    assert np.array_equal(got, img3.astype(np.uint8))


def test_jpeg_lossless_rgb_rejections():
    img = _rgb_ramp(4, 4, seed=1)
    payload = bytearray(jpeg_lossless_rgb_bytes(img, 8, 1))
    sof = payload.find(b"\xff\xc3")
    payload[sof + 11] = 0x21  # subsample component 1 -> reject
    with pytest.raises(NotImplementedError, match="subsampled"):
        jpeg_pixels(bytes(payload))
    payload[sof + 11] = 0x11
    payload[sof + 9] = 2  # 2-component lossless stays rejected
    with pytest.raises(NotImplementedError, match="1 or 3 components"):
        jpeg_pixels(bytes(payload))


def test_jpeg_progressive_matches_baseline_exactly_444():
    """Progressive and baseline encode the SAME quantized coefficients;
    the full successive-approximation scan script is lossless, so both
    decodes must reconstruct identical pixels."""
    img = _smooth_rgb(24, 21)
    prog = jpeg_pixels(jpeg_progressive_bytes(img))
    base = jpeg_pixels(jpeg_bytes(img))
    assert prog.shape == base.shape == img.shape
    assert np.array_equal(prog, base)


def test_jpeg_progressive_matches_baseline_exactly_420():
    img = _smooth_rgb(26, 19, seed=2)
    prog = jpeg_pixels(jpeg_progressive_bytes(img, subsample=True))
    base = jpeg_pixels(jpeg_bytes(img, subsample=True))
    assert np.array_equal(prog, base)


def test_jpeg_progressive_eobrun_zrl_and_refinement_paths():
    """Adversarial content for the progressive entropy coder: large flat
    regions (multi-block EOB runs), salted high-frequency noise (ZRL +
    dense refinement correction bits), odd dimensions (partial MCUs)."""
    rng = np.random.RandomState(3)
    img = np.full((47, 35, 3), 90, np.uint8)
    img[5:13, 4:30] = 230                        # hard edge: wide spectra
    noise = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    img[28:44, 12:28] = noise                    # dense AC activity
    prog = jpeg_pixels(jpeg_progressive_bytes(img))
    base = jpeg_pixels(jpeg_bytes(img))
    assert np.array_equal(prog, base)
    # and the decode is a faithful image, not just self-consistent
    err = np.abs(prog[:20, :, :].astype(int) - img[:20, :, :].astype(int))
    assert err.mean() < 12.0


def test_gif_roundtrip_exact():
    rng = np.random.RandomState(7)
    palette = rng.randint(0, 256, (13, 3)).astype(np.uint8)
    idx = rng.randint(0, 13, (40, 50))
    got = gif_pixels(gif_bytes(idx, palette))
    assert np.array_equal(got, palette[idx])


def test_gif_roundtrip_interlaced_and_width_growth():
    rng = np.random.RandomState(11)
    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = rng.randint(0, 4, (64, 61))  # 4-color: min code 2, many width bumps
    got = gif_pixels(gif_bytes(idx, palette, interlace=True))
    assert np.array_equal(got, palette[idx])


def test_gif_rejects_garbage():
    with pytest.raises(NotImplementedError, match="not a GIF"):
        gif_pixels(b"NOPE")


def test_decode_image_real_jpeg_and_gif_through_spark(spark):
    """The mapInPandas decode stage now covers JPEG and GIF with
    fake=False — the formats the round-3 verdict listed as the last
    stubbed pixel paths."""
    from temporai_mivdp_spark.llmdata import multimodal

    img = _smooth_rgb(16, 16, seed=5)
    palette = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    gif_idx = (np.indices((8, 8)).sum(axis=0) % 2)
    rows = [
        (1, jpeg_bytes(img), "image/jpeg", 16, 16, None),
        (2, gif_bytes(gif_idx, palette), "image/gif", 8, 8, None),
        (3, jpeg_progressive_bytes(img), "image/jpeg", 16, 16, None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = {
        r.media_id: [float(x) for x in r.features.split(",")]
        for r in multimodal.decode_image(media, fake=False).collect()
    }
    assert feats[1][:2] == [16.0, 16.0]
    assert feats[2][:2] == [8.0, 8.0]
    # progressive JPEG reconstructs the identical coefficients -> the
    # identical features as its baseline encoding of the same image
    assert feats[3] == feats[1]
    # gif mean channel values: half palette[0], half palette[1]
    assert feats[2][2] == pytest.approx(105.0)  # (10+200)/2
    assert feats[2][3] == pytest.approx(60.0)
    assert feats[2][4] == pytest.approx(40.0)
    # jpeg channel means near the source means (lossy)
    src_means = img.reshape(-1, 3).mean(axis=0)
    for k in range(3):
        assert abs(feats[1][2 + k] - src_means[k]) < 5.0


# ---------------------------------------------------------------------------
# animated GIF: test-side encoder + composition roundtrips
# ---------------------------------------------------------------------------


def gif_anim_bytes(screen, gct, frames, bg=0):
    """Encode an animated GIF89a: ``frames`` is a list of dicts with
    keys indices (2-D array), left, top, delay_cs, disposal,
    transparent (index or None), pal (local palette or None)."""
    sw, sh = screen
    bits = max(1, (len(gct) - 1).bit_length())
    pal_n = 1 << bits
    pal = np.zeros((pal_n, 3), dtype=np.uint8)
    pal[: len(gct)] = gct
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (bits - 1), bg, 0)
    out += pal.tobytes()
    for f in frames:
        idx = np.asarray(f["indices"])
        ih, iw = idx.shape
        tr = f.get("transparent")
        out += struct.pack(
            "<BBBBHBB",
            0x21, 0xF9, 4,
            (f.get("disposal", 0) << 2) | (1 if tr is not None else 0),
            f.get("delay_cs", 0),
            tr if tr is not None else 0,
            0,
        )
        lpal = f.get("pal")
        iflags = 0
        if lpal is not None:
            lbits = max(1, (len(lpal) - 1).bit_length())
            iflags = 0x80 | (lbits - 1)
        out += struct.pack(
            "<BHHHHB", 0x2C, f.get("left", 0), f.get("top", 0), iw, ih, iflags
        )
        if lpal is not None:
            lp = np.zeros((1 << lbits, 3), dtype=np.uint8)
            lp[: len(lpal)] = lpal
            out += lp.tobytes()
        code_bits = lbits if lpal is not None else bits
        min_code = max(2, code_bits)
        out.append(min_code)
        data = _lzw_encode([int(v) for v in idx.reshape(-1)], min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_frames_delays_and_fullframe_roundtrip():
    from temporai_mivdp_spark.llmdata.imagecodecs import gif_frames

    gct = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    f0 = np.zeros((4, 5), int)          # all red
    f1 = np.ones((4, 5), int)           # all green
    b = gif_anim_bytes(
        (5, 4), gct,
        [
            {"indices": f0, "delay_cs": 10},
            {"indices": f1, "delay_cs": 25},
        ],
    )
    frames = gif_frames(b)
    assert [d for d, _ in frames] == [100, 250]
    assert (frames[0][1] == gct[f0]).all()
    assert (frames[1][1] == gct[f1]).all()


def test_gif_frames_transparency_and_subrect():
    """A sub-rect frame with a transparent index leaves the underlying
    canvas visible through the holes."""
    from temporai_mivdp_spark.llmdata.imagecodecs import gif_frames

    gct = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]], np.uint8)
    base = np.full((6, 6), 1, int)       # all color 1
    # 2x3 patch at (left=2, top=1): color 2 except a transparent hole
    patch = np.array([[2, 3, 2], [3, 2, 3]])
    b = gif_anim_bytes(
        (6, 6), gct,
        [
            {"indices": base, "delay_cs": 5},
            {"indices": patch, "left": 2, "top": 1, "delay_cs": 5,
             "transparent": 3},
        ],
    )
    frames = gif_frames(b)
    assert len(frames) == 2
    expect = gct[base].copy()
    m = patch != 3
    expect[1:3, 2:5][m] = gct[patch][m]
    assert (frames[1][1] == expect).all()


def test_gif_frames_disposal_background_and_previous():
    """Disposal 2 clears the frame rect to background before the next
    frame; disposal 3 restores the pre-frame canvas."""
    from temporai_mivdp_spark.llmdata.imagecodecs import gif_frames

    gct = np.array([[7, 7, 7], [250, 0, 0], [0, 250, 0], [0, 0, 250]], np.uint8)
    base = np.full((4, 4), 1, int)
    spot = np.full((2, 2), 2, int)
    tail = np.full((1, 1), 3, int)
    b = gif_anim_bytes(
        (4, 4), gct,
        [
            {"indices": base, "delay_cs": 1},
            # disposal 2: after showing, its rect reverts to bg (idx 0)
            {"indices": spot, "left": 1, "top": 1, "delay_cs": 1, "disposal": 2},
            # disposal 3: after showing, canvas reverts to pre-frame
            {"indices": tail, "left": 0, "top": 0, "delay_cs": 1, "disposal": 3},
            # final frame paints nothing new over (3,3)
            {"indices": tail, "left": 3, "top": 3, "delay_cs": 1},
        ],
        bg=0,
    )
    frames = gif_frames(b)
    c0, c1, c2, c3 = [f[1] for f in frames]
    assert (c0 == gct[base]).all()
    # frame 1 shows the spot over base
    e1 = gct[base].copy(); e1[1:3, 1:3] = gct[2]
    assert (c1 == e1).all()
    # frame 2: spot rect reverted to BACKGROUND, tail painted at (0,0)
    e2 = gct[base].copy(); e2[1:3, 1:3] = gct[0]; e2[0, 0] = gct[3]
    assert (c2 == e2).all()
    # frame 3: disposal 3 undid the tail; only bg-reverted rect + new (3,3)
    e3 = gct[base].copy(); e3[1:3, 1:3] = gct[0]; e3[3, 3] = gct[3]
    assert (c3 == e3).all()


def test_gif_frames_local_palette_and_first_frame_matches_still():
    from temporai_mivdp_spark.llmdata.imagecodecs import gif_frames, gif_pixels

    gct = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    lpal = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9], [10, 11, 12]], np.uint8)
    f0 = np.array([[0, 1], [1, 0]])
    f1 = np.array([[3, 2], [1, 0]])
    b = gif_anim_bytes(
        (2, 2), gct,
        [
            {"indices": f0, "delay_cs": 2},
            {"indices": f1, "delay_cs": 2, "pal": lpal},
        ],
    )
    frames = gif_frames(b)
    assert (frames[0][1] == gct[f0]).all()
    assert (frames[1][1] == lpal[f1]).all()
    # the still decoder sees the same first frame
    assert (gif_pixels(b) == gct[f0]).all()


def test_gif_frames_out_of_bounds_rect_clips():
    """Malformed-but-real GIFs place frame rects past the logical
    screen; the visible part must paint and the rest clip, not crash."""
    from temporai_mivdp_spark.llmdata.imagecodecs import gif_frames

    gct = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [9, 9, 9]], np.uint8)
    base = np.full((4, 4), 1, int)
    # 3x3 patch at (3, 3): only its top-left pixel is on the 4x4 screen
    patch = np.full((3, 3), 2, int)
    b = gif_anim_bytes(
        (4, 4), gct,
        [
            {"indices": base, "delay_cs": 1},
            {"indices": patch, "left": 3, "top": 3, "delay_cs": 1},
        ],
    )
    frames = gif_frames(b)
    expect = gct[base].copy()
    expect[3, 3] = gct[2]
    assert (frames[1][1] == expect).all()

"""CCITT Group 3 / Group 4 TIFF decode — differential battery.

The decoder (multimodal._ccitt_decode + the _tiff_pixels bilevel branch)
is pinned against the independent T.4/T.6 ENCODER below — written from
the encoding direction of the public ITU-T specs, with its own table
transcription — over randomized rasters, hand-checked spec byte
vectors, multi-strip containers, both photometrics, and hostile
payloads. Same playbook as the FLAC / ADPCM / lossless-JPEG decoders
(reference repo: no media handling at all — this is the
training-data-pipeline tier; scanned-document corpora are
overwhelmingly G3/G4 fax TIFFs).
"""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from temporai_mivdp_spark.llmdata import multimodal as mm


# ---------------------------------------------------------------------------
# independent encoder-side tables (own transcription of T.4 tables 1-3)
# ---------------------------------------------------------------------------

WHITE_TERM = [
    "00110101", "000111", "0111", "1000", "1011", "1100", "1110", "1111",
    "10011", "10100", "00111", "01000", "001000", "000011", "110100",
    "110101", "101010", "101011", "0100111", "0001100", "0001000",
    "0010111", "0000011", "0000100", "0101000", "0101011", "0010011",
    "0100100", "0011000", "00000010", "00000011", "00011010", "00011011",
    "00010010", "00010011", "00010100", "00010101", "00010110", "00010111",
    "00101000", "00101001", "00101010", "00101011", "00101100", "00101101",
    "00000100", "00000101", "00001010", "00001011", "01010010", "01010011",
    "01010100", "01010101", "00100100", "00100101", "01011000", "01011001",
    "01011010", "01011011", "01001010", "01001011", "00110010", "00110011",
    "00110100",
]
WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}
BLACK_TERM = [
    "0000110111", "010", "11", "10", "011", "0011", "0010", "00011",
    "000101", "000100", "0000100", "0000101", "0000111", "00000100",
    "00000111", "000011000", "0000010111", "0000011000", "0000001000",
    "00001100111", "00001101000", "00001101100", "00000110111",
    "00000101000", "00000010111", "00000011000", "000011001010",
    "000011001011", "000011001100", "000011001101", "000001101000",
    "000001101001", "000001101010", "000001101011", "000011010010",
    "000011010011", "000011010100", "000011010101", "000011010110",
    "000011010111", "000001101100", "000001101101", "000011011010",
    "000011011011", "000001010100", "000001010101", "000001010110",
    "000001010111", "000001100100", "000001100101", "000001010010",
    "000001010011", "000000100100", "000000110111", "000000111000",
    "000000100111", "000000101000", "000001011000", "000001011001",
    "000000101011", "000000101100", "000001011010", "000001100110",
    "000001100111",
]
BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}
MODES = {
    "P": "0001", "H": "001", "V0": "1", "VR1": "011", "VR2": "000011",
    "VR3": "0000011", "VL1": "010", "VL2": "000010", "VL3": "0000010",
}
EOL = "000000000001"


class BitWriter:
    def __init__(self) -> None:
        self.bits: list[str] = []

    def put(self, s: str) -> None:
        self.bits.append(s)

    def align(self) -> None:
        n = len("".join(self.bits)) % 8
        if n:
            self.bits.append("0" * (8 - n))

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def encode_run(bw: BitWriter, run: int, white: bool) -> None:
    makeup = WHITE_MAKEUP if white else BLACK_MAKEUP
    while run > 2623:
        bw.put(EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        m = (run // 64) * 64
        bw.put(EXT_MAKEUP[m] if m >= 1792 else makeup[m])
        run -= m
    bw.put((WHITE_TERM if white else BLACK_TERM)[run])


def row_runs(row: np.ndarray) -> list[int]:
    """Alternating white-first run lengths of a 0/1 row."""
    runs, cur, n = [], 0, 0
    for v in row:
        if int(v) == cur:
            n += 1
        else:
            runs.append(n)
            cur, n = int(v), 1
    runs.append(n)
    return runs


def encode_1d_row(bw: BitWriter, row: np.ndarray) -> None:
    white = True
    for run in row_runs(row):
        encode_run(bw, run, white)
        white = not white


def transitions(row: np.ndarray) -> list[int]:
    t, cur = [], 0
    for x, v in enumerate(row):
        if int(v) != cur:
            t.append(x)
            cur = int(v)
    return t


def encode_2d_row(bw: BitWriter, row: np.ndarray, ref: list[int], w: int) -> None:
    """T.4-2D / T.6 coding of one row against reference transitions."""
    cur = transitions(row)
    a0, white, ci = -1, True, 0
    while a0 < w:
        a1 = cur[ci] if ci < len(cur) else w
        a2 = cur[ci + 1] if ci + 1 < len(cur) else w
        ri = 0
        while ri < len(ref) and (ref[ri] <= a0 or (ri & 1) != (0 if white else 1)):
            ri += 1
        b1 = ref[ri] if ri < len(ref) else w
        b2 = ref[ri + 1] if ri + 1 < len(ref) else w
        if b2 < a1:
            bw.put(MODES["P"])
            a0 = b2
        elif abs(a1 - b1) <= 3:
            d = a1 - b1
            bw.put(MODES[{0: "V0", 1: "VR1", 2: "VR2", 3: "VR3",
                          -1: "VL1", -2: "VL2", -3: "VL3"}[d]])
            a0, white, ci = a1, not white, ci + 1
        else:
            start = a0 if a0 >= 0 else 0
            bw.put(MODES["H"])
            encode_run(bw, a1 - start, white)
            encode_run(bw, a2 - a1, not white)
            a0, ci = a2, ci + 2


def encode_g4(img: np.ndarray) -> bytes:
    h, w = img.shape
    bw = BitWriter()
    ref: list[int] = []
    for y in range(h):
        encode_2d_row(bw, img[y], ref, w)
        ref = transitions(img[y])
    bw.put(EOL + EOL)  # EOFB
    return bw.tobytes()


def encode_mh(img: np.ndarray) -> bytes:
    """TIFF compression 2: byte-aligned MH rows, no EOLs."""
    bw = BitWriter()
    for y in range(img.shape[0]):
        if y:
            bw.align()
        encode_1d_row(bw, img[y])
    return bw.tobytes()


def encode_g3(img: np.ndarray, two_d: bool) -> bytes:
    """TIFF compression 3: EOL before each row; with two_d, EOL+tag bit
    and 2D coding for every row after the first (K = h)."""
    h, w = img.shape
    bw = BitWriter()
    ref: list[int] = []
    for y in range(h):
        bw.put(EOL)
        if two_d:
            bw.put("1" if y == 0 else "0")
        if two_d and y > 0:
            encode_2d_row(bw, img[y], ref, w)
        else:
            encode_1d_row(bw, img[y])
        ref = transitions(img[y])
    return bw.tobytes()


def tiff_bilevel(
    img: np.ndarray, comp: int, photo: int = 0, rps: int | None = None,
    t4opts: int | None = None, endian: str = "<",
) -> bytes:
    """Minimal bilevel TIFF container around per-strip CCITT payloads.
    ``img`` values: 1 = black pel (photometric-0 sense)."""
    h, w = img.shape
    rps = rps or h
    strips = []
    for y0 in range(0, h, rps):
        part = img[y0 : y0 + rps]
        if comp == 1:
            strips.append(np.packbits(part, axis=1).tobytes())
        elif comp == 2:
            strips.append(encode_mh(part))
        elif comp == 3:
            strips.append(encode_g3(part, two_d=bool((t4opts or 0) & 1)))
        else:
            strips.append(encode_g4(part))
    tags = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [1]), (259, 3, [comp]),
        (262, 3, [photo]), (277, 3, [1]), (278, 4, [rps]),
    ]
    if comp == 3:
        tags.append((292, 4, [t4opts or 0]))
    return _tiff_container(tags, strips, endian)


def _tiff_container(tags, strips, endian="<", extra_blobs=None) -> bytes:
    """Generic little/big-endian single-IFD TIFF builder: lays out the
    IFD, value areas, strip offset/count arrays, and strip data."""
    e = endian
    magic = b"II*\x00" if e == "<" else b"MM\x00*"
    n_strips = len(strips)
    all_tags = dict((t[0], (t[1], t[2])) for t in tags)
    all_tags[273] = (4, [0] * n_strips)  # patched below
    all_tags[279] = (4, [len(s) for s in strips])
    if extra_blobs:
        for tag, typ, blob in extra_blobs:
            all_tags[tag] = (typ, list(blob))
    order = sorted(all_tags)
    n = len(order)
    sizes = {1: 1, 3: 2, 4: 4, 7: 1}
    fmts = {1: "B", 3: "H", 4: "I", 7: "B"}
    ifd_off = 8
    va = ifd_off + 2 + 12 * n + 4
    # first pass: assign value-area offsets
    va_map, va_cur = {}, va
    for tag in order:
        typ, vals = all_tags[tag]
        total = sizes[typ] * len(vals)
        if total > 4:
            va_map[tag] = va_cur
            va_cur += total + (total % 2)
    data_off = va_cur
    strip_offs = []
    for s in strips:
        strip_offs.append(data_off)
        data_off += len(s)
    all_tags[273] = (4, strip_offs)
    if 513 in all_tags:  # old-style JPEG: point at the first blob
        all_tags[513] = (4, [strip_offs[0]])
        all_tags[514] = (4, [len(strips[0])])
    out = bytearray(magic) + struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", n)
    for tag in order:
        typ, vals = all_tags[tag]
        total = sizes[typ] * len(vals)
        out += struct.pack(e + "HHI", tag, typ, len(vals))
        if total > 4:
            out += struct.pack(e + "I", va_map[tag])
        else:
            packed = struct.pack(e + str(len(vals)) + fmts[typ], *vals)
            out += packed + b"\x00" * (4 - len(packed))
    out += struct.pack(e + "I", 0)
    for tag in order:
        typ, vals = all_tags[tag]
        total = sizes[typ] * len(vals)
        if total > 4:
            out += struct.pack(e + str(len(vals)) + fmts[typ], *vals)
            if total % 2:
                out += b"\x00"
    for s in strips:
        out += s
    return bytes(out)


def random_raster(rng: random.Random, w: int, h: int) -> np.ndarray:
    """Run-structured random bilevel raster (fax-like: bursty runs, not
    iid noise — exercises makeups, passes, and long verticals)."""
    img = np.zeros((h, w), np.uint8)
    for y in range(h):
        x, color = 0, rng.random() < 0.3
        while x < w:
            run = min(w - x, max(1, int(rng.expovariate(1 / 9.0)) + 1))
            if color:
                img[y, x : x + run] = 1
            x += run
            color = not color
        if y and rng.random() < 0.4:
            img[y] = img[y - 1]  # vertical-mode-heavy stretches
    return img


def decode_gray(payload: bytes) -> np.ndarray:
    px = mm._tiff_pixels(payload)
    assert (px[:, :, 0] == px[:, :, 1]).all() and (px[:, :, 0] == px[:, :, 2]).all()
    return px[:, :, 0]


def as_bits_photo0(gray: np.ndarray) -> np.ndarray:
    return (gray == 0).astype(np.uint8)  # photometric 0: black pel = 0 gray


# ---------------------------------------------------------------------------
# round-trip differentials
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("comp,t4opts", [(1, 0), (2, 0), (3, 0), (3, 1), (4, 0)])
def test_roundtrip_random_rasters(comp, t4opts):
    rng = random.Random(1000 + comp * 10 + t4opts)
    for trial in range(12):
        w = rng.choice([1, 2, 5, 8, 17, 40, 64, 200, 1728])
        h = rng.choice([1, 2, 3, 9, 16])
        img = random_raster(rng, w, h)
        payload = tiff_bilevel(img, comp, photo=0, t4opts=t4opts)
        got = as_bits_photo0(decode_gray(payload))
        assert got.shape == img.shape, (comp, t4opts, w, h, trial)
        assert (got == img).all(), (comp, t4opts, w, h, trial)


@pytest.mark.parametrize("comp", [2, 3, 4])
def test_roundtrip_edge_rasters(comp):
    for img in [
        np.zeros((3, 11), np.uint8),              # all white
        np.ones((3, 11), np.uint8),               # all black
        np.eye(7, 7, dtype=np.uint8),             # diagonal (vertical modes)
        np.tile(np.array([[0, 1]], np.uint8), (4, 32)),  # 1px alternation
        np.ones((2, 2700), np.uint8),             # chained-makeup black run
    ]:
        payload = tiff_bilevel(img, comp, photo=0)
        assert (as_bits_photo0(decode_gray(payload)) == img).all(), comp


def test_multi_strip_resets_reference_line():
    """Each CCITT strip codes independently (fresh all-white reference):
    a 2-strip G4 image must equal the 1-strip decode."""
    rng = random.Random(7)
    img = random_raster(rng, 33, 8)
    one = tiff_bilevel(img, 4, rps=8)
    two = tiff_bilevel(img, 4, rps=3)  # strips of 3+3+2 rows
    assert (decode_gray(one) == decode_gray(two)).all()


def test_photometric_inversion_and_uncompressed_parity():
    img = np.eye(5, 9, dtype=np.uint8)
    g0 = decode_gray(tiff_bilevel(img, 4, photo=0))
    g1 = decode_gray(tiff_bilevel(img, 4, photo=1))
    assert ((g0 == 0) == (g1 == 255)).all()
    raw = decode_gray(tiff_bilevel(img, 1, photo=0))
    assert (raw == g0).all()


def test_big_endian_container():
    img = random_raster(random.Random(9), 21, 6)
    payload = tiff_bilevel(img, 4, endian=">")
    assert (as_bits_photo0(decode_gray(payload)) == img).all()


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:

    @settings(
        max_examples=60,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        comp=st.sampled_from([(1, 0), (2, 0), (3, 0), (3, 1), (4, 0)]),
        w=st.integers(1, 90),
        h=st.integers(1, 12),
        runs=st.lists(st.integers(1, 40), min_size=1, max_size=40),
        start_black=st.booleans(),
    )
    def test_roundtrip_property(comp, w, h, runs, start_black):
        """Shrinking property twin of the seeded round-trip battery:
        ANY run-structured raster survives encode→container→decode for
        every compression variant."""
        img = np.zeros((h, w), np.uint8)
        i = 0
        for y in range(h):
            x, color = 0, start_black
            while x < w:
                run = min(w - x, runs[i % len(runs)])
                i += 1
                if color:
                    img[y, x : x + run] = 1
                x += run
                color = not color
        c, t4 = comp
        payload = tiff_bilevel(img, c, photo=0, t4opts=t4)
        assert (as_bits_photo0(decode_gray(payload)) == img).all()


# ---------------------------------------------------------------------------
# hand-pinned spec vectors (independent of BOTH table transcriptions)
# ---------------------------------------------------------------------------


def test_mh_spec_bytes_all_white_row():
    """An all-white 1728-wide MH row is makeup-1728 (010011011) +
    white-term-0 (00110101): 01001101 10011010 1 + pad -> 4d 9a 80."""
    img = np.zeros((1, 1728), np.uint8)
    assert encode_mh(img) == bytes([0x4D, 0x9A, 0x80])
    got = mm._ccitt_decode(bytes([0x4D, 0x9A, 0x80]), 1728, 1, 2, 0)
    assert got.sum() == 0


def test_g4_spec_bytes_all_white_row():
    """A G4 all-white row against the imaginary white reference is one
    V0 bit (1). Three rows -> 111 + EOFB + pad."""
    img = np.zeros((3, 64), np.uint8)
    data = encode_g4(img)
    assert data[0] >> 5 == 0b111
    got = mm._ccitt_decode(data, 64, 3, 4, 0)
    assert got.sum() == 0


def test_black_run_spec_code():
    """Black run of 2 is '11'; a row [white 1, black 2, white 5] is
    000111 11 1100 per the published tables -> 0001 1111 1100 -> 1f c0."""
    img = np.array([[0, 1, 1, 0, 0, 0, 0, 0]], np.uint8)
    assert encode_mh(img) == bytes([0x1F, 0xC0])
    got = mm._ccitt_decode(bytes([0x1F, 0xC0]), 8, 1, 2, 0)
    assert (got[0] == img[0]).all()


# ---------------------------------------------------------------------------
# hostile payloads
# ---------------------------------------------------------------------------


def test_truncated_ccitt_stream_raises():
    img = np.ones((4, 64), np.uint8)
    payload = tiff_bilevel(img, 4)
    with pytest.raises(NotImplementedError):
        mm._tiff_pixels(payload[:-6])  # strip bytes cut


def test_run_overflow_raises():
    """An MH row whose runs overflow the declared width must raise, not
    write past the raster."""
    bw = BitWriter()
    encode_run(bw, 64, True)   # makeup 64
    encode_run(bw, 63, True)   # + term 63 = 127 > declared 100... as one run
    data = bw.tobytes()
    with pytest.raises(NotImplementedError):
        mm._ccitt_decode(data, 100, 1, 2, 0)


def test_uncompressed_mode_flag_rejected():
    img = np.zeros((2, 8), np.uint8)
    payload = tiff_bilevel(img, 3, t4opts=0b10)
    with pytest.raises(NotImplementedError):
        mm._tiff_pixels(payload)


def test_garbage_bits_raise():
    with pytest.raises(NotImplementedError):
        mm._ccitt_decode(b"\x00\x00\x00\x00\x00\x00", 16, 1, 2, 0)


def _bit_reversed(data: bytes) -> bytes:
    return bytes(int(f"{v:08b}"[::-1], 2) for v in data)


def test_fill_order_2_bilevel_decodes():
    """FillOrder 2 (LSB-first fax bytes — round 10): the same CCITT
    stream with every byte bit-reversed and tag 266=2 must decode to
    the identical raster."""
    img = random_raster(random.Random(21), 19, 7)
    for comp in (1, 2, 4):
        strip = (
            np.packbits(img, axis=1).tobytes() if comp == 1
            else encode_mh(img) if comp == 2 else encode_g4(img)
        )
        tags = [(256, 4, [19]), (257, 4, [7]), (258, 3, [1]), (259, 3, [comp]),
                (262, 3, [0]), (266, 3, [2]), (277, 3, [1]), (278, 4, [7])]
        payload = _tiff_container(tags, [_bit_reversed(strip)])
        got = as_bits_photo0(decode_gray(payload))
        assert (got == img).all(), comp
        assert mm.media_decode_status(payload) == ("image", "tiff", "full")


def test_fill_order_2_non_bilevel_rejected():
    gray_strip = bytes(range(6))  # 3x2 8-bit gray raster
    tags = [(256, 4, [3]), (257, 4, [2]), (258, 3, [8]), (259, 3, [1]),
            (262, 3, [1]), (266, 3, [2]), (277, 3, [1]), (278, 4, [2])]
    payload = _tiff_container(tags, [gray_strip])
    with pytest.raises(NotImplementedError):
        mm._tiff_pixels(payload)
    assert mm.media_decode_status(payload) == ("image", "tiff", "header_only")


# ---------------------------------------------------------------------------
# classifier + decode_image integration
# ---------------------------------------------------------------------------


def test_decode_status_full_for_ccitt():
    img = random_raster(random.Random(3), 24, 5)
    for comp, t4 in [(2, 0), (3, 0), (3, 1), (4, 0)]:
        payload = tiff_bilevel(img, comp, t4opts=t4)
        kind, fmt, status = mm.media_decode_status(payload)
        assert (kind, fmt, status) == ("image", "tiff", "full"), (comp, t4)


def test_decode_status_header_only_for_uncompressed_mode_flag():
    img = np.zeros((2, 8), np.uint8)
    payload = tiff_bilevel(img, 3, t4opts=0b10)
    assert mm.media_decode_status(payload) == ("image", "tiff", "header_only")


# ---------------------------------------------------------------------------
# JPEG-in-TIFF (compression 7) — round 10
# ---------------------------------------------------------------------------


def tiff_jpeg(
    strips: list[bytes], w: int, h: int, rps: int, spp: int,
    photo: int, tables: bytes | None = None, comp: int = 7,
) -> bytes:
    tags = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8] * spp), (259, 3, [comp]),
        (262, 3, [photo]), (277, 3, [spp]), (278, 4, [rps]),
    ]
    blobs = [(347, 7, tables)] if tables else None
    return _tiff_container(tags, strips, extra_blobs=blobs)


def _split_segments(jpg: bytes):
    """[(marker, segment_bytes)] between SOI and SOS; plus the tail from
    SOS onward."""
    segs, i = [], 2
    while i + 4 <= len(jpg):
        assert jpg[i] == 0xFF
        marker = jpg[i + 1]
        seglen = struct.unpack_from(">H", jpg, i + 2)[0]
        seg = jpg[i : i + 2 + seglen]
        if marker == 0xDA:
            return segs, jpg[i:]
        segs.append((marker, seg))
        i += 2 + seglen
    raise AssertionError("no SOS found")


def test_jpeg_in_tiff_photometrics_ycbcr_vs_rgb_stored():
    """Photometric 6 (YCbCr, the JFIF-in-TIFF norm) takes jpeg_pixels'
    own transform and equals the bare decode; photometric 2 means the
    three components ARE R,G,B as stored, so the transform is
    suppressed (review fix: the transform used to be applied to
    photo-2 strips too)."""
    from temporai_mivdp_spark.llmdata.imagecodecs import jpeg_pixels
    from tests.test_imagecodecs import _smooth_rgb, jpeg_bytes

    rgb = _smooth_rgb(13, 17, seed=4)
    jpg = jpeg_bytes(rgb)
    ycc = tiff_jpeg([jpg], 17, 13, 13, 3, 6)
    assert (mm._tiff_pixels(ycc) == jpeg_pixels(jpg)).all()
    assert mm.media_decode_status(ycc) == ("image", "tiff", "full")
    raw = tiff_jpeg([jpg], 17, 13, 13, 3, 2)
    assert (mm._tiff_pixels(raw) == jpeg_pixels(jpg, raw_rgb=True)).all()
    assert mm.media_decode_status(raw) == ("image", "tiff", "full")
    # the two interpretations genuinely differ on this payload
    assert (mm._tiff_pixels(ycc) != mm._tiff_pixels(raw)).any()
    # bare YCbCr payloads are unaffected by the flag default
    assert (jpeg_pixels(jpg) == jpeg_pixels(jpg, raw_rgb=False)).all()


def test_jpeg_in_tiff_multi_strip_stacks_rows():
    from tests.test_imagecodecs import _smooth_rgb, jpeg_bytes

    rgb = _smooth_rgb(12, 11, seed=8)
    top, bottom = jpeg_bytes(rgb[:6]), jpeg_bytes(rgb[6:])
    payload = tiff_jpeg([top, bottom], 11, 12, 6, 3, 6)
    whole = mm._tiff_pixels(payload)
    from temporai_mivdp_spark.llmdata.imagecodecs import jpeg_pixels

    assert (whole[:6] == jpeg_pixels(top)).all()
    assert (whole[6:] == jpeg_pixels(bottom)[:6]).all()


def test_jpeg_in_tiff_shared_jpegtables():
    """DQT/DHT hoisted into tag 347; the strip stream keeps only
    SOF/SOS. Decode must equal the self-contained stream's."""
    from temporai_mivdp_spark.llmdata.imagecodecs import jpeg_pixels
    from tests.test_imagecodecs import _smooth_rgb, jpeg_bytes

    rgb = _smooth_rgb(9, 14, seed=2)
    jpg = jpeg_bytes(rgb)
    segs, tail = _split_segments(jpg)
    tables = b"".join(s for m, s in segs if m in (0xC4, 0xDB))
    rest = b"".join(s for m, s in segs if m not in (0xC4, 0xDB))
    strip = b"\xff\xd8" + rest + tail
    payload = tiff_jpeg(
        [strip], 14, 9, 9, 3, 6, tables=b"\xff\xd8" + tables + b"\xff\xd9"
    )
    assert (mm._tiff_pixels(payload) == jpeg_pixels(jpg)).all()


def test_ycbcr_lossless_in_tiff_rejected():
    """Review fix (2nd pass): photometric 6 promises a YCbCr transform
    the lossless path cannot provide (it returns stored planes
    verbatim) — the combination must raise AND classify header_only
    instead of silently decoding as RGB-stored."""
    from tests.test_imagecodecs import _rgb_ramp, jpeg_lossless_rgb_bytes

    jpg = jpeg_lossless_rgb_bytes(_rgb_ramp(4, 5, seed=7), 8, 1)
    bad = tiff_jpeg([jpg], 5, 4, 4, 3, 6)
    with pytest.raises(NotImplementedError, match="YCbCr lossless"):
        mm._tiff_pixels(bad)
    assert mm.media_decode_status(bad) == ("image", "tiff", "header_only")
    # the same strip under photometric 2 (RGB-stored) stays decodable
    good = tiff_jpeg([jpg], 5, 4, 4, 3, 2)
    assert mm._tiff_pixels(good) is not None
    assert mm.media_decode_status(good) == ("image", "tiff", "full")


def test_first_sos_walk_stops_at_eoi():
    """Review fix (2nd pass): an EOI before any SOS terminates the
    classifier's SOS walk — trailer bytes after EOI must not be
    misread as a scan header and flip a 3-component SOF3 to 'full'."""
    import struct as s

    sof = s.pack(">BHHB", 8, 4, 4, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    fake_sos_trailer = b"\xff\xda\x00\x08\x03\x01\x00\x02\x10\x03"
    payload = (
        b"\xff\xd8"
        + b"\xff\xc3" + s.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xd9" + fake_sos_trailer
    )
    assert mm.media_decode_status(payload) == ("image", "jpeg", "header_only")


def test_jpeg_in_tiff_lossless_gray_photometrics():
    """A lossless (SOF3) stream inside the TIFF container — the
    composition the round-9 decoder tier makes free — under both
    grayscale photometrics (0 inverts)."""
    from tests.test_imagecodecs import jpeg_lossless_bytes

    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, (6, 10), np.uint16)
    jpg = jpeg_lossless_bytes(gray, 8, predictor=4)
    g1 = mm._tiff_pixels(tiff_jpeg([jpg], 10, 6, 6, 1, 1))
    g0 = mm._tiff_pixels(tiff_jpeg([jpg], 10, 6, 6, 1, 0))
    assert (g1[:, :, 0] == gray.astype(np.uint8)).all()
    assert (g0 == 255 - g1).all()


# ---------------------------------------------------------------------------
# round-10 self-review regressions
# ---------------------------------------------------------------------------


def test_g3_1d_without_eols_decodes():
    """Legacy fax writers emit G3-1D with no EOLs; the head peek (>=11
    leading zeros == EOL) routes both shapes correctly."""
    img = random_raster(random.Random(13), 23, 6)
    bw = BitWriter()
    for y in range(img.shape[0]):
        encode_1d_row(bw, img[y])  # back-to-back, no EOLs, no alignment
    payload = _tiff_container(
        [(256, 4, [23]), (257, 4, [6]), (258, 3, [1]), (259, 3, [3]),
         (262, 3, [0]), (277, 3, [1]), (278, 4, [6]), (292, 4, [0])],
        [bw.tobytes()],
    )
    assert (as_bits_photo0(decode_gray(payload)) == img).all()
    # the EOL form of the same raster still decodes identically
    with_eols = tiff_bilevel(img, 3, photo=0, t4opts=0)
    assert (decode_gray(payload) == decode_gray(with_eols)).all()


def test_g3_2d_without_eols_rejected():
    """No-EOL 2D G3 is unrepresentable (the 1D/2D tag bit only exists
    after an EOL) — must raise, not misparse."""
    img = np.eye(4, 8, dtype=np.uint8)
    bw = BitWriter()
    ref = []
    for y in range(img.shape[0]):
        encode_2d_row(bw, img[y], ref, 8)
        ref = transitions(img[y])
    with pytest.raises(NotImplementedError, match="without EOLs"):
        mm._ccitt_decode(bw.tobytes(), 8, 4, 3, 0b1)


def test_corrupt_g4_pass_then_backward_vertical_raises():
    """Review fix: after a pass mode advances a0 without appending to
    the current row's transitions, a vertical code landing BEHIND a0
    must raise (it used to pass the cur[-1]-only check and return a
    plausible-but-wrong raster)."""
    # reference row: black run [5,10); current row bits: P (a0 -> b2=10)
    # then VL3 against b1=w gives a1 behind a0 when ref has a late
    # transition — craft directly: ref [5,10], codes P then VL1 applied
    # to b1=w(16)... force the backward case with ref transitions [5,10]
    # and w=16: after P, a0=10, white; b1 = next even-parity ref > 10 =
    # w; VL3 -> a1 = 13 > a0 fine. To land behind a0 use ref [2,3]:
    # after P a0=3; b1 = w; VL codes can't go behind w-3=13 > 3. So use
    # a second ref transition pair: ref=[2,3,4,5]: P consumes b2=3;
    # next b1 = 4 (even idx=2), VL3 -> a1 = 1 < a0=3 -> must raise.
    bw = BitWriter()
    # row 1 (1D-as-2D against imaginary white ref): establish ref
    # [2,3,4,5] via H runs: w2,b1,w1,b1, then white to end
    row1 = np.zeros(16, np.uint8)
    row1[2] = 1
    row1[4] = 1
    encode_2d_row(bw, row1, [], 16)
    # row 2: P then VL3 — hand-built corrupt sequence
    bw.put(MODES["P"])
    bw.put(MODES["VL3"])
    # pad with V0s so the stream doesn't just truncate
    bw.put(MODES["V0"] * 10)
    with pytest.raises(NotImplementedError):
        mm._ccitt_decode(bw.tobytes(), 16, 2, 4, 0)


def test_non_interleaved_lossless_rgb_classifies_header_only():
    """Review fix: a 3-scan (non-interleaved) lossless RGB file is
    T.81-legal but the decoder handles one interleaved scan — the
    classifier must check the first SOS's component count instead of
    claiming 'full' from the SOF alone."""
    import struct as s

    sof = s.pack(">BHHB", 8, 4, 4, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    sos1 = bytes([1, 1, 0x00, 1, 0, 0])  # ns=1: first of three scans
    payload = (
        b"\xff\xd8"
        + b"\xff\xc4" + s.pack(">H", 2 + 17) + bytes([0] + [0] * 15 + [1]) + bytes([0])
        + b"\xff\xc3" + s.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xda" + s.pack(">H", 2 + len(sos1)) + sos1
        + b"\x00" * 8 + b"\xff\xd9"
    )
    assert mm.media_decode_status(payload) == ("image", "jpeg", "header_only")
    # and the interleaved real fixture still classifies full
    from tests.test_imagecodecs import _rgb_ramp, jpeg_lossless_rgb_bytes

    good = jpeg_lossless_rgb_bytes(_rgb_ramp(3, 4, seed=2), 8, 1)
    assert mm.media_decode_status(good) == ("image", "jpeg", "full")


def test_needle_safety_assertions():
    """Review fix: the doubled-boundary oracle form silently undercounts
    any needle containing a char outside [a-z0-9_]; the import-time
    assertion makes adding one impossible."""
    from temporai_mivdp_spark.llmdata import text as t

    with pytest.raises(AssertionError, match="a-z0-9_"):
        t._assert_needles_safe(["über"])
    t._assert_needles_safe(t.STOPWORDS)  # the shipped lists are safe


def test_old_style_jpeg_in_tiff_interchange_decodes():
    """Compression 6 (round 10): the one coherent old-style shape —
    JPEGInterchangeFormat (513/514) pointing at a complete SOI stream —
    decodes through the same jpeg_pixels; strip-fragmented/table-offset
    variants (no tag 513) stay rejected-but-classified."""
    from temporai_mivdp_spark.llmdata.imagecodecs import jpeg_pixels
    from tests.test_imagecodecs import _smooth_rgb, jpeg_bytes

    rgb = _smooth_rgb(10, 12, seed=6)
    jpg = jpeg_bytes(rgb)
    tags = [
        (256, 4, [12]), (257, 4, [10]), (258, 3, [8, 8, 8]), (259, 3, [6]),
        (262, 3, [6]), (277, 3, [3]), (278, 4, [10]), (513, 4, [0]),
    ]
    payload = _tiff_container(tags, [jpg])
    assert (mm._tiff_pixels(payload) == jpeg_pixels(jpg)).all()
    assert mm.media_decode_status(payload) == ("image", "tiff", "full")
    # photometric 2 = RGB-stored: transform suppressed
    tags_rgb = [t if t[0] != 262 else (262, 3, [2]) for t in tags]
    raw = _tiff_container(tags_rgb, [jpg])
    assert (mm._tiff_pixels(raw) == jpeg_pixels(jpg, raw_rgb=True)).all()
    # 513 pointing at a non-SOI region: rejected AND header_only
    lying = bytearray(payload)
    sig_off = payload.rfind(jpg)
    lying[sig_off : sig_off + 2] = b"\x00\x00"
    with pytest.raises(NotImplementedError):
        mm._tiff_pixels(bytes(lying))
    assert mm.media_decode_status(bytes(lying)) == ("image", "tiff", "header_only")


def test_jpeg_in_tiff_hostile_rows():
    from tests.test_imagecodecs import _smooth_rgb, jpeg_bytes

    rgb = _smooth_rgb(8, 8, seed=1)
    jpg = jpeg_bytes(rgb)
    # truncated strip: scan torn mid-stream
    torn = tiff_jpeg([jpg[: len(jpg) // 2]], 8, 8, 8, 3, 2)
    # ValueError is in decode_image's malformed-payload class too
    with pytest.raises((NotImplementedError, IndexError, struct.error, ValueError)):
        mm._tiff_pixels(torn)
    # strip without SOI
    nosoi = tiff_jpeg([b"\x00\x00" + jpg[2:]], 8, 8, 8, 3, 2)
    with pytest.raises(NotImplementedError):
        mm._tiff_pixels(nosoi)
    # IFD dims disagree with the stream's SOF dims
    lying = tiff_jpeg([jpg], 9, 8, 8, 3, 2)
    with pytest.raises(NotImplementedError):
        mm._tiff_pixels(lying)
    # old-style compression 6 stays rejected-but-classified
    old = tiff_jpeg([jpg], 8, 8, 8, 3, 2, comp=6)
    with pytest.raises(NotImplementedError):
        mm._tiff_pixels(old)
    assert mm.media_decode_status(old) == ("image", "tiff", "header_only")


# ---------------------------------------------------------------------------
# round-11 advice fixes
# ---------------------------------------------------------------------------


def test_zero_advance_horizontal_pair_raises():
    """Hostile 2D stream: horizontal mode with two zero-length runs is a
    legal bit pattern that never advances a0 — before the round-11 guard
    the row loop spun for O(stream-bits) appending empty transitions
    until bit exhaustion. No conforming encoder emits the pair, so it
    degrades crawl-mode like the other out-of-range guards."""
    bw = BitWriter()
    # many zero-advance pairs: without the guard each one appends two
    # transitions and consumes 21 bits without moving a0
    for _ in range(64):
        bw.put(MODES["H"])
        bw.put(WHITE_TERM[0])
        bw.put(BLACK_TERM[0])
    with pytest.raises(NotImplementedError, match="zero-advance"):
        mm._ccitt_decode(bw.tobytes(), 16, 1, 4, 0)


def test_bilevel_jpeg_compression_rejected_and_classified_header_only():
    """A bps=1 TIFF tagged with a JPEG compression (6/7) is a lying
    header — JPEG has no 1-bit mode. Advice r10: _tiff_pixels used to
    dispatch comp 6/7 to the JPEG tier BEFORE the bilevel check, so such
    a payload could decode 'full' while media_decode_status's bilevel
    branch classified it header_only. Both must now agree: decoder
    raises, classifier says header_only."""
    from tests.test_imagecodecs import _smooth_rgb, jpeg_bytes

    jpg = jpeg_bytes(_smooth_rgb(9, 11, seed=7))
    for comp in (6, 7):
        tags = [
            (256, 4, [11]), (257, 4, [9]), (258, 3, [1]), (259, 3, [comp]),
            (262, 3, [0]), (277, 3, [1]), (278, 4, [9]),
        ]
        if comp == 6:
            tags += [(513, 4, [0]), (514, 4, [0])]  # patched to blob 0
        payload = _tiff_container(tags, [jpg])
        with pytest.raises(NotImplementedError, match="bilevel"):
            mm._tiff_pixels(payload)
        assert mm.media_decode_status(payload) == (
            "image", "tiff", "header_only",
        ), comp

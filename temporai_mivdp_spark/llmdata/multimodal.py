"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata.

The Spark-side plumbing is real and tested — schema, Arrow-batched
``mapInPandas`` over binary columns, partition sizing. Codec coverage is
split by what the stdlib can genuinely do:

* REAL (no external libs): WAV/PCM audio (RIFF parse via ``wave`` +
  numpy for duration/RMS/zero-crossings, plus the ``audio_spectral``
  DSP tier: rFFT centroid/rolloff/dominant-frequency/band energies,
  tested against synthesized sine ground truth; IEEE-float WAVs and
  EXTENSIBLE-wrapped PCM/float/G.711 resolve via the SubFormat GUID),
  BMP decode
  (24/32-bit truecolor, paletted 1/4/8-bit, RLE8 AND RLE4, bottom-up
  and top-down) including nearest-neighbor resize, FULL PNG decode (chunk walk + stdlib ``zlib``
  inflate + all five scanline unfilters; every legal IHDR combination —
  gray/RGB/palette/gray-alpha/RGBA at depths 1/2/4/8/16, Adam7
  interlace), BASELINE and
  PROGRESSIVE JPEG decode (Huffman + spectral selection / successive
  approximation + dequant + IDCT + chroma upsampling — see
  ``imagecodecs``), GIF decode including FULL animation (variable-width
  LZW, interlace, local/global palettes, GCE delays/transparency/
  disposal — ``imagecodecs.gif_frames``; ``sample_frames`` below turns
  that into real timed frame sampling), TIFF (8/16-bit gray and RGB
  strips, compression none/PackBits/LZW, both byte orders, WhiteIsZero,
  predictor — round 9; round 10 adds BILEVEL fax tiers: CCITT Modified
  Huffman, Group 3 T.4 1D/2D, Group 4 T.6, packed uncompressed bits,
  plus new-style JPEG-in-TIFF with shared JPEGTables AND old-style
  JPEG-in-TIFF (compression 6, the tag-513 interchange shape) — the
  scanned-document-archive shapes), binary Netpbm P5/P6
  (round 9), and header-only dimension
  extraction for BMP/PNG/JPEG/GIF/TIFF/PNM.
* Audio samples decode for linear PCM (8/16/24/32-bit), G.711
  A-law/µ-law (ITU expansion tables, audioop-pinned), IMA ADPCM WAVs
  (block decoder, step function audioop-pinned across every
  state/nibble pair), MS ADPCM WAVs (fmt 0x02 — spec predictor
  pairs + delta adaptation, pinned by exact round-trip against a
  test-side spec encoder), and — round 9 — bare FLAC via a FULL
  RFC 9639 frame-body decode (constant/verbatim/fixed/LPC subframes,
  both Rice methods, escapes, wasted bits, all four channel
  assignments, CRC-8/16 verification; pinned bit-exactly against a
  hand-written test-side encoder). Other compressed-WAV tags
  (MP3-in-WAV, ...) get byte-rate duration math in the header tier.
* STUBBED (FINAL boundary — see ARCHITECTURE.md "Multimodal"):
  hierarchical / 12-bit-arithmetic / SUBSAMPLED-lossless JPEG, CCITT
  uncompressed mode, non-bilevel FillOrder 2, and entropy-coded audio
  bodies beyond FLAC (MP3/Vorbis/Opus filterbanks — a pure-Python
  MDCT/filterbank is the wrong tool; the header tier accounts for them
  exactly) — those payloads raise ``NotImplementedError`` unless
  the deterministic fake is requested (used by tests and the oracle
  harness), and ``decode_status`` quantifies the skip honestly as
  ``header_only``/``unsupported``. ARITHMETIC-coded JPEG — sequential
  SOF9 and progressive
  SOF10 — decodes for real since round 8 (imagecodecs' T.81 QM coder,
  libjpeg-fixture-validated); 12-bit EXTENDED Huffman JPEG (Pq=1
  quant tables, 2^11 level shift, x16-twin-pinned) and
  single-component LOSSLESS JPEG (SOF3 Annex H, the DICOM gray shape,
  exact-round-trip-pinned) since round 9; INTERLEAVED 1:1
  multi-component lossless (the DICOM RGB shape) and BOTH JPEG-in-TIFF
  styles (compression 7 and legacy compression 6) since round 10.

Scale notes for the real thing:
* media bytes ride in the same rows as metadata only up to a few MB each;
  beyond that store object-store URIs and fetch inside the UDF batch.
* ``mapInPandas`` receives Arrow batches — decode cost amortizes across a
  batch, and ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak
  memory (set it low for video).
* repartition by a content-hash prefix before heavy decode stages so
  stragglers are bounded and retries are cheap.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical media row: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

METADATA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("byte_len", LongType(), True),
        StructField("content_md5", StringType(), True),
        StructField("sniffed_mime", StringType(), True),
    ]
)

_MAGIC = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG", "image/png"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"OggS", "audio/ogg"),
    (b"\x00\x00\x00", "video/mp4"),
]


def _sniff(payload: bytes | None) -> str | None:
    if payload is None:
        return None
    for magic, mime in _MAGIC:
        if payload.startswith(magic):
            return mime
    return "application/octet-stream"


# ---------------------------------------------------------------------------
# stdlib codecs (the REAL fake=False paths)
# ---------------------------------------------------------------------------


def _riff_wav_info(
    b: bytes,
) -> tuple[int, int, int, int, int, int, bytes, bytes, int | None]:
    """(fmt_tag, channels, sample_rate, byte_rate, block_align, bits,
    data, fmt_extra, fact_samples) from a
    RIFF/WAVE container — manual word-aligned chunk walk. The stdlib
    ``wave`` module rejects every fmt tag except PCM at open, and the
    G.711 (A-law/µ-law) sample tier plus the byte-rate duration math
    for other compressed-WAV tags need the fmt fields regardless of
    codec support. ``fmt_extra`` is the fmt body past the 16 standard
    bytes (the cbSize extension — MS-ADPCM coefficient pairs,
    wSamplesPerBlock); ``fact_samples`` is the fact chunk's uint32
    total-sample count (the spec's truth for compressed formats whose
    final block is padded), or None. Raises ``NotImplementedError`` on
    anything that is not a well-formed RIFF/WAVE with fmt + data
    chunks."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    i, fmt, data, extra, fact = 12, None, None, b"", None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (clen,) = struct.unpack_from("<I", b, i + 4)
        body = b[i + 8 : i + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            extra = body[16:]
        elif cid == b"data":
            data = body
        elif cid == b"fact" and len(body) >= 4:
            (fact,) = struct.unpack_from("<I", body, 0)
        i += 8 + clen + (clen & 1)  # chunks are 16-bit word aligned
    if fmt is None or data is None:
        raise NotImplementedError("RIFF/WAVE missing fmt or data chunk")
    tag, ch, sr, br, align, bits = fmt
    if ch <= 0 or sr <= 0:
        raise NotImplementedError("degenerate WAV fmt chunk")
    return tag, ch, sr, br, align, bits, data, extra, fact


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """(µ-law, A-law) code → 16-bit linear expansion tables per ITU-T
    G.711 — differentially pinned against stdlib ``audioop`` in tests."""
    ulaw = np.empty(256, np.int16)
    alaw = np.empty(256, np.int16)
    for code in range(256):
        u = ~code & 0xFF
        mag = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)) - 0x84
        ulaw[code] = -mag if u & 0x80 else mag
        a = code ^ 0x55
        exp, mant = (a >> 4) & 0x07, a & 0x0F
        mag = (mant << 4) + 8 if exp == 0 else ((mant << 4) + 0x108) << (exp - 1)
        # A-law's sign convention is inverted relative to µ-law: a SET
        # sign bit means positive (pinned against audioop in tests)
        alaw[code] = mag if a & 0x80 else -mag
    return ulaw, alaw


_ULAW_TABLE, _ALAW_TABLE = _g711_tables()

#: WAV fmt tags the sample tier decodes: PCM, MS ADPCM, IEEE float,
#: A-law/µ-law (G.711), IMA ADPCM (DVI4); 0xFFFE (EXTENSIBLE) resolves
#: to one of these via its SubFormat GUID
_WAV_PCM, _WAV_MS_ADPCM, _WAV_ALAW, _WAV_ULAW, _WAV_IMA_ADPCM = 1, 2, 6, 7, 0x11
_WAV_FLOAT, _WAV_EXTENSIBLE = 3, 0xFFFE

#: WAVE_FORMAT_EXTENSIBLE SubFormat GUIDs are the 16-bit base tag in
#: little-endian followed by this fixed 14-byte suffix (KSDATAFORMAT)
_WAV_GUID_SUFFIX = bytes(
    [0x00, 0x00, 0x00, 0x00, 0x10, 0x00, 0x80, 0x00,
     0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
)


def _wav_resolve(tag: int, extra: bytes) -> int:
    """Resolve WAVE_FORMAT_EXTENSIBLE (0xFFFE) to its effective fmt tag
    via the SubFormat GUID (``extra`` is the fmt body past the 16
    standard bytes: cbSize(2) + wValidBitsPerSample(2) +
    dwChannelMask(4) + GUID(16)); other tags pass through. Raises on a
    short or non-KSDATAFORMAT extension."""
    if tag != _WAV_EXTENSIBLE:
        return tag
    if len(extra) < 24:
        raise NotImplementedError("EXTENSIBLE WAV missing its fmt extension")
    guid = extra[8:24]
    if guid[2:] != _WAV_GUID_SUFFIX:
        raise NotImplementedError("EXTENSIBLE WAV with a non-standard SubFormat")
    sub = int.from_bytes(guid[:2], "little")
    if sub in (_WAV_MS_ADPCM, _WAV_IMA_ADPCM):
        # the ADPCM decoders read coefficient tables / wSamplesPerBlock
        # from the fmt extension, which in an EXTENSIBLE container holds
        # the wValidBits/channel-mask/GUID block instead — resolving
        # would silently misparse GUID bytes as predictor coefficients,
        # so this nonstandard wrapping is an honest rejection
        raise NotImplementedError("EXTENSIBLE-wrapped ADPCM not supported")
    return sub

#: IMA/DVI ADPCM step machinery — differentially pinned against stdlib
#: audioop's C implementation across every (state, nibble) pair in tests
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ima_step(pred: int, index: int, nib: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: (predictor', index')."""
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    if nib & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[nib & 7]))
    return pred, index


def _ima_samples_per_block(align: int, ch: int) -> int:
    """WAV IMA-ADPCM samples per channel per block: the 4-byte/channel
    block header carries the first sample, the rest is 2 nibbles/byte
    split across channels."""
    return (align - 4 * ch) * 2 // ch + 1


#: MS-ADPCM (WAV fmt tag 0x02) machinery per the public Microsoft ADPCM
#: spec (the multimedia DDK msadpcm reference): 7 fixed predictor
#: coefficient pairs, a 16-entry delta adaptation table, and arithmetic
#: >>8 shifts (floor) for both the prediction and the delta update.
#: There is no independent decoder in this container (audioop's adpcm is
#: the Intel/DVI variant), so correctness is pinned the same way the IMA
#: tier's block LAYOUT is: a hand-written test-side encoder using the
#: same spec primitives must round-trip bit-exactly through this decoder
#: (tests/test_llmdata.py::test_ms_adpcm_wav_decode_and_metadata).
_MS_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)
_MS_COEF1 = (256, 512, 0, 192, 240, 460, 392)
_MS_COEF2 = (0, -256, 0, 64, 0, -208, -232)


def _ms_step(nib: int, s1: int, s2: int, delta: int, c1: int, c2: int):
    """One MS-ADPCM nibble: (new_sample, new_delta). Shared by the
    decoder below and the test-side encoder's reconstruction loop."""
    signed = nib - 16 if nib & 8 else nib
    pred = ((s1 * c1 + s2 * c2) >> 8) + signed * delta
    pred = max(-32768, min(32767, pred))
    delta = (_MS_ADAPT[nib] * delta) >> 8
    return pred, max(16, delta)


def _ms_coef_table(extra: bytes):
    """(coef1[], coef2[], samples_per_block|None) from the MS-ADPCM fmt
    extension — cbSize(2) wSamplesPerBlock(2) wNumCoef(2) then wNumCoef
    int16 pairs. Encoders that use predictor indices past the standard
    7 MUST publish their pairs here (the spec requires the first 7 to
    be the standard set); a missing/short extension falls back to the
    standard table with no per-block cap."""
    if len(extra) >= 6:
        _cb, wspb, ncoef = struct.unpack_from("<HHH", extra, 0)
        if ncoef >= 1 and len(extra) >= 6 + 4 * ncoef:
            c1 = [
                int.from_bytes(extra[6 + 4 * i : 8 + 4 * i], "little", signed=True)
                for i in range(ncoef)
            ]
            c2 = [
                int.from_bytes(extra[8 + 4 * i : 10 + 4 * i], "little", signed=True)
                for i in range(ncoef)
            ]
            return c1, c2, (wspb if wspb > 0 else None)
    return list(_MS_COEF1), list(_MS_COEF2), None


def _ms_adpcm_samples(
    data: bytes,
    ch: int,
    align: int,
    extra: bytes = b"",
    fact: int | None = None,
) -> np.ndarray:
    """Decode WAV MS-ADPCM (fmt tag 0x02) blocks to float samples in
    [-1, 1], channel-averaged. Block layout per the spec: per channel a
    predictor index byte, then per channel int16 initial delta, int16
    sample1 (most recent), int16 sample2; the two header samples are
    emitted (sample2 first), then the body nibbles — HIGH nibble first
    within each byte — rotate across channels one nibble at a time.
    ``extra`` (the fmt cbSize extension) supplies custom coefficient
    pairs and the per-block sample cap; ``fact`` (the fact chunk)
    trims the padded final block to the encoder's true total. A
    predictor index past the table clamps to its last pair (corrupt
    mid-stream bytes degrade, never throw — the accounting tier has
    already classified the payload)."""
    hdr = 7 * ch
    if align < hdr + 1:
        raise NotImplementedError(f"MS ADPCM block align {align} too small")
    coef1, coef2, wspb = _ms_coef_table(extra)
    out = []
    for boff in range(0, len(data) - hdr + 1, align):
        block = data[boff : boff + align]
        c1s, c2s, deltas, s1s, s2s, chans = [], [], [], [], [], []
        for c in range(ch):
            idx = min(block[c], len(coef1) - 1)
            c1s.append(coef1[idx])
            c2s.append(coef2[idx])
            deltas.append(
                int.from_bytes(block[ch + 2 * c : ch + 2 * c + 2], "little", signed=True)
            )
            s1s.append(
                int.from_bytes(
                    block[3 * ch + 2 * c : 3 * ch + 2 * c + 2], "little", signed=True
                )
            )
            s2s.append(
                int.from_bytes(
                    block[5 * ch + 2 * c : 5 * ch + 2 * c + 2], "little", signed=True
                )
            )
            chans.append([s2s[c], s1s[c]])
        k = 0
        for byte in block[hdr:]:
            for nib in (byte >> 4, byte & 0x0F):  # high nibble first
                c = k % ch
                k += 1
                s, deltas[c] = _ms_step(
                    nib, s1s[c], s2s[c], deltas[c], c1s[c], c2s[c]
                )
                s2s[c], s1s[c] = s1s[c], s
                chans[c].append(s)
        n = min(len(x) for x in chans)
        if wspb is not None:
            n = min(n, wspb)
        frame = np.array([x[:n] for x in chans], dtype=np.float64)
        out.append(frame.mean(axis=0) / 32768.0)
    if not out:
        return np.zeros(0)
    x = np.concatenate(out)
    return x[:fact] if fact is not None else x


def _ms_data_samples(
    n_bytes: int,
    ch: int,
    align: int,
    wspb: int | None = None,
    fact: int | None = None,
) -> int:
    """Samples per channel that ``_ms_adpcm_samples`` produces for
    ``n_bytes`` of block data — the same block walk (a partial trailing
    block with at least the 7*ch header decodes its truncated body):
    2 header samples + the channel-min share of the body nibbles,
    capped per block by ``wspb`` and in total by ``fact`` exactly like
    the decoder. Closed form, O(1): every block except the last is
    full, so the accounting tier stays header-math cheap on multi-MB
    payloads (randomized equivalence with the decoder pinned in
    tests)."""
    hdr = 7 * ch
    if n_bytes < hdr:
        return 0
    k = (n_bytes - hdr) // align + 1  # blocks the decoder walks
    full = 2 + (2 * (align - hdr)) // ch
    last = 2 + (2 * (min(align, n_bytes - (k - 1) * align) - hdr)) // ch
    if wspb is not None:
        full, last = min(full, wspb), min(last, wspb)
    total = (k - 1) * full + last
    return min(total, fact) if fact is not None else total


def _ima_data_samples(
    n_bytes: int,
    ch: int,
    align: int,
    wspb: int | None = None,
    fact: int | None = None,
) -> int:
    """Samples per channel that ``_ima_adpcm_samples`` produces for
    ``n_bytes`` of block data — the SAME block walk (a trailing partial
    block with at least the 4*ch-byte header decodes its truncated
    body), so the metadata tier can never disagree with the sample tier
    on truncated payloads. Per block the decoder consumes the body in
    4-byte groups rotated across channels and takes the channel-min
    length: header sample + 8 nibbles per full group landing on the
    last channel ⇒ 1 + 8 * (groups // ch). Closed form, O(1): every
    block except the last is full (randomized equivalence with the
    decoder pinned in tests)."""
    hdr = 4 * ch
    if n_bytes < hdr:
        return 0
    k = (n_bytes - hdr) // align + 1  # blocks the decoder walks
    full = 1 + 8 * (((align - hdr) // 4) // ch)
    last_body = min(align, n_bytes - (k - 1) * align) - hdr
    last = 1 + 8 * ((last_body // 4) // ch)
    if wspb is not None:
        full, last = min(full, wspb), min(last, wspb)
    total = (k - 1) * full + last
    return min(total, fact) if fact is not None else total


def _ima_adpcm_samples(
    data: bytes,
    ch: int,
    align: int,
    extra: bytes = b"",
    fact: int | None = None,
) -> np.ndarray:
    """Decode WAV IMA-ADPCM (fmt tag 0x11) blocks to float samples in
    [-1, 1], channel-averaged. Block layout per the WAV spec: per
    channel a 4-byte header (int16 predictor = first sample, uint8 step
    index, reserved), then the nibble data interleaved in 4-byte groups
    per channel, LOW nibble first within each byte. ``extra`` (the fmt
    cbSize extension: cbSize + wSamplesPerBlock) caps samples per
    block; ``fact`` trims the padded final block to the encoder's true
    total — both mirrored exactly by ``_ima_data_samples``."""
    wspb = _ima_ext_wspb(extra)
    if align < 4 * ch + 4:
        raise NotImplementedError(f"IMA ADPCM block align {align} too small")
    out = []
    for boff in range(0, len(data) - 4 * ch + 1, align):
        block = data[boff : boff + align]
        preds, idxs, chans = [], [], []
        for c in range(ch):
            pred = int.from_bytes(block[4 * c : 4 * c + 2], "little", signed=True)
            index = min(block[4 * c + 2], 88)
            preds.append(pred)
            idxs.append(index)
            chans.append([pred])
        body = block[4 * ch :]
        # 4-byte groups rotate across channels
        for g in range(len(body) // 4):
            c = g % ch
            for byte in body[4 * g : 4 * g + 4]:
                for nib in (byte & 0x0F, byte >> 4):  # low nibble first
                    preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                    chans[c].append(preds[c])
        n = min(len(x) for x in chans)
        if wspb is not None:
            n = min(n, wspb)
        frame = np.array([x[:n] for x in chans], dtype=np.float64)
        out.append(frame.mean(axis=0) / 32768.0)
    if not out:
        return np.zeros(0)
    x = np.concatenate(out)
    return x[:fact] if fact is not None else x


def _ima_ext_wspb(extra: bytes) -> int | None:
    """wSamplesPerBlock from the IMA-ADPCM fmt extension (cbSize(2) +
    wSamplesPerBlock(2)), or None when absent/zero."""
    if len(extra) >= 4:
        (wspb,) = struct.unpack_from("<H", extra, 2)
        if wspb > 0:
            return wspb
    return None


def _wav_samples(b: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, [-1, 1] float64 channel-averaged samples) of a
    RIFF WAV payload: linear PCM at 8/16/24/32 bits, IEEE float
    (fmt 3, 32/64-bit, clipped to the nominal [-1, 1]), G.711
    A-law/µ-law via the expansion tables (1 byte per sample), or
    IMA / MS ADPCM (fmt tags 0x11 / 0x02) via the block decoders;
    WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolves through its SubFormat
    GUID first. Raises ``NotImplementedError`` for other encodings
    (MP3-in-WAV, ...) — mirrors how unsupported image formats behave."""
    tag, ch, sr, _br, align, bits, data, extra, fact = _riff_wav_info(b)
    tag = _wav_resolve(tag, extra)
    if tag == _WAV_FLOAT:
        sw = bits // 8
        if sw not in (4, 8):
            raise NotImplementedError(f"unsupported float sample width {sw}")
        n = len(data) // (ch * sw)
        raw = data[: n * ch * sw]
        x = np.frombuffer(raw, "<f4" if sw == 4 else "<f8").astype(np.float64)
        x = np.clip(x, -1.0, 1.0)
    elif tag == _WAV_PCM:
        sw = bits // 8
        if sw not in (1, 2, 3, 4):
            raise NotImplementedError(f"unsupported PCM sample width {sw}")
        n = len(data) // (ch * sw)
        raw = data[: n * ch * sw]
        if sw == 1:  # unsigned 8-bit
            x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
        elif sw == 2:
            x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
        elif sw == 3:  # 24-bit little-endian, sign-extended
            u = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.int64)
            v = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)
            x = ((v ^ 0x800000) - 0x800000).astype(np.float64) / 8388608.0
        else:
            x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    elif tag in (_WAV_ALAW, _WAV_ULAW):
        n = len(data) // ch
        codes = np.frombuffer(data[: n * ch], np.uint8)
        table = _ALAW_TABLE if tag == _WAV_ALAW else _ULAW_TABLE
        x = table[codes].astype(np.float64) / 32768.0
    elif tag == _WAV_IMA_ADPCM:
        # already channel-averaged; extension caps + fact trim applied
        return sr, _ima_adpcm_samples(data, ch, align, extra, fact)
    elif tag == _WAV_MS_ADPCM:
        return sr, _ms_adpcm_samples(data, ch, align, extra, fact)
    else:
        raise NotImplementedError(f"WAV fmt tag {tag} needs a codec library")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return sr, x


def _wav_stats(b: bytes) -> tuple[int, float, int]:
    """(duration_ms, rms, zero_crossings) of any sample-tier payload
    (RIFF WAV via ``_wav_samples``, bare FLAC via ``_flac_samples``)."""
    sr, x = _audio_samples(b)
    duration_ms = int(len(x) * 1000 // sr) if sr else 0
    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
    zc = (
        int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
        if x.size > 1
        else 0
    )
    return duration_ms, rms, zc


# -- compressed-audio HEADER tier (no entropy decode needed) ---------------
#
# A real crawl's audio is mostly MP3/Ogg, which `_wav_samples` rejects.
# Duration / sample rate / channels / bitrate are all recoverable from
# FRAME HEADERS alone (pure struct over the byte stream — the same
# stdlib discipline as `_image_dims`), so pipelines can account for and
# route compressed audio without a PCM decoder. Full sample decode of
# these formats still raises — that honestly needs a codec library.

_MP3_BITRATES = {  # kbps rows indexed by header bitrate field (1-14)
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {1: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              25: (11025, 12000, 8000)}


def _mp3_frame(b: bytes, i: int):
    """Parse one MPEG audio frame header at offset ``i``. Returns
    (frame_bytes, samples, sample_rate, channels, bitrate_kbps) or None
    when the 4 bytes are not a valid header."""
    if i + 4 > len(b) or b[i] != 0xFF or (b[i + 1] & 0xE0) != 0xE0:
        return None
    ver_bits = (b[i + 1] >> 3) & 0x3     # 00=2.5 01=res 10=2 11=1
    layer_bits = (b[i + 1] >> 1) & 0x3   # 01=III 10=II 11=I
    if ver_bits == 1 or layer_bits == 0:
        return None
    version = {0: 25, 2: 2, 3: 1}[ver_bits]
    layer = 4 - layer_bits               # 1, 2, 3
    br_idx = (b[i + 2] >> 4) & 0xF
    sr_idx = (b[i + 2] >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:  # free-format / bad
        return None
    pad = (b[i + 2] >> 1) & 0x1
    channels = 1 if ((b[i + 3] >> 6) & 0x3) == 3 else 2
    kbps = _MP3_BITRATES[(1 if version == 1 else 2, layer)][br_idx - 1]
    sr = _MP3_RATES[version][sr_idx]
    if layer == 1:
        samples = 384
        frame_len = (12 * kbps * 1000 // sr + pad) * 4
    else:
        samples = 1152 if (layer == 2 or version == 1) else 576
        frame_len = samples // 8 * kbps * 1000 // sr + pad
    return frame_len, samples, sr, channels, kbps


def _mp3_stats(b: bytes) -> tuple[int, int, int, int]:
    """(duration_ms, sample_rate, channels, avg_bitrate_kbps) from an
    MPEG audio (MP3) byte stream by walking frame headers — an ID3v2
    prefix is skipped via its syncsafe size, a trailing ID3v1 'TAG'
    block is tolerated. Raises ``NotImplementedError`` when no valid
    frame sequence exists (the codec boundary contract)."""
    i = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) | \
               ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        i = 10 + size + (10 if b[5] & 0x10 else 0)
    # resync to the first valid frame (some encoders pad after ID3)
    first = None
    while i + 4 <= len(b):
        first = _mp3_frame(b, i)
        if first is not None:
            break
        i += 1
    if first is None:
        raise NotImplementedError("no MPEG audio frame sync found")
    total_samples = 0
    kbps_sum = n_frames = 0
    sr = first[2]
    channels = first[3]
    while i + 4 <= len(b):
        f = _mp3_frame(b, i)
        if f is None:
            if b[i : i + 3] == b"TAG":  # ID3v1 trailer
                break
            raise NotImplementedError(f"broken MPEG frame sequence at byte {i}")
        frame_len, samples, f_sr, _ch, kbps = f
        if f_sr != sr:
            raise NotImplementedError("sample-rate change mid-stream")
        total_samples += samples
        kbps_sum += kbps
        n_frames += 1
        i += frame_len
    duration_ms = total_samples * 1000 // sr
    return duration_ms, sr, channels, round(kbps_sum / max(n_frames, 1))


def _flac_streaminfo(b: bytes, off: int) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bits_per_sample, total_samples) from a
    FLAC STREAMINFO block: ``off`` points at the ``fLaC`` signature;
    STREAMINFO is mandated to be the FIRST metadata block (type 0,
    34-byte body — 16 bytes of header math after the block sizes:
    20-bit rate, 3-bit channels-1, 5-bit bps-1, 36-bit total samples).
    Raises ``NotImplementedError`` on anything malformed."""
    if b[off : off + 4] != b"fLaC" or len(b) < off + 8 + 34:
        raise NotImplementedError("missing fLaC signature/STREAMINFO")
    if b[off + 4] & 0x7F != 0:
        raise NotImplementedError("first FLAC metadata block is not STREAMINFO")
    blen = int.from_bytes(b[off + 5 : off + 8], "big")
    if blen < 34:
        raise NotImplementedError("short STREAMINFO block")
    packed = int.from_bytes(b[off + 18 : off + 26], "big")
    sr = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if sr <= 0:
        raise NotImplementedError("STREAMINFO missing sample rate")
    return sr, channels, bps, total


def _flac_stats(b: bytes) -> tuple[int, int, int, int]:
    """(duration_ms, sample_rate, channels, bitrate_kbps) for a BARE
    .flac payload — 16 bytes of STREAMINFO header math, no frame
    decode; the same stdlib discipline as the MP3/Ogg walkers."""
    sr, channels, _bps, total = _flac_streaminfo(b, 0)
    duration_ms = total * 1000 // sr
    kbps = round(len(b) * 8 / max(duration_ms, 1))
    return duration_ms, sr, channels, kbps


# -- FLAC frame-body decode (RFC 9639) --------------------------------------
#
# The sample tier below decodes EVERY legal FLAC subframe type —
# constant, verbatim, fixed orders 0-4, LPC orders 1-32 — with both Rice
# coding methods (4- and 5-bit parameters), escape partitions, wasted
# bits, all four channel assignments (independent, left/side,
# right/side, mid/side) and per-frame CRC-8/CRC-16 verification, in
# pure stdlib + numpy. FLAC is the one mainstream compressed-audio
# format whose entropy layer (Rice) is spec-simple enough to do this
# honestly; MP3/Vorbis/Opus stay header_only (they need a codec
# library's filterbank). Correctness is pinned the same way the
# IMA/MS-ADPCM tiers are: a hand-written test-side encoder using the
# spec's own primitives must round-trip BIT-EXACTLY through this
# decoder across a lattice of subframe types, orders, partition
# depths, escapes and channel modes
# (tests/test_llmdata.py::TestFlacDecode).

#: frame-header code tables (RFC 9639 §9.1)
_FLAC_BLOCKSIZE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_FLAC_RATE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_FLAC_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

#: fixed-predictor coefficients on (a[i-1], a[i-2], ...) per order
_FLAC_FIXED = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))


def _crc8(data: bytes) -> int:
    """CRC-8 poly x^8+x^2+x+1 (0x07), init 0 — FLAC frame headers."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 poly x^16+x^15+x^2+1 (0x8005), init 0 — FLAC frames."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _FlacBits:
    """MSB-first bit reader over bytes (no byte-stuffing — unlike the
    JPEG reader in ``imagecodecs``, which must unstuff 0xFF00)."""

    __slots__ = ("b", "pos")

    def __init__(self, b: bytes, byte_off: int) -> None:
        self.b = b
        self.pos = byte_off * 8  # bit cursor

    def read(self, n: int) -> int:
        end = self.pos + n
        last = (end + 7) >> 3
        if last > len(self.b):
            raise NotImplementedError("truncated FLAC frame")
        chunk = int.from_bytes(self.b[self.pos >> 3 : last], "big")
        self.pos = end
        return (chunk >> ((last << 3) - end)) & ((1 << n) - 1) if n else 0

    def signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v & (1 << (n - 1)) else v

    def unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_at(self) -> int:
        if self.pos & 7:
            raise NotImplementedError("FLAC reader not byte-aligned")
        return self.pos >> 3


def _flac_utf8_num(br: _FlacBits) -> int:
    """UTF-8-style coded frame/sample number (up to 7 bytes / 36 bits)."""
    x = br.read(8)
    if x < 0x80:
        return x
    lead = 0
    while x & (0x80 >> lead):
        lead += 1
    if lead < 2 or lead > 7:
        raise NotImplementedError("invalid FLAC UTF-8 coded number")
    val = x & (0x7F >> lead)
    for _ in range(lead - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise NotImplementedError("invalid FLAC UTF-8 continuation")
        val = (val << 6) | (c & 0x3F)
    return val


def _flac_residual(br: _FlacBits, n: int, order: int) -> list[int]:
    """Rice-partitioned residual (RFC 9639 §9.2.7): 2-bit method selects
    4- or 5-bit Rice parameters, 4-bit partition order, all-ones param
    escapes to raw n-bit verbatim (n may be 0 → silence run)."""
    method = br.read(2)
    if method > 1:
        raise NotImplementedError("reserved FLAC residual coding method")
    pbits = 4 + method
    esc = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if n % nparts or (n >> porder) <= order:
        raise NotImplementedError("invalid FLAC rice partition order")
    out: list[int] = []
    for p in range(nparts):
        cnt = (n >> porder) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == esc:
            nb = br.read(5)
            out.extend(br.signed(nb) if nb else 0 for _ in range(cnt))
        else:
            for _ in range(cnt):
                v = (br.unary() << param) | (br.read(param) if param else 0)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _flac_subframe(br: _FlacBits, n: int, bps: int) -> list[int]:
    """One subframe (RFC 9639 §9.2): header (type + wasted bits), then
    constant / verbatim / fixed / LPC payload; returns ``n`` ints."""
    if br.read(1):
        raise NotImplementedError("FLAC subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    bps -= wasted
    if bps <= 0:
        raise NotImplementedError("FLAC wasted bits exhaust sample size")
    if t == 0:  # CONSTANT
        out = [br.signed(bps)] * n
    elif t == 1:  # VERBATIM
        out = [br.signed(bps) for _ in range(n)]
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        out = [br.signed(bps) for _ in range(order)]
        res = _flac_residual(br, n, order)
        coefs = _FLAC_FIXED[order]
        for r in res:
            out.append(r + sum(c * out[-1 - j] for j, c in enumerate(coefs)))
    elif t >= 32:  # LPC order 1-32
        order = (t & 31) + 1
        out = [br.signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise NotImplementedError("invalid FLAC qlp precision")
        prec += 1
        shift = br.signed(5)
        if shift < 0:
            raise NotImplementedError("negative FLAC qlp shift")
        coefs = [br.signed(prec) for _ in range(order)]
        res = _flac_residual(br, n, order)
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs)) >> shift
            out.append(r + pred)
    else:
        raise NotImplementedError(f"reserved FLAC subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _flac_frame_data_off(b: bytes) -> int:
    """Byte offset of the first audio frame: walk the metadata-block
    chain from the ``fLaC`` signature to the last-block flag."""
    off = 4
    while True:
        if off + 4 > len(b):
            raise NotImplementedError("truncated FLAC metadata chain")
        hdr = b[off]
        blen = int.from_bytes(b[off + 1 : off + 4], "big")
        off += 4 + blen
        if hdr & 0x80:
            return off


def _flac_frame_header(br: _FlacBits, b: bytes, off: int, bps: int) -> tuple[int, int, int]:
    """Parse one FLAC frame header from ``br`` (positioned at ``off``):
    sync, codes, UTF-8 frame number, follow-up fields, CRC-8. Returns
    ``(blocksize, frame_bps, channel_assignment_code)`` with ``br``
    left at the first subframe bit."""
    if br.read(14) != 0x3FFE:
        raise NotImplementedError("bad FLAC frame sync")
    br.read(1)  # reserved (must-be-0 tolerated: decoders ignore)
    br.read(1)  # blocking strategy
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    ss_code = br.read(3)
    br.read(1)  # reserved
    _flac_utf8_num(br)
    if bs_code == 0:
        raise NotImplementedError("reserved FLAC block size code")
    bs = br.read(8) + 1 if bs_code == 6 else (
        br.read(16) + 1 if bs_code == 7 else _FLAC_BLOCKSIZE[bs_code]
    )
    if sr_code == 12:
        br.read(8)
    elif sr_code in (13, 14):
        br.read(16)
    elif sr_code == 15:
        raise NotImplementedError("invalid FLAC sample rate code")
    if ss_code != 0 and ss_code not in _FLAC_BPS:
        raise NotImplementedError("reserved FLAC sample size code")
    fbps = bps if ss_code == 0 else _FLAC_BPS[ss_code]
    hdr_end = br.byte_at()
    if br.read(8) != _crc8(b[off:hdr_end]):
        raise NotImplementedError("FLAC frame header CRC-8 mismatch")
    return bs, fbps, ch_code


def _flac_has_decodable_frames(b: bytes) -> bool:
    """Cheap 'full' probe for the accounting tiers: True iff audio
    frames follow the metadata chain AND the first frame header parses
    with a valid CRC-8 (~16 bytes of work — the MP3-walker discipline;
    corrupt frame BODIES still surface at the sample tier, whose
    per-frame CRC-16 raises)."""
    try:
        _sr, _ch, bps, _total = _flac_streaminfo(b, 0)
        off = _flac_frame_data_off(b)
        if off >= len(b):
            return False
        _flac_frame_header(_FlacBits(b, off), b, off, bps)
        return True
    except NotImplementedError:
        return False


def _flac_samples(b: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, [-1, 1] float64 channel-averaged samples) of a
    bare-FLAC payload — the compressed-audio twin of ``_wav_samples``.
    Full frame-body decode per RFC 9639 (see the tier comment above);
    every frame's CRC-8 (header) and CRC-16 (frame) are verified, so a
    corrupt byte raises instead of yielding silently-wrong samples.
    Raises ``NotImplementedError`` on malformed/truncated input."""
    sr, channels, bps, total = _flac_streaminfo(b, 0)
    off = _flac_frame_data_off(b)
    if off >= len(b):
        raise NotImplementedError("FLAC payload has no audio frames")
    chans: list[list[int]] = [[] for _ in range(channels)]
    got = 0
    while off < len(b) and (total == 0 or got < total):
        br = _FlacBits(b, off)
        bs, fbps, ch_code = _flac_frame_header(br, b, off, bps)
        if ch_code < 8:
            if ch_code + 1 != channels:
                raise NotImplementedError("FLAC frame channel count mismatch")
            subs = [_flac_subframe(br, bs, fbps) for _ in range(channels)]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise NotImplementedError("stereo decorrelation needs 2 channels")
            # the SIDE channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _flac_subframe(br, bs, fbps)
                side = _flac_subframe(br, bs, fbps + 1)
                subs = [left, [lv - sv for lv, sv in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _flac_subframe(br, bs, fbps + 1)
                right = _flac_subframe(br, bs, fbps)
                subs = [[rv + sv for rv, sv in zip(right, side)], right]
            else:  # mid/side
                mid = _flac_subframe(br, bs, fbps)
                side = _flac_subframe(br, bs, fbps + 1)
                lr: tuple[list[int], list[int]] = ([], [])
                for mv, sv in zip(mid, side):
                    m2 = (mv << 1) | (sv & 1)
                    lr[0].append((m2 + sv) >> 1)
                    lr[1].append((m2 - sv) >> 1)
                subs = [lr[0], lr[1]]
        else:
            raise NotImplementedError("reserved FLAC channel assignment")
        br.align()
        frame_end = br.byte_at()
        if br.read(16) != _crc16(b[off:frame_end]):
            raise NotImplementedError("FLAC frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].extend(subs[c])
        got += bs
        off = frame_end + 2
    if total and got < total:
        raise NotImplementedError("FLAC stream shorter than STREAMINFO total")
    x = np.array(chans, dtype=np.float64)
    if total:
        x = x[:, :total]  # final frame may be padded past the true total
    x = x.mean(axis=0) / float(1 << (bps - 1))
    return sr, x


def _audio_samples(b: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, [-1, 1] float64 channel-averaged samples) for any
    payload the sample tier decodes: RIFF/WAVE (PCM, G.711, IMA/MS
    ADPCM — ``_wav_samples``) or bare FLAC (full frame decode —
    ``_flac_samples``). Raises ``NotImplementedError`` otherwise."""
    if b[:4] == b"fLaC":
        return _flac_samples(b)
    return _wav_samples(b)


def _ogg_pages(b: bytes):
    """Yield ``(granule_position, body_bytes)`` per Ogg page; raises
    ``NotImplementedError`` on a malformed or truncated page. Shared by
    the audio (Vorbis/Opus/FLAC) and video (Theora) header walkers."""
    if b[:4] != b"OggS":
        raise NotImplementedError("not an Ogg container")
    i = 0
    while i + 27 <= len(b):
        if b[i : i + 4] != b"OggS" or b[i + 4] != 0:
            raise NotImplementedError(f"malformed Ogg page at byte {i}")
        (granule,) = struct.unpack_from("<q", b, i + 6)
        nsegs = b[i + 26]
        body_off = i + 27 + nsegs
        body_len = sum(b[i + 27 : i + 27 + nsegs])
        if body_off + body_len > len(b):
            raise NotImplementedError("truncated Ogg page")
        yield granule, b[body_off : body_off + body_len]
        i = body_off + body_len


def _ogg_stats(b: bytes) -> tuple[str, int, int, int, int]:
    """(codec, duration_ms, sample_rate, channels, bitrate_kbps) from an
    Ogg container by walking page headers: the first packet identifies
    Vorbis (``\\x01vorbis``), Opus (``OpusHead``), or FLAC-in-Ogg
    (``\\x7fFLAC`` mapping packet wrapping the STREAMINFO); duration
    comes from the LAST page's granule position (PCM samples at the
    stream rate for Vorbis/FLAC; 48 kHz units minus pre-skip for Opus).
    Raises ``NotImplementedError`` for other codecs (Theora is the
    VIDEO walker ``_theora_stats``) or malformed pages."""
    codec = None
    sr = channels = 0
    pre_skip = 0
    last_granule = 0
    for granule, body in _ogg_pages(b):
        if codec is None:
            if body[:7] == b"\x01vorbis" and len(body) >= 16:
                codec = "vorbis"
                channels = body[11]
                (sr,) = struct.unpack_from("<I", body, 12)
            elif body[:8] == b"OpusHead" and len(body) >= 19:
                codec = "opus"
                channels = body[9]
                (pre_skip,) = struct.unpack_from("<H", body, 10)
                sr = 48000  # granule timebase; input rate at 12 is advisory
            elif body[:5] == b"\x7fFLAC" and len(body) >= 9 + 8 + 34:
                # Ogg-FLAC mapping packet: 0x7F 'FLAC' major minor
                # n_headers(BE16), then the bare-FLAC fLaC + STREAMINFO
                codec = "flac"
                sr, channels, _bps, _total = _flac_streaminfo(body, 9)
            else:
                raise NotImplementedError("unsupported Ogg codec")
        if granule >= 0:
            last_granule = granule
    if sr <= 0:
        raise NotImplementedError("Ogg identification header missing rate")
    samples = max(last_granule - (pre_skip if codec == "opus" else 0), 0)
    duration_ms = samples * 1000 // sr
    kbps = round(len(b) * 8 / max(duration_ms, 1))
    return codec, duration_ms, sr, channels, kbps


def _theora_stats(b: bytes) -> tuple[int, int, int, int, int, int]:
    """(width, height, fps_num, fps_den, n_frames, duration_ms) for an
    Ogg Theora payload from HEADERS alone: the ``\\x80theora``
    identification packet carries picture dims (PICW/PICH, 24-bit BE),
    the frame rate as an exact rational (FRN/FRD, 32-bit BE), and
    KFGSHIFT — the bit split of every granule position into (keyframe
    number << shift | frames since keyframe). Total frames = the two
    granule fields of the LAST page summed + 1; no entropy decode.
    Raises ``NotImplementedError`` on non-Theora or malformed input."""
    ident = None
    last_granule = 0
    for granule, body in _ogg_pages(b):
        if ident is None:
            if body[:7] != b"\x80theora" or len(body) < 42:
                raise NotImplementedError("not an Ogg Theora stream")
            ident = body
        if granule >= 0:
            last_granule = granule
    if ident is None:
        raise NotImplementedError("empty Ogg container")
    picw = int.from_bytes(ident[14:17], "big")
    pich = int.from_bytes(ident[17:20], "big")
    frn = int.from_bytes(ident[22:26], "big")
    frd = int.from_bytes(ident[26:30], "big")
    two = int.from_bytes(ident[40:42], "big")  # QUAL(6) KFGSHIFT(5) PF(2) RES(3)
    kfgshift = (two >> 5) & 0x1F
    if frn <= 0 or frd <= 0:
        raise NotImplementedError("Theora ident missing frame rate")
    iframe = last_granule >> kfgshift
    pframe = last_granule & ((1 << kfgshift) - 1)
    n_frames = iframe + pframe + (1 if last_granule > 0 else 0)
    duration_ms = n_frames * 1000 * frd // frn
    return picw, pich, frn, frd, n_frames, duration_ms


def _gif_animation_stats(b: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, duration_ms) from a GIF payload by
    BLOCK WALKING only — image descriptors counted and GCE delays
    (centiseconds) summed, LZW data skipped sub-block by sub-block, no
    pixel decode. The full composited decode is
    ``imagecodecs.gif_frames``; this is the accounting tier's cheap
    mirror. Raises ``NotImplementedError`` on malformed input."""
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        raise NotImplementedError("not a GIF payload")
    w, h = struct.unpack_from("<HH", b, 6)
    flags = b[10]
    i = 13
    if flags & 0x80:  # global color table
        i += 3 * (2 << (flags & 0x07))
    n_frames = 0
    duration_ms = 0

    def skip_subblocks(j: int) -> int:
        while j < len(b) and b[j] != 0:
            j += 1 + b[j]
        return j + 1

    while i < len(b):
        block = b[i]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if i + 1 < len(b) and b[i + 1] == 0xF9 and i + 7 < len(b):
                (delay_cs,) = struct.unpack_from("<H", b, i + 4)
                duration_ms += delay_cs * 10
            i = skip_subblocks(i + 2)
        elif block == 0x2C:  # image descriptor
            if i + 10 > len(b):
                raise NotImplementedError("truncated GIF image descriptor")
            lflags = b[i + 9]
            i += 10
            if lflags & 0x80:
                i += 3 * (2 << (lflags & 0x07))
            i += 1  # LZW min code size
            i = skip_subblocks(i)
            n_frames += 1
        else:
            raise NotImplementedError(f"unknown GIF block 0x{block:02x}")
    if n_frames == 0:
        raise NotImplementedError("GIF with no image data")
    return w, h, n_frames, duration_ms


def _avi_stats(b: bytes) -> tuple[str, int, int, int, int, int, int]:
    """(codec, width, height, rate, scale, n_frames, duration_ms) for a
    RIFF/AVI payload from HEADERS alone — the video sibling of
    ``_riff_wav_info``'s chunk walk: the ``hdrl`` LIST's ``avih`` chunk
    carries dims and total frames, the first ``vids`` stream header
    carries the exact rational frame rate (dwRate/dwScale) and stream
    length. ``codec`` is the stream's fccHandler lowered ("mjpg" →
    "mjpeg", "dib " → "dib"). Raises ``NotImplementedError`` on
    non-AVI or malformed input."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise NotImplementedError("not a RIFF/AVI payload")
    avih = None
    vids = None

    def walk(lo: int, hi: int) -> None:
        nonlocal avih, vids
        i = lo
        while i + 8 <= hi:
            cid = b[i : i + 4]
            (clen,) = struct.unpack_from("<I", b, i + 4)
            body_lo = i + 8
            body_hi = min(body_lo + clen, hi)
            if cid == b"LIST" and clen >= 4:
                walk(body_lo + 4, body_hi)
            elif cid == b"avih" and clen >= 40:
                avih = struct.unpack_from("<10I", b, body_lo)
            elif (
                cid == b"strh"
                and clen >= 36
                and b[body_lo : body_lo + 4] == b"vids"
                and vids is None
            ):
                handler = b[body_lo + 4 : body_lo + 8]
                scale, rate, _start, length = struct.unpack_from(
                    "<IIII", b, body_lo + 20
                )
                vids = (handler, scale, rate, length)
            i = body_lo + clen + (clen & 1)

    walk(12, len(b))
    if avih is None:
        raise NotImplementedError("AVI missing avih header")
    w, h = avih[8], avih[9]
    if vids is not None:
        handler, scale, rate, length = vids
        n = length if length > 0 else avih[4]
    else:
        handler, scale, rate, n = b"", 1, 0, avih[4]
    if rate <= 0 or scale <= 0:
        # fall back to avih's microseconds-per-frame as the rational
        usec = avih[0]
        if usec <= 0:
            raise NotImplementedError("AVI missing frame rate")
        rate, scale = 1_000_000, usec
    codec = handler.decode("ascii", "replace").strip().lower() or "avi"
    if codec == "mjpg":
        codec = "mjpeg"
    duration_ms = n * 1000 * scale // rate
    return codec, w, h, rate, scale, n, duration_ms


def avi_frames(b: bytes) -> list[tuple[int, np.ndarray]]:
    """Decode an AVI's video frames to ``[(delay_ms, (h, w, 3) RGB)]``
    — the AVI twin of ``imagecodecs.gif_frames``. Supported stream
    payloads (``00dc``/``00db`` chunks in the ``movi`` LIST): MJPEG
    (each frame is a complete JFIF image → ``jpeg_pixels``) and
    uncompressed DIB (BITMAPINFOHEADER-less bottom-up BGR rows →
    rewrapped through the BMP decoder with a synthesized file header).
    Delays are granule-exact from the stream's dwRate/dwScale rational
    (cumulative-difference, so a 30000/1001 rate loses nothing). Other
    handlers raise ``NotImplementedError``."""
    codec, w, h, rate, scale, n, _dur = _avi_stats(b)
    frames: list[bytes] = []

    def walk(lo: int, hi: int, in_movi: bool) -> None:
        i = lo
        while i + 8 <= hi:
            cid = b[i : i + 4]
            (clen,) = struct.unpack_from("<I", b, i + 4)
            body_lo = i + 8
            body_hi = min(body_lo + clen, hi)
            if cid == b"LIST" and clen >= 4:
                ltype = b[body_lo : body_lo + 4]
                walk(body_lo + 4, body_hi, in_movi or ltype == b"movi")
            elif in_movi and cid in (b"00dc", b"00db"):
                frames.append(b[body_lo:body_hi])
            i = body_lo + clen + (clen & 1)

    walk(12, len(b), False)
    if not frames:
        raise NotImplementedError("AVI with no video frames in movi")
    out = []
    for k, payload in enumerate(frames):
        start = k * 1000 * scale // rate
        end = (k + 1) * 1000 * scale // rate
        if payload[:3] == b"\xff\xd8\xff":
            from temporai_mivdp_spark.llmdata.imagecodecs import jpeg_pixels

            px = jpeg_pixels(payload)
        elif len(payload) >= 40 and payload[:4] == (40).to_bytes(4, "little"):
            # bare DIB: synthesize the 14-byte BMPFILEHEADER the BMP
            # decoder expects; pixel data follows the info header +
            # color table directly
            (hdr_size,) = struct.unpack_from("<I", payload, 0)
            _pl, bpp = struct.unpack_from("<HH", payload, 12)
            (clr_used,) = struct.unpack_from("<I", payload, 32)
            pal = (
                (clr_used or (1 << bpp if bpp <= 8 else 0)) * 4
                if bpp <= 8
                else 0
            )
            off = 14 + hdr_size + pal
            bmp = (
                b"BM"
                + struct.pack("<IHHI", 14 + len(payload), 0, 0, off)
                + payload
            )
            px = _bmp_pixels(bmp)
        else:
            raise NotImplementedError("AVI frame handler not MJPEG/DIB")
        out.append((end - start, px))
    return out


VIDEO_METADATA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("codec", StringType(), True),
        StructField("decode_status", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", LongType(), True),
        StructField("fps_milli", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def video_metadata(media: DataFrame) -> DataFrame:
    """Video accounting across codec tiers, Arrow-batched — the video
    sibling of ``audio_metadata``:

    - animated/still GIF → status ``full`` (``imagecodecs.gif_frames``
      decodes the composited timed frames; stats here come from the
      header-only block walk — frame count, summed GCE delays),
    - RIFF AVI → ``full`` for MJPEG/DIB streams (``avi_frames`` decodes
      them), ``header_only`` for other handlers; dims/frames from
      ``avih``, exact-rational fps from the vids stream's
      dwRate/dwScale (``_avi_stats``),
    - Ogg Theora → status ``header_only`` (dims / exact-rational fps /
      frame count / duration from the ident packet + last granule, no
      entropy decode),
    - anything else (or null) → ``unsupported`` with null fields —
      accounting must survive a mixed crawl batch, never throw.

    ``fps_milli`` is fps × 1000 rounded down (exact for GIF's
    centisecond timebase and near-exact for Theora's rational)."""

    def one(mid, payload):
        row = {
            "media_id": mid, "codec": None, "decode_status": "unsupported",
            "width": None, "height": None, "n_frames": None,
            "fps_milli": None, "duration_ms": None,
        }
        if payload is None:
            return row
        b = bytes(payload)
        try:
            if b[:6] in (b"GIF87a", b"GIF89a"):
                w, h, n, dur = _gif_animation_stats(b)
                row.update(
                    codec="gif", decode_status="full", width=w, height=h,
                    n_frames=n, duration_ms=dur,
                    fps_milli=(n * 1_000_000 // dur) if dur > 0 else None,
                )
            elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                codec, w, h, rate, scale, n, dur = _avi_stats(b)
                row.update(
                    codec=codec,
                    decode_status=(
                        "full" if codec in ("mjpeg", "dib") else "header_only"
                    ),
                    width=w, height=h, n_frames=n, duration_ms=dur,
                    fps_milli=rate * 1000 // scale,
                )
            elif b[:4] == b"OggS":
                w, h, frn, frd, n, dur = _theora_stats(b)
                row.update(
                    codec="theora", decode_status="header_only", width=w,
                    height=h, n_frames=n, duration_ms=dur,
                    fps_milli=frn * 1000 // frd,
                )
        except NotImplementedError:
            pass  # stays 'unsupported'
        return row

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [one(m, p) for m, p in zip(pdf["media_id"], pdf["payload"])]
            out = pd.DataFrame(rows)
            for c in ("n_frames", "fps_milli", "duration_ms"):
                out[c] = out[c].astype("Int64")
            for c in ("width", "height"):
                out[c] = out[c].astype("Int32")
            yield out

    return media.select("media_id", "payload").mapInPandas(
        batches, VIDEO_METADATA_SCHEMA
    )


AUDIO_METADATA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("codec", StringType(), True),
        StructField("decode_status", StringType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("bitrate_kbps", IntegerType(), True),
    ]
)


def audio_metadata(media: DataFrame) -> DataFrame:
    """Audio accounting across codec tiers, Arrow-batched: per payload,
    the codec, a ``decode_status`` pipelines can aggregate to quantify
    the fraction the PCM tier skips, and duration / rate / channels /
    bitrate from HEADERS alone:

    - ``pcm_wav`` / ``g711_alaw`` / ``g711_ulaw`` / ``ima_adpcm`` /
      ``ms_adpcm`` →
      status ``full`` (``audio_features``/``audio_spectral`` can decode
      samples — linear PCM at 8/16/24/32 bits, G.711 via the ITU
      expansion tables, IMA / MS ADPCM via the block decoders with
      fmt-extension caps and fact-chunk trims),
    - ``mp3`` / ``vorbis`` / ``opus`` / ``flac`` (bare or in-Ogg) /
      ``wav_fmt_<tag>`` (compressed WAV codecs — MP3-in-WAV, ...) →
      status ``header_only`` (frame/page-header walk, 16 bytes of
      STREAMINFO math for FLAC, or the WAV fmt chunk's byte-rate
      duration — no entropy decode, so metadata is exact but samples
      are unavailable without a codec library),
    - anything else (or a null payload) → status ``unsupported`` with
      null fields, NOT an exception — this operator is the accounting
      tier, so it must survive a mixed crawl batch.
    """

    def one(mid, payload):
        row = {
            "media_id": mid, "codec": None, "decode_status": "unsupported",
            "duration_ms": None, "sample_rate": None, "channels": None,
            "bitrate_kbps": None,
        }
        if payload is None:
            return row
        b = bytes(payload)
        try:
            if b[:4] == b"RIFF":
                tag, ch, sr, br, align, bits, data, extra, fact = _riff_wav_info(b)
                try:
                    tag = _wav_resolve(tag, extra)
                except NotImplementedError:
                    # unresolvable EXTENSIBLE: header tier, labeled by
                    # the CONTAINER tag (wav_fmt_65534) so this surface
                    # agrees with media_decode_status on the same bytes
                    tag = _WAV_EXTENSIBLE
                if tag == _WAV_PCM and bits in (8, 16, 24, 32):
                    n = len(data) // max(ch * (bits // 8), 1)
                    codec, status = "pcm_wav", "full"
                elif tag == _WAV_FLOAT and bits in (32, 64):
                    n = len(data) // max(ch * (bits // 8), 1)
                    codec, status = "pcm_float", "full"
                elif tag in (_WAV_ALAW, _WAV_ULAW):
                    n = len(data) // ch  # G.711 is 1 byte/sample
                    codec = "g711_alaw" if tag == _WAV_ALAW else "g711_ulaw"
                    status = "full"
                elif tag == _WAV_IMA_ADPCM and align >= 4 * ch + 4:
                    n = _ima_data_samples(
                        len(data), ch, align, _ima_ext_wspb(extra), fact
                    )
                    codec, status = "ima_adpcm", "full"
                elif tag == _WAV_MS_ADPCM and align >= 7 * ch + 1:
                    _c1, _c2, _wspb = _ms_coef_table(extra)
                    n = _ms_data_samples(len(data), ch, align, _wspb, fact)
                    codec, status = "ms_adpcm", "full"
                else:
                    # compressed WAV codec (ADPCM, MP3-in-WAV, ...):
                    # duration from the fmt chunk's byte rate — header
                    # math, same tier as the MP3/Ogg walkers
                    n = None
                    codec, status = f"wav_fmt_{tag}", "header_only"
                if n is not None:
                    dur = n * 1000 // max(sr, 1)
                elif br > 0:
                    dur = len(data) * 1000 // br
                else:
                    dur = None
                row.update(
                    codec=codec, decode_status=status,
                    duration_ms=dur, sample_rate=sr, channels=ch,
                    bitrate_kbps=(
                        round(len(b) * 8 / max(dur, 1)) if dur is not None else None
                    ),
                )
            elif b[:4] == b"OggS":
                codec, dur, sr, ch, kbps = _ogg_stats(b)
                row.update(codec=codec, decode_status="header_only",
                           duration_ms=dur, sample_rate=sr, channels=ch,
                           bitrate_kbps=kbps)
            elif b[:3] == b"ID3" or (
                len(b) > 1 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0
            ):
                dur, sr, ch, kbps = _mp3_stats(b)
                row.update(codec="mp3", decode_status="header_only",
                           duration_ms=dur, sample_rate=sr, channels=ch,
                           bitrate_kbps=kbps)
            elif b[:4] == b"fLaC":
                dur, sr, ch, kbps = _flac_stats(b)
                # first frame header validates (CRC-8) -> the sample
                # tier's full RFC 9639 decode applies (every subframe
                # type); STREAMINFO-only or junk-tail payloads stay
                # header_only. Header-cheap claim, same discipline as
                # the AVI mjpeg/dib routing: corrupt frame BODIES
                # surface at the sample tier (CRC-16 raises; crawl
                # mode nulls them).
                full = _flac_has_decodable_frames(b)
                row.update(codec="flac",
                           decode_status="full" if full else "header_only",
                           duration_ms=dur, sample_rate=sr, channels=ch,
                           bitrate_kbps=kbps)
        except (NotImplementedError, wave.Error, EOFError):
            pass  # stays 'unsupported' — accounting must not throw
        return row

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [one(m, p) for m, p in zip(pdf["media_id"], pdf["payload"])]
            out = pd.DataFrame(rows)
            out["duration_ms"] = out["duration_ms"].astype("Int64")
            out["sample_rate"] = out["sample_rate"].astype("Int32")
            out["channels"] = out["channels"].astype("Int32")
            out["bitrate_kbps"] = out["bitrate_kbps"].astype("Int32")
            yield out

    return media.select("media_id", "payload").mapInPandas(
        batches, AUDIO_METADATA_SCHEMA
    )


def _first_sos_ns(b: bytes, start: int) -> int:
    """Component count declared by the first SOS segment at/after
    ``start`` (0 if none before the buffer ends) — segment-length walk,
    no entropy decode."""
    i = start
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker == 0xDA:
            return b[i + 4] if i + 4 < len(b) else 0
        if marker == 0xD9:
            # EOI terminates the stream (review fix: walking past it
            # could misread trailer bytes as an SOS and classify an
            # undecodable payload 'full' — jpeg_pixels breaks here too)
            return 0
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        i += 2 + struct.unpack_from(">H", b, i + 2)[0]
    return 0


def _jpeg_first_sof_marker(b: bytes, start: int = 2) -> int | None:
    """Marker byte of the first SOFn segment at/after ``start`` (None
    if the stream ends or hits EOI first) — segment-length walk only."""
    i = start
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        m = b[i + 1]
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            return m
        if m == 0xD9:
            return None
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        i += 2 + struct.unpack_from(">H", b, i + 2)[0]
    return None


def media_decode_status(b: bytes | None) -> tuple[str, str | None, str]:
    """(modality, codec, decode_status) for one payload — HEADER-CHEAP
    accounting of what the decode tiers can do, no pixel/sample decode:

    - ``full``: the in-repo stdlib decoders produce samples/pixels
      (linear-PCM WAV at 8/16/24/32 bits; G.711 A-law/µ-law and IMA
      ADPCM WAV; PNG; GIF; 8-bit JPEG — SOF0/1/2 Huffman and SOF9/10
      arithmetic; BMP 24/32-bit uncompressed or 1/4/8-bit
      RLE8/uncompressed),
    - ``header_only``: exact metadata from container headers, payload
      decode needs a codec library (MP3, Ogg Vorbis/Opus; compressed
      WAV fmt tags like ADPCM — byte-rate duration; JPEG variants
      the decoder rejects — 12/16-bit precision, lossless-arithmetic
      SOF11, hierarchical SOF13-15 — still carry dimensions in their
      SOF),
    - ``unsupported``: unrecognized or null payloads (including RIFF
      containers that are not walkable WAVE, e.g. AVI).

    The classification MUST track the decoders' real capabilities —
    tests/test_llmdata.py pins status=='full' ⇔ the pixel/sample tier
    succeeds over the synthesized fixture suite, so a decoder change
    that widens/narrows coverage fails there, not silently here."""
    if b is None or len(b) < 4:
        return ("unknown", None, "unsupported")
    if b[:4] == b"RIFF":
        if b[8:12] == b"AVI ":
            try:
                codec = _avi_stats(b)[0]
                return (
                    "video", codec,
                    "full" if codec in ("mjpeg", "dib") else "header_only",
                )
            except NotImplementedError:
                return ("video", "avi", "unsupported")
        try:
            tag, ch, _sr, _br, align, bits, _data, extra, _fact = _riff_wav_info(b)
        except NotImplementedError:
            # RIFF but neither a walkable WAVE nor an AVI
            return ("audio", "wav", "unsupported")
        try:
            tag = _wav_resolve(tag, extra)
        except NotImplementedError:
            return ("audio", f"wav_fmt_{tag}", "header_only")
        if tag == _WAV_PCM and bits in (8, 16, 24, 32):
            return ("audio", "pcm_wav", "full")
        if tag == _WAV_FLOAT and bits in (32, 64):
            return ("audio", "pcm_float", "full")
        if tag == _WAV_ALAW:
            return ("audio", "g711_alaw", "full")
        if tag == _WAV_ULAW:
            return ("audio", "g711_ulaw", "full")
        if tag == _WAV_IMA_ADPCM and align >= 4 * ch + 4:
            return ("audio", "ima_adpcm", "full")
        if tag == _WAV_MS_ADPCM and align >= 7 * ch + 1:
            return ("audio", "ms_adpcm", "full")
        return ("audio", f"wav_fmt_{tag}", "header_only")
    if b[:4] == b"OggS":
        try:
            codec = _ogg_stats(b)[0]
            return ("audio", codec, "header_only")
        except NotImplementedError:
            try:
                _theora_stats(b)
                return ("video", "theora", "header_only")
            except NotImplementedError:
                return ("audio", "ogg", "unsupported")
    if b[:3] == b"ID3" or (b[0] == 0xFF and (b[1] & 0xE0) == 0xE0):
        try:
            _mp3_stats(b)
            return ("audio", "mp3", "header_only")
        except NotImplementedError:
            return ("audio", "mp3", "unsupported")
    if b[:4] == b"fLaC":
        try:
            _flac_stats(b)
            full = _flac_has_decodable_frames(b)
            return ("audio", "flac", "full" if full else "header_only")
        except NotImplementedError:
            return ("audio", "flac", "unsupported")
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        # single IFD walk decides dims validity AND decodability (the
        # generic _image_dims route would parse the same tags twice)
        try:
            _e, t = _tiff_ifd(b)
        except NotImplementedError:
            return ("unknown", None, "unsupported")
        if not (t.get(256, [0])[0] and t.get(257, [0])[0]):
            return ("unknown", None, "unsupported")
        # 8-bit chunky gray/RGB strips (compression none/PackBits/LZW,
        # predictor none/horizontal), 16-bit gray, bilevel
        # none/CCITT-G3/G4 (round 10), and new-style JPEG-in-TIFF
        # (round 10) decode; tiled / non-bilevel-FillOrder-2 / old-style-JPEG /
        # uncompressed-mode-CCITT variants stay header_only
        spp = t.get(277, [1])[0]
        bps = t.get(258, [1] * spp)
        comp = t.get(259, [1])[0]
        pred = t.get(317, [1])[0]
        deep = spp == 1 and bps == [16]
        bilevel = spp == 1 and bps == [1]
        if bilevel:
            t4opts = t.get(292, [0])[0] if comp == 3 else t.get(293, [0])[0]
            comp_ok = comp in (1, 2, 3, 4) and pred == 1 and not (t4opts & 0b10)
        elif comp in (6, 7):
            # comp 7: strips are JPEG streams; comp 6 decodes ONLY in
            # its interchange-format shape (tag 513 pointing at a
            # complete SOI stream). Peek the stream's SOI, and — since
            # lossless returns stored planes verbatim — reject the
            # YCbCr-photometric + SOF3 combination the pixel tier
            # raises on (review fix)
            so = t.get(273 if comp == 7 else 513, [0])[0]
            comp_ok = (
                (all(v == 8 for v in bps) or deep)
                and (comp == 7 or 513 in t)
                and b[so : so + 2] == b"\xff\xd8"
                and not (
                    t.get(262, [1])[0] == 6
                    and _jpeg_first_sof_marker(b, so + 2) == 0xC3
                )
            )
        else:
            comp_ok = (
                (all(v == 8 for v in bps) or deep)
                and comp in (1, 32773, 5)
                and pred in (1, 2)
                and not (pred == 2 and deep)
            )
        ok = (
            322 not in t and 323 not in t
            and t.get(284, [1])[0] == 1
            # FillOrder 2 (LSB-first) decodes for the bilevel fax tiers
            # via per-byte bit reversal (round 10)
            and (t.get(266, [1])[0] == 1 or (bilevel and t.get(266, [1])[0] == 2))
            and spp in (1, 3)
            and (all(v == 8 for v in bps) or deep or bilevel)
            and comp_ok
            # YCbCr (6) is decodable only under the JPEG compressions
            and t.get(262, [1])[0] in ((0, 1, 2, 6) if comp in (6, 7) else (0, 1, 2))
            and (t.get(262, [1])[0] in (2, 6)) == (spp == 3)
            and (comp == 6 or (bool(t.get(273)) and bool(t.get(279))))
        )
        return ("image", "tiff", "full" if ok else "header_only")
    if b[:2] in (b"P5", b"P6"):
        try:
            maxval = _pnm_header(b)[2]
        except (NotImplementedError, ValueError):
            return ("unknown", None, "unsupported")
        # binary P5/P6 decode at 8- and 16-bit; odd maxvals stay header
        return (
            "image", "pnm",
            "full" if maxval in (255, 65535) else "header_only",
        )
    dims = _image_dims(b)
    if dims is None:
        return ("unknown", None, "unsupported")
    fmt = dims[0]
    if fmt == "jpeg":
        # dims came from the first SOFn segment; decodability depends on
        # WHICH one and the sample precision (imagecodecs.jpeg_pixels
        # accepts 8-bit SOF0/1/2 Huffman and SOF9/10 arithmetic)
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                # 8-bit decodes on all supported SOFs; 12-bit (round 9)
                # on the Huffman modes only; lossless SOF3 on
                # single-component (round 9) and interleaved 1:1
                # 3-component (round 10) frames at any legal precision —
                # 12-bit arithmetic, hierarchical, and subsampled
                # lossless stay header_only
                prec = b[i + 4]
                nc = b[i + 9]
                lossless_ok = marker == 0xC3 and 2 <= prec <= 16 and (
                    nc == 1
                    or (
                        nc == 3
                        and i + 10 + 3 * nc <= len(b)
                        and all(b[i + 11 + 3 * c] == 0x11 for c in range(nc))
                        # the decoder handles ONE interleaved scan; a
                        # non-interleaved 3-scan lossless file (legal
                        # per Annex H) must not classify 'full'
                        # (review fix): require the first SOS to
                        # declare all three components
                        and _first_sos_ns(b, i) == 3
                    )
                )
                ok = (
                    (marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA) and prec == 8)
                    or (marker in (0xC0, 0xC1, 0xC2) and prec == 12)
                    or lossless_ok
                )
                return ("image", "jpeg", "full" if ok else "header_only")
            i += 2 + struct.unpack_from(">H", b, i + 2)[0]
        return ("image", "jpeg", "header_only")
    if fmt == "bmp":
        bpp = struct.unpack_from("<HH", b, 26)[1] if len(b) >= 34 else 0
        comp = struct.unpack_from("<I", b, 30)[0] if len(b) >= 34 else 99
        ok = (
            (bpp in (24, 32) and comp == 0)
            or (bpp in (1, 4, 8) and comp == 0)
            or (bpp == 8 and comp == 1)   # RLE8
            or (bpp == 4 and comp == 2)   # RLE4
        )
        return ("image", "bmp", "full" if ok else "header_only")
    return ("image", fmt, "full")  # png, gif (tiff/pnm handled above)


DECODE_ROLLUP_SCHEMA = StructType(
    [
        StructField("modality", StringType(), False),
        StructField("codec", StringType(), True),
        StructField("decode_status", StringType(), False),
        StructField("n_bytes", LongType(), True),
    ]
)


def media_decode_rollup(media: DataFrame) -> DataFrame:
    """The curation-surface answer to "what fraction of image/audio bytes
    did we only header-scan?": per (modality, decode_status), item and
    byte counts plus within-modality fractions.

    Plan: one Arrow-batched classification pass (header sniffing only —
    no decode), then a groupBy over a key space bounded by
    #modalities × #statuses (≤ ~12 rows), so the shuffle is trivially
    small at any corpus size; fractions come from a broadcast join
    against the ≤4-row per-modality totals — no window, no driver math.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for p in pdf["payload"]:
                b = None if p is None else bytes(p)
                modality, codec, status = media_decode_status(b)
                rows.append(
                    {
                        "modality": modality,
                        "codec": codec,
                        "decode_status": status,
                        "n_bytes": 0 if b is None else len(b),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_ROLLUP_SCHEMA])

    classified = media.select("payload").mapInPandas(batches, DECODE_ROLLUP_SCHEMA)
    per_status = classified.groupBy("modality", "decode_status").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("n_bytes"),
    )
    totals = per_status.groupBy("modality").agg(
        F.sum("n_items").alias("__tot_items"),
        F.sum("n_bytes").alias("__tot_bytes"),
    )
    return (
        per_status.join(F.broadcast(totals), "modality")
        .select(
            "modality",
            "decode_status",
            "n_items",
            "n_bytes",
            F.round(F.col("n_items") / F.col("__tot_items"), 6).alias("frac_items"),
            F.round(
                F.col("n_bytes") / F.greatest(F.col("__tot_bytes"), F.lit(1)), 6
            ).alias("frac_bytes"),
        )
    )


def _bmp_rle8(b: bytes, off: int, w: int, h: int) -> np.ndarray:
    """Decode a BI_RLE8 pixel stream to (h, w) palette indices
    (bottom-up rows, per the spec): runs, absolute chunks (word-
    aligned), end-of-line (0,0), end-of-bitmap (0,1), delta (0,2)."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = off
    while i + 1 < len(b):
        n, v = b[i], b[i + 1]
        i += 2
        if n > 0:  # run of n copies of v
            if y >= h or x + n > w:
                raise NotImplementedError("malformed RLE8 stream (run past bitmap)")
            out[y, x : x + n] = v
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
            if y >= h:
                break
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta — only bounds-checked at the next write so a
            # trailing delta-to-edge followed by end-of-bitmap stays legal
            x += b[i]
            y += b[i + 1]
            i += 2
        else:  # absolute: v literal bytes, padded to a word boundary
            if y >= h or x + v > w:
                raise NotImplementedError("malformed RLE8 stream (run past bitmap)")
            out[y, x : x + v] = np.frombuffer(b, np.uint8, v, i)
            x += v
            i += v + (v & 1)
    return out[::-1]  # expose top-down like the uncompressed path


def _bmp_rle4(b: bytes, off: int, w: int, h: int) -> np.ndarray:
    """Decode a BI_RLE4 pixel stream to (h, w) palette indices — the
    4-bit sibling of ``_bmp_rle8``: a run of n pixels ALTERNATES the
    byte's high and low nibbles; absolute chunks pack two pixels per
    byte (high nibble first) padded to a word boundary; the (0,0) /
    (0,1) / (0,2) escapes are identical."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = off
    while i + 1 < len(b):
        n, v = b[i], b[i + 1]
        i += 2
        if n > 0:  # n pixels alternating v's high/low nibbles
            if y >= h or x + n > w:
                raise NotImplementedError("malformed RLE4 stream (run past bitmap)")
            pair = np.array([v >> 4, v & 0xF], np.uint8)
            out[y, x : x + n] = np.tile(pair, (n + 1) // 2)[:n]
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
            if y >= h:
                break
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta (bounds-checked at the next write)
            x += b[i]
            y += b[i + 1]
            i += 2
        else:  # absolute: v pixels, two per byte, word-aligned
            if y >= h or x + v > w:
                raise NotImplementedError("malformed RLE4 stream (run past bitmap)")
            nbytes = (v + 1) // 2
            packed = np.frombuffer(b, np.uint8, nbytes, i)
            nibs = np.empty(nbytes * 2, np.uint8)
            nibs[0::2] = packed >> 4
            nibs[1::2] = packed & 0xF
            out[y, x : x + v] = nibs[:v]
            x += v
            i += nbytes + (nbytes & 1)
    return out[::-1]  # expose top-down like the uncompressed path


def _bmp_pixels(b: bytes) -> np.ndarray:
    """Decode a BMP to an (h, w, 3) RGB uint8 array — pure struct +
    numpy: uncompressed 24/32-bit, paletted 1/4/8-bit (BGRX color
    table), and RLE8/RLE4-compressed 4/8-bit; bottom-up and top-down
    row orders, 4-byte row padding. 16-bit bitfield variants raise
    ``NotImplementedError``."""
    if len(b) < 54 or b[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", b, 10)
    (hdr_size,) = struct.unpack_from("<I", b, 14)
    w, h = struct.unpack_from("<ii", b, 18)
    _planes, bpp = struct.unpack_from("<HH", b, 26)
    (compression,) = struct.unpack_from("<I", b, 30)
    (clr_used,) = struct.unpack_from("<I", b, 46)
    bottom_up = h > 0
    h = abs(h)
    if bpp in (24, 32) and compression == 0:
        bypp = bpp // 8
        stride = (w * bypp + 3) & ~3
        arr = (
            np.frombuffer(b, np.uint8, count=stride * h, offset=data_off)
            .reshape(h, stride)[:, : w * bypp]
            .reshape(h, w, bypp)
        )
        if bottom_up:
            arr = arr[::-1]
        return np.ascontiguousarray(arr[:, :, 2::-1])  # BGR(X) -> RGB
    if bpp in (1, 4, 8) and compression in (0, 1, 2):
        n_colors = clr_used or (1 << bpp)
        pal_off = 14 + hdr_size
        pal = np.frombuffer(b, np.uint8, n_colors * 4, pal_off).reshape(
            n_colors, 4
        )[:, 2::-1]  # BGRX -> RGB
        if compression in (1, 2):  # BI_RLE8 / BI_RLE4
            if (compression == 1) != (bpp == 8) or (compression == 2) != (bpp == 4):
                raise NotImplementedError("BMP RLE type must match bit depth")
            rle = _bmp_rle8 if compression == 1 else _bmp_rle4
            idx = rle(b, data_off, w, h)
            if not bottom_up:
                idx = idx[::-1]
            # same out-of-range-palette policy as the uncompressed
            # paletted path below: raise, never silently clamp
            if int(idx.max(initial=0)) >= n_colors:
                raise NotImplementedError("BMP palette index out of range")
            return pal[idx.astype(np.intp)]
        stride = ((w * bpp + 31) // 32) * 4
        rows = np.frombuffer(
            b, np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)
        if bpp == 8:
            idx = rows[:, :w].astype(np.intp)
        else:  # 1/4-bit: MSB-first within each byte
            bits = np.unpackbits(rows, axis=1)
            spb = bpp
            samples = bits[:, : w * spb].reshape(h, w, spb)
            weights = 1 << np.arange(spb - 1, -1, -1)
            idx = (samples * weights).sum(axis=2).astype(np.intp)
        if bottom_up:
            idx = idx[::-1]
        if int(idx.max(initial=0)) >= n_colors:
            raise NotImplementedError("BMP palette index out of range")
        return pal[idx]
    raise NotImplementedError(
        f"BMP variant needs codec libs (bpp={bpp}, compression={compression})"
    )


def _png_unfilter(raw: bytes, pos: int, h: int, stride: int, bpp: int):
    """Reconstruct ``h`` filtered scanlines of ``stride`` bytes each
    (``bpp`` = bytes per pixel for the Sub/Paeth left-neighbor offset).
    Returns the (h, stride) byte matrix and the new stream position.

    Filter cost: None/Up are whole-row numpy; Sub is a per-pixel-column
    cumsum (byte addition mod 256 is associative, so the running
    dependency collapses); Average/Paeth have a true per-pixel data
    dependency (nonlinear predictor) and fall back to a Python loop over
    the row — encoders that care about decode throughput here should
    emit filters 0-2, and a 100 TB media sweep should be using the
    header-only ``image_dims`` anyway unless it truly needs pixels."""
    if len(raw) - pos < h * (stride + 1):
        raise NotImplementedError("PNG pixel data truncated")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1)
        pos += 1 + stride
        if f == 0:
            rec = row.copy()
        elif f == 1:  # Sub
            n_px = stride // bpp
            px = row[: n_px * bpp].reshape(n_px, bpp).astype(np.uint32)
            rec = (np.cumsum(px, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
            if stride % bpp:  # stride not divisible (never for valid PNG)
                rec = np.concatenate([rec, row[n_px * bpp :]])
        elif f == 2:  # Up (uint8 addition wraps mod 256 natively)
            rec = row + prev
        elif f in (3, 4):  # Average / Paeth
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                if f == 3:
                    pred = (a + up) >> 1
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    pr = a + up - c
                    pa, pb, pc = abs(pr - a), abs(pr - up), abs(pr - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise NotImplementedError(f"unknown PNG filter type {f}")
        out[y] = rec
        prev = rec
    return out, pos


def _png_rows_to_samples(rows: np.ndarray, w: int, ch: int, depth: int) -> np.ndarray:
    """Filtered byte rows -> (h, w, ch) uint8 sample array. 16-bit
    samples keep the high byte (standard 8-bit downconversion);
    1/2/4-bit samples unpack MSB-first (valid only for 1-channel color
    types, which is all the spec allows)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * ch].reshape(h, w, ch)
    if depth == 16:
        return rows[:, : w * ch * 2].reshape(h, w, ch, 2)[:, :, :, 0]
    # sub-byte: ch == 1 per the PNG spec
    bits = np.unpackbits(rows, axis=1)
    spb = depth  # bits per sample
    samples = bits[:, : w * spb].reshape(h, w, spb)
    weights = (1 << np.arange(spb - 1, -1, -1)).astype(np.uint8)
    return (samples * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8)[
        :, :, None
    ]


#: Adam7 pass grid: (x0, y0, dx, dy) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_pixels(b: bytes) -> np.ndarray:
    """Decode a PNG to an (h, w, 3) RGB uint8 array with the stdlib
    only: chunk walk, ``zlib`` inflate of the IDAT stream, per-scanline
    reconstruction of all five PNG filters, then sample conversion.
    Covers every legal IHDR combination: bit depths 1/2/4/8/16, color
    types 0 (gray), 2 (RGB), 3 (paletted via PLTE), 4 (gray+alpha),
    6 (RGBA), and both interlace methods (none and Adam7 — each of the
    7 passes is an independently filtered sub-image scattered onto the
    output grid). Gray replicates to 3 channels; alpha is dropped;
    16-bit keeps the high byte; sub-byte gray scales to full range."""
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("not a PNG payload")
    ihdr: bytes | None = None
    plte: np.ndarray | None = None
    idat = bytearray()
    i = 8
    while i + 8 <= len(b):
        (ln,) = struct.unpack_from(">I", b, i)
        typ = b[i + 4 : i + 8]
        if typ == b"IHDR":
            ihdr = b[i + 8 : i + 8 + ln]
        elif typ == b"PLTE":
            plte = np.frombuffer(b, np.uint8, ln, i + 8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += b[i + 8 : i + 8 + ln]
        elif typ == b"IEND":
            break
        i += 12 + ln  # length + type + data + crc
    if ihdr is None or len(ihdr) < 13:
        raise NotImplementedError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr[:13])
    legal = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
    if comp != 0 or filt != 0 or interlace > 1 or ctype not in legal \
            or depth not in legal[ctype]:
        raise NotImplementedError(
            f"PNG variant outside the spec (depth={depth}, color_type={ctype}, "
            f"interlace={interlace})"
        )
    if ctype == 3 and plte is None:
        raise NotImplementedError("paletted PNG missing PLTE")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    bpp = max(1, ch * depth // 8)
    raw = zlib.decompress(bytes(idat))
    samples = np.zeros((h, w, ch), dtype=np.uint8)
    if interlace == 0:
        stride = (w * ch * depth + 7) // 8
        rows, _ = _png_unfilter(raw, 0, h, stride, bpp)
        samples = _png_rows_to_samples(rows, w, ch, depth)
    else:  # Adam7
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * ch * depth + 7) // 8
            rows, pos = _png_unfilter(raw, pos, ph, stride, bpp)
            samples[y0::dy, x0::dx] = _png_rows_to_samples(rows, pw, ch, depth)
    if ctype == 3:
        if int(samples.max()) >= len(plte):
            raise NotImplementedError("PNG palette index out of range")
        return plte[samples[:, :, 0]]
    if ctype in (0, 4):
        g = samples[:, :, 0]
        if depth < 8:  # scale 1/2/4-bit gray to full range
            g = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return np.ascontiguousarray(samples[:, :, :3])


def _tiff_ifd(b: bytes) -> tuple[str, dict[int, list[int]]]:
    """(endian, {tag: values}) from a TIFF header + first IFD. Values
    resolve SHORT(3)/LONG(4)/BYTE(1) entries, inline or offset-stored.
    Raises ``NotImplementedError`` on malformed/truncated input."""
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        raise NotImplementedError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(e + "I", b, 4)
    if ifd_off + 2 > len(b):
        raise NotImplementedError("truncated TIFF IFD offset")
    (n,) = struct.unpack_from(e + "H", b, ifd_off)
    tags: dict[int, list[int]] = {}
    # type 7 (UNDEFINED) is byte-sized; materialize it ONLY for
    # JPEGTables (347) — real TIFFs carry multi-hundred-KB type-7 blobs
    # (ICC profiles, Photoshop resources) that would otherwise become
    # million-element int lists on the per-payload classify path
    sizes = {1: 1, 3: 2, 4: 4, 7: 1}
    fmts = {1: "B", 3: "H", 4: "I", 7: "B"}
    for k in range(n):
        off = ifd_off + 2 + 12 * k
        if off + 12 > len(b):
            raise NotImplementedError("truncated TIFF IFD entry")
        tag, typ = struct.unpack_from(e + "HH", b, off)
        (cnt,) = struct.unpack_from(e + "I", b, off + 4)
        if typ not in sizes or (typ == 7 and tag != 347):
            continue  # RATIONAL / non-JPEGTables UNDEFINED — not needed
        total = sizes[typ] * cnt
        src = off + 8 if total <= 4 else struct.unpack_from(e + "I", b, off + 8)[0]
        if src + total > len(b):
            raise NotImplementedError("TIFF values past end of payload")
        tags[tag] = list(struct.unpack_from(e + str(cnt) + fmts[typ], b, src))
    return e, tags


def _tiff_lzw(data: bytes, expect: int) -> bytes:
    """TIFF-variant LZW (compression 5): MSB-first code packing,
    ClearCode 256 / EOI 257, 9→12-bit codes with the spec's EARLY
    code-width change (the width grows when the NEXT code to be added
    is 2^w − 1, one code earlier than GIF's variant). Decodes until
    ``expect`` bytes or EOI; raises on malformed streams."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    acc = nbits = 0
    i = 0
    while len(out) < expect:
        while nbits < width:
            if i >= len(data):
                raise NotImplementedError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[i]
            i += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 256:
            reset()
            continue
        if code == 257:
            break
        if prev is None:
            if code > 255:
                raise NotImplementedError("TIFF LZW first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise NotImplementedError("TIFF LZW code past table end")
        out += entry
        prev = entry
        # EARLY CHANGE, decoder side: the decoder's table lags the
        # encoder's by ONE entry (it learns each entry's first byte
        # from the NEXT code), so it widens at 2^w - 2 where the
        # encoder widened at 2^w - 1
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < expect:
        raise NotImplementedError("TIFF LZW stream shorter than raster")
    return bytes(out[:expect])


def _packbits(data: bytes, expect: int) -> bytes:
    """Apple PackBits decompression (TIFF compression 32773)."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        nv = data[i]
        if nv < 128:  # literal run of n+1 bytes
            out += data[i + 1 : i + 2 + nv]
            i += 2 + nv
        elif nv > 128:  # repeat next byte 257-n times
            if i + 1 >= len(data):
                raise NotImplementedError("truncated PackBits repeat")
            out += bytes([data[i + 1]]) * (257 - nv)
            i += 2
        else:  # 128: no-op
            i += 1
    if len(out) < expect:
        raise NotImplementedError("PackBits stream shorter than raster")
    return bytes(out[:expect])


# ---------------------------------------------------------------------------
# CCITT Group 3 / Group 4 bilevel decompression (TIFF compressions 2/3/4).
#
# Implemented from the public ITU-T T.4 (Group 3) and T.6 (Group 4)
# recommendations: Modified Huffman run-length tables (T.4 tables 1-3),
# the 2D vertical/pass/horizontal mode codes, and the reference-line
# changing-element algebra. Round 10; pinned against an independent
# test-side T.4/T.6 ENCODER (tests/test_tiff_ccitt.py) plus hand-checked
# spec byte vectors, the same playbook as the FLAC/ADPCM decoders. The
# reference repo has no media handling at all (SURVEY.md §2) — this is
# part of the training-data-pipeline tier, scanned-document corpora
# being overwhelmingly G4-in-TIFF.
# ---------------------------------------------------------------------------

#: T.4 table 1/2: terminating (0-63) + makeup (64-1728) codes, and the
#: shared extended makeups (1792-2560). Written as "run:bitstring" from
#: the published tables; decode dicts and the test-side encoder both
#: derive from THIS literal, while the independent encoder in
#: tests/test_tiff_ccitt.py carries its own transcription — a typo in
#: either side breaks the round-trip differentials.
_T4_WHITE = (
    "0:00110101 1:000111 2:0111 3:1000 4:1011 5:1100 6:1110 7:1111 "
    "8:10011 9:10100 10:00111 11:01000 12:001000 13:000011 14:110100 "
    "15:110101 16:101010 17:101011 18:0100111 19:0001100 20:0001000 "
    "21:0010111 22:0000011 23:0000100 24:0101000 25:0101011 26:0010011 "
    "27:0100100 28:0011000 29:00000010 30:00000011 31:00011010 "
    "32:00011011 33:00010010 34:00010011 35:00010100 36:00010101 "
    "37:00010110 38:00010111 39:00101000 40:00101001 41:00101010 "
    "42:00101011 43:00101100 44:00101101 45:00000100 46:00000101 "
    "47:00001010 48:00001011 49:01010010 50:01010011 51:01010100 "
    "52:01010101 53:00100100 54:00100101 55:01011000 56:01011001 "
    "57:01011010 58:01011011 59:01001010 60:01001011 61:00110010 "
    "62:00110011 63:00110100 "
    "64:11011 128:10010 192:010111 256:0110111 320:00110110 384:00110111 "
    "448:01100100 512:01100101 576:01101000 640:01100111 704:011001100 "
    "768:011001101 832:011010010 896:011010011 960:011010100 "
    "1024:011010101 1088:011010110 1152:011010111 1216:011011000 "
    "1280:011011001 1344:011011010 1408:011011011 1472:010011000 "
    "1536:010011001 1600:010011010 1664:011000 1728:010011011"
)

_T4_BLACK = (
    "0:0000110111 1:010 2:11 3:10 4:011 5:0011 6:0010 7:00011 8:000101 "
    "9:000100 10:0000100 11:0000101 12:0000111 13:00000100 14:00000111 "
    "15:000011000 16:0000010111 17:0000011000 18:0000001000 "
    "19:00001100111 20:00001101000 21:00001101100 22:00000110111 "
    "23:00000101000 24:00000010111 25:00000011000 26:000011001010 "
    "27:000011001011 28:000011001100 29:000011001101 30:000001101000 "
    "31:000001101001 32:000001101010 33:000001101011 34:000011010010 "
    "35:000011010011 36:000011010100 37:000011010101 38:000011010110 "
    "39:000011010111 40:000001101100 41:000001101101 42:000011011010 "
    "43:000011011011 44:000001010100 45:000001010101 46:000001010110 "
    "47:000001010111 48:000001100100 49:000001100101 50:000001010010 "
    "51:000001010011 52:000000100100 53:000000110111 54:000000111000 "
    "55:000000100111 56:000000101000 57:000001011000 58:000001011001 "
    "59:000000101011 60:000000101100 61:000001011010 62:000001100110 "
    "63:000001100111 "
    "64:0000001111 128:000011001000 192:000011001001 256:000001011011 "
    "320:000000110011 384:000000110100 448:000000110101 512:0000001101100 "
    "576:0000001101101 640:0000001001010 704:0000001001011 "
    "768:0000001001100 832:0000001001101 896:0000001110010 "
    "960:0000001110011 1024:0000001110100 1088:0000001110101 "
    "1152:0000001110110 1216:0000001110111 1280:0000001010010 "
    "1344:0000001010011 1408:0000001010100 1472:0000001010101 "
    "1536:0000001011010 1600:0000001011011 1664:0000001100100 "
    "1728:0000001100101"
)

_T4_EXT = (
    "1792:00000001000 1856:00000001100 1920:00000001101 1984:000000010010 "
    "2048:000000010011 2112:000000010100 2176:000000010101 "
    "2240:000000010110 2304:000000010111 2368:000000011100 "
    "2432:000000011101 2496:000000011110 2560:000000011111"
)


def _t4_table(spec: str) -> dict[tuple[int, int], int]:
    """{(bit_length, code_value): run} decode table from a spec literal."""
    out: dict[tuple[int, int], int] = {}
    for item in spec.split():
        run, code = item.split(":")
        out[(len(code), int(code, 2))] = int(run)
    return out


_T4_DEC_WHITE = {**_t4_table(_T4_WHITE), **_t4_table(_T4_EXT)}
_T4_DEC_BLACK = {**_t4_table(_T4_BLACK), **_t4_table(_T4_EXT)}

#: 2D mode codes (T.4 §4.2.1.3.7, shared verbatim by T.6): value is
#: ('P',), ('H',) or ('V', delta).
_T4_MODES = {
    (1, 0b1): ("V", 0),
    (3, 0b011): ("V", 1),
    (6, 0b000011): ("V", 2),
    (7, 0b0000011): ("V", 3),
    (3, 0b010): ("V", -1),
    (6, 0b000010): ("V", -2),
    (7, 0b0000010): ("V", -3),
    (3, 0b001): ("H", 0),
    (4, 0b0001): ("P", 0),
}


class _CcittReader:
    """MSB-first bit reader for CCITT streams (no marker semantics —
    fax data is a raw bit sequence, unlike the JPEG readers above)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bitpos = 0

    def read_bit(self) -> int:
        byte, off = divmod(self.bitpos, 8)
        if byte >= len(self.data):
            raise NotImplementedError("truncated CCITT stream")
        self.bitpos += 1
        return (self.data[byte] >> (7 - off)) & 1

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def exhausted(self) -> bool:
        return self.bitpos >= 8 * len(self.data)

    def read_code(self, table: dict[tuple[int, int], int], limit: int = 14):
        """Read one variable-length code from ``table`` (max ``limit``
        bits). Raises on no match — hostile/corrupt stream."""
        n = v = 0
        while n < limit:
            v = (v << 1) | self.read_bit()
            n += 1
            got = table.get((n, v))
            if got is not None:
                return got
        raise NotImplementedError("invalid CCITT code")


def _ccitt_run(br: _CcittReader, white: bool) -> int:
    """One complete MH run: zero or more makeup codes, then a
    terminating code (< 64). T.4 allows chained 2560 makeups for very
    wide rows."""
    table = _T4_DEC_WHITE if white else _T4_DEC_BLACK
    total = 0
    for _ in range(64):  # > (2**31 / 2560) rows don't exist; bound the loop
        run = br.read_code(table)
        total += run
        if run < 64:
            return total
    raise NotImplementedError("CCITT makeup chain never terminated")


def _ccitt_1d_row(br: _CcittReader, w: int) -> list[int]:
    """Decode one MH 1D row; returns the row's changing-element
    positions (transitions), alternating white→black / black→white."""
    trans: list[int] = []
    pos, white = 0, True
    while pos < w:
        run = _ccitt_run(br, white)
        pos += run
        if pos > w:
            raise NotImplementedError("CCITT run overflows row width")
        trans.append(pos)
        white = not white
    # drop the trailing sentinel transition at pos == w (not a change)
    if trans and trans[-1] == w:
        trans.pop()
    return trans


def _ccitt_2d_row(br: _CcittReader, ref: list[int], w: int) -> list[int]:
    """Decode one 2D-coded row (T.4 2D == T.6 coding) against the
    reference row's changing elements. Returns this row's changing
    elements."""
    import bisect

    cur: list[int] = []
    a0, white = -1, True
    while a0 < w:
        # b1: first changing element of ref strictly right of a0 whose
        # parity marks a change to the color OPPOSITE the current one
        # (even index = white->black). b2: the next one after b1.
        idx = bisect.bisect_right(ref, a0)
        if (idx & 1) != (0 if white else 1):
            idx += 1
        b1 = ref[idx] if idx < len(ref) else w
        b2 = ref[idx + 1] if idx + 1 < len(ref) else w
        mode, dv = br.read_code(_T4_MODES, limit=7), 0
        kind = mode[0]
        if kind == "V":
            dv = mode[1]
        if kind == "P":
            a0 = b2  # color run continues through b2; no transition
            continue
        if kind == "V":
            a1 = b1 + dv
            # strictly right of a0 (review fix: checking cur[-1] alone
            # let a corrupt stream place a1 behind a pass-advanced a0
            # and return a plausible-but-wrong raster instead of the
            # crawl-mode degrade)
            if a1 <= a0 or a1 > w:
                raise NotImplementedError("CCITT vertical mode out of range")
            cur.append(a1)
            a0, white = a1, not white
            continue
        # horizontal: two explicit runs in the CURRENT color then its
        # opposite; a0 of -1 counts from 0 (the imaginary start element)
        start = a0 if a0 >= 0 else 0
        r1 = _ccitt_run(br, white)
        r2 = _ccitt_run(br, not white)
        # two zero-length runs are legal bit patterns but leave a0
        # unchanged — a hostile stream could loop here for O(stream-bits)
        # appending empty transitions until bit exhaustion. No conforming
        # encoder emits a zero-advance horizontal pair; degrade crawl-mode
        # like the other out-of-range guards (advice r10)
        if r1 + r2 == 0:
            raise NotImplementedError("CCITT zero-advance horizontal pair")
        t1, t2 = start + r1, start + r1 + r2
        if t2 > w or t1 < start:
            raise NotImplementedError("CCITT horizontal runs overflow row")
        cur.append(t1)
        cur.append(t2)
        a0 = t2
    while cur and cur[-1] >= w:
        cur.pop()  # trailing w sentinels are not changes
    return cur


def _ccitt_find_eol(br: _CcittReader, max_fill: int = 4096) -> None:
    """Consume fill bits + one EOL (000000000001). T.4 allows arbitrary
    zero fill before the EOL; bound it so hostile streams terminate."""
    zeros = 0
    for _ in range(max_fill):
        if br.read_bit():
            if zeros >= 11:
                return
            raise NotImplementedError("CCITT EOL expected")
        zeros += 1
    raise NotImplementedError("CCITT fill run never reached EOL")


def _trans_to_row(trans: list[int], w: int) -> np.ndarray:
    """Changing elements → uint8 row of {0(white), 1(black)}."""
    row = np.zeros(w, np.uint8)
    for i in range(0, len(trans), 2):
        start = trans[i]
        end = trans[i + 1] if i + 1 < len(trans) else w
        row[start:end] = 1
    return row


def _ccitt_decode(data: bytes, w: int, h: int, comp: int, t4opts: int) -> np.ndarray:
    """Decode one CCITT-compressed TIFF strip to an (h, w) uint8 raster
    of {0(white), 1(black)}.

    comp 2 — Modified Huffman: byte-aligned 1D rows, no EOLs.
    comp 3 — T.4 Group 3: EOL before every row; T4Options bit 0 adds the
      per-row tag bit selecting 1D/2D coding (2D rows reference the
      previous row); bit 2 (fill to byte before EOL) is tolerated
      implicitly by the fill scan. Uncompressed mode (bit 1) rejects.
      Review-hardened tolerance: legacy writers emit G3-1D with NO
      EOLs at all; the two shapes are unambiguous at the stream head
      (an EOL opens with >= 11 zero bits, while no legal MH code
      carries more than 7 leading zeros), so a 1D strip that does not
      open with an EOL decodes as back-to-back rows. No-EOL 2D is
      rejected — the per-row 1D/2D tag bit only exists after an EOL.
    comp 4 — T.6 Group 4: pure 2D against an imaginary all-white first
      reference line, no EOLs; the trailing EOFB is ignored.
    """
    if t4opts & 0b10:
        raise NotImplementedError("CCITT uncompressed mode not supported")
    br = _CcittReader(data)
    rows = np.zeros((h, w), np.uint8)
    ref: list[int] = []  # imaginary all-white line above row 0
    two_d_g3 = comp == 3 and bool(t4opts & 0b1)
    eol_mode = True
    if comp == 3:
        # unambiguous head peek: >= 11 leading zero bits == EOL stream
        lead = 0
        for i in range(min(len(data), 8) * 8):
            if (data[i // 8] >> (7 - i % 8)) & 1:
                break
            lead += 1
        eol_mode = lead >= 11
        if two_d_g3 and not eol_mode:
            raise NotImplementedError("G3 2D stream without EOLs")
    for y in range(h):
        if comp == 2:
            if y:
                br.align()
            trans = _ccitt_1d_row(br, w)
        elif comp == 3:
            if eol_mode:
                _ccitt_find_eol(br)
                if two_d_g3 and br.read_bit() == 0:
                    trans = _ccitt_2d_row(br, ref, w)
                else:
                    trans = _ccitt_1d_row(br, w)
            else:
                trans = _ccitt_1d_row(br, w)
        else:  # comp 4
            trans = _ccitt_2d_row(br, ref, w)
        rows[y] = _trans_to_row(trans, w)
        ref = trans
    return rows


def _jpeg_table_segments(tables: bytes) -> bytes:
    """The DQT/DHT/DAC segment bytes of a JPEGTables (tag 347) stream —
    its own SOI/EOI wrappers dropped, per TIFF/EP. Raises on anything
    that is not a pure table stream."""
    if tables[:2] != b"\xff\xd8":
        raise NotImplementedError("JPEGTables stream missing SOI")
    i, out = 2, bytearray()
    while i + 2 <= len(tables):
        if tables[i] != 0xFF:
            raise NotImplementedError("JPEGTables stream desynced")
        marker = tables[i + 1]
        if marker == 0xD9:
            return bytes(out)
        if i + 4 > len(tables):
            break
        seglen = struct.unpack_from(">H", tables, i + 2)[0]
        if marker not in (0xC4, 0xDB, 0xCC):
            raise NotImplementedError("non-table segment in JPEGTables")
        out += tables[i : i + 2 + seglen]
        i += 2 + seglen
    raise NotImplementedError("JPEGTables stream missing EOI")


def _tiff_jpeg_pixels(
    b: bytes, t: dict, w: int, h: int, rps: int,
    offsets: list[int], counts: list[int], photo: int, spp: int,
) -> np.ndarray:
    """New-style JPEG-in-TIFF (compression 7): every strip is a complete
    JPEG interchange stream covering its rows; shared tables from an
    optional JPEGTables (347) are spliced in after each strip's SOI.
    The actual entropy/pixel work is ``imagecodecs.jpeg_pixels`` — the
    same decoder every bare-JPEG payload goes through, so all its
    flavors (baseline/progressive/arithmetic/12-bit/lossless) come for
    free inside the TIFF container. Photometric 6 (YCbCr, the normal
    JFIF-in-TIFF shape) takes jpeg_pixels' own transform; photometric 2
    means the components are STORED as R,G,B, so the transform is
    suppressed (``raw_rgb`` — round-10 review fix: the transform used
    to be applied to RGB-stored strips)."""
    from temporai_mivdp_spark.llmdata.imagecodecs import jpeg_pixels

    if photo not in (0, 1, 2, 6):
        raise NotImplementedError("unsupported JPEG-in-TIFF photometric")
    raw_rgb = photo == 2
    tbl = b""
    if 347 in t:
        # tag 347 is UNDEFINED(7)-typed; _tiff_ifd surfaces it as byte
        # values, so the list IS the stream
        tbl = _jpeg_table_segments(bytes(t[347]))
    parts: list[np.ndarray] = []
    y = 0
    for so, sc in zip(offsets, counts):
        strip = b[so : so + sc]
        if len(strip) < sc:
            raise NotImplementedError("TIFF strip past end of payload")
        if strip[:2] != b"\xff\xd8":
            raise NotImplementedError("JPEG-in-TIFF strip missing SOI")
        if photo == 6 and _jpeg_first_sof_marker(strip) == 0xC3:
            # lossless returns stored planes verbatim — it cannot honor
            # a YCbCr photometric claim (review fix: this used to
            # decode as if RGB-stored while classifying full)
            raise NotImplementedError("YCbCr lossless JPEG-in-TIFF not supported")
        px = jpeg_pixels(strip[:2] + tbl + strip[2:], raw_rgb=raw_rgb)
        nrows = min(rps, h - y)
        if px.shape[1] != w or px.shape[0] < nrows:
            raise NotImplementedError("JPEG-in-TIFF strip dims disagree with IFD")
        parts.append(px[:nrows])
        y += nrows
    if y < h:
        raise NotImplementedError("TIFF strips cover fewer rows than ImageLength")
    out = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)
    if photo == 0 and spp == 1:
        out = (255 - out).astype(np.uint8)  # WhiteIsZero grayscale JPEG
    return out


def _tiff_pixels(b: bytes) -> np.ndarray:
    """Decode a TIFF to (h, w, 3) uint8 RGB: 8-bit grayscale
    (photometric 0/1), 16-bit grayscale (endian-honoring, scaled >>8 —
    the medical/scientific deep-sample shape), 8-bit RGB
    (photometric 2), BILEVEL (bps=1: packed bits, CCITT Modified
    Huffman (2), Group 3 T.4 1D/2D (3), and Group 4 T.6 (4) — round 10,
    the fax / scanned-document-archive shapes), or new-style
    JPEG-in-TIFF (7, every jpeg_pixels flavor incl. shared JPEGTables);
    strip-organized, chunky planar config, baseline compression none
    (1), PackBits (32773), or LZW (5 — the TIFF variant: MSB-first
    codes, early width change) with optional horizontal-differencing
    predictor (tag 317 = 2) — all decodable from the public TIFF 6.0 /
    ITU-T T.4/T.6 specs with struct+numpy alone. FillOrder 2
    (LSB-first) decodes for the bilevel tiers via per-byte bit
    reversal. Tiled, paletted, non-bilevel-FillOrder-2, old-style-JPEG
    (6), CCITT-uncompressed-mode, or 16-bit-RGB TIFFs raise
    ``NotImplementedError``."""
    e, t = _tiff_ifd(b)
    w = t.get(256, [0])[0]
    h = t.get(257, [0])[0]
    if w <= 0 or h <= 0:
        raise NotImplementedError("TIFF missing/degenerate dimensions")
    spp = t.get(277, [1])[0]
    bps = t.get(258, [1] * spp)
    comp = t.get(259, [1])[0]
    photo = t.get(262, [1])[0]
    planar = t.get(284, [1])[0]
    if 322 in t or 323 in t:
        raise NotImplementedError("tiled TIFF not supported")
    offsets = t.get(273)
    counts = t.get(279)
    # old-style JPEG (6) carries its stream behind tag 513, not strips
    if t.get(259, [1])[0] != 6 and (
        not offsets or not counts or len(offsets) != len(counts)
    ):
        raise NotImplementedError("TIFF missing strip offsets/counts")
    rps = t.get(278, [h])[0] or h
    deep = spp == 1 and bps == [16]  # 16-bit gray: the medical shape
    bilevel = spp == 1 and bps == [1]  # fax / scanned-document shape
    fill_order = t.get(266, [1])[0]
    # FillOrder 2 (LSB-first bytes — round 10): legal per TIFF 6.0 only
    # for bilevel fax data in practice; a per-byte bit reversal restores
    # the MSB-first stream every decoder here consumes
    if fill_order not in (1, 2) or (fill_order == 2 and not bilevel):
        raise NotImplementedError("TIFF FillOrder 2 only decodes for bilevel")
    if planar != 1 or spp not in (1, 3) or not (
        deep or bilevel or all(v == 8 for v in bps)
    ):
        raise NotImplementedError("only 1/8/16-bit chunky gray/RGB TIFF decodes")
    # bps=1 tagged with a JPEG compression is a lying header (JPEG has no
    # 1-bit mode); rejecting it here keeps this dispatch shape-for-shape
    # consistent with media_decode_status, whose bilevel branch classifies
    # comp 6/7 as header_only (advice r10: the JPEG tiers below used to
    # win the dispatch and decode 'full' against that classification)
    if bilevel and comp in (6, 7):
        raise NotImplementedError("bilevel TIFF cannot carry JPEG compression")
    # photometric 6 (YCbCr) is legal ONLY for the JPEG compressions,
    # where jpeg_pixels' own transform produces RGB; photometric 2
    # with JPEG means the components are STORED as R,G,B (raw_rgb)
    if photo == 6 and comp not in (6, 7):
        raise NotImplementedError("YCbCr TIFF only decodes under JPEG compression")
    if photo not in (0, 1, 2, 6) or (photo in (2, 6)) != (spp == 3):
        raise NotImplementedError("unsupported TIFF photometric interpretation")
    if comp == 7:
        # new-style JPEG-in-TIFF: each strip is a complete JPEG stream
        # of its rows, decoded by the same jpeg_pixels every bare-JPEG
        # payload uses; an optional JPEGTables (347) stream's segments
        # are spliced after each strip's SOI (its own SOI/EOI dropped)
        return _tiff_jpeg_pixels(b, t, w, h, rps, offsets, counts, photo, spp)
    if comp == 6:
        # old-style JPEG-in-TIFF: the 1992 draft's strip/table-offset
        # machinery (tags 512-521) was famously incoherent and is
        # rejected — EXCEPT the one shape real writers converged on: a
        # complete interchange JPEG stream pointed at by
        # JPEGInterchangeFormat (513) + length (514). Decode that via
        # the same jpeg_pixels as compression 7 (round 10).
        if 513 not in t:
            raise NotImplementedError(
                "old-style JPEG-in-TIFF without JPEGInterchangeFormat"
            )
        off = t[513][0]
        ln = t.get(514, [len(b) - off])[0]
        stream = b[off : off + ln]
        if stream[:2] != b"\xff\xd8":
            raise NotImplementedError("JPEGInterchangeFormat stream missing SOI")
        if photo == 6 and _jpeg_first_sof_marker(stream) == 0xC3:
            raise NotImplementedError("YCbCr lossless JPEG-in-TIFF not supported")
        from temporai_mivdp_spark.llmdata.imagecodecs import jpeg_pixels

        px = jpeg_pixels(stream, raw_rgb=photo == 2)
        if px.shape[1] != w or px.shape[0] < h:
            raise NotImplementedError("JPEG-in-TIFF stream dims disagree with IFD")
        px = px[:h]
        if photo == 0 and spp == 1:
            px = (255 - px).astype(np.uint8)
        return px
    if bilevel:
        if comp not in (1, 2, 3, 4):
            raise NotImplementedError(f"bilevel TIFF compression {comp} not supported")
        if t.get(317, [1])[0] != 1:
            raise NotImplementedError("predictor on bilevel TIFF not supported")
        t4opts = t.get(292, [0])[0] if comp == 3 else t.get(293, [0])[0]
        bits = np.zeros((h, w), np.uint8)
        y = 0
        for so, sc in zip(offsets, counts):
            strip = b[so : so + sc]
            if len(strip) < sc:
                raise NotImplementedError("TIFF strip past end of payload")
            if fill_order == 2:
                # LSB-first bytes -> reverse each byte's bits once and
                # every decoder below reads its normal MSB-first stream
                strip = np.packbits(
                    np.unpackbits(
                        np.frombuffer(strip, np.uint8), bitorder="little"
                    )
                ).tobytes()
            nrows = min(rps, h - y)
            if comp == 1:
                rb = (w + 7) // 8
                if len(strip) < nrows * rb:
                    raise NotImplementedError("TIFF strip shorter than its rows")
                packed = np.frombuffer(strip[: nrows * rb], np.uint8)
                bits[y : y + nrows] = np.unpackbits(
                    packed.reshape(nrows, rb), axis=1
                )[:, :w]
            else:
                bits[y : y + nrows] = _ccitt_decode(strip, w, nrows, comp, t4opts)
            y += nrows
        if y < h:
            raise NotImplementedError("TIFF strips cover fewer rows than ImageLength")
        # photometric 0 (WhiteIsZero, the fax norm): value 1 = black ink
        g = (255 * (1 - bits if photo == 0 else bits)).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if comp not in (1, 32773, 5):
        raise NotImplementedError(f"TIFF compression {comp} needs a codec lib")
    pred = t.get(317, [1])[0]
    if pred not in (1, 2) or (pred == 2 and deep):
        raise NotImplementedError("unsupported TIFF predictor")
    row_bytes = w * spp * (2 if deep else 1)
    raw = bytearray()
    rows_left = h
    for so, sc in zip(offsets, counts):
        strip = b[so : so + sc]
        if len(strip) < sc:
            raise NotImplementedError("TIFF strip past end of payload")
        nrows = min(rps, rows_left)
        want = nrows * row_bytes
        if comp == 32773:
            raw += _packbits(strip, want)
        elif comp == 5:
            raw += _tiff_lzw(strip, want)
        else:
            if sc < want:
                raise NotImplementedError("TIFF strip shorter than its rows")
            raw += strip[:want]
        rows_left -= nrows
    if len(raw) < h * row_bytes:
        raise NotImplementedError("TIFF strips cover fewer rows than ImageLength")
    raster = bytes(raw[: h * row_bytes])
    if deep:
        px16 = np.frombuffer(raster, e + "u2").reshape(h, w, 1)
        px = (px16 >> 8).astype(np.uint8)
    else:
        px = np.frombuffer(raster, np.uint8).reshape(h, w, spp)
        if pred == 2:
            # horizontal differencing: each row stores per-channel byte
            # deltas; reconstruct by modular cumulative sum along x
            px = np.cumsum(px.astype(np.uint32), axis=1).astype(np.uint8)
    if spp == 1:
        g = px[:, :, 0]
        if photo == 0:  # WhiteIsZero: invert to the usual sense
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)
    return px.copy()


def _pnm_header(b: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, maxval, samples_per_pixel, data_offset) of a
    binary Netpbm header (P5 grayscale / P6 RGB), honoring whitespace
    runs and '#' comments. Raises ``NotImplementedError`` otherwise."""
    if b[:2] not in (b"P5", b"P6"):
        raise NotImplementedError("not a binary PGM/PPM payload")
    i, fields = 2, []
    while len(fields) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i] == 0x23:  # '#' comment to end of line
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise NotImplementedError("truncated PGM/PPM header")
        fields.append(int(b[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if w <= 0 or h <= 0:
        raise NotImplementedError("degenerate PGM/PPM dimensions")
    return w, h, maxval, (1 if b[:2] == b"P5" else 3), i


def _netpbm_pixels(b: bytes) -> np.ndarray:
    """Decode binary Netpbm: P5 (PGM grayscale) and P6 (PPM RGB) at
    8-bit (maxval 255) or 16-bit (maxval 65535, big-endian per the
    spec, scaled >>8 into the uint8 contract) — the scientific/medical
    interchange rasters. ASCII variants (P2/P3), odd maxvals, and PBM
    bitmaps raise."""
    w, h, maxval, spp, i = _pnm_header(b)
    if maxval not in (255, 65535):
        raise NotImplementedError("only maxval 255/65535 PGM/PPM decodes")
    bpsamp = 1 if maxval == 255 else 2
    need = w * h * spp * bpsamp
    raster = b[i : i + need]
    if len(raster) < need:
        raise NotImplementedError("PGM/PPM raster shorter than dimensions")
    if bpsamp == 1:
        px = np.frombuffer(raster, np.uint8).reshape(h, w, spp)
    else:
        px = (np.frombuffer(raster, ">u2").reshape(h, w, spp) >> 8).astype(np.uint8)
    return np.repeat(px, 3, axis=2) if spp == 1 else px.copy()


def _raster_pixels(b: bytes) -> np.ndarray:
    """Dispatch pixel decode by magic number: BMP, PNG, baseline /
    progressive / arithmetic / 12-bit / gray-lossless JPEG, GIF
    first frame (all stdlib+numpy — see ``imagecodecs`` for the
    JPEG/GIF implementations), baseline TIFF (8-bit gray/RGB strips,
    none/PackBits), or binary PGM/PPM; remaining variants
    (hierarchical, multi-component-lossless, or 12-bit-arithmetic
    JPEG, LZW/CCITT TIFF, spec-illegal IHDR combinations) raise
    ``NotImplementedError``."""
    if b[:2] == b"BM":
        return _bmp_pixels(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return _png_pixels(b)
    if b[:3] == b"\xff\xd8\xff":
        from temporai_mivdp_spark.llmdata.imagecodecs import jpeg_pixels

        return jpeg_pixels(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        from temporai_mivdp_spark.llmdata.imagecodecs import gif_pixels

        return gif_pixels(b)
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        return _tiff_pixels(b)
    if b[:2] in (b"P5", b"P6"):
        return _netpbm_pixels(b)
    raise NotImplementedError(
        "pixel decode without codec libs: BMP/PNG/JPEG/GIF/TIFF/PNM only"
    )


def _image_dims(b: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from raster headers alone — BMP, PNG
    (IHDR), JPEG (SOF segment scan), GIF, TIFF (first-IFD tag walk),
    binary PGM/PPM. None when unrecognized. Header-only: no
    decompression, so it works for formats whose pixel decode is
    stubbed."""
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        try:
            _e, tags = _tiff_ifd(b)
            w, h = tags.get(256, [0])[0], tags.get(257, [0])[0]
        except NotImplementedError:
            return None
        return ("tiff", w, h) if w and h else None
    if b[:2] in (b"P5", b"P6"):
        try:
            w, h, _mx, _spp, _off = _pnm_header(b)
        except (NotImplementedError, ValueError):
            return None
        return "pnm", w, h
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack_from("<ii", b, 18)
        return "bmp", w, abs(h)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack_from(">II", b, 16)
        return "png", w, h
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack_from("<HH", b, 6)
        return "gif", w, h
    if b[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack_from(">HH", b, i + 5)
                return "jpeg", w, h
            (seg_len,) = struct.unpack_from(">H", b, i + 2)
            i += 2 + seg_len
        return None
    return None


def extract_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column: byte
    length, content hash, magic-number mime sniff. This is the pattern
    every real decode stage follows — per-batch pandas work on
    ``payload`` bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else None).astype("Int64"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "sniffed_mime": payloads.map(_sniff),
                }
            )

    return media.select("media_id", "payload").mapInPandas(batches, METADATA_SCHEMA)


def decode_image(
    media: DataFrame, fake: bool = False, strict: bool = True
) -> DataFrame:
    """Decode images to fixed-size float features.

    The real path decodes BMP (uncompressed 24/32-bit, paletted
    1/4/8-bit, RLE8, bottom-up and top-down), PNG (all five scanline
    filters, greyscale/palette/truecolor ± alpha, 1/2/4/8/16-bit
    depths, Adam7 interlace), baseline/progressive/arithmetic/12-bit/
    gray-lossless JPEG, GIF first-frame, baseline TIFF, and binary
    PGM/PPM payloads (``_raster_pixels``, dispatching to
    ``imagecodecs`` for JPEG/GIF — all stdlib+numpy, no codec
    libs) into 8 features —
    width, height, mean R/G/B, luminance std/min/max.

    ``strict=True`` (default): unsupported variants and malformed
    payloads raise — the fail-loudly contract unit tests pin capability
    against. ``strict=False``: they yield NULL features instead — the
    crawl-scale mode, where one truncated IDAT or zero-dim BMP in a
    100 TB corpus must degrade that ROW, not kill the task; route
    status accounting through ``media_decode_status``/
    ``curation_media_report``, which classify rather than crash.
    The ``fake=True`` path produces deterministic pseudo-features
    (md5-seeded) with the same plumbing — schema, batching, output
    shape — so mixed-format pipelines are testable end-to-end.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("features", StringType(), True),  # csv of 8 floats
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def feat(b: bytes | None) -> str | None:
                if b is None:
                    return None
                if fake:
                    d = hashlib.md5(b).digest()
                    return ",".join(str(round(x / 255.0, 6)) for x in d[:8])
                try:
                    px = _raster_pixels(b).astype(np.float64)
                    if px.size == 0:  # zero-dim raster (e.g. 0-width BMP)
                        raise NotImplementedError("empty raster")
                except (
                    NotImplementedError,  # unsupported variant
                    zlib.error,           # truncated/torn IDAT stream
                    struct.error,         # header shorter than its fields
                    ValueError,           # bad reshape/geometry from lying dims
                    IndexError,           # offsets past a truncated buffer
                ):
                    # ONLY malformed-payload classes — a genuine decoder
                    # defect (TypeError/AttributeError/...) must stay
                    # loud even in crawl mode, or a regression turns
                    # into silent NULL rows
                    if strict:
                        raise
                    return None
                lum = px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114
                vals = [
                    float(px.shape[1]),
                    float(px.shape[0]),
                    float(px[:, :, 0].mean()),
                    float(px[:, :, 1].mean()),
                    float(px[:, :, 2].mean()),
                    float(lum.std()),
                    float(lum.min()),
                    float(lum.max()),
                ]
                return ",".join(str(round(v, 6)) for v in vals)

            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": pdf["payload"].map(feat)}
            )

    return media.select("media_id", "payload").mapInPandas(batches, out_schema)


def image_dims(media: DataFrame) -> DataFrame:
    """Header-only image dimensions — BMP/PNG/GIF fixed offsets, JPEG
    SOF-segment scan (``_image_dims``); no decompression, so it covers
    formats whose pixel decode is stubbed. Unrecognized payloads yield
    NULL dims rather than failing the batch (a corpus sweep should
    classify, not crash)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("format", StringType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(lambda b: _image_dims(b) if b is not None else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": dims.map(lambda d: d[0] if d else None),
                    "width": dims.map(lambda d: d[1] if d else None).astype("Int32"),
                    "height": dims.map(lambda d: d[2] if d else None).astype("Int32"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(batches, out_schema)


def image_dhash(media: DataFrame, strict: bool = False) -> DataFrame:
    """Perceptual difference-hash (dHash) per image — the image-tier
    entry point of the dedup family (round 10): the classic 64-bit
    gradient fingerprint that is invariant to container format,
    lossless re-encoding, and uniform brightness shifts, so the SAME
    picture shipped as PNG / TIFF / PGM / BMP (or decoded out of any
    other ``_raster_pixels`` format) hashes identically and exact
    dedup on the hash collapses cross-format duplicates; visually
    near-identical images land within a few Hamming bits, which the
    banded LSH columns bucket without an all-pairs join.

    Definition (pinned — the DuckDB oracle replays it bit for bit from
    the fixture algebra): luminance 0.299R+0.587G+0.114B, floor-nearest
    resample to 9×8 with the SAME index convention as ``resize_image``
    (``xi = x*w // 9``, ``yi = y*h // 8``), bit(y, x) = 1 iff
    g[yi(y), xi(x+1)] > g[yi(y), xi(x)] for x in 0..7, y in 0..7,
    packed row-major MSB-first into a 16-char lowercase hex string
    (strings, not int64: bit 63 would flip the sign and the two
    engines' overflow rules differ). ``band1..band4`` are the four
    16-bit hex quarters — equality on ANY band is the LSH candidate
    condition (Hamming ≤ 3 guarantees one clean band by pigeonhole).

    Null payloads and (with ``strict=False``, the crawl default here)
    malformed ones yield NULL hash/bands — accounting, not crashes,
    same contract as ``decode_image``. Plan: one row-local
    Arrow-batched ``mapInPandas``, zero shuffles; downstream dedup is
    one hash-groupBy on a 16-byte key, exactly the exact-dedup shape.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("dhash", StringType(), True),
            StructField("band1", StringType(), True),
            StructField("band2", StringType(), True),
            StructField("band3", StringType(), True),
            StructField("band4", StringType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def dhash(b: bytes | None) -> str | None:
                if b is None:
                    return None
                try:
                    px = _raster_pixels(b)  # stays uint8 until sampling
                    if px.size == 0:
                        raise NotImplementedError("empty raster")
                except (
                    NotImplementedError, zlib.error, struct.error,
                    ValueError, IndexError,
                ):
                    if strict:
                        raise
                    return None
                # sample FIRST, then luminance on the 72 survivors —
                # identical values (lum of sampled pixels == sampled
                # lum) without the full-raster float64 temporaries a
                # crawl-size image would otherwise allocate (review
                # fix); packbits replaces the per-bit Python loop
                h, w = px.shape[0], px.shape[1]
                yi = (np.arange(8) * h // 8).astype(np.intp)
                xi = (np.arange(9) * w // 9).astype(np.intp)
                sub = px[np.ix_(yi, xi)].astype(np.float64)
                g = sub[:, :, 0] * 0.299 + sub[:, :, 1] * 0.587 + sub[:, :, 2] * 0.114
                bits = (g[:, 1:] > g[:, :-1]).astype(np.uint8).ravel()
                return np.packbits(bits).tobytes().hex()

            hashes = pdf["payload"].map(dhash)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": hashes,
                    "band1": hashes.str.slice(0, 4),
                    "band2": hashes.str.slice(4, 8),
                    "band3": hashes.str.slice(8, 12),
                    "band4": hashes.str.slice(12, 16),
                }
            )

    return media.select("media_id", "payload").mapInPandas(batches, out_schema)


def dhash_hamming(col_a, col_b):
    """Column expression: Hamming distance between two 16-hex dHash
    strings — two 32-bit halves through ``conv`` + xor + ``bit_count``
    (whole-stage codegen, no UDF). Verification step after the band
    bucketing of ``image_dhash``."""
    def half(c, lo, hi):
        return F.conv(F.substring(c, lo, hi), 16, 10).cast("long")

    return (
        F.bit_count(half(col_a, 1, 8).bitwiseXOR(half(col_b, 1, 8)))
        + F.bit_count(half(col_a, 9, 8).bitwiseXOR(half(col_b, 9, 8)))
    )


def resize_image(
    media: DataFrame, target_w: int, target_h: int, fake: bool = False
) -> DataFrame:
    """Resize images to ``target_w × target_h``, emitting a new payload
    plus the recorded dimensions.

    The real path resamples any format ``_raster_pixels`` decodes —
    BMP (incl. paletted/RLE8/32-bit), full PNG, baseline/progressive
    JPEG, GIF first frame: decode, luminance-convert, nearest-neighbor
    index into the target grid — all numpy, emitting ``w*h`` grayscale
    bytes. Exotic variants (arithmetic/hierarchical JPEG) raise;
    ``fake=True`` produces a deterministic payload — an md5 keystream
    over ``(content, dims)`` — through the same plumbing:
    binary-in/binary-out ``mapInPandas``, Arrow batches, explicit output
    schema. Resized payloads are uniform-size, so downstream batch
    memory is exactly ``maxRecordsPerBatch × w × h`` — set that conf
    from the target dims in production."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )
    n_bytes = target_w * target_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def stretch(b: bytes | None) -> bytes | None:
                if b is None:
                    return None
                if not fake:
                    px = _raster_pixels(b).astype(np.float64)
                    lum = px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114
                    h, w = lum.shape
                    yi = (np.arange(target_h) * h // target_h).astype(np.intp)
                    xi = (np.arange(target_w) * w // target_w).astype(np.intp)
                    return lum[np.ix_(yi, xi)].astype(np.uint8).tobytes()
                seed = hashlib.md5(b + f"{target_w}x{target_h}".encode()).digest()
                out = bytearray()
                block = seed
                while len(out) < n_bytes:
                    block = hashlib.md5(block).digest()
                    out.extend(block)
                return bytes(out[:n_bytes])

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": pdf["payload"].map(stretch),
                }
            )

    return media.select("media_id", "payload").mapInPandas(batches, out_schema)


def audio_features(
    media: DataFrame, fake: bool = False, strict: bool = True
) -> DataFrame:
    """Audio feature extraction (duration, RMS level, zero crossings).

    The real path decodes sample-tier payloads (``_wav_stats`` →
    ``_audio_samples``: RIFF WAV linear PCM, G.711, IMA/MS ADPCM, and
    bare FLAC via the full RFC 9639 frame decode): duration from
    samples/rate, RMS over [-1, 1]-normalized channel-averaged samples,
    sign-change count. Unsupported compressed audio (mp3/ogg/...)
    raises under ``strict=True`` (the default the capability tests pin
    — SAMPLE decode needs librosa/soundfile); ``strict=False`` is the
    crawl mode: malformed/unsupported payloads yield NULL stats
    instead of killing the batch, the ``decode_image`` contract. Use
    ``audio_metadata`` for the header tier and its ``decode_status``
    column to quantify the skipped fraction.
    The ``fake=True`` stub derives deterministic values from the content
    hash through the same mapInPandas plumbing."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("duration_ms", LongType(), True),
            StructField("rms", StringType(), True),  # stringified float, stable
            StructField("zero_crossings", LongType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def stats(b: bytes | None) -> tuple[int | None, str | None, int | None]:
                if b is None:
                    return None, None, None
                if fake:
                    d = hashlib.md5(b).digest()
                    return None, str(round(d[0] / 255.0, 6)), int.from_bytes(d[1:3], "big")
                try:
                    dur, rms, zc = _wav_stats(b)
                except (
                    NotImplementedError, wave.Error, EOFError,
                    struct.error, ValueError, IndexError,
                ):
                    if strict:
                        raise
                    return None, None, None
                return dur, str(round(rms, 6)), zc

            triples = pdf["payload"].map(stats)
            decoded_ms = triples.map(lambda p: p[0]).astype("Int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    # real path: measured duration; fake path: the typed
                    # metadata column rides through unchanged
                    "duration_ms": decoded_ms.fillna(pdf["duration_ms"]).astype("Int64")
                    if not fake
                    else pdf["duration_ms"],
                    "rms": triples.map(lambda p: p[1]),
                    "zero_crossings": triples.map(lambda p: p[2]).astype("Int64"),
                }
            )

    return media.select("media_id", "duration_ms", "payload").mapInPandas(
        batches, out_schema
    )


def spread_for_decode(media: DataFrame, partitions: int) -> DataFrame:
    """Repartition by a content-hash prefix before a heavy decode stage:
    pure-random spread (no key skew possible), stable across retries
    (hash of content, not of partition id), and decouples decode
    parallelism from the upstream file layout."""
    return media.repartition(partitions, F.xxhash64(F.col("payload")))


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand each video row into the frame
    timestamps a decoder would extract (sequence + explode — pure
    Catalyst), using metadata duration only. For container formats
    (mp4/webm) the per-frame decode stays stubbed (no codec libs); for
    animated GIF the REAL end-to-end path exists — ``sample_frames``
    decodes the actual timed frames via ``imagecodecs.gif_frames``."""
    return (
        media.filter(F.col("mime").startswith("video/"))
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
                )
            ),
        )
        .select("media_id", "frame_ms")
    )


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_ms", LongType(), False),
        StructField("features", StringType(), True),  # csv of 8 floats
    ]
)


def sample_frames(
    media: DataFrame,
    every_ms: int = 100,
    min_delay_ms: int = 10,
    strict: bool = True,
) -> DataFrame:
    """REAL timed frame sampling — the decode stage ``frame_sample_plan``
    only plans. Two video-like formats decode from scratch here:
    animated GIF (``imagecodecs.gif_frames``: a timed, composited frame
    sequence) and MJPEG/DIB AVI (``avi_frames``: granule-exact
    dwRate/dwScale delays) — the honest end-to-end path: payload ->
    frame timeline (cumulative delays; zero delays clamped to
    ``min_delay_ms`` so degenerate GIFs still have a timeline) ->
    the frame showing at each ``every_ms`` tick -> the same 8 features
    as ``decode_image`` per sampled tick.

    Output grain is (media_id, frame_ms): one row per SAMPLE TICK, not
    per stored frame — exactly what a vision-model ingest wants
    (uniform temporal sampling regardless of variable frame delays).
    Non-GIF payloads raise inside the batch like every real codec
    boundary under ``strict=True``; ``strict=False`` (crawl mode, the
    ``decode_image`` contract) skips them — they contribute no sample
    ticks instead of killing the batch. Route mixed corpora by sniffed
    mime first either way. Decode runs
    inside Arrow ``mapInPandas`` batches; parallelism comes from Spark
    partitions (see ``spread_for_decode``)."""
    from temporai_mivdp_spark.llmdata.imagecodecs import gif_frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ts, feats = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    pb = bytes(payload)
                    if pb[:4] == b"RIFF" and pb[8:12] == b"AVI ":
                        frames = avi_frames(pb)
                    else:
                        frames = gif_frames(pb)
                except (
                    NotImplementedError, zlib.error, struct.error,
                    ValueError, IndexError,
                ):
                    if strict:
                        raise
                    continue
                delays = [max(d, min_delay_ms) for d, _ in frames]
                total = sum(delays)
                # frame k shows during [start_k, start_k + delay_k)
                starts, acc = [], 0
                for d in delays:
                    starts.append(acc)
                    acc += d
                k = 0
                for t in range(0, total, every_ms):
                    while k + 1 < len(starts) and starts[k + 1] <= t:
                        k += 1
                    px = frames[k][1].astype(np.float64)
                    lum = (
                        px[:, :, 0] * 0.299
                        + px[:, :, 1] * 0.587
                        + px[:, :, 2] * 0.114
                    )
                    vals = [
                        float(px.shape[1]),
                        float(px.shape[0]),
                        float(px[:, :, 0].mean()),
                        float(px[:, :, 1].mean()),
                        float(px[:, :, 2].mean()),
                        float(lum.std()),
                        float(lum.min()),
                        float(lum.max()),
                    ]
                    ids.append(mid)
                    ts.append(t)
                    feats.append(",".join(str(round(v, 6)) for v in vals))
            yield pd.DataFrame(
                {"media_id": ids, "frame_ms": ts, "features": feats}
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, FRAME_SAMPLE_SCHEMA
    )


SPECTRAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", LongType(), True),
        StructField("centroid_hz", StringType(), True),  # stringified floats,
        StructField("rolloff_hz", StringType(), True),   # stable across archs
        StructField("dominant_hz", StringType(), True),
        StructField("band_energy", StringType(), True),  # csv, n_bands floats
    ]
)


def audio_spectral(
    media: DataFrame, n_bands: int = 8, strict: bool = True
) -> DataFrame:
    """Spectral audio features from sample-tier payloads (WAV PCM /
    G.711 / ADPCM and full-decode FLAC via ``_audio_samples``) — the
    DSP tier above ``audio_features``'s time-domain stats, numpy-only
    (rFFT):

    - ``centroid_hz``: magnitude-weighted mean frequency (brightness),
    - ``rolloff_hz``: frequency below which 85% of spectral energy sits,
    - ``dominant_hz``: the peak magnitude bin,
    - ``band_energy``: energy fractions over ``n_bands`` equal linear
      bands up to Nyquist (sums to 1 for any non-silent signal).

    Enough to route speech/music/tone/noise in a curation pipeline and
    fully testable against synthesized ground truth (a 440 Hz sine's
    dominant bin IS 440 Hz). Same codec boundary discipline as the
    image path: supported WAVs decode for real, unsupported compressed
    formats raise inside the Arrow batch under ``strict=True``;
    ``strict=False`` (crawl mode) yields NULL rows for them instead.
    Floats ship as strings (same reason as
    ``audio_features.rms``: byte-stable across engines/archs)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k.name: [] for k in SPECTRAL_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                if payload is None:
                    for k in ("sample_rate", "centroid_hz", "rolloff_hz",
                              "dominant_hz", "band_energy"):
                        out[k].append(None)
                    continue
                try:
                    sr, x = _audio_samples(bytes(payload))
                except (
                    NotImplementedError, wave.Error, EOFError,
                    struct.error, ValueError, IndexError,
                ):
                    if strict:
                        raise
                    for k in ("sample_rate", "centroid_hz", "rolloff_hz",
                              "dominant_hz", "band_energy"):
                        out[k].append(None)
                    continue
                if sr <= 0 or x.size == 0:
                    # zero-frame / malformed-rate PCM: emit zeros rather
                    # than dividing by sr or FFT-ing nothing
                    out["sample_rate"].append(sr)
                    out["centroid_hz"].append("0.0")
                    out["rolloff_hz"].append("0.0")
                    out["dominant_hz"].append("0.0")
                    out["band_energy"].append(",".join(["0.0"] * n_bands))
                    continue
                mag = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)
                power = mag * mag
                total = float(power.sum())
                if total <= 0.0:
                    cent = roll = dom = 0.0
                    bands = [0.0] * n_bands
                else:
                    cent = float((freqs * power).sum() / total)
                    cum = np.cumsum(power)
                    roll = float(freqs[int(np.searchsorted(cum, 0.85 * total))])
                    dom = float(freqs[int(power.argmax())])
                    nyq = sr / 2.0
                    edges = np.linspace(0.0, nyq, n_bands + 1)
                    idx = np.clip(
                        np.digitize(freqs, edges[1:-1]), 0, n_bands - 1
                    )
                    bands = [
                        float(power[idx == k].sum() / total)
                        for k in range(n_bands)
                    ]
                out["sample_rate"].append(sr)
                out["centroid_hz"].append(str(round(cent, 3)))
                out["rolloff_hz"].append(str(round(roll, 3)))
                out["dominant_hz"].append(str(round(dom, 3)))
                out["band_energy"].append(
                    ",".join(str(round(v, 6)) for v in bands)
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        batches, SPECTRAL_SCHEMA
    )

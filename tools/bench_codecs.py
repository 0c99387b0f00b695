"""Measure the stdlib media codecs' single-core decode throughput.

The multimodal docstrings claim the pure-Python/numpy codecs are "fine
for the Arrow-batched mapInPandas stage"; this tool replaces that claim
with numbers: images (or seconds-of-audio) decoded per second per core
and MB/s of payload, for each real decode path. Payloads are synthesized
by the INDEPENDENT test-side encoders (tests/test_imagecodecs.py,
tests/test_llmdata.py), so the measurement exercises exactly the decode
code a corpus pipeline runs.

Usage: python tools/bench_codecs.py [side]   (default image side 128 px)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from temporai_mivdp_spark.llmdata.imagecodecs import (  # noqa: E402
    gif_frames,
    gif_pixels,
    jpeg_pixels,
)
from temporai_mivdp_spark.llmdata.multimodal import (  # noqa: E402
    _png_pixels,
    _wav_samples,
    _wav_stats,
)
from tests.test_imagecodecs import (  # noqa: E402
    _smooth_rgb,
    gif_anim_bytes,
    gif_bytes,
    jpeg_bytes,
    jpeg_progressive_bytes,
)
from temporai_mivdp_spark.llmdata.multimodal import _bmp_pixels  # noqa: E402
from tests.test_llmdata import _bmp_bytes, _png_bytes_full  # noqa: E402


def measure(name: str, payload: bytes, decode, min_s: float = 2.0) -> None:
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < min_s:
        decode(payload)
        n += 1
    dt = time.perf_counter() - t0
    rate = n / dt
    mbs = len(payload) * rate / 1e6
    print(f"| {name} | {len(payload)/1024:.0f} KiB | {rate:.1f}/s | {mbs:.2f} MB/s |")


def main() -> None:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rgb = _smooth_rgb(side, side)
    pal = (np.arange(768) % 256).astype(np.uint8).reshape(256, 3)
    idx = (rgb[:, :, 0] // 1).astype(np.intp)  # 8-bit palette indices

    sr = 16000
    t = np.arange(sr * 10) / sr
    import io
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
    w.writeframes((np.sin(2 * np.pi * 440 * t) * 20000).astype("<i2").tobytes())
    w.close()
    wav = buf.getvalue()

    anim = gif_anim_bytes(
        (side, side), pal,
        [{"indices": (idx + k) % 256, "delay_cs": 10} for k in range(8)],
    )

    print(f"image side: {side}px; audio: 10 s PCM @ {sr} Hz; single core")
    print("| codec path | payload | decodes/s | MB/s |")
    print("|---|---|---|---|")
    measure("JPEG baseline 4:4:4", jpeg_bytes(rgb), jpeg_pixels)
    measure("JPEG baseline 4:2:0", jpeg_bytes(rgb, subsample=True), jpeg_pixels)
    measure("JPEG progressive", jpeg_progressive_bytes(rgb), jpeg_pixels)
    measure("PNG RGB filters 0-2", _png_bytes_full(rgb, 2, filters=[0, 1, 2]), _png_pixels)
    measure("PNG RGB Paeth", _png_bytes_full(rgb, 2, filters=[4]), _png_pixels)
    measure("BMP 24-bit", _bmp_bytes(pixels=rgb), _bmp_pixels)
    measure("BMP paletted 8-bit", _bmp_bytes(indices=idx, palette=pal, bpp=8), _bmp_pixels)
    measure("GIF still", gif_bytes(idx, pal), gif_pixels)
    measure("GIF 8-frame anim", anim, gif_frames)

    # round 10: CCITT fax tiers + JPEG-in-TIFF through the container
    # walk (independent T.4/T.6 test-side encoder)
    import random as _random

    from temporai_mivdp_spark.llmdata.multimodal import _tiff_pixels
    from tests.test_tiff_ccitt import random_raster, tiff_bilevel, tiff_jpeg

    fax = random_raster(_random.Random(1), side * 4, side * 4)
    measure("TIFF CCITT G4 (4x side, bilevel)", tiff_bilevel(fax, 4), _tiff_pixels)
    measure("TIFF CCITT G3-1D (4x side)", tiff_bilevel(fax, 2), _tiff_pixels)
    measure(
        "JPEG-in-TIFF baseline 4:4:4",
        tiff_jpeg([jpeg_bytes(rgb)], side, side, side, 3, 2),
        _tiff_pixels,
    )
    measure("WAV stats (10 s)", wav, _wav_stats)
    measure("WAV samples (10 s)", wav, _wav_samples)

    # compressed-audio sample tiers: same 10 s sine through the G.711
    # table expansion and the IMA / MS ADPCM block decoders (test-side
    # encoders from tests/test_llmdata.py — the same fixtures the
    # differential pins use)
    import struct as _struct

    from tests.test_llmdata import (
        _ima_encode_block,
        _ms_encode_block,
        _raw_wav,
    )
    from temporai_mivdp_spark.llmdata.multimodal import (
        _ima_samples_per_block,
    )

    pcm16 = (np.sin(2 * np.pi * 440 * t) * 20000).astype(int)
    ulaw_payload = _raw_wav(7, 1, sr, 8, b"\x55" * (sr * 10))
    measure("WAV G.711 u-law (10 s)", ulaw_payload, _wav_samples)

    align = 1024
    spb = _ima_samples_per_block(align, 1)
    data, state = b"", None
    for i in range(len(pcm16) // spb):
        block, state, _ = _ima_encode_block(
            list(pcm16[i * spb : (i + 1) * spb]), 1, align, state
        )
        data += block
    ima_payload = _raw_wav(0x11, 1, sr, 4, data, byte_rate=sr // 2)
    ima_payload = ima_payload[:32] + align.to_bytes(2, "little") + ima_payload[34:]
    measure("WAV IMA ADPCM (10 s)", ima_payload, _wav_samples)

    spb_ms = 2 + 2 * (align - 7)
    data = b""
    for i in range(len(pcm16) // spb_ms):
        block, _ = _ms_encode_block(
            [list(pcm16[i * spb_ms : (i + 1) * spb_ms])], 1, align, idx=1
        )
        data += block
    ms_payload = _raw_wav(0x02, 1, sr, 4, data, byte_rate=sr // 2)
    ms_payload = ms_payload[:32] + align.to_bytes(2, "little") + ms_payload[34:]
    measure("WAV MS ADPCM (10 s)", ms_payload, _wav_samples)

    # round 9: FLAC frame-body decode (RFC 9639) — 1 s at 16 kHz (the
    # Rice/unary walk is pure-Python bit work, an order of magnitude
    # slower per sample than the table/block codecs above; the number
    # is the honest cost a mapInPandas batch pays per core) — and the
    # new JPEG tiers (12-bit extended, SOF3 lossless)
    from temporai_mivdp_spark.llmdata.multimodal import _flac_samples
    from tests.test_llmdata import _flac_encode
    from tests.test_imagecodecs import jpeg_lossless_bytes

    flac_payload = _flac_encode(
        [list(pcm16[:sr])], sr, 16, 4096, [("fixed", 2, 2, 0)]
    )
    measure("FLAC fixed-order-2 (1 s)", flac_payload, _flac_samples)
    measure(
        "JPEG 12-bit baseline",
        jpeg_bytes(rgb.astype(np.uint16) * 16, precision=12),
        jpeg_pixels,
    )
    gray12 = (rgb[:, :, 0].astype(np.int64) * 16) % 4096
    measure(
        "JPEG lossless (SOF3, 12-bit)",
        jpeg_lossless_bytes(gray12, 12, predictor=4),
        jpeg_pixels,
    )


if __name__ == "__main__":
    main()

"""Multimodal capstone: raw media payloads -> REAL stdlib codecs
(fake=False end to end) -> deterministic embedding hook -> persisted IVF
index -> partition-pruned serving -> rolling shard append.

The media twin of the text raw-crawl->packed-table capstone: proves the
whole multimodal chain composes as one pipeline — metadata sniffing,
WAV/BMP/PNG decode, feature->embedding projection, index build, serve,
and incremental ingest — with zero fakes and zero stubs on the path.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from temporai_mivdp_spark.llmdata import multimodal, similarity

from test_llmdata import _bmp_bytes_3x2_red_over_blue, _png_bytes, _square_wav_bytes

DIM = 8


def _png_payload(seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(4, 5, 3)).astype(np.uint8)
    return _png_bytes(px, color_type=2, filters=[0, 1, 2, 4])


def _media_rows(start_id: int, n_png: int, n_wav: int) -> list[tuple]:
    rows = []
    mid = start_id
    for i in range(n_png):
        rows.append((mid, _png_payload(seed=mid), "image/png", 5, 4, None))
        mid += 1
    rows.append((mid, _bmp_bytes_3x2_red_over_blue(), "image/bmp", 3, 2, None))
    mid += 1
    for i in range(n_wav):
        rows.append(
            (
                mid,
                _square_wav_bytes(frames=400 + 80 * i, amp=6000 + 2500 * i),
                "audio/wav",
                None,
                None,
                None,
            )
        )
        mid += 1
    return rows


def _embed(spark, media):
    """Deterministic embedding hook over the REAL decode outputs: images
    -> the 8 decode_image features; audio -> (duration, rms, crossings)
    scaled and zero-padded to the same 8 dims. Everything below the
    mapInPandas decode is plain Catalyst (split/cast/array)."""
    img = media.filter(F.col("mime").startswith("image/"))
    aud = media.filter(F.col("mime").startswith("audio/"))
    img_emb = (
        multimodal.decode_image(img, fake=False)
        .select(
            F.col("media_id").alias("vec_id"),
            F.transform(
                F.split("features", ","), lambda s: s.cast("double")
            ).alias("embedding"),
        )
    )
    aud_emb = multimodal.audio_features(aud, fake=False).select(
        F.col("media_id").alias("vec_id"),
        F.array(
            F.col("duration_ms").cast("double") / 100.0,
            F.col("rms").cast("double") * 10.0,
            F.col("zero_crossings").cast("double") / 100.0,
            *[F.lit(0.0) for _ in range(DIM - 3)],
        ).alias("embedding"),
    )
    return img_emb.unionByName(aud_emb)


def test_multimodal_capstone_end_to_end(spark, tmp_path):
    media = spark.createDataFrame(_media_rows(1, n_png=6, n_wav=6), multimodal.MEDIA_SCHEMA)

    # 1. metadata: magic sniffing sees through the mime column
    meta = {r.media_id: r for r in multimodal.extract_metadata(media).collect()}
    assert all(m.byte_len > 0 and m.content_md5 for m in meta.values())
    assert meta[1].sniffed_mime == "image/png"
    assert meta[7].sniffed_mime == "application/octet-stream"  # BMP: no magic row
    assert meta[8].sniffed_mime == "audio/wav"

    # 2. real decode -> embeddings: every media row embeds, all DIM-wide
    emb = _embed(spark, media)
    rows = emb.collect()
    assert len(rows) == 13 and all(len(r.embedding) == DIM for r in rows)
    emb_map = {r.vec_id: r.embedding for r in rows}
    # image features carry real pixel stats (nonzero channel means)
    assert any(v > 0 for v in emb_map[1][2:5])
    # audio features carry the measured duration/rms
    assert emb_map[8][0] == pytest.approx(0.5)  # 400 frames @ 8kHz = 50ms

    # 3. persisted IVF index over the embeddings
    path = str(tmp_path / "media_ivf")
    cents = similarity.deterministic_centroids(emb, n=4)
    similarity.persist_ivf_index(emb, cents, path)

    probes = emb.filter(F.col("vec_id").isin(1, 8)).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )

    # 4. serving: with nprobe == ncentroids the pruned index scan must
    # reproduce brute force exactly
    served = similarity.ivf_topk_from_index(spark, path, probes, k=5, nprobe=4)
    brute = similarity.brute_force_topk(emb, probes, k=5)
    got = sorted(tuple(r) for r in served.collect())
    want = sorted(tuple(r) for r in brute.collect())
    assert got == want

    # modality structure: an image probe's nearest neighbors are images,
    # an audio probe's are audio (the embedding hook separates them)
    by_probe = {}
    for r in served.collect():
        by_probe.setdefault(r.probe_id, []).append((r.rank, r.neighbor_id))
    top1_img = min(by_probe[1])[1]
    top1_aud = min(by_probe[8])[1]
    assert 1 <= top1_img <= 7      # image ids
    assert 8 <= top1_aud <= 13     # audio ids

    # 5. rolling append: a new shard (1 PNG + 1 WAV) joins the index
    # without rebuilding; serving sees the new neighbors
    shard_media = spark.createDataFrame(
        _media_rows(100, n_png=1, n_wav=1), multimodal.MEDIA_SCHEMA
    )
    shard_emb = _embed(spark, shard_media)
    similarity.append_to_ivf_index(shard_emb, path)
    after = similarity.ivf_topk_from_index(spark, path, probes, k=20, nprobe=4)
    ids_after = {r.neighbor_id for r in after.collect()}
    assert {100, 101, 102} <= ids_after

    # 6. the serving scan is partition-pruned (bucket is a partition
    # filter, not a post-scan filter)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_sample_frames_real_gif_timeline(spark):
    """sample_frames: animated GIF payloads -> one row per sample tick,
    features exactly matching a driver-side decode of the frame each
    tick lands on (uniform sampling over variable delays)."""
    import numpy as np

    from temporai_mivdp_spark.llmdata.imagecodecs import gif_frames
    from tests.test_imagecodecs import gif_anim_bytes

    gct = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [40, 40, 40]], np.uint8
    )
    # 300ms of frame 0, 100ms of frame 1, 200ms of frame 2
    payload = gif_anim_bytes(
        (3, 2), gct,
        [
            {"indices": np.full((2, 3), 0, int), "delay_cs": 30},
            {"indices": np.full((2, 3), 1, int), "delay_cs": 10},
            {"indices": np.full((2, 3), 2, int), "delay_cs": 20},
        ],
    )
    media = spark.createDataFrame(
        [(7, bytearray(payload), "image/gif", None, None, None)],
        multimodal.MEDIA_SCHEMA,
    )
    got = {
        r.frame_ms: r.features
        for r in multimodal.sample_frames(media, every_ms=100).collect()
    }
    # total 600ms -> ticks at 0..500; frame boundaries at 300, 400
    assert sorted(got) == [0, 100, 200, 300, 400, 500]
    frames = gif_frames(payload)

    def feats(px):
        px = px.astype(np.float64)
        lum = px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114
        vals = [
            float(px.shape[1]), float(px.shape[0]),
            float(px[:, :, 0].mean()), float(px[:, :, 1].mean()),
            float(px[:, :, 2].mean()),
            float(lum.std()), float(lum.min()), float(lum.max()),
        ]
        return ",".join(str(round(v, 6)) for v in vals)

    for t, want_frame in [(0, 0), (200, 0), (300, 1), (400, 2), (500, 2)]:
        assert got[t] == feats(frames[want_frame][1]), t


def test_multimodal_capstone_video_modality(spark, tmp_path):
    """The video tier composes into the same embedding->index->serve
    chain as images/audio: animated GIFs -> sample_frames ticks -> a
    temporal-mean 8-dim embedding (pure Catalyst after the decode) ->
    persisted IVF -> exact pruned serving. A color-ramp GIF's nearest
    neighbor must be the adjacent ramp step, proving the embedding
    carries the decoded pixel signal, not just plumbing."""
    import numpy as np

    from tests.test_imagecodecs import gif_anim_bytes

    def ramp_gif(base):
        # 4 frames of single colors stepping from `base` — temporal mean
        # tracks base, so ids sort by color distance
        gct = np.clip(
            np.array([[base + 10 * k, 60, 200 - base] for k in range(4)]),
            0, 255,
        ).astype(np.uint8)
        return gif_anim_bytes(
            (3, 2), gct,
            [{"indices": np.full((2, 3), k, int), "delay_cs": 5}
             for k in range(4)],
        )

    rows = [
        (mid, bytearray(ramp_gif(base)), "video/gif", None, None, None)
        for mid, base in [(1, 0), (2, 40), (3, 80), (4, 160), (5, 200)]
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    f = F.transform(F.split("features", ","), lambda s: s.cast("double"))
    ticks = multimodal.sample_frames(media, every_ms=50).select(
        "media_id", f.alias("v")
    )
    emb = (
        ticks.groupBy("media_id")
        .agg(*[F.avg(F.element_at("v", i + 1)).alias(f"c{i}")
               for i in range(DIM)])
        .select(
            F.col("media_id").alias("vec_id"),
            F.array(*[F.col(f"c{i}") for i in range(DIM)]).alias("embedding"),
        )
    )
    path = str(tmp_path / "video_ivf")
    cents = similarity.deterministic_centroids(emb, n=2)
    similarity.persist_ivf_index(emb, cents, path)
    probes = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    served = similarity.ivf_topk_from_index(spark, path, probes, k=2, nprobe=2)
    brute = similarity.brute_force_topk(emb, probes, k=2)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, brute.collect())
    )
    ranked = sorted((r.rank, r.neighbor_id) for r in served.collect())
    assert [nid for _, nid in ranked] == [2, 3]  # adjacent ramp steps


def _wav_payload(freqs, sr=16000, seconds=1.0, amps=None):
    import io
    import wave

    import numpy as np

    t = np.arange(int(sr * seconds)) / sr
    amps = amps or [0.5] * len(freqs)
    x = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps))
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
    w.writeframes((np.clip(x, -1, 1) * 30000).astype("<i2").tobytes())
    w.close()
    return buf.getvalue()


def test_audio_spectral_ground_truth(spark):
    """Spectral features against synthesized ground truth: a pure tone's
    dominant/centroid land on its frequency; a two-tone mix's centroid
    sits at the energy-weighted mean; band energies concentrate where
    the tones are."""
    media = spark.createDataFrame(
        [
            (1, bytearray(_wav_payload([440.0])), "audio/wav", None, None, None),
            (2, bytearray(_wav_payload([3000.0])), "audio/wav", None, None, None),
            (3, bytearray(_wav_payload([1000.0, 5000.0], amps=[0.5, 0.5])),
             "audio/wav", None, None, None),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    got = {r.media_id: r for r in multimodal.audio_spectral(media, n_bands=8).collect()}

    # 1s @ 16 kHz -> 1 Hz bin resolution; Nyquist 8 kHz, bands of 1 kHz
    assert got[1].sample_rate == 16000
    assert abs(float(got[1].dominant_hz) - 440.0) <= 1.0
    assert abs(float(got[1].centroid_hz) - 440.0) < 20.0
    b1 = [float(v) for v in got[1].band_energy.split(",")]
    assert len(b1) == 8 and b1[0] > 0.99 and abs(sum(b1) - 1.0) < 1e-6

    assert abs(float(got[2].dominant_hz) - 3000.0) <= 1.0
    b2 = [float(v) for v in got[2].band_energy.split(",")]
    assert b2[3] > 0.99  # 3000 Hz -> band [3000, 4000): index 3

    # equal-amplitude 1 kHz + 5 kHz: centroid ~ 3 kHz, rolloff >= 5 kHz
    assert abs(float(got[3].centroid_hz) - 3000.0) < 60.0
    assert float(got[3].rolloff_hz) >= 4999.0
    b3 = [float(v) for v in got[3].band_energy.split(",")]
    assert b3[1] > 0.45 and b3[5] > 0.45


def test_audio_spectral_silence_and_nonpcm(spark):
    import numpy as np
    import pytest

    silent = _wav_payload([440.0], amps=[0.0])
    media = spark.createDataFrame(
        [(1, bytearray(silent), "audio/wav", None, None, None)],
        multimodal.MEDIA_SCHEMA,
    )
    r = multimodal.audio_spectral(media).collect()[0]
    assert float(r.centroid_hz) == 0.0
    assert all(float(v) == 0.0 for v in r.band_energy.split(","))

    bad = spark.createDataFrame(
        [(2, bytearray(b"not audio at all"), "audio/wav", None, None, None)],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="RIFF/WAVE"):
        multimodal.audio_spectral(bad).collect()


def test_audio_spectral_zero_frames(spark):
    """A valid WAV header with zero frames emits zero features, not a
    division error or an empty-FFT crash."""
    import io
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
    w.writeframes(b"")
    w.close()
    media = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()), "audio/wav", None, None, None)],
        multimodal.MEDIA_SCHEMA,
    )
    r = multimodal.audio_spectral(media).collect()[0]
    assert r.sample_rate == 16000
    assert float(r.centroid_hz) == 0.0
    assert all(float(v) == 0.0 for v in r.band_energy.split(","))


def test_audio_spectral_g711_sine(spark):
    """The spectral feature tier must work through the G.711 decode
    path end-to-end: a 440 Hz sine companded to µ-law (audioop encodes
    test-side — independent of the in-repo expansion tables) still
    lands its dominant/centroid on the tone; companding noise stays far
    below the tone's band energy."""
    import struct
    import warnings

    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    sr = 16000
    t = np.arange(sr) / sr
    pcm = (0.5 * np.sin(2 * np.pi * 440.0 * t) * 30000).astype("<i2")
    ulaw = audioop.lin2ulaw(pcm.tobytes(), 2)
    fmt = struct.pack("<HHIIHH", 7, 1, sr, sr, 1, 8)
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(ulaw)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(ulaw)) + ulaw
    )
    media = spark.createDataFrame(
        [(1, bytearray(payload), "audio/wav", None, None, None)],
        multimodal.MEDIA_SCHEMA,
    )
    r = multimodal.audio_spectral(media, n_bands=8).collect()[0]
    assert r.sample_rate == sr
    assert abs(float(r.dominant_hz) - 440.0) <= 1.0
    assert abs(float(r.centroid_hz) - 440.0) < 100.0  # companding noise floor
    bands = [float(v) for v in r.band_energy.split(",")]
    assert bands[0] > 0.95

"""Perceptual image dedup (multimodal.image_dhash / dhash_hamming) —
round 10. The operator's contract: format-robust (the SAME raster in
any lossless container hashes identically), brightness-shift-invariant
(gradient signs, not absolute values), Hamming-local for small edits,
and NULL-accounting for hostile payloads. Pinned against the
INDEPENDENT test-side encoders the codec batteries already use
(tests/test_llmdata.py, tests/test_tiff_ccitt.py) plus a pure-Python
reference hash written directly from the docstring definition.
"""

from __future__ import annotations

import numpy as np
import pytest

from temporai_mivdp_spark.llmdata import multimodal as mm
from tests.test_llmdata import _bmp_bytes, _png_bytes_full, _pnm_bytes, _tiff_bytes


def _texture(w, h, a=3, b=2, c=7):
    return np.fromfunction(
        lambda y, x: (a * x + b * y + c) % 256, (h, w), dtype=np.int64
    ).astype(np.uint8)


def _reference_dhash(gray: np.ndarray) -> str:
    """Pure-Python mirror of the docstring definition."""
    h, w = gray.shape
    g = gray.astype(np.float64)
    val = 0
    for y in range(8):
        yi = y * h // 8
        for x in range(8):
            x1, x2 = x * w // 9, (x + 1) * w // 9
            val = (val << 1) | int(g[yi, x2] > g[yi, x1])
    return f"{val:016x}"


def _hash_payloads(spark, payloads):
    df = spark.createDataFrame(
        list(enumerate(payloads)), "media_id: long, payload: binary"
    )
    return {r["media_id"]: r for r in mm.image_dhash(df).collect()}


def test_dhash_cross_format_and_reference(spark):
    """The same raster in PNG / TIFF / PGM / gray-BMP hashes
    identically, equals the pure-Python reference, and the bands are
    its hex quarters."""
    gray = _texture(13, 9)
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    payloads = [
        _png_bytes_full(gray[:, :, None], color_type=0, filters=[0]),
        _tiff_bytes(gray),
        _pnm_bytes(gray),
        _bmp_bytes(pixels=rgb),
    ]
    rows = _hash_payloads(spark, payloads)
    want = _reference_dhash(gray)
    for i in range(4):
        assert rows[i]["dhash"] == want, i
        assert rows[i]["band1"] == want[0:4]
        assert rows[i]["band4"] == want[12:16]


def test_dhash_brightness_invariant_and_edit_local(spark):
    """A uniform +40 brightness shift (no wrap) keeps the hash; a
    localized edit moves only a few bits."""
    gray = np.clip(_texture(17, 11), 0, 200)
    edited = gray.copy()
    edited[0:3, 0:5] = 255  # blow out one corner region
    rows = _hash_payloads(
        spark,
        [
            _pnm_bytes(gray),
            _pnm_bytes((gray + 40).astype(np.uint8)),
            _pnm_bytes(edited),
        ],
    )
    assert rows[0]["dhash"] == rows[1]["dhash"]
    h0, h2 = int(rows[0]["dhash"], 16), int(rows[2]["dhash"], 16)
    dist = bin(h0 ^ h2).count("1")
    assert 0 < dist <= 16, dist
    # pigeonhole: hamming <= 3 would guarantee a clean band; here just
    # assert the bands that SHOULD match (edit confined to the top-left
    # rows) actually do
    assert rows[0]["band4"] == rows[2]["band4"]


def test_dhash_hamming_expression(spark):
    """dhash_hamming: codegen'd popcount over the hex halves — 0 for
    equal hashes, exact bit count for crafted differences."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            ("0000000000000000", "0000000000000000", 0),
            ("ffffffffffffffff", "0000000000000000", 64),
            ("8000000000000001", "0000000000000001", 1),
            ("00ff00ff00ff00ff", "0000000000000000", 32),
            ("123456789abcdef0", "123456789abcdef0", 0),
        ],
        "a: string, b: string, want: int",
    )
    got = df.select(
        mm.dhash_hamming(F.col("a"), F.col("b")).alias("d"), "want"
    ).collect()
    for r in got:
        assert r["d"] == r["want"], r


def test_dhash_null_and_hostile_rows(spark):
    """NULL payloads and malformed rasters yield NULL hash/band rows in
    crawl mode; strict mode raises."""
    gray = _texture(8, 8)
    good = _pnm_bytes(gray)
    rows = _hash_payloads(spark, [good, None, b"\x00garbage"])
    assert rows[0]["dhash"] is not None
    assert rows[1]["dhash"] is None and rows[1]["band1"] is None
    assert rows[2]["dhash"] is None

    df = spark.createDataFrame([(0, b"\x00garbage")], "media_id: long, payload: binary")
    with pytest.raises(Exception):
        mm.image_dhash(df, strict=True).collect()


def test_dhash_ccitt_and_lossless_formats_hash_identically(spark):
    """Format robustness extends to the round-10 codec tiers: a bilevel
    raster as CCITT-G4 TIFF and as PGM hashes identically (the fax walk
    and the trivial container land on the same pixels)."""
    import random

    from tests.test_tiff_ccitt import random_raster, tiff_bilevel

    bits = random_raster(random.Random(5), 20, 12)
    gray = (255 * (1 - bits)).astype(np.uint8)  # photometric-0 sense
    rows = _hash_payloads(
        spark, [tiff_bilevel(bits, 4, photo=0), _pnm_bytes(gray)]
    )
    assert rows[0]["dhash"] == rows[1]["dhash"]

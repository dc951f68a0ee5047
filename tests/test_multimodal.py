"""Real-container decode path (decode_mode="real"): pure-stdlib BMP /
PPM / WAV header parsing.  Goldens here are HANDWRITTEN byte strings
(not produced by the builders under test) so the decoder is checked
against the container specs, not against itself."""

import struct

import pyspark.sql.functions as F

from polars_iptools_spark.operators import multimodal as mm

# -- handwritten golden containers --------------------------------------

# 2x2 24-bit BMP: 54-byte header + 2 rows of (2*3 bytes + 2 pad)
_BMP_2X2 = (
    b"BM" + struct.pack("<I", 70) + b"\x00\x00\x00\x00" + struct.pack("<I", 54)
    + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 0, 0, 0, 0)
    + b"\x11" * 16
)

# top-down BMP stores NEGATIVE height
_BMP_TOPDOWN = (
    b"BM" + struct.pack("<I", 70) + b"\x00\x00\x00\x00" + struct.pack("<I", 54)
    + struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, 16, 0, 0, 0, 0)
    + b"\x11" * 16
)

_PPM_3X5 = b"P6\n3 5\n255\n" + b"\x22" * 45

# mono 16-bit 8kHz WAV with 7 sample frames
_WAV_7 = (
    b"RIFF" + struct.pack("<I", 36 + 14) + b"WAVE"
    + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    + b"data" + struct.pack("<I", 14) + b"\x00" * 14
)


def test_real_decode_goldens():
    d = mm._real_decode(1, _BMP_2X2)
    assert (d["width"], d["height"], d["n_frames"]) == (2, 2, 1)
    assert d["magic"] == _BMP_2X2[:4].hex() and d["n_bytes"] == 70

    d = mm._real_decode(2, _BMP_TOPDOWN)
    assert (d["width"], d["height"]) == (2, 2)  # abs() of top-down rows

    d = mm._real_decode(3, _PPM_3X5)
    assert (d["width"], d["height"], d["n_frames"]) == (3, 5, 1)

    d = mm._real_decode(4, _WAV_7)
    assert d["width"] is None and d["height"] is None
    assert d["n_frames"] == 7


def test_real_decode_corrupt_degrades_not_raises():
    for junk in (b"", b"BM", b"P6\ngarbage", b"RIFFxxxxWAVE", b"\x89PNG\r\n"):
        d = mm._real_decode(9, junk)
        assert d["width"] is None and d["n_frames"] is None
        assert d["n_bytes"] == len(junk)


def test_builders_roundtrip_through_real_decode():
    assert mm._real_decode(0, mm.build_bmp(20, 36))["width"] == 20
    assert mm._real_decode(0, mm.build_bmp(17, 3))["n_bytes"] == 54 + (17 * 3 + 1) * 3
    assert mm._real_decode(0, mm.build_ppm(11, 13))["height"] == 13
    assert mm._real_decode(0, mm.build_wav(123))["n_frames"] == 123


def test_real_mode_end_to_end_spark(spark):
    df = spark.range(30).select(F.col("id").alias("doc_id"))
    media = mm.attach_synthetic_media(df, "doc_id")
    out = mm.extract_media_meta(media, "doc_id", "media", decode_mode="real")
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 30
    for i in range(30):
        r = rows[i]
        if i % 3 == 0:
            assert (r.width, r.height) == (16 + (i % 8) * 4, 16 + (i % 6) * 4)
            assert r.n_frames == 1 and r.magic.startswith("424d")
        elif i % 3 == 1:
            assert (r.width, r.height) == (10 + (i % 40), 10 + (i % 30))
            assert r.magic.startswith("50360a")
        else:
            assert r.width is None and r.height is None
            assert r.n_frames == 100 + (i % 50)
            assert r.magic == "52494646"


def test_fake_mode_unchanged(spark):
    df = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    media = mm.attach_fake_media(df, "doc_id", "text")
    out = mm.extract_media_meta(media, "doc_id", "media").collect()
    assert len(out) == 5 and all(r.n_bytes == 32 for r in out)


def test_sample_frames_real_mode(spark):
    df = spark.range(9).select(F.col("id").alias("doc_id"))
    media = mm.attach_synthetic_media(df, "doc_id")
    frames = mm.sample_frames(
        media, every_n=25, id_col="doc_id", decode_mode="real"
    ).collect()
    got = {}
    for r in frames:
        got.setdefault(r.media_id, []).append(r.frame_idx)
    for i in range(9):
        if i % 3 == 2:  # wav: n_frames = 100 + i%50, sampled every 25
            assert sorted(got[i]) == list(range(0, 100 + (i % 50), 25))
        else:  # images: a single frame
            assert sorted(got[i]) == [0]


def test_sample_frames_real_mode_skips_undecodable(spark):
    df = spark.range(4).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    media = mm.attach_fake_media(df, "doc_id", "text")  # unknown container
    assert (
        mm.sample_frames(media, id_col="doc_id", decode_mode="real").count() == 0
    )


def test_real_decode_clamps_out_of_int32_claims(spark):
    """Code-review regression: a corrupt header CLAIMING a dimension
    outside Int32 must degrade that row to null fields, not blow up the
    nullable-Int32 pin and kill the task."""
    import struct

    huge_ppm = b"P6\n99999999999 5\n255\n" + b"\x00" * 8
    d = mm._real_decode(1, huge_ppm)
    # the out-of-range dimension degrades; the parseable one survives —
    # but n_frames nulls too for an image whose dims were junk, so
    # sample_frames never emits frame 0 for an undecodable image
    # (review follow-up to the per-field r4 semantics)
    assert d["width"] is None and d["height"] == 5 and d["n_frames"] is None
    huge_wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", 0xFFFFFFF0)
    )
    d = mm._real_decode(2, huge_wav)
    assert d["n_frames"] is None
    # and end-to-end through the Int32 pin
    df = spark.createDataFrame(
        [(1, bytearray(huge_ppm)), (2, bytearray(huge_wav))],
        "media_id long, media binary",
    )
    rows = {
        r.media_id: r
        for r in mm.extract_media_meta(
            df, "media_id", "media", decode_mode="real"
        ).collect()
    }
    assert len(rows) == 2
    assert rows[1].width is None and rows[1].height == 5
    assert rows[1].n_frames is None
    assert rows[2].n_frames is None

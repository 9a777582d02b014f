"""functions/png.py: the in-container REAL image kernel (VERDICT r4 gap 2).

Pins actual pixel values — a known 4×4 fixture decoded byte-for-byte, a
random round-trip across every (channels, row-filter) combination, the
nearest-neighbor index math, and the multimodal decode_image/resize_images
entry points that route PNG payloads onto the real kernel."""

import random

import pytest

from agentic_data_pipeline_spark.functions.png import (
    decode_png, encode_png, is_png, resize_nearest,
)

# A known 4×4 greyscale image: a diagonal ramp.
FIXTURE_PIXELS = bytes([
    0, 16, 32, 48,
    16, 32, 48, 64,
    32, 48, 64, 80,
    48, 64, 80, 96,
])


def test_known_fixture_roundtrip_exact_pixels():
    png = encode_png(FIXTURE_PIXELS, 4, 4, 1)
    assert is_png(png)
    w, h, ch, px = decode_png(png)
    assert (w, h, ch) == (4, 4, 1)
    assert px == FIXTURE_PIXELS  # actual pixel values, byte for byte


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_all_filters_and_channels(channels, filter_type):
    rng = random.Random(channels * 10 + filter_type)
    w, h = rng.randint(1, 13), rng.randint(1, 13)
    px = bytes(rng.randrange(256) for _ in range(w * h * channels))
    got = decode_png(encode_png(px, w, h, channels, filter_type))
    assert got == (w, h, channels, px)


def test_resize_nearest_index_math():
    # 8×8 ramp (pixel = index) → 4×4 must sample src(2r, 2c)
    px = bytes(range(64))
    out = resize_nearest(px, 8, 8, 1, 4, 4)
    assert list(out) == [(2 * r) * 8 + 2 * c
                         for r in range(4) for c in range(4)]
    # upscale: 2×2 → 4×4 replicates each pixel 2×2
    out = resize_nearest(bytes([1, 2, 3, 4]), 2, 2, 1, 4, 4)
    assert list(out) == [1, 1, 2, 2, 1, 1, 2, 2,
                         3, 3, 4, 4, 3, 3, 4, 4]


def test_decode_image_routes_png_and_rejects_others():
    from agentic_data_pipeline_spark.operators.multimodal import decode_image

    w, h, ch, px = decode_image(encode_png(FIXTURE_PIXELS, 4, 4, 1))
    assert (w, h, ch, px) == (4, 4, 1, FIXTURE_PIXELS)
    with pytest.raises(NotImplementedError, match="ffd8"):  # JPEG magic
        decode_image(b"\xff\xd8\xff\xe0" + b"\0" * 16)


def test_resize_images_real_kernel_on_png_assets(spark):
    """resize_images must produce a VALID PNG of the target size whose
    pixels are the nearest-neighbor sample of the source."""
    from agentic_data_pipeline_spark.operators.multimodal import resize_images

    src = bytes(range(64))
    df = spark.createDataFrame([(1, bytearray(encode_png(src, 8, 8, 1)))],
                               "asset_id bigint, media binary")
    row = resize_images(df, 4, 4).head()
    assert (row["width"], row["height"]) == (4, 4)
    w, h, ch, px = decode_png(bytes(row["media"]))
    assert (w, h, ch) == (4, 4, 1)
    assert px == resize_nearest(src, 8, 8, 1, 4, 4)


def test_resize_images_non_png_keeps_pad_truncate_standin(spark):
    from agentic_data_pipeline_spark.operators.multimodal import resize_images

    df = spark.createDataFrame([(1, bytearray(b"abc"))],
                               "asset_id bigint, media binary")
    row = resize_images(df, 4, 4).head()
    assert bytes(row["media"]) == b"abc" + b"\0" * 13


def test_decoder_rejects_unsupported_fields():
    png = bytearray(encode_png(FIXTURE_PIXELS, 4, 4, 1))
    png[24] = 16  # IHDR bit depth byte
    # (crc now wrong but decoder checks fields first)
    with pytest.raises(NotImplementedError, match="bit depth 16"):
        decode_png(bytes(png))


def test_split_png_stream_framing():
    from agentic_data_pipeline_spark.functions.png import split_png_stream

    a = encode_png(bytes(range(16)), 4, 4, 1)
    b = encode_png(bytes(range(16, 32)), 4, 4, 1)
    frames = split_png_stream(a + b + a)
    assert frames == [a, b, a]
    assert split_png_stream(b"not a png") == []
    # exact pixels survive the stream round-trip
    assert decode_png(frames[1])[3] == bytes(range(16, 32))
    # truncated trailing frame (IEND never reached) is DROPPED, not
    # emitted as a garbage blob for downstream decode to choke on
    assert split_png_stream(a + b[:-6]) == [a]
    # corrupt chunk length striding past the end: dropped, no exception
    bad = bytearray(a)
    bad[8:12] = (0xFFFFFF).to_bytes(4, "big")
    assert split_png_stream(bytes(bad)) == []


def test_sample_png_frames_keeps_every_strideth(spark):
    from agentic_data_pipeline_spark.operators.multimodal import (
        sample_png_frames,
    )

    pngs = [encode_png(bytes([f] * 16), 4, 4, 1) for f in range(6)]
    df = spark.createDataFrame([(1, bytearray(b"".join(pngs)))],
                               "asset_id bigint, media binary")
    rows = sorted(sample_png_frames(df, stride=2).collect(),
                  key=lambda r: r["frame_no"])
    assert [r["frame_no"] for r in rows] == [0, 2, 4]
    for r, f in zip(rows, (0, 2, 4)):
        assert decode_png(bytes(r["frame"]))[3] == bytes([f] * 16)


# ---- property tests (hypothesis): the codec must round-trip ARBITRARY
# pixel content at arbitrary small geometries, under every filter type.

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 24), h=st.integers(1, 24),
        channels=st.sampled_from([1, 2, 3, 4]),
        filter_type=st.integers(0, 4),
        seed=st.integers(0, 2**31),
    )
    def test_property_roundtrip_any_image(w, h, channels, filter_type, seed):
        rng = random.Random(seed)
        px = bytes(rng.randrange(256) for _ in range(w * h * channels))
        assert decode_png(encode_png(px, w, h, channels, filter_type)) == \
            (w, h, channels, px)

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 16), h=st.integers(1, 16),
        nw=st.integers(1, 16), nh=st.integers(1, 16),
        seed=st.integers(0, 2**31),
    )
    def test_property_resize_indices(w, h, nw, nh, seed):
        rng = random.Random(seed)
        px = bytes(rng.randrange(256) for _ in range(w * h))
        out = resize_nearest(px, w, h, 1, nw, nh)
        assert len(out) == nw * nh
        for r in range(nh):
            for c in range(nw):
                assert out[r * nw + c] == px[(r * h // nh) * w
                                             + (c * w // nw)]
except ImportError:  # pragma: no cover — hypothesis ships in the container
    pass

"""functions/wav.py: the in-container REAL audio kernel (WAV sibling of
the PNG codec tests)."""

import random

import pytest

from agentic_data_pipeline_spark.functions.wav import (
    decode_wav, encode_wav, resample_nearest,
)


def test_known_fixture_roundtrip_exact_samples():
    samples = [0, 1000, -1000, 32767, -32768, 12345]
    wav = encode_wav(samples, 8000)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    rate, ch, got = decode_wav(wav)
    assert (rate, ch) == (8000, 1)
    assert got == samples  # actual sample values, int for int


@pytest.mark.parametrize("channels,rate", [(1, 8000), (2, 44100)])
def test_roundtrip_random(channels, rate):
    rng = random.Random(channels * rate)
    samples = [rng.randint(-32768, 32767) for _ in range(64 * channels)]
    got = decode_wav(encode_wav(samples, rate, channels))
    assert got == (rate, channels, samples)


def test_decoder_tolerates_extra_chunks():
    """Real-world WAVs carry LIST/fact chunks between fmt and data; the
    chunk walker must skip them (with word alignment)."""
    samples = [5, -5, 7]
    wav = bytearray(encode_wav(samples, 8000))
    # splice an odd-length junk chunk before 'data'
    data_at = wav.index(b"data")
    junk = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\0"  # padded
    spliced = bytes(wav[:data_at]) + junk + bytes(wav[data_at:])
    spliced = (b"RIFF" + (len(spliced) - 8 + len(junk)).to_bytes(4, "little")
               + spliced[8:])
    assert decode_wav(spliced)[2] == samples


def test_decoder_rejects_non_pcm():
    wav = bytearray(encode_wav([1, 2], 8000))
    wav[20] = 3  # fmt code -> IEEE float
    with pytest.raises(NotImplementedError, match="format 3"):
        decode_wav(bytes(wav))


def test_resample_nearest_index_math():
    s = list(range(64))
    assert resample_nearest(s, 32) == s[::2]
    assert resample_nearest([1, 2], 4) == [1, 1, 2, 2]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(0, 200), channels=st.sampled_from([1, 2]),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31),
    )
    def test_property_roundtrip_any_audio(n, channels, rate, seed):
        rng = random.Random(seed)
        samples = [rng.randint(-32768, 32767) for _ in range(n * channels)]
        assert decode_wav(encode_wav(samples, rate, channels)) == \
            (rate, channels, samples)
except ImportError:  # pragma: no cover
    pass

"""Pure-Python WAV (RIFF/PCM16) codec + nearest resample (stdlib only).

The audio sibling of functions/png.py: librosa/soundfile are absent from
this container, but canonical PCM WAV is a fixed RIFF header + raw
little-endian int16 frames — fully implementable with `struct`. Supported:
PCM (format 1), 16-bit, any rate/channels; anything else raises with the
offending field. Runs inside Arrow-batched mapInPandas kernels
(operators/multimodal): per-row CPU, zero shuffle implications.
"""

from __future__ import annotations

import struct


def encode_wav(samples: list[int], sample_rate: int,
               channels: int = 1) -> bytes:
    """Encode int16 samples (interleaved if multi-channel) as a PCM WAV."""
    n = len(samples)
    data = struct.pack(f"<{n}h", *samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels,
                                    sample_rate, byte_rate, block_align, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a PCM16 WAV to (sample_rate, channels, samples).
    Walks RIFF chunks (tolerates extra chunks like LIST/fact); rejects
    non-PCM formats and non-16-bit depths by name."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, fmt, frames = 12, None, None, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16])
        elif tag == b"data":
            frames = body
    if fmt is None or frames is None:
        raise ValueError("missing fmt/data chunk")
    if fmt != 1:
        raise NotImplementedError(f"WAV format {fmt} (only PCM=1)")
    if bits != 16:
        raise NotImplementedError(f"bit depth {bits} (only 16)")
    n = len(frames) // 2
    return rate, channels, list(struct.unpack(f"<{n}h", frames[:n * 2]))


def resample_nearest(samples: list[int], n_out: int) -> list[int]:
    """Nearest-neighbor resample of a mono sample list to ``n_out``
    samples: out[i] = in[i * n_in // n_out] — the same integer mapping as
    png.resize_nearest, exactly replayable in SQL."""
    n_in = len(samples)
    return [samples[i * n_in // n_out] for i in range(n_out)]

"""Real WAV (RIFF/PCM) codec — stdlib ``wave`` + numpy, no ffmpeg.

The reference's audio fixtures are ffmpeg-generated PCM WAV files
(test/factories/factories.go:215-263: ``sine=frequency=1000``, pcm_s16le,
44100 Hz, stereo). PCM WAV needs no codec library, so the audio blocks get
a real-media path: parse RIFF → int16 frame matrix → operate → re-encode.
MP3/AAC stay behind the ffmpeg gate (actual entropy coding).

``sine_wav`` mirrors the factory's generator so tests exercise the same
fixture shape the reference's functional suite uses.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, int16 frames of shape (n_frames, channels)).

    Only 16-bit PCM is accepted (the reference writes pcm_s16le); other
    sample widths raise rather than silently mis-decode.
    """
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"only 16-bit PCM WAV supported, got {8 * w.getsampwidth()}-bit"
            )
        rate = w.getframerate()
        ch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    frames = np.frombuffer(raw, dtype="<i2").reshape(-1, ch)
    return rate, frames


def wav_encode(rate: int, frames: np.ndarray) -> bytes:
    """(n_frames, channels) int16 → WAV bytes (pcm_s16le)."""
    if frames.ndim == 1:
        frames = frames[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(frames.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.ascontiguousarray(frames, dtype="<i2").tobytes())
    return buf.getvalue()


def wav_duration(data: bytes) -> float:
    rate, frames = wav_decode(data)
    return frames.shape[0] / float(rate)


def sine_wav(
    freq: float = 1000.0,
    seconds: float = 1.0,
    rate: int = 44100,
    channels: int = 2,
    amplitude: int = 16384,
) -> bytes:
    """Deterministic sine fixture (factories.go:215-263 shape)."""
    n = int(round(seconds * rate))
    t = np.arange(n, dtype=np.float64) / rate
    mono = np.rint(amplitude * np.sin(2.0 * np.pi * freq * t)).astype(np.int16)
    return wav_encode(rate, np.repeat(mono[:, None], channels, axis=1))


def chunk(data: bytes, duration: float) -> list[bytes]:
    """Fixed-duration WAV chunks, ragged tail (ffmpeg -f segment shape)."""
    rate, frames = wav_decode(data)
    step = max(1, int(duration * rate))
    return [
        wav_encode(rate, frames[i : i + step])
        for i in range(0, frames.shape[0], step)
    ]


def convert(
    data: bytes,
    mono: bool = False,
    sample_rate: int | None = None,
) -> bytes:
    """-ac 1 / -ar semantics on PCM: channel mixdown by integer mean,
    nearest-neighbour resample (deterministic stand-in for ffmpeg's
    polyphase filter — duration and content structure preserved)."""
    rate, frames = wav_decode(data)
    if mono and frames.shape[1] > 1:
        frames = (frames.astype(np.int32).mean(axis=1)).astype(np.int16)[:, None]
    if sample_rate and sample_rate != rate and frames.shape[0]:
        n_out = max(1, int(round(frames.shape[0] * sample_rate / rate)))
        idx = (np.arange(n_out, dtype=np.int64) * frames.shape[0]) // n_out
        frames = frames[idx]
        rate = sample_rate
    elif sample_rate:
        rate = sample_rate
    return wav_encode(rate, frames)

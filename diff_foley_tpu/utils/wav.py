"""Minimal PCM16 WAV writer/reader (no soundfile in this environment)."""
from __future__ import annotations

import struct
import wave

import numpy as np


def write_wav(path: str, wav: np.ndarray, sr: int = 16000) -> None:
    """float waveform in [-1, 1] (or pre-quantized int16 PCM) → 16-bit WAV."""
    wav = np.asarray(wav)
    if wav.dtype == np.int16:  # already quantized on-device (wav_dtype="int16")
        pcm = wav.astype("<i2", copy=False)
    else:
        data = np.clip(wav.astype(np.float32), -1.0, 1.0)
        pcm = (data * 32767.0).astype("<i2")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def read_wav(path: str):
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        raw = f.readframes(n)
        width = f.getsampwidth()
        channels = f.getnchannels()
    if width == 2:
        pcm = np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if channels > 1:
        # frames are interleaved — downmix to mono instead of returning
        # an interleaved stream the DSP chain would misread
        pcm = pcm.reshape(-1, channels).mean(axis=1)
    return pcm, sr

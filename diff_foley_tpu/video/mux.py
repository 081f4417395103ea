"""A/V muxing of generated foley onto the source video.

Behavioural spec: reference notebook cell 15 (`diff_foley_inference.ipynb`):
`ffmpeg -i <video> -i <wav> -c:v copy -c:a aac -strict experimental <out>`,
with the wav written at 16 kHz first (cell 14 `sf.write(..., 16000)`), and
`demo_util.py:20-28` (which_ffmpeg) for locating the binary.

ffmpeg isn't present in every environment; `has_ffmpeg()` gates the path and
`mux_audio_video` raises a clear error when it's absent. The wav is written
with scipy (no soundfile needed).
"""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

import numpy as np


def which_ffmpeg() -> str:
    """Path to ffmpeg, '' if not installed (demo_util.py:20-28)."""
    return shutil.which("ffmpeg") or ""


def has_ffmpeg() -> bool:
    return which_ffmpeg() != ""


def write_wav(path: str, wav: np.ndarray, sr: int = 16000) -> str:
    """float waveform in [-1, 1] → 16-bit PCM wav (notebook cell 14)."""
    from scipy.io import wavfile

    pcm = np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
    wavfile.write(path, sr, (pcm * 32767.0).astype(np.int16))
    return path


def mux_audio_video(
    video_path: str,
    wav: np.ndarray,
    out_path: str,
    sr: int = 16000,
    tmp_wav: Optional[str] = None,
) -> str:
    """Attach `wav` to `video_path` → `out_path` (video stream copied,
    audio AAC-encoded — notebook cell 15's exact codec choice)."""
    ffmpeg = which_ffmpeg()
    if not ffmpeg:
        raise RuntimeError(
            "ffmpeg not found on PATH; install it to mux audio onto video "
            "(generation itself does not need it)"
        )
    tmp_wav = tmp_wav or (os.path.splitext(out_path)[0] + "_audio.wav")
    write_wav(tmp_wav, wav, sr)
    cmd = [
        ffmpeg, "-hide_banner", "-loglevel", "error", "-y",
        "-i", video_path, "-i", tmp_wav,
        "-c:v", "copy", "-c:a", "aac", "-strict", "experimental",
        "-map", "0:v:0", "-map", "1:a:0", "-shortest",
        out_path,
    ]
    subprocess.check_call(cmd)
    return out_path

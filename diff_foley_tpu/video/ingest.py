"""Host-edge video ingest: frame extraction at 4 FPS + CAVP feature encode.

Behavioural spec: reference `inference/demo_util.py:31-173`
(Extract_CAVP_Features): ffmpeg re-encode to fps=4 → cv2 frame loop →
Resize(224,224) + ToTensor (/255) → batches of `batch_size` frames →
`encode_video(normalize=True, pool=False)` → concat.

No ffmpeg in this environment, so the 4-FPS resample is done by timestamp
selection directly on the native-FPS stream (cv2): frame k of the output
corresponds to source frame round(k · src_fps / 4), which matches ffmpeg's
`fps=4` filter (frame nearest to each output timestamp) for CFR inputs.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def extract_frames(
    video_path: str,
    fps: float = 4.0,
    size: int = 224,
    start_second: float = 0.0,
    truncate_second: Optional[float] = None,
) -> np.ndarray:
    """→ (T, size, size, 3) float32 in [0,1] at `fps` frames/second."""
    assert cv2 is not None, "cv2 required for video ingest"
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(video_path)
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    n_src = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    duration = n_src / src_fps
    end = duration if truncate_second is None else min(
        duration, start_second + truncate_second
    )
    n_out = max(0, int((end - start_second) * fps))
    # source index for each output frame (ffmpeg fps filter: first frame at
    # t=start, then 1/fps spacing)
    src_idx = np.minimum(
        np.round((start_second + np.arange(n_out) / fps) * src_fps).astype(int),
        n_src - 1,
    )
    want = set(src_idx.tolist())
    mapping = {}
    i = 0
    ok = True
    if n_out and src_idx[0] > 0:
        # seek to the first wanted frame instead of decoding from 0
        # (start_second=60 @30fps would otherwise decode+discard 1800 frames)
        if cap.set(cv2.CAP_PROP_POS_FRAMES, int(src_idx[0])):
            i = int(src_idx[0])
    while ok and i <= (src_idx.max() if n_out else -1):
        ok, frame = cap.read()
        if not ok:
            break
        if i in want:
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            rgb = cv2.resize(rgb, (size, size), interpolation=cv2.INTER_LINEAR)
            mapping[i] = rgb
        i += 1
    cap.release()
    if not mapping:
        raise ValueError(f"no frames decoded from {video_path}")
    if len(mapping) < len(want):
        # container over-reported CAP_PROP_FRAME_COUNT (truncated file):
        # substitute the last decoded frame so the output still covers the
        # requested duration, and say so instead of silently shrinking
        import warnings

        warnings.warn(
            f"{video_path}: decode stopped at frame {max(mapping)} but "
            f"{int(src_idx.max())} was requested (container over-reported "
            "length); repeating the last decoded frame"
        )
    last_decoded = max(mapping)
    frames = [mapping[j if j in mapping else last_decoded] for j in src_idx]
    return np.stack(frames).astype(np.float32) / 255.0


def extract_cavp_features(
    video_path: str,
    cavp_apply_fn,
    cavp_variables,
    fps: float = 4.0,
    batch_size: int = 40,
    start_second: float = 0.0,
    truncate_second: Optional[float] = None,
    size: int = 224,
) -> np.ndarray:
    """Video file → (T, 512) L2-normalised per-frame CAVP features.

    `cavp_apply_fn(variables, video_batch)` must run
    CAVPModel.encode_video(pool=False, normalize=True) on a
    (1, T, size, size, 3) batch (demo_util.py:124-173 semantics: batches of
    `batch_size` frames, ragged tail included; size=224 in the reference).
    """
    frames = extract_frames(video_path, fps, size, start_second, truncate_second)
    feats = []
    for i in range(0, len(frames), batch_size):
        chunk = frames[i : i + batch_size][None]  # (1, t, 224, 224, 3)
        out = cavp_apply_fn(cavp_variables, chunk)
        feats.append(np.asarray(out[0]))
    return np.concatenate(feats, axis=0)

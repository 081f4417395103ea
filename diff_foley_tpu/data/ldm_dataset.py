"""Stage-2 LDM dataset: mel-spec `.npy` + CAVP-feature `.npz` pairs.

Behavioural spec: reference `adm/data/video_spec_dataset.py:12-208`
(audio_video_spec_fullset_Dataset) at the shipped 16 kHz operating point:

- pad-by-tiling spec to `sr·duration/hop` frames and feats to `fps·duration`
  (load_spec_and_feat :82-97);
- p=0.5 **temporal mix augmentation**: splice two clips' spec+feat segments
  consistently (mode 'concat'), else a random 8.192-s crop (mode 'single')
  (mix_audio_and_feat :100-147);
- spec tiled 1→3 channels; keys 'mix_spec' / 'mix_video_feat' (:184-186).

Output layout is TPU-native NHWC: spec (128, T, 3).

An optional `alignment_labels` mode additionally emits {0,1} labels by
pairing specs with mismatched features — the training signal for the
double-guidance classifier (SURVEY.md §3.4).
"""
from __future__ import annotations

import dataclasses
import math
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class LDMDataConfig:
    sr: int = 16000
    duration: float = 10.0
    truncate: int = 131072     # 8.192 s → 512 spec frames, 32 feats @4 FPS
    fps: float = 4.0
    hop_len: int = 256
    min_duration: int = 2
    mix_prob: float = 0.5
    fix_frames: bool = False
    # False → emit single-channel (128, T) specs and let the train step tile
    # ×3 on device: 3× fewer host→device bytes (the reference tiles on host,
    # video_spec_dataset.py:184)
    tile_channels: bool = True


class SpecFeatDataset:
    """Map-style dataset over (spec.npy, feat.npz) path pairs."""

    def __init__(
        self,
        spec_paths: Sequence[str],
        feat_paths: Sequence[str],
        cfg: LDMDataConfig = LDMDataConfig(),
        alignment_labels: bool = False,
        seed: int = 0,
    ):
        assert len(spec_paths) == len(feat_paths)
        self.spec_paths = list(spec_paths)
        self.feat_paths = list(feat_paths)
        self.cfg = cfg
        self.alignment_labels = alignment_labels
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Vary augmentation draws per epoch (PrefetchLoader calls this)."""
        self._epoch = int(epoch)

    def _item_rng(self, idx: int) -> np.random.Generator:
        """Fresh per-item generator keyed on (seed, epoch, idx): thread-safe
        under PrefetchLoader's concurrent workers (a shared np Generator is
        not), and crops are reproducible regardless of arrival order."""
        return np.random.default_rng(
            np.random.SeedSequence([self.seed, self._epoch, int(idx)])
        )

    @classmethod
    def from_split_file(
        cls, data_dir: str, split: str, cfg: LDMDataConfig = LDMDataConfig(),
        feat_type: str = "CAVP_feat", **kw,
    ) -> "SpecFeatDataset":
        """Directory layout of the reference (video_spec_dataset.py:40-52):
        <data_dir>/<Split>/audio_npy_spec/<id>_mel.npy,
        <data_dir>/<feat_type>/<Split>/<id>.npz, ids from <split>.txt."""
        split_cap = {"train": "Train", "valid": "Test", "test": "Test"}[split]
        with open(os.path.join(data_dir, f"{split_cap}.txt")) as f:
            ids = [x.strip() for x in f if x.strip()]
        specs = [
            os.path.join(data_dir, split_cap, "audio_npy_spec", f"{i}_mel.npy")
            for i in ids
        ]
        feats = [os.path.join(data_dir, feat_type, split_cap, f"{i}.npz") for i in ids]
        return cls(specs, feats, cfg, **kw)

    def __len__(self) -> int:
        return len(self.spec_paths)

    # ---- loading ----------------------------------------------------------
    def _load(self, idx: int):
        spec = np.load(self.spec_paths[idx]).astype(np.float32)
        feat = np.load(self.feat_paths[idx])["feat"].astype(np.float32)
        cfg = self.cfg
        spec_len = int(cfg.sr * cfg.duration / cfg.hop_len)
        if spec.shape[1] < spec_len:
            spec = np.tile(spec, math.ceil(spec_len / spec.shape[1]))
        spec = spec[:, :spec_len]
        feat_len = int(cfg.fps * cfg.duration)
        if feat.shape[0] < feat_len:
            feat = np.tile(feat, (math.ceil(feat_len / feat.shape[0]), 1))
        feat = feat[:feat_len]
        return spec, feat

    # ---- augmentation -----------------------------------------------------
    def _single(self, spec, feat, rng):
        cfg = self.cfg
        # duration == truncate (or shorter operating points) → start 0
        # instead of rng.integers on an empty range
        hi = max(int(cfg.sr * cfg.duration) - cfg.truncate - 1, 0)
        start = 0 if cfg.fix_frames or hi == 0 else int(
            rng.integers(0, hi + 1))
        start_frame = int(cfg.fps * start / cfg.sr)
        truncate_frame = int(cfg.fps * cfg.truncate / cfg.sr)
        spec_start = start // cfg.hop_len
        spec_truncate = cfg.truncate // cfg.hop_len
        return (
            spec[:, spec_start : spec_start + spec_truncate],
            feat[start_frame : start_frame + truncate_frame],
        )

    def _concat(self, spec1, spec2, feat1, feat2, rng):
        cfg = self.cfg
        total = cfg.truncate // cfg.hop_len
        min_frames = cfg.min_duration * cfg.sr // cfg.hop_len
        len1 = int(rng.integers(min_frames, total - min_frames))
        len2 = total - len1
        s1 = int(rng.integers(0, total - len1))
        s2 = int(rng.integers(0, total - len2))
        spec = np.concatenate(
            [spec1[:, s1 : s1 + len1], spec2[:, s2 : s2 + len2]], axis=1
        )
        f1_start = int(cfg.fps * s1 * cfg.hop_len / cfg.sr)
        f1_len = int(cfg.fps * len1 * cfg.hop_len / cfg.sr)
        f2_start = int(cfg.fps * s2 * cfg.hop_len / cfg.sr)
        f2_len = int(cfg.fps * cfg.truncate / cfg.sr) - f1_len
        feat = np.concatenate(
            [feat1[f1_start : f1_start + f1_len], feat2[f2_start : f2_start + f2_len]]
        )
        return spec, feat

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = self._item_rng(idx)
        spec1, feat1 = self._load(idx)
        mixed = float(rng.uniform()) < self.cfg.mix_prob

        if self.alignment_labels:
            # classifier mode: p=0.5 swap in a mismatched video feature
            if mixed:
                j = idx
                while j == idx:
                    j = int(rng.integers(0, len(self)))
                _, feat1 = self._load(j)
            spec, feat = self._single(spec1, feat1, rng)
            label = 0 if mixed else 1
            return {
                "spec": np.repeat(spec[:, :, None], 3, axis=2),
                "video_feat": feat,
                "labels": np.asarray(label, np.int32),
            }

        # concat-mix needs room for two ≥min_duration segments inside the
        # crop; shorter operating points fall back to the single-crop mode
        total = self.cfg.truncate // self.cfg.hop_len
        min_frames = self.cfg.min_duration * self.cfg.sr // self.cfg.hop_len
        if mixed and total > 2 * min_frames:
            j = idx
            while j == idx:
                j = int(rng.integers(0, len(self)))
            spec2, feat2 = self._load(j)
            spec, feat = self._concat(spec1, spec2, feat1, feat2, rng)
        else:
            spec, feat = self._single(spec1, feat1, rng)
        if self.cfg.tile_channels:
            spec = np.repeat(spec[:, :, None], 3, axis=2)  # (128, T, 3) NHWC
        return {
            "spec": spec,
            "video_feat": feat,
        }


class SpecDataset:
    """Spec-only dataset for first-stage VAE training.

    The reference trains its AutoencoderKL on mel-spec images alone
    (autoencoder.py:341-404, driven by the autoencoder training YAMLs); the
    loading/tiling/crop behaviour matches SpecFeatDataset minus the feature
    stream. Emits (128, T, 3) NHWC by default (video_spec_dataset.py:184's
    ×3 tile); cfg.tile_channels=False emits single-channel (128, T) for
    consumers that tile on device.
    """

    def __init__(self, spec_paths: Sequence[str],
                 cfg: LDMDataConfig = LDMDataConfig(), seed: int = 0):
        self.spec_paths = list(spec_paths)
        self.cfg = cfg
        self.seed = seed
        self._epoch = 0

    @classmethod
    def from_split_file(cls, data_dir: str, split: str,
                        cfg: LDMDataConfig = LDMDataConfig(), **kw):
        """Reference data layout (see SpecFeatDataset.from_split_file)."""
        split_cap = {"train": "Train", "valid": "Test", "test": "Test"}[split]
        with open(os.path.join(data_dir, f"{split_cap}.txt")) as f:
            ids = [x.strip() for x in f if x.strip()]
        specs = [
            os.path.join(data_dir, split_cap, "audio_npy_spec", f"{i}_mel.npy")
            for i in ids
        ]
        return cls(specs, cfg, **kw)

    @classmethod
    def from_dir(cls, spec_dir: str, cfg: LDMDataConfig = LDMDataConfig(),
                 **kw):
        """Flat directory of .npy mel specs (cli.preprocess_audio output)."""
        specs = sorted(
            os.path.join(spec_dir, f)
            for f in os.listdir(spec_dir) if f.endswith(".npy")
        )
        if not specs:
            raise FileNotFoundError(f"no .npy specs under {spec_dir}")
        return cls(specs, cfg, **kw)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def __len__(self) -> int:
        return len(self.spec_paths)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self._epoch, int(idx)])
        )
        spec = np.load(self.spec_paths[idx]).astype(np.float32)
        spec_len = int(cfg.sr * cfg.duration / cfg.hop_len)
        if spec.shape[1] < spec_len:
            spec = np.tile(spec, math.ceil(spec_len / spec.shape[1]))
        spec = spec[:, :spec_len]
        spec_truncate = cfg.truncate // cfg.hop_len
        hi = max(spec_len - spec_truncate, 0)
        # inclusive upper bound: the final valid offset is sampled too
        # (matches SpecFeatDataset._single's rng.integers(0, hi + 1))
        start = 0 if cfg.fix_frames or hi == 0 else int(
            rng.integers(0, hi + 1))
        spec = spec[:, start : start + spec_truncate]
        if cfg.tile_channels:
            spec = np.repeat(spec[:, :, None], 3, axis=2)
        return {"spec": spec}

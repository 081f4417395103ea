"""diff_foley_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-to-audio foley
generation framework with the capabilities of Diff-Foley (arXiv 2306.17203).

The framework is organised as:

- ``diffusion``  — noise schedules, losses, and samplers (DDIM / DPM-Solver++ /
  PLMS) expressed as ``lax.scan`` loops with composable guidance.
- ``models``     — the single model zoo: mel-spectrogram VAE, conditional UNet,
  alignment classifier, CAVP dual towers (SlowOnly-R50 / CNN14).
- ``ops``        — TPU compute primitives: Pallas attention, STFT/mel DSP,
  Griffin-Lim, NNLS mel inversion.
- ``audio`` / ``video`` — host-edge IO and the invertible mel transform chain.
- ``parallel``   — mesh construction and sharding rules (data/model axes).
- ``train``      — stage-1 CAVP, stage-2 LDM and alignment-classifier trainers.
- ``data``       — input pipelines (spec+feature datasets, sharded tar reader).
- ``eval``       — alignment-accuracy metric and spectrogram interop tools.

Reference behavioural spec: /root/reference (luosiallen/Diff-Foley); file:line
citations in docstrings point there.
"""

__version__ = "0.1.0"

"""Conditioning-stage embedders beyond the video posembed encoder.

Behavioural spec: reference `adm/modules/cond_stage/clip_embedder.py` —
- ClassEmbedder (`:21`): nn.Embedding lookup of a batch's class key →
  (B, 1, embed_dim) cross-attention tokens.
- FrozenCLIPEmbedder (`:137`): HF CLIPTextModel last_hidden_state over
  77-token padded text → (B, 77, 768) frozen context.

TPU notes: the CLIP text tower runs as transformers' Flax model (one jit'd
forward, frozen params). Zero-egress environments can't download weights or
tokenizer files, so construction accepts a `CLIPTextConfig` for local/random
initialisation and `encode_tokens` takes pre-tokenised ids.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class ClassEmbedder(nn.Module):
    """clip_embedder.py:21-33: class id → one cross-attn token."""

    embed_dim: int
    n_classes: int = 1000

    @nn.compact
    def __call__(self, y):
        return nn.Embed(self.n_classes, self.embed_dim, name="embedding")(
            y[:, None]
        )


class FrozenCLIPTextEmbedder:
    """Frozen HF CLIP text encoder (clip_embedder.py:137-162).

    encode(texts) needs the tokenizer (downloads — unavailable here);
    encode_tokens(input_ids (B, L)) always works. Parameters are frozen:
    callers never take gradients through `params`.
    """

    def __init__(self, version: str = "openai/clip-vit-large-patch14",
                 max_length: int = 77, config=None, seed: int = 0):
        from transformers import CLIPTextConfig, FlaxCLIPTextModel

        self.max_length = max_length
        self.tokenizer = None
        if config is None:
            try:
                self.model = FlaxCLIPTextModel.from_pretrained(version)
                from transformers import CLIPTokenizer

                self.tokenizer = CLIPTokenizer.from_pretrained(version)
            except Exception:
                # zero-egress fallback: architecture with random weights
                config = CLIPTextConfig()
                self.model = FlaxCLIPTextModel(
                    config, seed=seed, _do_init=True
                )
        else:
            self.model = FlaxCLIPTextModel(config, seed=seed, _do_init=True)
        self._fwd = jax.jit(
            lambda params, ids: self.model(
                input_ids=ids, params=params
            ).last_hidden_state
        )

    @property
    def params(self):
        return self.model.params

    def encode_tokens(self, input_ids) -> jnp.ndarray:
        """(B, L) token ids → (B, L, width) frozen hidden states."""
        out = self._fwd(self.model.params, jnp.asarray(input_ids))
        return jax.lax.stop_gradient(out)

    def encode(self, texts) -> jnp.ndarray:
        assert self.tokenizer is not None, (
            "tokenizer unavailable (zero-egress build); use encode_tokens"
        )
        batch = self.tokenizer(
            texts, truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np",
        )
        return self.encode_tokens(batch["input_ids"])

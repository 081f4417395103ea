"""Composable ε-guidance: classifier-free guidance + alignment-classifier
gradient guidance, fused into one model call per sampler step.

Behavioural spec:
- CFG 2×-batch combine: reference `ddim.py:241-245`, `dpm_solver.py:1367-1376`.
- Classifier guidance: ε ← ε − s_t · c_scale · ∇ₓ log p(aligned|x,t), where the
  reference uses s_t = √(1−ᾱ_t) in DDIM (`ddim.py:365-380`) but s_t = σ_t in the
  DPM 'double-guide' wrapper (`dpm_solver.py:1377-1393`).  Both scalings are kept:
  the sampler supplies s_t per step.

The torch `enable_grad` island becomes a plain `jax.grad` of the classifier's
log-sigmoid output — differentiable by construction, safe inside `lax.scan`.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

# model_fn(x, t_model_vec, context) -> eps, all batched
ModelFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]
# classifier_fn(x, t_model_vec, video_feat_context) -> LOG-probability of
# alignment, (B, 1). Log-space (e.g. jax.nn.log_sigmoid of the logits) is
# required: log(sigmoid(...)) of an underflowed-to-0 probability is -inf
# with NaN gradients, which would poison the whole sampling scan.
ClassifierFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class GuidanceSpec:
    """What to apply on top of the raw ε-model at each sampler step."""

    cfg_scale: float = 1.0
    classifier_scale: float = 0.0

    @property
    def use_cfg(self) -> bool:
        return self.cfg_scale != 1.0

    @property
    def use_classifier(self) -> bool:
        return self.classifier_scale > 0.0


def make_guided_eps_fn(
    model_fn: ModelFn,
    cond: jnp.ndarray,
    uncond: Optional[jnp.ndarray],
    spec: GuidanceSpec,
    classifier_fn: Optional[ClassifierFn] = None,
    classifier_cond: Optional[jnp.ndarray] = None,
    model_type: str = "noise",
):
    """Build eps_fn(x, t_model, s_t) -> guided ε.

    - CFG runs cond/uncond as one 2×batch UNet call (reference pattern), which
      keeps the MXU fed with a single large batch instead of two small ones.
    - Classifier gradient is taken at the *unguided* x (matching the
      reference, which differentiates log p w.r.t. x_t directly).
    - `model_type` declares the network's parameterisation à la the
      reference model_wrapper (dpm_solver.py:177-349): "noise" (ε, the
      shipped Diff-Foley case), "x_start" (x₀) or "v". The raw output is
      converted to ε BEFORE the classifier term is added — the reference
      order (noise_pred_fn first, then `noise - scale·σ·∇`,
      dpm_solver.py:335-348 / 1377-1393). The CFG combine commutes with the
      conversion (ε is affine in the raw output with combine weights
      summing to 1), so one combined conversion is exact. α_t is recovered
      from the supplied σ_t via α=√(1−σ²), exact for the VP schedules the
      solver library supports (NoiseScheduleVP asserts VP).
    """
    if model_type not in ("noise", "x_start", "v"):
        raise ValueError(
            f"model_type must be 'noise', 'x_start' or 'v' "
            f"(dpm_solver.py:349), got {model_type!r}")
    if spec.use_cfg:
        assert uncond is not None, "CFG needs an unconditional embedding"
        c_in = jnp.concatenate([uncond, cond], axis=0)

    if spec.use_classifier:
        assert classifier_fn is not None and classifier_cond is not None

        def log_prob_sum(x, t_model):
            log_p = classifier_fn(x, t_model, classifier_cond)
            return jnp.sum(log_p)

        grad_fn = jax.grad(log_prob_sum)

    def to_eps(x, out, s_t):
        if model_type == "noise":
            return out
        a_t = jnp.sqrt(1.0 - jnp.square(s_t))
        if model_type == "x_start":  # ε = (x − α·x₀)/σ   (:303-306)
            return (x - a_t * out) / s_t
        return a_t * out + s_t * x   # "v": ε = α·v + σ·x (:307-310)

    def eps_fn(x, t_model, s_t):
        if spec.use_cfg:
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([t_model, t_model], axis=0)
            o_uncond, o_cond = jnp.split(model_fn(x_in, t_in, c_in), 2, axis=0)
            out = o_uncond + spec.cfg_scale * (o_cond - o_uncond)
        else:
            out = model_fn(x, t_model, cond)
        eps = to_eps(x, out, s_t)
        if spec.use_classifier:
            grad = grad_fn(x, t_model)
            eps = eps - s_t * spec.classifier_scale * grad
        return eps

    return eps_fn

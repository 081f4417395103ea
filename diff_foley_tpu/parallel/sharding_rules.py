"""Parameter sharding rules: tensor parallelism over the `model` mesh axis.

The reference has no TP (SURVEY.md §2.8) — this is a new capability for
scaling past one chip per replica. Under GSPMD we only annotate parameter
PartitionSpecs; XLA inserts the all-gathers/reduce-scatters on ICI:

- attention projections: to_q/to_k/to_v kernels shard the *output* features
  (head-parallel), to_out shards the *input* features (row-parallel, psum).
- GEGLU/FF: proj kernel column-parallel, out kernel row-parallel.
- time-embedding MLP: dense0 column-, dense1 row-parallel.
- convolutions shard output channels (I/O-channel parallel conv); the
  following GroupNorm needs full channels, so conv kernels stay replicated
  by default unless `shard_convs=True` (worth it only for very large nets).

Everything else replicates. Biases/norms replicate.
"""
from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COL = {"to_q", "to_k", "to_v"}        # shard kernel output dim
ROW = {"to_out"}                      # shard kernel input dim


def _spec_for(path: Tuple[str, ...], leaf) -> P:
    names = [p for p in path]
    if not hasattr(leaf, "ndim") or leaf.ndim < 2:
        return P()
    parent = names[-2] if len(names) >= 2 else ""
    name = names[-1]
    if name != "kernel":
        return P()
    if parent in COL:
        return P(None, "model")
    if parent in ROW:
        return P("model", None)
    # GEGLU projections (column — both halves shard independently so the
    # x·gelu(gate) product is shard-local) / FF out (row); time-embed MLP
    if parent in ("proj_x", "proj_gate") and "geglu" in names:
        return P(None, "model")
    if parent == "out" and "ff" in names:
        return P("model", None)
    if parent == "dense0" and "time_embed" in names:
        return P(None, "model")
    if parent == "dense1" and "time_embed" in names:
        return P("model", None)
    return P()


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings implementing the TP rules above."""

    def assign(path, leaf):
        keys = tuple(
            getattr(k, "key", getattr(k, "idx", str(k))) for k in path
        )
        return NamedSharding(mesh, _spec_for([str(k) for k in keys], leaf))

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh: Mesh):
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


# --- FSDP / ZeRO-style fully-sharded state over the `data` axis -----------
#
# The reference replicates parameters and Adam state on every DDP rank
# (SURVEY.md §2.8); at the flagship 860M-param UNet that is ~10 GB of
# param+mu+nu+EMA per chip in fp32. Sharding every large leaf over the
# `data` axis divides that by the data-parallel degree; under GSPMD the
# annotations alone make XLA all-gather parameters for compute and
# reduce-scatter gradients on ICI (ZeRO-3 semantics, zero code in the
# train step — `make_train_step` is sharding-agnostic).

FSDP_MIN_SIZE = 2**15  # leaves below this stay replicated (gather overhead)


def fsdp_spec(
    shape, n_shard: int, axis: str = "data",
    min_size: int = FSDP_MIN_SIZE, base: P | None = None,
) -> P:
    """PartitionSpec sharding the largest free, divisible dim over `axis`.

    `base` (e.g. a tensor-parallel spec) is preserved; the data axis goes on
    the biggest remaining dim whose size divides n_shard evenly. Leaves that
    are small, scalar, or have no divisible free dim replicate.
    """
    dims = list(base) if base is not None else []
    dims += [None] * (len(shape) - len(dims))
    size = 1
    for s in shape:
        size *= int(s)
    if size < min_size or n_shard <= 1:
        return P(*dims) if any(d is not None for d in dims) else P()
    cands = [
        (shape[i], i)
        for i in range(len(shape))
        if dims[i] is None and shape[i] % n_shard == 0
    ]
    if not cands:
        return P(*dims) if any(d is not None for d in dims) else P()
    _, i = max(cands)
    dims[i] = axis
    return P(*dims)


def fsdp_shardings(
    tree, mesh: Mesh, axis: str = "data",
    min_size: int = FSDP_MIN_SIZE, base_specs=None,
):
    """Pytree of NamedShardings fully sharding `tree` over the data axis.

    Works uniformly on params, optimizer states (Adam mu/nu mirror the param
    shapes; scalars like `count` replicate) and EMA shadows — apply it to the
    whole TrainState. To compose with tensor parallelism, call it on the
    SAME subtree the TP specs were built from (treedefs must match), e.g.
    `fsdp_shardings(params["unet"], mesh,
                    base_specs=param_shardings(params["unet"], mesh))`
    — the data axis then lands on a dim the model axis doesn't own
    (see __graft_entry__._dryrun_impl for the full recipe).
    """
    n = mesh.shape[axis]

    def assign(leaf, base):
        if not hasattr(leaf, "shape"):
            return NamedSharding(mesh, P())
        bspec = base.spec if isinstance(base, NamedSharding) else base
        return NamedSharding(
            mesh, fsdp_spec(leaf.shape, n, axis, min_size, bspec)
        )

    if base_specs is None:
        return jax.tree.map(lambda l: assign(l, None), tree)
    return jax.tree.map(assign, tree, base_specs)


def shard_state_fsdp(state, mesh: Mesh, **kw):
    """device_put a TrainState (or any pytree) into its FSDP layout."""
    shardings = fsdp_shardings(state, mesh, **kw)
    return jax.tree.map(jax.device_put, state, shardings), shardings

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
    # GEGLU proj (column) / FF out (row); time-embed MLP
    if parent == "proj" and "geglu" in names:
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

"""Tensor parallelism — Megatron-style param sharding over the mesh
"model" axis, expressed purely as sharding annotations (GSPMD inserts the
collectives).

The reference has no model parallelism of any kind (SURVEY.md §2.3); the
base model (~94 M params) fits per chip, but the Conformer-large variants
the reference studies (w2v2conformer.py:57-59, ~600 M params) benefit from
sharded params/activations at serving batch sizes. The classic decomposition
needs no code changes to the forward:

  * attention q/k/v projections shard their OUTPUT features (heads split
    across devices — requires num_heads % model_parallel == 0);
  * the attention output projection shards its INPUT features (its matmul
    contracts the sharded head dim; XLA emits one all-reduce per layer);
  * FFN intermediate shards OUTPUT, FFN output shards INPUT (second
    all-reduce per layer);
  * norms, conv feature encoder, positional/conv modules, and the CTC head
    replicate (they are a rounding error of the FLOPs).

``tp_shardings`` walks the params pytree by key path and returns a matching
pytree of NamedShardings; ``shard_params_tp`` places the params. Works for
both models/wav2vec2.py and models/w2v2_conformer.py pytrees (scan-stacked
layers carry a leading [L] axis).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# keys whose kernels shard output features (last axis); their biases shard too
_SHARD_OUT = ("q", "k", "v", "intermediate", "pw1")
# keys whose kernels shard input features (second-to-last axis); bias replicated
_SHARD_IN = ("out", "output", "pw2")


def _spec_for(path, leaf, model_axis: str) -> P:
    keys = [getattr(p, "key", None) for p in path]
    name = keys[-1] if keys else None
    parent = keys[-2] if len(keys) >= 2 else None
    ndim = getattr(leaf, "ndim", 0)

    if name == "kernel" and parent in _SHARD_OUT:
        spec = [None] * ndim
        spec[-1] = model_axis
        return P(*spec)
    if name == "kernel" and parent in _SHARD_IN and ndim >= 2:
        spec = [None] * ndim
        spec[-2] = model_axis
        return P(*spec)
    if name == "bias" and parent in _SHARD_OUT and ndim >= 1:
        spec = [None] * ndim
        spec[-1] = model_axis
        return P(*spec)
    return P()  # replicate everything else (norms, convs, heads, biases)


def tp_shardings(params: Dict[str, Any], mesh: Mesh,
                 model_axis: str = "model") -> Dict[str, Any]:
    """NamedSharding pytree matching ``params`` (Megatron split above)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf, model_axis)),
        params,
    )


def shard_params_tp(params: Dict[str, Any], mesh: Mesh,
                    model_axis: str = "model") -> Dict[str, Any]:
    """Place ``params`` with tensor-parallel shardings. The forward runs
    unchanged under jit: GSPMD propagates the shardings through the head
    reshape and inserts the two all-reduces per layer."""
    return jax.device_put(params, tp_shardings(params, mesh, model_axis))

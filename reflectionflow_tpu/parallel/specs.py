"""Partition specs for FLUX DiT weights (tensor parallelism).

Megatron-style sharding over the "model" axis: QKV / MLP-in projections
split on the output (head / hidden) dimension, out-proj / MLP-out split on
the input dimension — one allreduce per attention and per MLP, riding ICI.
Stacked block leaves are (N, in, out), so specs shard dim 1/2.

Everything not matched stays replicated. Used by `shard_dit_params` and the
multi-chip dryrun; single-chip and pure-DP paths just replicate.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.tree import tree_paths

# path suffix -> (spec for stacked (N, in, out), spec for flat (in, out))
_COL = (P(None, None, "model"), P(None, "model"))  # shard output dim
_ROW = (P(None, "model", None), P("model", None))  # shard input dim
_COL_BIAS = (P(None, "model"), P("model"))

_RULES: list[tuple[str, tuple]] = [
    ("attn/q/w", _COL), ("attn/k/w", _COL), ("attn/v/w", _COL),
    ("attn/txt_q/w", _COL), ("attn/txt_k/w", _COL), ("attn/txt_v/w", _COL),
    ("attn/q/b", _COL_BIAS), ("attn/k/b", _COL_BIAS), ("attn/v/b", _COL_BIAS),
    ("attn/txt_q/b", _COL_BIAS), ("attn/txt_k/b", _COL_BIAS), ("attn/txt_v/b", _COL_BIAS),
    ("attn/out/w", _ROW), ("attn/txt_out/w", _ROW),
    ("img_mlp/fc1/w", _COL), ("txt_mlp/fc1/w", _COL), ("mlp_in/w", _COL),
    ("img_mlp/fc1/b", _COL_BIAS), ("txt_mlp/fc1/b", _COL_BIAS), ("mlp_in/b", _COL_BIAS),
    ("img_mlp/fc2/w", _ROW), ("txt_mlp/fc2/w", _ROW),
]


def dit_param_spec(path: str, ndim: int) -> P:
    for suffix, (stacked, flat) in _RULES:
        if path.endswith(suffix):
            spec = stacked if ndim == 3 else flat
            if len(spec) > ndim:  # bias on stacked blocks vs flat
                spec = flat
            return spec
    return P()


def shard_dit_params(params, mesh: Mesh):
    """Place DiT weights with TP sharding over "model" (replicated over
    "data"). No-op specs when the mesh has no "model" axis."""
    if "model" not in mesh.axis_names or mesh.shape.get("model", 1) == 1:
        return jax.device_put(params, NamedSharding(mesh, P()))

    def place(path_leaf):
        path, leaf = path_leaf
        return jax.device_put(leaf, NamedSharding(mesh, dit_param_spec(path, leaf.ndim)))

    flat = tree_paths(params)
    placed = [place(pl) for pl in flat]
    # rebuild tree
    treedef = jax.tree.structure(params)
    return jax.tree.unflatten(treedef, placed)

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


def fsdp_param_spec(shape: tuple[int, ...], n_shards: int, axis: str = "data") -> P:
    """FSDP-style spec: shard the LARGEST dimension divisible by the axis
    size (ties broken toward the trailing dim, which XLA lays out major for
    stacked (N, in, out) leaves), replicate anything that doesn't divide.
    XLA's SPMD partitioner inserts the per-layer all-gather on use — the
    ZeRO-3 pattern the reference gets from DeepSpeed
    (/root/reference/reward_modeling/utils.py:94-137) expressed as shardings."""
    if not shape or n_shards <= 1:
        return P()
    order = sorted(range(len(shape)), key=lambda d: (shape[d], d), reverse=True)
    for d in order:
        if shape[d] >= n_shards and shape[d] % n_shards == 0:
            spec = [None] * len(shape)
            spec[d] = axis
            return P(*spec)
    return P()


def shard_fsdp_params(params, mesh: Mesh, axis: str = "data"):
    """Place a frozen param tree with every leaf sharded FSDP-style over
    `axis` (no-op replication when the axis is absent or size 1)."""
    n = int(mesh.shape.get(axis, 1))
    if n <= 1:
        return jax.device_put(params, NamedSharding(mesh, P()))
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, fsdp_param_spec(getattr(leaf, "shape", ()), n, axis))
        ),
        params,
    )


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

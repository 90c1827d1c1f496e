"""Device mesh + sharding helpers.

The workload's scale axis is CANDIDATES (SURVEY.md §2.5): N parallel
trajectories per prompt. The design:

  * axis "data": candidate/batch parallelism — latents, text states, and
    per-candidate conditions are sharded here; weights are replicated.
    XLA inserts the (tiny) collectives; verifier scores are gathered to
    host for top-k pruning.
  * axis "model": optional tensor parallelism for attention heads / MLP
    shards on larger meshes (partition specs provided; off by default
    since FLUX-dev fits one chip's compute profile after quantization).

Replaces the reference's NCCL/DDP machinery (`train_flux/train.sh:10`,
`train/data.py:13-25`) with `jax.sharding.Mesh` + NamedSharding.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: tuple[int, ...] | None = None, axis_names: tuple[str, ...] = ("data",)) -> Mesh:
    """Default: 1-D mesh over all devices on the "data" axis."""
    devices = jax.devices()
    if shape is None or shape == (-1,):
        shape = (len(devices),)
    shape = tuple(len(devices) // abs(int(np.prod([s for s in shape if s > 0]))) if s == -1 else s for s in shape)
    dev_array = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(dev_array, axis_names[: len(shape)])


def candidate_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis (candidate) sharding: first dim over "data"."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_params(params, mesh: Mesh):
    """Place every weight replicated on the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(params, sharding)


def shard_batch(tree, mesh: Mesh):
    """Place batch-leading arrays sharded over "data". Pads nothing: the
    caller guarantees batch % mesh size == 0 (pad_candidates helps)."""
    sharding = candidate_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_candidates(n: int, mesh: Mesh) -> int:
    """Smallest multiple of the data-axis size >= n."""
    d = mesh.shape["data"]
    return ((n + d - 1) // d) * d

"""Ring attention: sequence parallelism over the ICI mesh.

The reference has no sequence parallelism (SURVEY.md §2.5 — max joint
sequence ~5.6k tokens fits one device), but the blockwise attention design
here extends to sharded sequences for larger resolutions / multi-condition
streams: Q, K, V are sharded along the sequence axis across `axis`; each
device keeps its Q shard and rotates K/V shards around the ring with
`lax.ppermute`, merging partial results with the online-softmax recurrence
(the same math as the Pallas flash kernel, at mesh scale). One K/V shard is
in flight per step, so communication overlaps the next chunk's compute and
peak memory per device is O(L/p).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _chunk_attention(q, k, v, scale):
    """Plain attention on local chunks; returns (out_unnormalized, m, l).

    q: (B, Lq, H, D); k/v: (B, Lk, H, D). Accumulation fp32."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1)  # (B, H, Lq)
    p = jnp.exp(logits - m[..., None])
    l = jnp.sum(p, axis=-1)  # (B, H, Lq)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v).astype(jnp.float32)
    return out, m, l


def _merge(acc, m_acc, l_acc, out, m, l):
    m_new = jnp.maximum(m_acc, m)
    c_acc = jnp.exp(m_acc - m_new)
    c_new = jnp.exp(m - m_new)
    # broadcast (B, H, Lq) -> (B, Lq, H, 1)
    def b(x):
        return x.transpose(0, 2, 1)[..., None]

    acc = acc * b(c_acc) + out * b(c_new)
    l_new = l_acc * c_acc + l * c_new
    return acc, m_new, l_new


def ring_attention(
    q: jnp.ndarray,  # (B, L, H, D), L sharded over `axis`
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
) -> jnp.ndarray:
    """Full (non-causal) attention over a sequence sharded across the mesh."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    p_devices = mesh.shape[axis]

    def local_fn(q_loc, k_loc, v_loc):
        # q_loc: (B, L/p, H, D)
        out, m, l = _chunk_attention(q_loc, k_loc, v_loc, scale)
        acc, m_acc, l_acc = out, m, l
        k_rot, v_rot = k_loc, v_loc
        perm = [(i, (i + 1) % p_devices) for i in range(p_devices)]
        for _ in range(p_devices - 1):
            k_rot = jax.lax.ppermute(k_rot, axis, perm)
            v_rot = jax.lax.ppermute(v_rot, axis, perm)
            out, m, l = _chunk_attention(q_loc, k_rot, v_rot, scale)
            acc, m_acc, l_acc = _merge(acc, m_acc, l_acc, out, m, l)
        norm = l_acc.transpose(0, 2, 1)[..., None]
        return (acc / jnp.maximum(norm, 1e-20)).astype(q_loc.dtype)

    spec = P(None, axis, None, None)
    return jax.shard_map(
        local_fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)

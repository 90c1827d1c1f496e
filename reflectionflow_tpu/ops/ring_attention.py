"""Ring attention: sequence parallelism over the ICI mesh — fwd AND bwd.

The reference has no sequence parallelism (SURVEY.md §2.5 — max joint
sequence ~5.6k tokens fits one device); this is the TPU extension for
larger resolutions / multi-condition streams. Q, K, V are sharded along
the sequence axis across `axis`; each device keeps its Q shard and rotates
K/V shards around the ring with `lax.ppermute`, merging partial results
with the online-softmax recurrence (the same math as the Pallas flash
kernel, at mesh scale). One K/V shard is in flight per step, so
communication overlaps the next chunk's compute and peak memory per device
is O(L/p).

Local chunks run through the Pallas flash kernel (`impl="pallas"`,
`ops.pallas_attention.flash_chunk_fwd/bwd`) or dense XLA (`impl="xla"`).
The backward is a custom VJP: a second ring pass that recomputes chunk
probabilities from the forward's ring-global logsumexp rows and
accumulates dK/dV on the rotating shards — after a full cycle each shard's
gradient lands back on its owner device. Exposed to models via
`ops.attention.joint_attention(impl="ring"...)`, INCLUDING the structural
cond-stream modifiers (`union_cond_attn=False` mask / `c_factor` bias,
`/root/reference/train_flux/flux/block.py:106-122`): global token
positions are reconstructed per chunk from the ring topology, see
`ring_attention`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


# ---------------------------------------------------------------------------
# local chunk math (one Q shard x one K/V shard)
# ---------------------------------------------------------------------------


def _xla_chunk_fwd(q, k, v, scale, bias=None):
    """Normalized chunk attention + logsumexp. q/k/v (B, L, H, D);
    returns (out fp32 (B, L, H, D), lse fp32 (B, L, H, 1)).
    bias: optional (Lq, Lk) fp32 additive logits bias (-1e30 masks)."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias[None, None]
    m = jnp.max(logits, axis=-1, keepdims=True)  # (B, H, Lq, 1)
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.maximum(l, 1e-20))  # (B, H, Lq, 1)
    out = jnp.einsum("bhqk,bkhd->bqhd", (p / jnp.maximum(l, 1e-20)).astype(v.dtype), v)
    return out.astype(jnp.float32), lse.squeeze(-1).transpose(0, 2, 1)[..., None]


def _xla_chunk_bwd(q, k, v, g, lse, delta, scale, bias=None):
    """Chunk gradients from ring-global lse/delta ((B, L, H, 1) fp32)."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias[None, None]
    lse_bh = lse[..., 0].transpose(0, 2, 1)[..., None]  # (B, H, Lq, 1)
    delta_bh = delta[..., 0].transpose(0, 2, 1)[..., None]
    p = jnp.exp(logits - lse_bh)  # (B, H, Lq, Lk)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p.astype(g.dtype), g)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g, v, preferred_element_type=jnp.float32)
    ds = (p * (dp - delta_bh)).astype(q.dtype)
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q) * scale
    return dq, dk, dv


def _chunk_fns(impl: str, interpret: bool, scale: float):
    if impl == "pallas":
        from .pallas_attention import flash_chunk_bwd, flash_chunk_fwd

        return (
            functools.partial(flash_chunk_fwd, interpret=interpret),
            functools.partial(flash_chunk_bwd, interpret=interpret),
        )
    return (
        functools.partial(_xla_chunk_fwd, scale=scale),
        functools.partial(_xla_chunk_bwd, scale=scale),
    )


def _merge(out, lse, out2, lse2):
    """Merge two normalized partial results via their logsumexp rows."""
    m = jnp.maximum(lse, lse2)
    a = jnp.exp(lse - m)
    b = jnp.exp(lse2 - m)
    den = a + b
    merged = (out * a + out2 * b) / den
    return merged, m + jnp.log(den)


# ---------------------------------------------------------------------------
# ring (runs per device inside shard_map)
# ---------------------------------------------------------------------------


def ring_attention(
    q: jnp.ndarray,  # (B, L, H, D), L sharded over `axis`
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    impl: str = "xla",
    interpret: bool = False,
    main_len: int | None = None,
    cross_bias: float = 0.0,
) -> jnp.ndarray:
    """Differentiable full (non-causal) attention over a sequence sharded
    across the mesh. `impl`: "xla" dense chunks | "pallas" flash-kernel
    chunks. The ring size must divide L (pad the sequence to a multiple
    of the ring).

    Cond-stream modifiers (`/root/reference/train_flux/flux/block.py:106-122`
    under SP): tokens at GLOBAL position >= `main_len` are the cond stream;
    `cross_bias` is added to cross-(cond, main) logits (-1e30 reproduces
    `union_cond_attn=False`, log(c_factor) reproduces `c_factor`). Global
    positions are reconstructed per chunk from the ring topology: shard_map
    shards the sequence contiguously, so the Q chunk of device i starts at
    i*L/p and the K shard held after r rotations started at ((i-r) mod p)*L/p.
    With `impl="pallas"` the chunk offsets enter the flash kernels as SMEM
    scalars (the cross-segment predicate compares global positions), so
    modifier configs run the SAME Pallas kernels as plain ones; `impl="xla"`
    materializes the (Lq, Lk) bias instead."""
    B, L, H, D = q.shape
    p_devices = mesh.shape[axis]
    if L % p_devices:
        raise ValueError(
            f"ring size {p_devices} must divide the sequence length {L} — "
            "pad the sequence to a multiple of the ring"
        )
    scale = float(D) ** -0.5
    modifiers = main_len is not None and cross_bias != 0.0
    chunk_fwd, chunk_bwd = _chunk_fns(impl, interpret, scale)
    perm = [(i, (i + 1) % p_devices) for i in range(p_devices)]
    L_chunk = L // p_devices

    def rotate(*xs):
        return [jax.lax.ppermute(x, axis, perm) for x in xs]

    def _offsets_for(r):
        """Ring-global (q_start, k_start) of rotation step r."""
        i = jax.lax.axis_index(axis)
        return i * L_chunk, ((i - r) % p_devices) * L_chunk

    def _bias_for(r):
        """(Lq, Lk) fp32 cross-segment bias for rotation step r, from
        ring-global positions (the XLA chunk path)."""
        q_off, k_off = _offsets_for(r)
        is_cond = lambda off: (off + jnp.arange(L_chunk)) >= main_len  # noqa: E731
        q_seg = is_cond(q_off)
        k_seg = is_cond(k_off)
        return jnp.where(q_seg[:, None] != k_seg[None, :], jnp.float32(cross_bias), 0.0)

    def _mod_kwargs(r):
        if not modifiers:
            return {}
        if impl == "pallas":
            q_off, k_off = _offsets_for(r)
            return {"main_len": main_len, "cross_bias": cross_bias,
                    "q_offset": q_off, "k_offset": k_off}
        return {"bias": _bias_for(r)}

    @jax.custom_vjp
    def ring(q_loc, k_loc, v_loc):
        out, _ = _fwd(q_loc, k_loc, v_loc)
        return out

    def _fwd(q_loc, k_loc, v_loc):
        out, lse = chunk_fwd(q_loc, k_loc, v_loc, **_mod_kwargs(0))
        k_rot, v_rot = k_loc, v_loc
        for r in range(1, p_devices):
            k_rot, v_rot = rotate(k_rot, v_rot)
            out2, lse2 = chunk_fwd(q_loc, k_rot, v_rot, **_mod_kwargs(r))
            out, lse = _merge(out, lse, out2, lse2)
        return out.astype(q_loc.dtype), lse

    def ring_fwd_rule(q_loc, k_loc, v_loc):
        out, lse = _fwd(q_loc, k_loc, v_loc)
        return out, (q_loc, k_loc, v_loc, out, lse)

    def ring_bwd_rule(res, g):
        q_loc, k_loc, v_loc, out, lse = res
        delta = jnp.sum(
            g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
        )  # (B, Lq, H, 1)
        dq = jnp.zeros(q_loc.shape, jnp.float32)
        dk_rot = jnp.zeros(k_loc.shape, jnp.float32)
        dv_rot = jnp.zeros(v_loc.shape, jnp.float32)
        k_rot, v_rot = k_loc, v_loc
        for r in range(p_devices):
            dq_c, dk_c, dv_c = chunk_bwd(q_loc, k_rot, v_rot, g, lse, delta, **_mod_kwargs(r))
            dq = dq + dq_c.astype(jnp.float32)
            dk_rot = dk_rot + dk_c.astype(jnp.float32)
            dv_rot = dv_rot + dv_c.astype(jnp.float32)
            # rotate shard + its accumulated grad together: after the full
            # cycle (p rotations) every dK/dV shard is home at its owner
            k_rot, v_rot, dk_rot, dv_rot = rotate(k_rot, v_rot, dk_rot, dv_rot)
        return dq.astype(q_loc.dtype), dk_rot.astype(k_loc.dtype), dv_rot.astype(v_loc.dtype)

    ring.defvjp(ring_fwd_rule, ring_bwd_rule)

    spec = P(None, axis, None, None)
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation; correctness is covered by the dense-equivalence tests
    return jax.shard_map(
        ring, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
    )(q, k, v)

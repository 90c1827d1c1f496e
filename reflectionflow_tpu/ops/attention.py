"""Joint multi-stream attention.

The FLUX hot op: one attention over the concatenated [txt | img | cond]
token streams (~512 + 4096 + 1024 tokens at 1024px/512px-cond), with two
optional modifiers reproducing the semantics of
`/root/reference/train_flux/flux/block.py:106-125`:

  * `union_cond_attn=False` -> block-diagonal mask: cond tokens and
    (txt+img) tokens do not attend to each other;
  * `c_factor != 1`        -> additive bias log(c_factor) on the
    cond<->(txt+img) cross blocks.

The XLA path below is a single fused SDPA (XLA:TPU emits a flash-style
fused softmax-matmul chain for this pattern). A hand-written Pallas flash
kernel lives in `ops.pallas_attention` and is selected via `impl=`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# Sequence-parallel (ring) context: the mesh/axis the concatenated
# sequence shards over when `impl="ring*"`. Static run configuration (not
# traced data), set once before building the jitted graphs — threading a
# Mesh through every model apply signature for one impl would contaminate
# the whole string-based attn_impl plumbing.
_RING_CTX: dict = {"mesh": None, "axis": "seq"}


def set_ring_context(mesh, axis: str = "seq") -> None:
    """Configure the mesh axis ring attention shards the sequence over.
    Call before the first traced call with `impl="ring*"`."""
    _RING_CTX["mesh"] = mesh
    _RING_CTX["axis"] = axis


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Scaled dot-product attention.

    Args:
      q, k, v: (B, L, H, D) — length-major layout, heads second-to-last so
        the (L, D) matmul panels tile onto the MXU.
      bias: optional additive bias broadcastable to (B, H, Lq, Lk); -inf
        entries mask.

    Returns (B, L, H, D), same dtype as q.
    """
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.lru_cache(maxsize=64)
def _cond_bias_template(total_len: int, cond_len: int, masked: bool) -> jnp.ndarray:
    """(1, 1, L, L) bias separating the last `cond_len` tokens from the rest.

    masked=True  -> -inf on the cross blocks (union_cond_attn=False)
    masked=False -> returns zeros template to be scaled by log(c_factor).
    """
    main_len = total_len - cond_len
    is_cond = jnp.arange(total_len) >= main_len
    cross = is_cond[:, None] != is_cond[None, :]
    fill = jnp.float32(-jnp.inf if masked else 1.0)
    bias = jnp.where(cross, fill, 0.0).astype(jnp.float32)
    return bias[None, None]


def cond_attention_bias(
    total_len: int,
    cond_len: int,
    union_cond_attn: bool = True,
    c_factor: float | jnp.ndarray | None = None,
) -> jnp.ndarray | None:
    """Build the (1,1,L,L) additive bias for the joint attention, or None."""
    if cond_len == 0:
        return None
    # c_factor takes precedence over the union mask (the reference's bias
    # overwrites the mask when both are set, block.py:106-122).
    if c_factor is not None:
        log_c = jnp.log(jnp.asarray(c_factor, jnp.float32))
        return _cond_bias_template(total_len, cond_len, masked=False) * log_c
    if not union_cond_attn:
        return _cond_bias_template(total_len, cond_len, masked=True)
    return None


def joint_attention(
    streams_q: list[jnp.ndarray],
    streams_k: list[jnp.ndarray],
    streams_v: list[jnp.ndarray],
    bias: jnp.ndarray | None = None,
    impl: str = "xla",
    cond_len: int = 0,
    cross_bias: float = 0.0,
) -> list[jnp.ndarray]:
    """Attention over concatenated streams, outputs re-split per stream.

    Each stream tensor is (B, L_i, H, D). Concat order is the caller's
    responsibility (FLUX: [txt, img] then [txt, img, cond]).

    The cond-stream modifiers come in two equivalent forms: `bias` (dense,
    XLA path) and (`cond_len`, `cross_bias`) (structural, Pallas path) —
    cross_bias is added to (cond x main) logits; -1e30 masks.
    """
    lens = [s.shape[1] for s in streams_q]
    q = jnp.concatenate(streams_q, axis=1) if len(streams_q) > 1 else streams_q[0]
    k = jnp.concatenate(streams_k, axis=1) if len(streams_k) > 1 else streams_k[0]
    v = jnp.concatenate(streams_v, axis=1) if len(streams_v) > 1 else streams_v[0]
    if impl.startswith("ring"):
        # sequence parallelism: the concatenated sequence shards over the
        # ring axis (set_ring_context). Cond modifiers come in the
        # STRUCTURAL form (cond_len/cross_bias) — ring reconstructs global
        # positions from the ring topology (see ring_attention docstring).
        if bias is not None:
            raise NotImplementedError(
                "impl='ring' takes the structural modifier form "
                "(cond_len/cross_bias), not a dense bias"
            )
        if _RING_CTX["mesh"] is None:
            raise ValueError("impl='ring' requires ops.attention.set_ring_context(mesh, axis)")
        from .ring_attention import ring_attention

        out = ring_attention(
            q, k, v, mesh=_RING_CTX["mesh"], axis=_RING_CTX["axis"],
            impl="pallas" if "pallas" in impl else "xla",
            interpret=impl.endswith("interpret"),
            main_len=q.shape[1] - cond_len if cond_len else None,
            cross_bias=cross_bias,
        )
    elif impl.startswith("pallas"):
        from .pallas_attention import flash_attention

        out = flash_attention(
            q, k, v, main_len=q.shape[1] - cond_len, cross_bias=cross_bias,
            interpret=impl.endswith("interpret"),
            # "pallas_int8[_interpret]": serving-only int8 QK^T (no backward)
            int8="int8" in impl,
        )
    else:
        out = sdpa(q, k, v, bias=bias)
    outs = []
    off = 0
    for L in lens:
        outs.append(out[:, off : off + L])
        off += L
    return outs

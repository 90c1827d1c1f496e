"""Load-time weight fusions for serving.

`fuse_dit_qkv` concatenates each attention's Q/K/V projections into one
(in, 3H) matmul — at batch 1-2 the MXU prefers one wide panel over three
narrow ones, and HBM reads coalesce. Applied AFTER LoRA folding (the fused
tree is not a LoRA target) and BEFORE int8 quantization (per-output-channel
scales survive concatenation).

`models.flux.dit._qkv` dispatches on the presence of the fused key.
"""

from __future__ import annotations

import jax.numpy as jnp


def _fuse_three(q: dict, k: dict, v: dict) -> dict:
    w = jnp.concatenate([q["w"], k["w"], v["w"]], axis=-1)
    b = jnp.concatenate([q["b"], k["b"], v["b"]], axis=-1)
    return {"w": w, "b": b}


def fuse_dit_qkv(params: dict) -> dict:
    """Returns a new param tree with fused `qkv` / `txt_qkv` projections."""
    out = dict(params)
    for family in ("double_blocks", "single_blocks"):
        if family not in out:
            continue
        blocks = dict(out[family])
        attn = dict(blocks["attn"])
        if "q" in attn and "w" in attn["q"]:
            attn["qkv"] = _fuse_three(attn["q"], attn["k"], attn["v"])
            for key in ("q", "k", "v"):
                del attn[key]
        if "txt_q" in attn and "w" in attn["txt_q"]:
            attn["txt_qkv"] = _fuse_three(attn["txt_q"], attn["txt_k"], attn["txt_v"])
            for key in ("txt_q", "txt_k", "txt_v"):
                del attn[key]
        blocks["attn"] = attn
        out[family] = blocks
    return out

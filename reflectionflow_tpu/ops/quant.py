"""Int8 weight-only quantization for single-chip serving.

The FLUX.1-dev DiT is ~11.9B params: bf16 weights (23.8 GB) cannot fit one
v5e (16 GB HBM), int8 (11.9 GB) can. Weight-only symmetric per-output-
channel quantization keeps activations bf16 — XLA fuses the
dequant (convert+scale) into the matmul operand read, so HBM traffic drops
2x, which is the binding constraint for small-batch inference.

A quantized linear is {"w_q": int8 (..., in, out), "w_scale": f32 (..., 1,
out) or (out,), "b": ...}; `models.flux.dit.linear` dispatches on the key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.tree import tree_paths, update_path


def quantize_linear(p: dict) -> dict:
    """{"w": float (..., in, out), "b"} -> int8 weight-only quantized dict."""
    w = p["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # per output channel
    scale = jnp.maximum(amax / 127.0, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "w_scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def dequantize_weight(p: dict, dtype) -> jnp.ndarray:
    return (p["w_q"].astype(jnp.float32) * p["w_scale"]).astype(dtype)


def quantize_dit_params(params, min_size: int = 1 << 20):
    """Quantize every linear weight bigger than `min_size` elements.

    Embedding/modulation layers below the threshold stay bf16 (negligible
    memory, quality-sensitive)."""
    out = params
    seen_dicts = set()
    for path, leaf in tree_paths(params):
        if not path.endswith("/w"):
            continue
        if leaf.ndim < 2 or leaf.size < min_size:
            continue
        parent_path = path[: -len("/w")]
        node = _get(params, parent_path)
        if id(node) in seen_dicts:
            continue
        seen_dicts.add(id(node))
        out = update_path(out, parent_path, quantize_linear(node))
    return out


def _get(tree, path):
    node = tree
    for part in path.split("/"):
        node = node[int(part)] if isinstance(node, (list, tuple)) else node[part]
    return node

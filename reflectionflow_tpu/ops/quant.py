"""Int8 quantization for single-chip serving.

The FLUX.1-dev DiT is ~11.9B params: bf16 weights (23.8 GB) cannot fit one
v5e (16 GB HBM), int8 (11.9 GB) can. Two serving modes, both symmetric
per-output-channel on weights:

  * **w8a8** (default): activations are dynamically quantized per token
    (amax/127) and the matmul runs as int8 x int8 -> int32 on the MXU,
    which doubles v5e peak (394 TOPS int8 vs 197 TFLOP bf16). The rescale
    (x_scale * w_scale) is a rank-1 elementwise epilogue XLA fuses into
    the matmul output.
  * **w8a16** (weight-only): XLA fuses the dequant (convert+scale) into
    the matmul operand read; compute stays bf16. Halves HBM traffic only.

A quantized linear is {"w_q": int8 (in, out), "w_scale": f32 (1, out),
"b": ..., ["act_q": int8 scalar marker]}; `models.flux.dit.linear`
dispatches on the keys. Replaces the reference's GPU-free-lunch of 80 GB
cards (`/root/reference/tts/tts_reflectionflow.py:503-512` loads bf16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.tree import tree_paths, update_path


def quantize_linear(p: dict, act_quant: bool = True) -> dict:
    """{"w": float (..., in, out), "b"} -> int8 quantized dict."""
    w = p["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # per output channel
    scale = jnp.maximum(amax / 127.0, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "w_scale": scale.astype(jnp.float32)}
    if act_quant:
        # marker: use the W8A8 path; shaped to the stacked-block leading dims
        # so `lax.scan` over stacked per-block params can slice it
        out["act_q"] = jnp.zeros(w_q.shape[:-2], jnp.int8)
    if "b" in p:
        out["b"] = p["b"]
    return out


def dequantize_weight(p: dict, dtype) -> jnp.ndarray:
    return (p["w_q"].astype(jnp.float32) * p["w_scale"]).astype(dtype)


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray) -> jnp.ndarray:
    """W8A8 matmul: per-token dynamic activation quant, int32 MXU accum.

    x: (..., in) float; w_q: (in, out) int8; w_scale: (1, out) or (out,).
    Returns (..., out) in x.dtype.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax, 1e-12) / 127.0  # (..., 1)
    x_q = jnp.round(xf / x_scale).astype(jnp.int8)  # |xf| <= 127*x_scale, no clip needed
    acc = jax.lax.dot_general(
        x_q,
        w_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale * w_scale.reshape(-1)
    return out.astype(x.dtype)


def quantize_dit_params(params, min_size: int = 1 << 20, act_quant: bool = True):
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
        out = update_path(out, parent_path, quantize_linear(node, act_quant=act_quant))
    return out


def _get(tree, path):
    node = tree
    for part in path.split("/"):
        node = node[int(part)] if isinstance(node, (list, tuple)) else node[part]
    return node

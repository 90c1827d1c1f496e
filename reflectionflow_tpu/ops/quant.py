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


def int8_matmul_pre(x_q: jnp.ndarray, x_scale: jnp.ndarray, p: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    """W8A8 matmul consuming a PRE-quantized activation (ops.pallas_quant):
    several matmuls share one per-token quantization of the same input.

    x_q (..., in) int8; x_scale (..., 1) f32; p a quantized linear dict."""
    acc = jax.lax.dot_general(
        x_q, p["w_q"], (((x_q.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * x_scale * p["w_scale"].reshape(-1)
    out = out.astype(dtype)
    if "b" in p:
        out = out + p["b"]
    return out


# NF4 codebook (QLoRA, Dettmers et al. 2023): the 16 quantile-optimal levels
# for N(0,1) weights scaled to [-1, 1]. ~30% lower quantization error than
# uniform int4 on gaussian-distributed weights.
NF4_CODE_VALUES = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
)


def _nf4_codes() -> jnp.ndarray:
    return jnp.asarray(NF4_CODE_VALUES, jnp.float32)


def _nf4_indices(w: jnp.ndarray, group: int):
    """Shared NF4 quantization core: (..., in, out) float ->
    (idx (..., G, group, out) uint8 nearest-code indices,
     scale (..., G, 1, out) f32 per-(group, channel) absmax). Both nibble
    packings (pair / plane) consume this so codes and scales stay
    bit-identical across layouts."""
    din = w.shape[-2]
    lead = w.shape[:-2]
    G = din // group
    wg = w.reshape(*lead, G, group, w.shape[-1])
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)  # (..., G, 1, out)
    scale = jnp.maximum(amax, 1e-12)
    codes = _nf4_codes()
    mids = (codes[1:] + codes[:-1]) / 2.0
    idx = jnp.searchsorted(mids, wg / scale).astype(jnp.uint8)  # nearest code
    return idx, scale.astype(jnp.float32)


def quantize_linear_int4(p: dict, group: int = 128) -> dict:
    """{"w": float (..., in, out)} -> packed NF4 weight-only quantized dict.

    One absmax scale per (contraction group, output channel); 4-bit code
    indices into `NF4_CODES`, two nibbles per uint8 along the group axis.
    Resident footprint is in/2 bytes per output element — this is what lets
    T5-XXL (2.4 GB packed) co-reside with the int8 FLUX DiT (11.9 GB) on
    one 16 GB v5e. Dequant materializes one *layer* at a time inside the
    block scan (<100 MB transient), never the whole tree.
    """
    w = p["w"].astype(jnp.float32)
    din = w.shape[-2]
    if din % group or din < group:
        # shape not groupable: fall back to weight-only int8 — int4 trees are
        # chosen for quality-sensitive encoders, so keep activations fp
        return quantize_linear(p, act_quant=False)
    idx, scale = _nf4_indices(w, group)
    packed = (idx[..., 0::2, :] | (idx[..., 1::2, :] << 4)).astype(jnp.uint8)
    out = {"w_p4": packed, "w_scale4": scale}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _nf4_decode(idx: jnp.ndarray) -> jnp.ndarray:
    """idx in [0,15] -> NF4 code values via a binary select tree.

    A table GATHER per weight element is catastrophically slow on the TPU
    VPU (measured: one T5-XXL encode took 32 s); 15 fused elementwise
    selects over scalar constants compile to one vectorized loop."""
    b0 = (idx & 1).astype(bool)
    b1 = (idx & 2).astype(bool)
    b2 = (idx & 4).astype(bool)
    b3 = (idx & 8).astype(bool)
    c = NF4_CODE_VALUES
    v = [jnp.where(b0, c[2 * i + 1], c[2 * i]) for i in range(8)]
    v = [jnp.where(b1, v[2 * i + 1], v[2 * i]) for i in range(4)]
    v = [jnp.where(b2, v[2 * i + 1], v[2 * i]) for i in range(2)]
    return jnp.where(b3, v[1], v[0])


def int4_matmul(x: jnp.ndarray, w_p4: jnp.ndarray, w_scale4: jnp.ndarray) -> jnp.ndarray:
    """W4A16 matmul: NF4 unpack + dequant one layer, then a bf16 MXU matmul.

    x: (..., in); w_p4: (G, group/2, out) uint8; w_scale4: (G, 1, out).
    """
    lo = _nf4_decode(w_p4 & 0xF)
    hi = _nf4_decode(w_p4 >> 4)
    q = jnp.stack([lo, hi], axis=-2)  # (G, group/2, 2, out): (2j, 2j+1) pairs
    G, half, _, dout = q.shape
    w = (q * w_scale4[:, :, None, :]).astype(x.dtype)
    return x @ w.reshape(G * half * 2, dout)


def quantize_linear_int4_plane(p: dict, group: int = 128) -> dict:
    """NF4 packing in the SPLIT-PLANE layout: low nibbles carry rows
    [0, K/2), high nibbles rows [K/2, K) — the dequant is then two decodes
    + one contiguous concat instead of an even/odd sublane interleave
    (`int4_matmul`'s stack+reshape relayout, the serving-path cost the
    plane layout removes). Same NF4 codes/scales; leaf key "w_p4p"."""
    w = p["w"].astype(jnp.float32)
    din = w.shape[-2]
    if din % (2 * group) or din < 2 * group:
        return quantize_linear_int4(p, group=group)
    lead = w.shape[:-2]
    idx, scale = _nf4_indices(w, group)
    flat = idx.reshape(*lead, din, w.shape[-1])
    packed = (flat[..., : din // 2, :] | (flat[..., din // 2 :, :] << 4)).astype(jnp.uint8)
    out = {"w_p4p": packed, "w_scale4": scale}
    if "b" in p:
        out["b"] = p["b"]
    return out


def int4_matmul_plane(x: jnp.ndarray, w_p4p: jnp.ndarray, w_scale4: jnp.ndarray) -> jnp.ndarray:
    """W4A16 matmul, split-plane packing: decode both nibble planes,
    concatenate along K (contiguous — no interleave relayout), scale per
    group, one bf16 MXU matmul.

    x: (..., in); w_p4p: (in/2, out) uint8; w_scale4: (G, 1, out)."""
    K2, dout = w_p4p.shape[-2:]
    G, group = w_scale4.shape[-3], (2 * K2) // w_scale4.shape[-3]
    lo = _nf4_decode(w_p4p & 0xF)  # (in/2, out)
    hi = _nf4_decode(w_p4p >> 4)
    q = jnp.concatenate([lo, hi], axis=-2)  # (in, out), rows in original order
    w = (q.reshape(G, group, dout) * w_scale4).astype(x.dtype)
    return x @ w.reshape(G * group, dout)


def _quantize_tree(params, quantizer, min_size: int):
    """quantizer(node, path) -> quantized node, applied to every /w parent."""
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
        out = update_path(out, parent_path, quantizer(node, path))
    return out


def quantize_dit_params(
    params,
    min_size: int = 1 << 20,
    act_quant: bool = True,
    act_quant_exclude: tuple[str, ...] = (),
    int4_paths: tuple[str, ...] = (),
    int4_group: int = 128,
    int4_layout: str = "pair",
):
    """Int8-quantize every linear weight bigger than `min_size` elements.

    Embedding layers below the threshold stay bf16 (negligible memory,
    quality-sensitive). `act_quant_exclude` path substrings (e.g. "_mod")
    keep those layers weight-only int8 — a quality knob for activation-
    sensitive layers like the AdaLN modulation projections. `int4_paths`
    substrings (matched against the full leaf path, e.g.
    "single_blocks/out/") go packed NF4 instead (w4a16) — the co-residency
    memory profile quantizes the MLP weights (~60% of the DiT) int4 while
    attention stays int8 W8A8; `models.flux.dit.linear` dispatches per
    leaf, so mixed trees need no model changes."""

    int4_fn = quantize_linear_int4_plane if int4_layout == "plane" else quantize_linear_int4

    def quantizer(node, path):
        if any(sub in path for sub in int4_paths):
            return int4_fn(node, group=int4_group)
        aq = act_quant and not any(sub in path for sub in act_quant_exclude)
        return quantize_linear(node, act_quant=aq)

    return _quantize_tree(params, quantizer, min_size)


def quantize_params_int4(params, min_size: int = 1 << 20, group: int = 128, layout: str = "pair"):
    """Int4 (w4a16, group-wise) quantize every big linear weight.
    `layout="plane"` packs nibbles as split-K planes (dequant = decode +
    contiguous concat, no even/odd relayout — see quantize_linear_int4_plane)."""
    fn = quantize_linear_int4_plane if layout == "plane" else quantize_linear_int4
    return _quantize_tree(params, lambda p, _path: fn(p, group=group), min_size)


def _get(tree, path):
    node = tree
    for part in path.split("/"):
        node = node[int(part)] if isinstance(node, (list, tuple)) else node[part]
    return node

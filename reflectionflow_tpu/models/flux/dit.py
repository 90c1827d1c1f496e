"""FLUX.1 rectified-flow DiT, TPU-native.

Functional re-design of the capabilities of the reference's conditioned
FLUX forward (`/root/reference/train_flux/flux/transformer.py:47`,
`/root/reference/train_flux/flux/block.py:7,173,275`):

  * 19 double-stream (img/txt) MMDiT blocks + 38 single-stream blocks;
  * AdaLN-Zero modulation from (timestep, guidance, pooled-CLIP) embedding;
  * optional third **condition** token stream that shares all image-stream
    weights, gets its own timestep embedding at `c_t` (default 0, guidance
    forced to 1.0) and its own RoPE ids with a position delta;
  * `union_cond_attn` / `add_cond_attn` / `c_factor` semantics of
    `block.py:106-125,224-228`.

TPU-first choices (not in the reference):
  * params are stacked per block family and the block loop is a
    `lax.scan` — one compiled block body per family instead of 57 inlined
    blocks (faster compiles, uniform sharding annotations);
  * the three QKV projections + joint attention run per block as one fused
    region; attention is `ops.joint_attention` (XLA fused softmax or Pallas
    flash kernel);
  * `remat="block"` wraps the scan bodies in `jax.checkpoint` for training.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...config import FluxDiTConfig
from ...ops.attention import cond_attention_bias, joint_attention
from ...ops.norms import adaln_modulate, layer_norm, rms_norm


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _linear_init(key, d_in, d_out, dtype):
    kw, _ = jax.random.split(key)
    scale = 1.0 / jnp.sqrt(d_in)
    return {
        "w": (jax.random.normal(kw, (d_in, d_out)) * scale).astype(dtype),
        "b": jnp.zeros((d_out,), dtype),
    }


def linear(p, x):
    if "w_q" in p and "act_q" in p:
        # W8A8: int8 x int8 -> int32 on the MXU (ops.quant.int8_matmul)
        from ...ops.quant import int8_matmul

        out = int8_matmul(x, p["w_q"], p["w_scale"])
    elif "w_q" in p:  # int8 weight-only — dequant fused into the matmul read
        w = (p["w_q"].astype(jnp.float32) * p["w_scale"]).astype(x.dtype)
        out = x @ w
    elif "w_p4p" in p:  # int4 weight-only, split-plane packing (no
        # even/odd relayout in the dequant — ops.quant.int4_matmul_plane)
        from ...ops.quant import int4_matmul_plane

        out = int4_matmul_plane(x, p["w_p4p"], p["w_scale4"])
    elif "w_p4" in p:  # int4 weight-only (ops.quant.int4_matmul)
        from ...ops.quant import int4_matmul

        out = int4_matmul(x, p["w_p4"], p["w_scale4"])
    else:
        out = x @ p["w"]
    if "lora_A" in p:  # low-rank add (lora.attach_lora); B carries the scale
        out = out + (x @ p["lora_A"].astype(x.dtype)) @ p["lora_B"].astype(x.dtype)
    if "b" in p:
        out = out + p["b"]
    return out


def _mlp_embed_init(key, d_in, d_hidden, dtype):
    k1, k2 = jax.random.split(key)
    return {"fc1": _linear_init(k1, d_in, d_hidden, dtype), "fc2": _linear_init(k2, d_hidden, d_hidden, dtype)}


def _mlp_embed(p, x):
    return linear(p["fc2"], jax.nn.silu(linear(p["fc1"], x)))


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal features, cos-first ordering (matches the convention of the
    weights this model loads). t: (B,) already scaled by 1000."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _attn_init(key, cfg: FluxDiTConfig, dual: bool, dtype):
    H = cfg.hidden_size
    D = cfg.head_dim
    ks = jax.random.split(key, 12)
    p = {
        "q": _linear_init(ks[0], H, H, dtype),
        "k": _linear_init(ks[1], H, H, dtype),
        "v": _linear_init(ks[2], H, H, dtype),
        "q_norm": {"scale": jnp.ones((D,), dtype)},
        "k_norm": {"scale": jnp.ones((D,), dtype)},
    }
    if dual:
        p.update(
            {
                "txt_q": _linear_init(ks[3], H, H, dtype),
                "txt_k": _linear_init(ks[4], H, H, dtype),
                "txt_v": _linear_init(ks[5], H, H, dtype),
                "txt_q_norm": {"scale": jnp.ones((D,), dtype)},
                "txt_k_norm": {"scale": jnp.ones((D,), dtype)},
                "out": _linear_init(ks[6], H, H, dtype),
                "txt_out": _linear_init(ks[7], H, H, dtype),
            }
        )
    return p


def _double_block_init(key, cfg: FluxDiTConfig, dtype):
    H, M = cfg.hidden_size, cfg.mlp_hidden
    ks = jax.random.split(key, 8)
    return {
        "img_mod": _linear_init(ks[0], H, 6 * H, dtype),
        "txt_mod": _linear_init(ks[1], H, 6 * H, dtype),
        "attn": _attn_init(ks[2], cfg, dual=True, dtype=dtype),
        "img_mlp": {"fc1": _linear_init(ks[3], H, M, dtype), "fc2": _linear_init(ks[4], M, H, dtype)},
        "txt_mlp": {"fc1": _linear_init(ks[5], H, M, dtype), "fc2": _linear_init(ks[6], M, H, dtype)},
    }


def _single_block_init(key, cfg: FluxDiTConfig, dtype):
    H, M = cfg.hidden_size, cfg.mlp_hidden
    ks = jax.random.split(key, 5)
    return {
        "mod": _linear_init(ks[0], H, 3 * H, dtype),
        "attn": _attn_init(ks[1], cfg, dual=False, dtype=dtype),
        "mlp_in": _linear_init(ks[2], H, M, dtype),
        # proj_out consumes concat([attn_out, gelu(mlp)], -1)
        "out": _linear_init(ks[3], H + M, H, dtype),
    }


def flux_dit_init(key, cfg: FluxDiTConfig, dtype=jnp.float32):
    H = cfg.hidden_size
    ks = jax.random.split(key, 10)
    params = {
        "img_in": _linear_init(ks[0], cfg.in_channels, H, dtype),
        "txt_in": _linear_init(ks[1], cfg.text_dim, H, dtype),
        "time_in": _mlp_embed_init(ks[2], cfg.time_freq_dim, H, dtype),
        "vector_in": _mlp_embed_init(ks[3], cfg.pooled_dim, H, dtype),
        "final_mod": _linear_init(ks[5], H, 2 * H, dtype),
        "final_proj": _linear_init(ks[6], H, cfg.in_channels, dtype),
        "double_blocks": jax.vmap(lambda k: _double_block_init(k, cfg, dtype))(
            jax.random.split(ks[7], cfg.num_double_blocks)
        ),
        "single_blocks": jax.vmap(lambda k: _single_block_init(k, cfg, dtype))(
            jax.random.split(ks[8], cfg.num_single_blocks)
        ),
    }
    if cfg.guidance_embeds:
        params["guidance_in"] = _mlp_embed_init(ks[4], cfg.time_freq_dim, H, dtype)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _heads(cfg: FluxDiTConfig, x: jnp.ndarray) -> jnp.ndarray:
    B, L, _ = x.shape
    return x.reshape(B, L, cfg.num_heads, cfg.head_dim)


def _unheads(x: jnp.ndarray) -> jnp.ndarray:
    B, L, nH, D = x.shape
    return x.reshape(B, L, nH * D)


def _rms_fast(x, scale, eps=1e-6):
    """Serving QK-norm: fp32 only for the per-row rsqrt reduce; the (L, H, D)
    elementwise stays in the storage dtype (no fp32 intermediates)."""
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps).astype(x.dtype) * scale.astype(x.dtype)


def _qk_norm(x, scale, fast):
    return _rms_fast(x, scale) if fast else rms_norm(x, scale)


def _adaln_fast(x, shift, scale, eps=1e-6):
    """Serving AdaLN-Zero modulate: fp32 only for the per-row mean/var
    reduces; the big (L, H) elementwise runs in the storage dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    r = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    a = r.astype(x.dtype)
    b = (-mu * r).astype(x.dtype)
    return (x * a + b) * (1.0 + scale[:, None, :].astype(x.dtype)) + shift[:, None, :].astype(x.dtype)


def _modulate(x, shift, scale, fast):
    return _adaln_fast(x, shift, scale) if fast else adaln_modulate(x, shift, scale)


def _quant_block_rows(L, width):
    from ...ops.pallas_quant import auto_block_rows

    return auto_block_rows(L, width)


def _out_width(p):
    """Output width of a linear param dict (int8/NF4-quantized or float)."""
    for k in ("w_q", "w_p4", "w_p4p", "w"):
        if k in p:
            return p[k].shape[-1]
    raise KeyError(f"not a linear param dict: {sorted(p)}")


def _use_fused_quant(flags, attn_impl, p, L, *widths):
    """Gate for the Pallas fused act-quant serving path (ops.pallas_quant):
    serving fast layout + W8A8 params + a pallas attention impl (its
    `_interpret` suffix also drives the quant kernels' interpret mode) +
    row-tileable length. `widths` must list every activation width the
    gated path will quantize at (the gate and the kernels share
    `auto_block_rows`, whose result is width-dependent — gating on one
    width while running another invites a zero-block grid)."""
    return (
        flags.get("fast_qk", False)
        and attn_impl.startswith("pallas")
        and isinstance(p, dict)
        and "act_q" in p
        and all(_quant_block_rows(L, w) > 0 for w in widths)
    )


def _adaln_quant_matmul(x, shift, scale, p, attn_impl, dtype):
    """modulate+quant (one Pallas pass) -> pre-quantized W8A8 matmul."""
    from ...ops.pallas_quant import adaln_quant
    from ...ops.quant import int8_matmul_pre

    interp = attn_impl.endswith("interpret")
    xq, xs = adaln_quant(x, shift, scale, block_rows=_quant_block_rows(x.shape[1], x.shape[-1]), interpret=interp)
    return int8_matmul_pre(xq, xs, p, dtype)


def _gelu_quant_matmul(x_pre, p, attn_impl, dtype):
    """gelu+quant (one Pallas pass) -> pre-quantized W8A8 matmul."""
    from ...ops.pallas_quant import gelu_quant
    from ...ops.quant import int8_matmul_pre

    interp = attn_impl.endswith("interpret")
    mq, ms = gelu_quant(x_pre, block_rows=_quant_block_rows(x_pre.shape[1], x_pre.shape[-1]), interpret=interp)
    return int8_matmul_pre(mq, ms, p, dtype)


def _rowquant_matmul(x, p, attn_impl, dtype):
    """per-token quant (one Pallas pass) -> pre-quantized W8A8 matmul."""
    from ...ops.pallas_quant import rowquant
    from ...ops.quant import int8_matmul_pre

    interp = attn_impl.endswith("interpret")
    xq, xs = rowquant(x, block_rows=_quant_block_rows(x.shape[1], x.shape[-1]), interpret=interp)
    return int8_matmul_pre(xq, xs, p, dtype)




def _nr_gate(flags, attn_impl, tables, L, width):
    """Use the fused Pallas QK-norm+RoPE pass? Serving fast layout + split
    rope tables + pallas attention + row-tileable stream length."""
    return (
        flags.get("fast_qk", False)
        and tables is not None
        and tables[2]  # split layout (contiguous-half rotation)
        and attn_impl.startswith("pallas")
        and _quant_block_rows(L, width) > 0
    )


def _nr_attn_gate(flags, attn_impl, *tables):
    """Fully-fused serving attention: QK-norm + split-RoPE run INSIDE the
    flash kernel (`ops.pallas_attention.flash_attention_nr`) instead of as
    a separate `norm_rope` pass — one read+write of the q and k panels per
    layer (~112 MB at FLUX scale) never hits HBM. Selected with
    attn_impl="pallas_nr[_interpret]"; needs the serving fast layout and
    split tables for every present stream."""
    return (
        attn_impl.startswith("pallas_nr")
        and flags.get("fast_qk", False)
        and all(t is not None and t[2] for t in tables)
    )


def _nr_attention(streams_q, streams_k, streams_v, scq, sck, rope_main,
                  rope_cond, txt_len, cond_len, cross_bias, interp):
    """Concatenate RAW (pre-norm, pre-rope) per-stream q/k/v and run the
    norm+rope-fused flash kernel; returns per-stream outputs like
    `ops.attention.joint_attention`.

    Norm-scale rows: row 0 = txt-stream scales (joint positions < txt_len),
    row 1 = img-stream scales — shared by the cond stream, whose projections
    reuse the img-side norm params (LoRA folding only touches linears, never
    norm scales)."""
    from ...ops.pallas_attention import flash_attention_nr

    lens = [s.shape[1] for s in streams_q]
    cat = lambda xs: jnp.concatenate(xs, axis=1) if len(xs) > 1 else xs[0]
    q, k, v = cat(streams_q), cat(streams_k), cat(streams_v)
    cos, sin = rope_main[0], rope_main[1]
    if cond_len:
        cos = jnp.concatenate([cos, rope_cond[0]], axis=0)
        sin = jnp.concatenate([sin, rope_cond[1]], axis=0)
    out = flash_attention_nr(
        q, k, v, cos, sin, scq, sck, txt_len=txt_len,
        main_len=q.shape[1] - cond_len, cross_bias=cross_bias, interpret=interp,
    )
    outs, off = [], 0
    for L in lens:
        outs.append(out[:, off : off + L])
        off += L
    return outs


def _qkv_split(attn_p, cfg, qkv, prefix="", fast=False, rope=None):
    """Split a packed (..., 3H[+extra]) projection into normed per-head q/k/v.

    With `rope=(cos, sin, interpret)` (serving), QK-norm AND the split-layout
    rotation run as ONE Pallas pass per panel (`ops.pallas_quant.norm_rope`)
    — the caller must then skip its `_rope_qk`."""
    H = cfg.num_heads * cfg.head_dim
    q_r, k_r, v_r = qkv[..., :H], qkv[..., H : 2 * H], qkv[..., 2 * H : 3 * H]
    if rope == "raw":  # fully-fused attention: norm+rope happen IN-KERNEL
        return _heads(cfg, q_r), _heads(cfg, k_r), _heads(cfg, v_r)
    if rope is not None:
        from ...ops.pallas_quant import norm_rope

        cos, sin, interp = rope
        bl = _quant_block_rows(q_r.shape[1], H)
        q = _heads(cfg, norm_rope(
            q_r, attn_p[prefix + "q_norm"]["scale"], cos, sin, cfg.head_dim,
            block_rows=bl, interpret=interp,
        ))
        k = _heads(cfg, norm_rope(
            k_r, attn_p[prefix + "k_norm"]["scale"], cos, sin, cfg.head_dim,
            block_rows=bl, interpret=interp,
        ))
        return q, k, _heads(cfg, v_r)
    q = _qk_norm(_heads(cfg, q_r), attn_p[prefix + "q_norm"]["scale"], fast)
    k = _qk_norm(_heads(cfg, k_r), attn_p[prefix + "k_norm"]["scale"], fast)
    v = _heads(cfg, v_r)
    return q, k, v


def _qkv(attn_p, cfg, x, prefix="", fast=False, rope=None):
    if prefix + "qkv" in attn_p:  # fused projection (ops.fuse.fuse_dit_qkv)
        return _qkv_split(attn_p, cfg, linear(attn_p[prefix + "qkv"], x), prefix, fast, rope=rope)
    if rope is not None:  # fused norm+rope needs the panel layout
        return _qkv_split(
            attn_p, cfg,
            jnp.concatenate(
                [linear(attn_p[prefix + n], x) for n in ("q", "k", "v")], axis=-1
            ),
            prefix, fast, rope=rope,
        )
    q_r = linear(attn_p[prefix + "q"], x)
    k_r = linear(attn_p[prefix + "k"], x)
    v_r = linear(attn_p[prefix + "v"], x)
    q = _qk_norm(_heads(cfg, q_r), attn_p[prefix + "q_norm"]["scale"], fast)
    k = _qk_norm(_heads(cfg, k_r), attn_p[prefix + "k_norm"]["scale"], fast)
    v = _heads(cfg, v_r)
    return q, k, v


def _mod(p, temb, n):
    out = linear(p, jax.nn.silu(temb))
    return jnp.split(out, n, axis=-1)


def _rope_qk(q, k, tables):
    from .rope import apply_rope, apply_rope_split

    cos, sin, split = tables
    fn = apply_rope_split if split else apply_rope
    return fn(q, cos, sin), fn(k, cos, sin)


def _double_block_apply(bp, cfg, img, txt, cond, temb, cond_temb, rope_main, rope_cond, bias, flags, attn_impl, bp_c=None, modules=None, return_modules=False):
    bp_c = bp if bp_c is None else bp_c
    use_cond = cond is not None
    # modulation (img-side params are shared with the cond stream)
    i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = _mod(bp["img_mod"], temb, 6)
    t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = _mod(bp["txt_mod"], temb, 6)
    if modules is not None:
        # TaylorSeer skip step (arXiv 2503.06923): the four module outputs
        # (img/txt attention and MLP, PRE-gate) are forecast from history;
        # the glue — fresh AdaLN gates from the CURRENT temb and the
        # residual adds — still runs, so the block structure stays live.
        assert not use_cond, "module cache does not cover the cond stream"
        ia, ta, im, tm = modules
        dt = img.dtype
        img = img + i_g1[:, None, :] * ia.astype(dt) + i_g2[:, None, :] * im.astype(dt)
        txt = txt + t_g1[:, None, :] * ta.astype(dt) + t_g2[:, None, :] * tm.astype(dt)
        return img, txt, cond
    fast = flags.get("fast_qk", False)
    ap = bp["attn"]
    H = cfg.num_heads * cfg.head_dim
    Lt = txt.shape[1]
    interp = attn_impl.endswith("interpret")
    # fully-fused attention (pallas_nr): raw q/k straight into the kernel
    nr_fuse = _nr_attn_gate(
        flags, attn_impl, rope_main, *((rope_cond,) if use_cond else ())
    )
    # fused norm+rope (serving): both main streams must be row-tileable so
    # the post-concat _rope_qk can be skipped for main as a whole
    nr_main = not nr_fuse and _nr_gate(flags, attn_impl, rope_main, Lt, H) and _nr_gate(
        flags, attn_impl, rope_main, img.shape[1], H
    )
    if nr_fuse:
        rope_txt = rope_img = "raw"
    else:
        rope_txt = (rope_main[0][:Lt], rope_main[1][:Lt], interp) if nr_main else None
        rope_img = (rope_main[0][Lt:], rope_main[1][Lt:], interp) if nr_main else None

    def stream_qkv(a, x, sh, sc, prefix="", rope=None):
        # serving: modulate+act-quant as ONE Pallas pass feeding the panel matmul
        if prefix + "qkv" in a and _use_fused_quant(
            flags, attn_impl, a[prefix + "qkv"], x.shape[1], x.shape[-1]
        ):
            panel = _adaln_quant_matmul(x, sh, sc, a[prefix + "qkv"], attn_impl, x.dtype)
            return _qkv_split(a, cfg, panel, prefix, fast=True, rope=rope)
        return _qkv(a, cfg, _modulate(x, sh, sc, fast), prefix=prefix, fast=fast, rope=rope)

    img_q, img_k, img_v = stream_qkv(ap, img, i_sh1, i_sc1, rope=rope_img)
    txt_q, txt_k, txt_v = stream_qkv(ap, txt, t_sh1, t_sc1, prefix="txt_", rope=rope_txt)
    # RoPE covers [txt|img] jointly; cond has its own tables
    q = jnp.concatenate([txt_q, img_q], axis=1)
    k = jnp.concatenate([txt_k, img_k], axis=1)
    if not (nr_main or nr_fuse):
        q, k = _rope_qk(q, k, rope_main)
    v = jnp.concatenate([txt_v, img_v], axis=1)

    streams_q, streams_k, streams_v = [q], [k], [v]
    if use_cond:
        # cond stream reads the (possibly LoRA-folded) bp_c weights
        nr_cond = not nr_fuse and _nr_gate(flags, attn_impl, rope_cond, cond.shape[1], H)
        rope_c = "raw" if nr_fuse else (
            (rope_cond[0], rope_cond[1], interp) if nr_cond else None
        )
        c_sh1, c_sc1, c_g1, c_sh2, c_sc2, c_g2 = _mod(bp_c["img_mod"], cond_temb, 6)
        cond_q, cond_k, cond_v = stream_qkv(bp_c["attn"], cond, c_sh1, c_sc1, rope=rope_c)
        if not (nr_cond or nr_fuse):
            cond_q, cond_k = _rope_qk(cond_q, cond_k, rope_cond)
        streams_q.append(cond_q)
        streams_k.append(cond_k)
        streams_v.append(cond_v)

    if nr_fuse:
        outs = _nr_attention(
            streams_q, streams_k, streams_v,
            jnp.stack([ap["txt_q_norm"]["scale"], ap["q_norm"]["scale"]]),
            jnp.stack([ap["txt_k_norm"]["scale"], ap["k_norm"]["scale"]]),
            rope_main, rope_cond, Lt, bias["cond_len"], bias["cross_bias"], interp,
        )
    else:
        outs = joint_attention(streams_q, streams_k, streams_v, impl=attn_impl, **bias)
    joint = outs[0]
    txt_len = txt.shape[1]
    txt_attn, img_attn = joint[:, :txt_len], joint[:, txt_len:]
    img_attn = _proj(ap["out"], _unheads(img_attn), flags, attn_impl)
    txt_attn = _proj(ap["txt_out"], _unheads(txt_attn), flags, attn_impl)

    img = img + i_g1[:, None, :] * img_attn
    txt = txt + t_g1[:, None, :] * txt_attn
    if use_cond:
        cond_attn = _proj(bp_c["attn"]["out"], _unheads(outs[1]), flags, attn_impl)
        gated_cond_attn = c_g1[:, None, :] * cond_attn
        cond = cond + gated_cond_attn
        if flags.get("add_cond_attn", False):
            # only meaningful when cond and img grids match (same constraint
            # as the reference's in-place add)
            assert cond.shape[1] == img.shape[1], "add_cond_attn requires L_cond == L_img"
            img = img + gated_cond_attn

    # feed-forward (img-stream MLP shared with cond)
    img_mlp = _mlp_apply(bp["img_mlp"], img, i_sh2, i_sc2, flags, attn_impl, fast)
    txt_mlp = _mlp_apply(bp["txt_mlp"], txt, t_sh2, t_sc2, flags, attn_impl, fast)
    img = img + i_g2[:, None, :] * img_mlp
    txt = txt + t_g2[:, None, :] * txt_mlp
    if use_cond:
        cond = cond + c_g2[:, None, :] * _mlp_apply(
            bp_c["img_mlp"], cond, c_sh2, c_sc2, flags, attn_impl, fast
        )
    if return_modules:
        return img, txt, cond, (img_attn, txt_attn, img_mlp, txt_mlp)
    return img, txt, cond


def _proj(p, x, flags, attn_impl):
    """Attention out-projection: fused rowquant+matmul on the serving path."""
    if _use_fused_quant(flags, attn_impl, p, x.shape[1], x.shape[-1]):
        return _rowquant_matmul(x, p, attn_impl, x.dtype)
    return linear(p, x)


def _mlp_apply(mlp_p, x, sh2, sc2, flags, attn_impl, fast):
    """modulate -> fc1 -> gelu -> fc2, fusing both act-quants on the serving path."""
    if (
        _use_fused_quant(
            flags, attn_impl, mlp_p["fc1"], x.shape[1],
            x.shape[-1], _out_width(mlp_p["fc1"]),
        )
        and "act_q" in mlp_p["fc2"]
    ):
        pre = _adaln_quant_matmul(x, sh2, sc2, mlp_p["fc1"], attn_impl, x.dtype)
        return _gelu_quant_matmul(pre, mlp_p["fc2"], attn_impl, x.dtype)
    x_m = _modulate(x, sh2, sc2, fast)
    return linear(mlp_p["fc2"], gelu_tanh(linear(mlp_p["fc1"], x_m)))


def _single_in(bp, cfg, h_n, fast=False, rope=None):
    """(mlp_pre_gelu, q, k, v) for one single-block stream; `in_proj` is the
    fused serving panel (ops.fuse.fuse_single_block_io): one matmul — and
    under W8A8 one per-token activation quantization — for all four."""
    if "in_proj" in bp:
        fused = linear(bp["in_proj"], h_n)
        q, k, v = _qkv_split(bp["attn"], cfg, fused, fast=fast, rope=rope)
        mlp = gelu_tanh(fused[..., 3 * cfg.num_heads * cfg.head_dim :])
    else:
        mlp = gelu_tanh(linear(bp["mlp_in"], h_n))
        q, k, v = _qkv(bp["attn"], cfg, h_n, fast=fast, rope=rope)
    return mlp, q, k, v


def _single_out(bp, attn_out, mlp):
    """proj_out(concat([attn, mlp])); the split serving layout computes the
    two halves as separate matmuls summed in the epilogue, so the (L, H+M)
    concat never hits HBM."""
    if "out_attn" in bp:
        return linear(bp["out_attn"], attn_out) + linear(bp["out_mlp"], mlp)
    return linear(bp["out"], jnp.concatenate([attn_out, mlp], axis=-1))


def _single_stream_in(bp, cfg, x, sh, sc, flags, attn_impl, rope=None):
    """One single-block stream's q/k/v + mlp context, with the fused
    modulate+quant -> in_proj matmul on the serving path."""
    fast = flags.get("fast_qk", False)
    if "in_proj" in bp and _use_fused_quant(
        flags, attn_impl, bp["in_proj"], x.shape[1],
        x.shape[-1], _out_width(bp["in_proj"]) - 3 * cfg.num_heads * cfg.head_dim,
    ):
        fused = _adaln_quant_matmul(x, sh, sc, bp["in_proj"], attn_impl, x.dtype)
        q, k, v = _qkv_split(bp["attn"], cfg, fused, fast=True, rope=rope)
        return q, k, v, ("pre", fused[..., 3 * cfg.num_heads * cfg.head_dim :])
    h_n = _modulate(x, sh, sc, fast)
    mlp, q, k, v = _single_in(bp, cfg, h_n, fast=fast, rope=rope)
    return q, k, v, ("gelu", mlp)


def _single_stream_out(bp, flags, attn_impl, attn_out, mlp_ctx):
    kind, val = mlp_ctx
    if kind == "pre":
        if "act_q" in bp["out_mlp"]:
            return (_proj(bp["out_attn"], attn_out, flags, attn_impl)
                    + _gelu_quant_matmul(val, bp["out_mlp"], attn_impl, attn_out.dtype))
        val = gelu_tanh(val)
    return _single_out(bp, attn_out, val)


def _single_block_apply(bp, cfg, hidden, cond, temb, cond_temb, rope_main, rope_cond, bias, flags, attn_impl, bp_c=None, modules=None, return_modules=False):
    bp_c = bp if bp_c is None else bp_c
    use_cond = cond is not None
    sh, sc, gate = _mod(bp["mod"], temb, 3)
    if modules is not None:
        # TaylorSeer skip step: the block's (pre-gate) output projection is
        # forecast; the fresh AdaLN gate and the residual add stay live.
        assert not use_cond, "module cache does not cover the cond stream"
        hidden = hidden + gate[:, None, :] * modules.astype(hidden.dtype)
        return hidden, cond
    H = cfg.num_heads * cfg.head_dim
    interp = attn_impl.endswith("interpret")
    nr_fuse = _nr_attn_gate(
        flags, attn_impl, rope_main, *((rope_cond,) if use_cond else ())
    )
    nr_main = not nr_fuse and _nr_gate(flags, attn_impl, rope_main, hidden.shape[1], H)
    rope_m = "raw" if nr_fuse else (
        (rope_main[0], rope_main[1], interp) if nr_main else None
    )
    q, k, v, mctx = _single_stream_in(bp, cfg, hidden, sh, sc, flags, attn_impl, rope=rope_m)
    if not (nr_main or nr_fuse):
        q, k = _rope_qk(q, k, rope_main)
    streams_q, streams_k, streams_v = [q], [k], [v]
    if use_cond:
        nr_cond = not nr_fuse and _nr_gate(flags, attn_impl, rope_cond, cond.shape[1], H)
        rope_c = "raw" if nr_fuse else (
            (rope_cond[0], rope_cond[1], interp) if nr_cond else None
        )
        c_sh, c_sc, c_gate = _mod(bp_c["mod"], cond_temb, 3)
        cq, ck, cv, c_mctx = _single_stream_in(
            bp_c, cfg, cond, c_sh, c_sc, flags, attn_impl, rope=rope_c
        )
        if not (nr_cond or nr_fuse):
            cq, ck = _rope_qk(cq, ck, rope_cond)
        streams_q.append(cq)
        streams_k.append(ck)
        streams_v.append(cv)
    if nr_fuse:
        # one projection per single block -> one scale per row; txt_len=0
        # sends every joint position to row 1 (row 0 is a harmless twin)
        scq = jnp.stack([bp["attn"]["q_norm"]["scale"]] * 2)
        sck = jnp.stack([bp["attn"]["k_norm"]["scale"]] * 2)
        outs = _nr_attention(
            streams_q, streams_k, streams_v, scq, sck, rope_main, rope_cond,
            0, bias["cond_len"], bias["cross_bias"], interp,
        )
    else:
        outs = joint_attention(streams_q, streams_k, streams_v, impl=attn_impl, **bias)
    s_out = _single_stream_out(bp, flags, attn_impl, _unheads(outs[0]), mctx)
    hidden = hidden + gate[:, None, :] * s_out
    if use_cond:
        cond = cond + c_gate[:, None, :] * _single_stream_out(
            bp_c, flags, attn_impl, _unheads(outs[1]), c_mctx
        )
    if return_modules:
        return hidden, cond, s_out
    return hidden, cond


def _time_text_embed(params, cfg: FluxDiTConfig, pooled, timestep, guidance, dtype):
    """The forward's conditioning vector: timestep + pooled-text (+ guidance)
    MLP embeddings. Shared by `flux_dit_apply` and `flux_mod_signal` so the
    velocity-cache skip signal can never drift from the real prologue."""
    t_feat = timestep_embedding(timestep * 1000.0, cfg.time_freq_dim)
    temb = _mlp_embed(params["time_in"], t_feat.astype(dtype))
    temb = temb + _mlp_embed(params["vector_in"], pooled.astype(dtype))
    if cfg.guidance_embeds and guidance is not None:
        g_feat = timestep_embedding(guidance * 1000.0, cfg.time_freq_dim)
        temb = temb + _mlp_embed(params["guidance_in"], g_feat.astype(dtype))
    return temb


def flux_mod_signal(params, cfg: FluxDiTConfig, img, pooled, timestep, guidance=None):
    """Velocity-cache skip signal: the first double block's AdaLN-modulated
    image-stream input (TeaCache, arXiv 2411.19108, applied to FLUX). Its
    step-to-step relative L1 change tracks how much the full forward's
    output will move; `sampler.generate.denoise` accumulates it and reuses
    the previous velocity while the estimate stays under threshold.

    Cost: the x_embedder matmul + the temb MLPs + one modulation linear —
    ~0.05% of a full 19/38-block forward. Works on any weight tree the
    forward accepts (bf16 / W8A8 / NF4) since it reuses `linear`."""
    dtype = img.dtype
    h = linear(params["img_in"], img)
    temb = _time_text_embed(params, cfg, pooled, timestep, guidance, dtype)
    mod0 = jax.tree.map(lambda a: a[0], params["double_blocks"]["img_mod"])
    sh1, sc1 = _mod(mod0, temb, 6)[:2]
    return _modulate(h, sh1, sc1, fast=False)


def flux_residual_decode(params, cfg: FluxDiTConfig, img, resid, pooled, timestep,
                         guidance=None):
    """TeaCache skip-step compute graph (arXiv 2411.19108, reference impl
    `teacache_flux.py` applied to FLUX.1-dev): a fresh input embedding of
    the CURRENT latents plus the cached transformer residual, then the
    real final AdaLN + projection. This is exactly what the cited method
    runs on a skipped step — the cached quantity is the image-stream
    residual across the transformer blocks (`flux_dit_apply(...,
    return_img_residual=True)`), NOT the raw output velocity, so the
    input embedding and the output head stay live every step.

    Cost: two thin matmuls (img_in, final_proj) + the temb MLPs —
    negligible next to a 19/38-block forward."""
    dtype = img.dtype
    h = linear(params["img_in"], img) + resid.astype(dtype)
    temb = _time_text_embed(params, cfg, pooled, timestep, guidance, dtype)
    sc, sh = _mod(params["final_mod"], temb, 2)
    h = layer_norm(h) * (1.0 + sc[:, None, :]) + sh[:, None, :]
    return linear(params["final_proj"], h)


def flux_dit_apply(
    params,
    cfg: FluxDiTConfig,
    img: jnp.ndarray,  # (B, L_img, in_channels) packed latents
    txt: jnp.ndarray,  # (B, L_txt, text_dim) T5 states
    pooled: jnp.ndarray,  # (B, pooled_dim) CLIP pooled
    timestep: jnp.ndarray,  # (B,) in [0, 1]
    img_ids: jnp.ndarray,  # (L_img, 3)
    txt_ids: jnp.ndarray,  # (L_txt, 3)
    guidance: jnp.ndarray | None = None,  # (B,) distilled-guidance scale
    cond: jnp.ndarray | None = None,  # (B, L_cond, in_channels)
    cond_ids: jnp.ndarray | None = None,  # (L_cond, 3)
    c_t: float = 0.0,
    union_cond_attn: bool = True,
    add_cond_attn: bool = False,
    c_factor: float | None = None,
    attn_impl: str = "xla",
    remat: bool = False,
    cond_params=None,
    rope_layout: str = "pair",
    controlnet_block_samples: jnp.ndarray | None = None,  # (n, B, L_img, hidden)
    controlnet_single_block_samples: jnp.ndarray | None = None,  # (n, B, L_img, hidden)
    return_img_residual: bool = False,
    module_cache: dict | None = None,  # TaylorSeer skip step: forecast module outs
    return_module_outs: bool = False,  # full step: also return per-module outputs
) -> jnp.ndarray:
    """Predict rectified-flow velocity for the packed image tokens.

    `rope_layout="split"` expects weights transformed by
    `ops.fuse.permute_rope_layout` (serving: contiguous-half rotation
    instead of stride-2 shuffles).

    `controlnet_[single_]block_samples`: stacked per-hook residuals added
    to the image stream after each block, hook i serving blocks
    [i*interval, (i+1)*interval) with interval = ceil(n_blocks / n_hooks)
    (`/root/reference/train_flux/flux/transformer.py:172-181,230-239`).
    Expanded to one residual per block OUTSIDE the scan (a static gather)
    so the scan body stays shape-uniform.

    `return_img_residual=True` additionally returns the image-stream
    residual across the transformer blocks (post-blocks hidden minus the
    `img_in` embedding, (B, L_img, hidden)) — the quantity TeaCache caches
    and `flux_residual_decode` consumes on skipped steps.

    `return_module_outs=True` (full step) additionally returns the
    TaylorSeer cache (arXiv 2503.06923): every block's PRE-gate module
    outputs, stacked per block —
      {"double": (img_attn, txt_attn, img_mlp, txt_mlp) each (Nd, B, L, H),
       "single": (Ns, B, L_txt+L_img, H)}.
    `module_cache=` (skip step) consumes a forecast of that pytree: each
    block adds its forecast module outputs through FRESH AdaLN gates (temb
    recomputed), so only the attention/MLP matmuls are skipped — the
    per-module granularity the citation validated, vs the output-velocity
    proxy of `vcache_order`. t2i only (no cond/controlnet streams).

    Returns (B, L_img, in_channels)."""
    from .rope import rope_split_perm, rope_tables

    use_cond = cond is not None
    module_mode = return_module_outs or module_cache is not None
    if module_mode and (use_cond or controlnet_block_samples is not None
                        or controlnet_single_block_samples is not None
                        or return_img_residual):
        raise ValueError("module cache covers the plain t2i path "
                         "(no cond/controlnet streams, not combinable with "
                         "return_img_residual)")
    # "split" is the serving layout: fast (storage-dtype) QK-norm + RoPE
    flags = {"add_cond_attn": add_cond_attn, "fast_qk": rope_layout == "split"}
    dtype = img.dtype

    img = linear(params["img_in"], img)
    img_embed = img if return_img_residual else None
    txt = linear(params["txt_in"], txt)
    cp = params if cond_params is None else cond_params
    cond_h = linear(cp["img_in"], cond) if use_cond else None

    if cfg.guidance_embeds:
        assert guidance is not None, "FLUX.1-dev requires a guidance scale"
    temb = _time_text_embed(params, cfg, pooled, timestep, guidance, dtype)

    cond_temb = None
    if use_cond:
        # cond stream: t fixed at c_t, guidance forced to 1.0
        # (/root/reference/train_flux/flux/transformer.py:108-114)
        cond_temb = _time_text_embed(
            params, cfg, pooled, jnp.full_like(timestep, c_t),
            jnp.ones_like(timestep) if cfg.guidance_embeds else None, dtype,
        )

    main_ids = jnp.concatenate([txt_ids, img_ids], axis=0)
    split = rope_layout == "split"

    def tables(ids):
        cos, sin = rope_tables(ids, cfg.axes_dims_rope, cfg.rope_theta)
        if split:
            perm = jnp.asarray(rope_split_perm(cfg.head_dim))
            # bf16 tables select the all-bf16 rotation (rope.apply_rope_split)
            cos, sin = cos[:, perm].astype(dtype), sin[:, perm].astype(dtype)
        return cos, sin, split

    rope_main = tables(main_ids)
    rope_cond = tables(cond_ids) if use_cond else None

    L_main = img.shape[1] + txt.shape[1]
    L_cond = cond_h.shape[1] if use_cond else 0
    # two equivalent bias forms: dense for the XLA path, structural for
    # Pallas and ring (SP reconstructs global positions from the ring)
    if use_cond and attn_impl.startswith(("pallas", "ring")):
        # c_factor takes precedence over the union mask (block.py:106-122)
        if c_factor is not None:
            cross = float(jnp.log(jnp.asarray(c_factor)))
        elif not union_cond_attn:
            cross = -1e30
        else:
            cross = 0.0
        bias = {"cond_len": L_cond, "cross_bias": cross, "bias": None}
    else:
        dense = cond_attention_bias(L_main + L_cond, L_cond, union_cond_attn, c_factor) if use_cond else None
        bias = {"bias": dense, "cond_len": 0, "cross_bias": 0.0}

    # ControlNet hook residuals: the scan carries only a per-block hook
    # INDEX (int32 xs); each body gathers its slice from the small
    # (n_hooks, B, L_img, H) stack, which rides the scan as a loop
    # invariant. (Expanding to one slice per block as xs multiplies the
    # residual HBM by the hook interval — ~0.9 GB/batch-elem for 2 hooks
    # over 38 single blocks at 1024px, enough to tip 16 GB serving.)
    def _ctrl_idx(samples, n_blocks):
        interval = -(-n_blocks // samples.shape[0])  # ceil, transformer.py:174-178
        return jnp.asarray(np.arange(n_blocks) // interval, jnp.int32)

    ctrl_d_smp = ctrl_s_smp = ctrl_d = ctrl_s = None
    if controlnet_block_samples is not None:
        ctrl_d_smp = jnp.asarray(controlnet_block_samples, dtype)
        ctrl_d = _ctrl_idx(ctrl_d_smp, cfg.num_double_blocks)
    if controlnet_single_block_samples is not None:
        ctrl_s_smp = jnp.asarray(controlnet_single_block_samples, dtype)
        ctrl_s = _ctrl_idx(ctrl_s_smp, cfg.num_single_blocks)

    # --- double-stream blocks (scan over stacked params) ---
    def double_body(carry, bps):
        img, txt, cond_h = carry
        img, txt, cond_h = _double_block_apply(
            bps[0], cfg, img, txt, cond_h, temb, cond_temb, rope_main, rope_cond, bias, flags,
            attn_impl, bp_c=bps[1],
        )
        if len(bps) == 3:  # controlnet residual on the image stream
            img = img + jax.lax.dynamic_index_in_dim(ctrl_d_smp, bps[2], 0, keepdims=False)
        return (img, txt, cond_h), None

    body_d = jax.checkpoint(double_body) if remat else double_body
    if use_cond:
        xs_d = (params["double_blocks"], cp["double_blocks"]) + ((ctrl_d,) if ctrl_d is not None else ())
        (img, txt, cond_h), _ = jax.lax.scan(body_d, (img, txt, cond_h), xs_d)
    elif return_module_outs:
        def double_body_mo(carry, bp):
            i, t = carry
            i2, t2, _, mods = _double_block_apply(
                bp, cfg, i, t, None, temb, None, rope_main, None, bias, flags,
                attn_impl, return_modules=True,
            )
            return (i2, t2), mods

        (img, txt), d_mods = jax.lax.scan(double_body_mo, (img, txt), params["double_blocks"])
    elif module_cache is not None:
        def double_body_mc(carry, xs):
            i, t = carry
            i2, t2, _ = _double_block_apply(
                xs[0], cfg, i, t, None, temb, None, rope_main, None, bias, flags,
                attn_impl, modules=xs[1],
            )
            return (i2, t2), None

        (img, txt), _ = jax.lax.scan(
            double_body_mc, (img, txt), (params["double_blocks"], module_cache["double"]))
    else:
        def double_body_nc(carry, bps):
            i, t = carry
            i2, t2, _ = _double_block_apply(
                bps[0], cfg, i, t, None, temb, None, rope_main, None, bias, flags, attn_impl
            )
            if len(bps) == 2:
                i2 = i2 + jax.lax.dynamic_index_in_dim(ctrl_d_smp, bps[1], 0, keepdims=False)
            return (i2, t2), None

        body_d = jax.checkpoint(double_body_nc) if remat else double_body_nc
        xs_d = (params["double_blocks"],) + ((ctrl_d,) if ctrl_d is not None else ())
        (img, txt), _ = jax.lax.scan(body_d, (img, txt), xs_d)

    hidden = jnp.concatenate([txt, img], axis=1)
    Lt = txt.shape[1]

    # --- single-stream blocks ---
    if use_cond:
        def single_body(carry, bps):
            h, c = carry
            h, c = _single_block_apply(
                bps[0], cfg, h, c, temb, cond_temb, rope_main, rope_cond, bias, flags, attn_impl,
                bp_c=bps[1],
            )
            if len(bps) == 3:  # controlnet residual on the image rows
                h = h.at[:, Lt:, :].add(jax.lax.dynamic_index_in_dim(ctrl_s_smp, bps[2], 0, keepdims=False))
            return (h, c), None

        body_s = jax.checkpoint(single_body) if remat else single_body
        xs_s = (params["single_blocks"], cp["single_blocks"]) + ((ctrl_s,) if ctrl_s is not None else ())
        (hidden, cond_h), _ = jax.lax.scan(body_s, (hidden, cond_h), xs_s)
    elif return_module_outs:
        def single_body_mo(h, bp):
            h, _, s_out = _single_block_apply(
                bp, cfg, h, None, temb, None, rope_main, None, bias, flags, attn_impl,
                return_modules=True,
            )
            return h, s_out

        hidden, s_mods = jax.lax.scan(single_body_mo, hidden, params["single_blocks"])
    elif module_cache is not None:
        def single_body_mc(h, xs):
            h, _ = _single_block_apply(
                xs[0], cfg, h, None, temb, None, rope_main, None, bias, flags, attn_impl,
                modules=xs[1],
            )
            return h, None

        hidden, _ = jax.lax.scan(
            single_body_mc, hidden, (params["single_blocks"], module_cache["single"]))
    else:
        def single_body_nc(h, bps):
            h, _ = _single_block_apply(
                bps[0], cfg, h, None, temb, None, rope_main, None, bias, flags, attn_impl
            )
            if len(bps) == 2:
                h = h.at[:, Lt:, :].add(jax.lax.dynamic_index_in_dim(ctrl_s_smp, bps[1], 0, keepdims=False))
            return h, None

        body_s = jax.checkpoint(single_body_nc) if remat else single_body_nc
        xs_s = (params["single_blocks"],) + ((ctrl_s,) if ctrl_s is not None else ())
        hidden, _ = jax.lax.scan(body_s, hidden, xs_s)

    img = hidden[:, txt.shape[1] :]
    resid = (img - img_embed) if return_img_residual else None
    # final AdaLN (scale-first chunk order, matching loaded weights)
    sc, sh = _mod(params["final_mod"], temb, 2)
    img = layer_norm(img) * (1.0 + sc[:, None, :]) + sh[:, None, :]
    out = linear(params["final_proj"], img)
    if return_module_outs:
        return out, {"double": d_mods, "single": s_mods}
    return (out, resid) if return_img_residual else out

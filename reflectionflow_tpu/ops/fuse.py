"""Load-time weight fusions for serving.

`fuse_dit_qkv` concatenates each attention's Q/K/V projections into one
(in, 3H) matmul — at batch 1-2 the MXU prefers one wide panel over three
narrow ones, and HBM reads coalesce. Applied AFTER LoRA folding (the fused
tree is not a LoRA target) and BEFORE int8 quantization (per-output-channel
scales survive concatenation).

`fuse_single_block_io` goes further for the single-stream blocks, whose
four hot matmuls all touch the same modulated hidden state: Q/K/V and
`mlp_in` become ONE `in_proj` panel (H, 3H+M) — under W8A8 the per-token
activation quantization runs once instead of twice — and the `out`
projection (H+M, H) splits into `out_attn` + `out_mlp` so the (L, H+M)
concat of [attn_out, gelu(mlp)] is never materialized in HBM.

`models.flux.dit._qkv` / `_single_block_apply` dispatch on the presence of
the fused keys. Fused layouts are the SINGLE-CHIP serving profile: the TP
partition specs (`parallel.specs`) shard the unfused per-head panels, so a
model-parallel mesh keeps the unfused layout.
"""

from __future__ import annotations

import jax.numpy as jnp


def _cat_bias(parts: list[dict]):
    """Concatenate the parts' optional biases; missing ones contribute
    zeros. Returns None when no part carries a bias."""
    have = [p for p in parts if "b" in p]
    if not have:
        return None
    dtype = have[0]["b"].dtype
    return jnp.concatenate(
        [
            p["b"] if "b" in p
            else jnp.zeros(p["w"].shape[:-2] + (p["w"].shape[-1],), dtype)
            for p in parts
        ],
        axis=-1,
    )


def _fuse_parts(parts: list[dict]) -> dict:
    out = {"w": jnp.concatenate([p["w"] for p in parts], axis=-1)}
    b = _cat_bias(parts)
    if b is not None:
        out["b"] = b
    return out


def _fuse_three(q: dict, k: dict, v: dict) -> dict:
    return _fuse_parts([q, k, v])


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


def fuse_single_block_io(params: dict) -> dict:
    """Fuse the single-block input panel and split its output panel.

    [q|k|v|mlp_in] -> `in_proj` (H, 3H+M); `out` (H+M, H) ->
    `out_attn` (H, H) + `out_mlp` (M, H) (bias stays on `out_attn`).
    Expects float weights (apply after LoRA folding / `fuse_dit_qkv`,
    before quantization); returns the tree unchanged if the layout does
    not match (already quantized, already fused, or no single blocks).
    """
    if "single_blocks" not in params:
        return params
    blocks = dict(params["single_blocks"])
    attn = dict(blocks["attn"])
    if "qkv" not in attn:
        if not ("q" in attn and "w" in attn["q"]):
            return params
        attn["qkv"] = _fuse_three(attn.pop("q"), attn.pop("k"), attn.pop("v"))
    if not all("w" in d for d in (attn["qkv"], blocks.get("mlp_in", {}), blocks.get("out", {}))):
        return params
    qkv = attn.pop("qkv")
    mlp_in = blocks.pop("mlp_in")
    blocks["in_proj"] = _fuse_parts([qkv, mlp_in])
    o = blocks.pop("out")
    hidden = qkv["w"].shape[-2]
    blocks["out_attn"] = {"w": o["w"][..., :hidden, :]}
    if "b" in o:
        blocks["out_attn"]["b"] = o["b"]
    blocks["out_mlp"] = {"w": o["w"][..., hidden:, :]}
    blocks["attn"] = attn
    out = dict(params)
    out["single_blocks"] = blocks
    return out


def permute_rope_layout(params: dict, head_dim: int) -> dict:
    """Permute Q/K projection outputs (and QK-norm scales) to the half-split
    RoPE layout (`models.flux.rope.rope_split_perm`): the serving forward
    then rotates via two contiguous half-slices instead of stride-2 lane
    shuffles (measured 107 ms/step of VPU time in the pair layout).

    Apply together with the other load-time fusions, BEFORE quantization;
    the caller must run the model with `rope_layout="split"`. V and the
    output projections are untouched (attention logits are invariant under
    a consistent q/k/table permutation)."""
    import numpy as np

    from ..models.flux.rope import rope_split_perm

    perm = rope_split_perm(head_dim)

    def perm_cols(p: dict, col_slice: tuple[int, int] | None = None) -> dict:
        """Permute within each head of the output (last) axis of w/b."""
        w = p["w"]
        n_out = w.shape[-1] if col_slice is None else col_slice[1] - col_slice[0]
        n_heads = n_out // head_dim
        base = 0 if col_slice is None else col_slice[0]
        idx = np.arange(w.shape[-1])
        for h in range(n_heads):
            idx[base + h * head_dim : base + (h + 1) * head_dim] = base + h * head_dim + perm
        out = {"w": jnp.take(w, jnp.asarray(idx), axis=-1)}
        if "b" in p:
            out["b"] = jnp.take(p["b"], jnp.asarray(idx), axis=-1)
        return out

    def do_attn(attn: dict, hidden: int) -> dict:
        attn = dict(attn)
        for pref in ("", "txt_"):
            if pref + "qkv" in attn:  # permute q and k thirds
                attn[pref + "qkv"] = perm_cols(
                    perm_cols(attn[pref + "qkv"], (0, hidden)), (hidden, 2 * hidden)
                )
            elif pref + "q" in attn and "w" in attn[pref + "q"]:
                attn[pref + "q"] = perm_cols(attn[pref + "q"])
                attn[pref + "k"] = perm_cols(attn[pref + "k"])
            if pref + "q_norm" in attn:
                for nk in (pref + "q_norm", pref + "k_norm"):
                    attn[nk] = {"scale": jnp.take(attn[nk]["scale"], jnp.asarray(perm), axis=-1)}
        return attn

    out = dict(params)
    for family in ("double_blocks", "single_blocks"):
        if family not in out:
            continue
        blocks = dict(out[family])
        hidden = None
        for probe in ("in_proj", "mod", "img_mod"):
            if probe in blocks and "w" in blocks[probe]:
                hidden = blocks[probe]["w"].shape[-2]
                break
        if hidden is None:
            # No float projection panels: the tree is already quantized, so a
            # silent no-op here would let the caller run split-layout rotation
            # on unpermuted q/k weights (silently wrong outputs).
            raise ValueError(
                "permute_rope_layout: no float q/k panels found in "
                f"{family!r} — apply load-time fusions BEFORE quantization"
            )
        if "in_proj" in blocks:  # fused single layout: q/k are the first thirds
            p1 = perm_cols(blocks["in_proj"], (0, hidden))
            blocks["in_proj"] = perm_cols(p1, (hidden, 2 * hidden))
        blocks["attn"] = do_attn(blocks["attn"], hidden)
        out[family] = blocks
    return out

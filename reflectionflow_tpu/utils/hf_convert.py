"""HF state-dict -> framework param-tree converters.

Pure numpy-in / numpy-out mappings. Used both for loading real published
weights (FLUX.1-dev, T5-XXL, CLIP-L, Qwen2.5-VL safetensors from a local
snapshot) and for golden-parity tests that convert *random* torch weights
and compare activations.

Torch Linear stores (out, in); we store (in, out) -> every weight is
transposed. Per-block params are stacked on a leading axis for `lax.scan`.
"""

from __future__ import annotations

import numpy as np

from ..config import (
    CLIPTextConfig,
    FluxDiTConfig,
    FluxVAEConfig,
    QwenLMConfig,
    QwenVLVisionConfig,
    SiglipVisionConfig,
    T5Config,
)


def _lin(sd, name):
    p = {"w": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    else:
        p["b"] = np.zeros(p["w"].shape[1], p["w"].dtype)
    return p


def _lin_nobias(sd, name):
    return {"w": np.ascontiguousarray(sd[f"{name}.weight"].T)}


def _stack(blocks: list[dict]) -> dict:
    """list of per-block trees -> one tree with stacked leaves."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


# ---------------------------------------------------------------------------
# T5 encoder
# ---------------------------------------------------------------------------


def convert_t5_state(sd: dict[str, np.ndarray], cfg: T5Config) -> dict:
    blocks = []
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}"
        blocks.append(
            {
                "ln1": {"scale": sd[f"{b}.layer.0.layer_norm.weight"]},
                "q": _lin_nobias(sd, f"{b}.layer.0.SelfAttention.q"),
                "k": _lin_nobias(sd, f"{b}.layer.0.SelfAttention.k"),
                "v": _lin_nobias(sd, f"{b}.layer.0.SelfAttention.v"),
                "o": _lin_nobias(sd, f"{b}.layer.0.SelfAttention.o"),
                "ln2": {"scale": sd[f"{b}.layer.1.layer_norm.weight"]},
                "wi0": _lin_nobias(sd, f"{b}.layer.1.DenseReluDense.wi_0"),
                "wi1": _lin_nobias(sd, f"{b}.layer.1.DenseReluDense.wi_1"),
                "wo": _lin_nobias(sd, f"{b}.layer.1.DenseReluDense.wo"),
            }
        )
    embed_key = "shared.weight" if "shared.weight" in sd else "encoder.embed_tokens.weight"
    return {
        "embed": sd[embed_key],
        "rel_bias": sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"],
        "blocks": _stack(blocks),
        "final_ln": {"scale": sd["encoder.final_layer_norm.weight"]},
    }


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------


def convert_clip_text_state(sd: dict[str, np.ndarray], cfg: CLIPTextConfig) -> dict:
    pre = "text_model."
    blocks = []
    for i in range(cfg.num_layers):
        b = f"{pre}encoder.layers.{i}"
        blocks.append(
            {
                "ln1": {"scale": sd[f"{b}.layer_norm1.weight"], "bias": sd[f"{b}.layer_norm1.bias"]},
                "q": _lin(sd, f"{b}.self_attn.q_proj"),
                "k": _lin(sd, f"{b}.self_attn.k_proj"),
                "v": _lin(sd, f"{b}.self_attn.v_proj"),
                "o": _lin(sd, f"{b}.self_attn.out_proj"),
                "ln2": {"scale": sd[f"{b}.layer_norm2.weight"], "bias": sd[f"{b}.layer_norm2.bias"]},
                "fc1": _lin(sd, f"{b}.mlp.fc1"),
                "fc2": _lin(sd, f"{b}.mlp.fc2"),
            }
        )
    return {
        "tok_embed": sd[f"{pre}embeddings.token_embedding.weight"],
        "pos_embed": sd[f"{pre}embeddings.position_embedding.weight"],
        "blocks": _stack(blocks),
        "final_ln": {
            "scale": sd[f"{pre}final_layer_norm.weight"],
            "bias": sd[f"{pre}final_layer_norm.bias"],
        },
    }


# ---------------------------------------------------------------------------
# FLUX DiT (diffusers FluxTransformer2DModel checkpoint layout)
# ---------------------------------------------------------------------------


def convert_flux_dit_state(sd: dict[str, np.ndarray], cfg: FluxDiTConfig) -> dict:
    """diffusers FluxTransformer2DModel state dict -> our param tree."""

    def rms(name):
        return {"scale": sd[f"{name}.weight"]}

    doubles = []
    for i in range(cfg.num_double_blocks):
        b = f"transformer_blocks.{i}"
        doubles.append(
            {
                "img_mod": _lin(sd, f"{b}.norm1.linear"),
                "txt_mod": _lin(sd, f"{b}.norm1_context.linear"),
                "attn": {
                    "q": _lin(sd, f"{b}.attn.to_q"),
                    "k": _lin(sd, f"{b}.attn.to_k"),
                    "v": _lin(sd, f"{b}.attn.to_v"),
                    "q_norm": rms(f"{b}.attn.norm_q"),
                    "k_norm": rms(f"{b}.attn.norm_k"),
                    "txt_q": _lin(sd, f"{b}.attn.add_q_proj"),
                    "txt_k": _lin(sd, f"{b}.attn.add_k_proj"),
                    "txt_v": _lin(sd, f"{b}.attn.add_v_proj"),
                    "txt_q_norm": rms(f"{b}.attn.norm_added_q"),
                    "txt_k_norm": rms(f"{b}.attn.norm_added_k"),
                    "out": _lin(sd, f"{b}.attn.to_out.0"),
                    "txt_out": _lin(sd, f"{b}.attn.to_add_out"),
                },
                "img_mlp": {"fc1": _lin(sd, f"{b}.ff.net.0.proj"), "fc2": _lin(sd, f"{b}.ff.net.2")},
                "txt_mlp": {
                    "fc1": _lin(sd, f"{b}.ff_context.net.0.proj"),
                    "fc2": _lin(sd, f"{b}.ff_context.net.2"),
                },
            }
        )
    singles = []
    for i in range(cfg.num_single_blocks):
        b = f"single_transformer_blocks.{i}"
        singles.append(
            {
                "mod": _lin(sd, f"{b}.norm.linear"),
                "attn": {
                    "q": _lin(sd, f"{b}.attn.to_q"),
                    "k": _lin(sd, f"{b}.attn.to_k"),
                    "v": _lin(sd, f"{b}.attn.to_v"),
                    "q_norm": rms(f"{b}.attn.norm_q"),
                    "k_norm": rms(f"{b}.attn.norm_k"),
                },
                "mlp_in": _lin(sd, f"{b}.proj_mlp"),
                "out": _lin(sd, f"{b}.proj_out"),
            }
        )
    params = {
        "img_in": _lin(sd, "x_embedder"),
        "txt_in": _lin(sd, "context_embedder"),
        "time_in": {
            "fc1": _lin(sd, "time_text_embed.timestep_embedder.linear_1"),
            "fc2": _lin(sd, "time_text_embed.timestep_embedder.linear_2"),
        },
        "vector_in": {
            "fc1": _lin(sd, "time_text_embed.text_embedder.linear_1"),
            "fc2": _lin(sd, "time_text_embed.text_embedder.linear_2"),
        },
        "final_mod": _lin(sd, "norm_out.linear"),
        "final_proj": _lin(sd, "proj_out"),
        "double_blocks": _stack(doubles),
        "single_blocks": _stack(singles),
    }
    if cfg.guidance_embeds:
        params["guidance_in"] = {
            "fc1": _lin(sd, "time_text_embed.guidance_embedder.linear_1"),
            "fc2": _lin(sd, "time_text_embed.guidance_embedder.linear_2"),
        }
    return params


# ---------------------------------------------------------------------------
# FLUX VAE (diffusers AutoencoderKL checkpoint layout)
# ---------------------------------------------------------------------------


def _conv(sd, name):
    # torch conv weight (O, I, kh, kw) -> HWIO
    return {"w": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0)), "b": sd[f"{name}.bias"]}


def _gn(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _resnet(sd, name):
    p = {
        "norm1": _gn(sd, f"{name}.norm1"),
        "conv1": _conv(sd, f"{name}.conv1"),
        "norm2": _gn(sd, f"{name}.norm2"),
        "conv2": _conv(sd, f"{name}.conv2"),
    }
    if f"{name}.conv_shortcut.weight" in sd:
        p["shortcut"] = _conv(sd, f"{name}.conv_shortcut")
    return p


def _vae_attn(sd, name):
    def lin_as_conv(n):
        w = sd[f"{n}.weight"]
        if w.ndim == 2:  # newer diffusers store attention as Linear
            w = w[:, :, None, None]
        return {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)), "b": sd[f"{n}.bias"]}

    return {
        "norm": _gn(sd, f"{name}.group_norm"),
        "q": lin_as_conv(f"{name}.to_q"),
        "k": lin_as_conv(f"{name}.to_k"),
        "v": lin_as_conv(f"{name}.to_v"),
        "out": lin_as_conv(f"{name}.to_out.0"),
    }


def _mid(sd, name):
    return {
        "res1": _resnet(sd, f"{name}.resnets.0"),
        "attn": _vae_attn(sd, f"{name}.attentions.0"),
        "res2": _resnet(sd, f"{name}.resnets.1"),
    }


def convert_flux_vae_state(sd: dict[str, np.ndarray], cfg: FluxVAEConfig) -> dict:
    n_blocks = len(cfg.block_out_channels)
    down = []
    for i in range(n_blocks):
        b = f"encoder.down_blocks.{i}"
        block = {"resnets": [_resnet(sd, f"{b}.resnets.{j}") for j in range(cfg.layers_per_block)]}
        if f"{b}.downsamplers.0.conv.weight" in sd:
            block["down"] = _conv(sd, f"{b}.downsamplers.0.conv")
        down.append(block)
    up = []
    for i in range(n_blocks):
        b = f"decoder.up_blocks.{i}"
        block = {"resnets": [_resnet(sd, f"{b}.resnets.{j}") for j in range(cfg.layers_per_block + 1)]}
        if f"{b}.upsamplers.0.conv.weight" in sd:
            block["up"] = _conv(sd, f"{b}.upsamplers.0.conv")
        up.append(block)
    return {
        "encoder": {
            "conv_in": _conv(sd, "encoder.conv_in"),
            "down": down,
            "mid": _mid(sd, "encoder.mid_block"),
            "norm_out": _gn(sd, "encoder.conv_norm_out"),
            "conv_out": _conv(sd, "encoder.conv_out"),
        },
        "decoder": {
            "conv_in": _conv(sd, "decoder.conv_in"),
            "mid": _mid(sd, "decoder.mid_block"),
            "up": up,
            "norm_out": _gn(sd, "decoder.conv_norm_out"),
            "conv_out": _conv(sd, "decoder.conv_out"),
        },
    }


# ---------------------------------------------------------------------------
# Qwen2.5-VL (language model + vision tower)
# ---------------------------------------------------------------------------


def _normalize_qwen_keys(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Accept both transformers layouts: `model.layers...`/`visual...` and
    the newer `model.language_model.layers...`/`model.visual...`."""
    out = {}
    for k, v in sd.items():
        k = k.replace("model.language_model.", "model.")
        k = k.replace("model.visual.", "visual.")
        out[k] = v
    return out


def convert_qwen_lm_state(sd: dict[str, np.ndarray], cfg: QwenLMConfig) -> dict:
    sd = _normalize_qwen_keys(sd)
    blocks = []
    for i in range(cfg.num_layers):
        b = f"model.layers.{i}"
        blocks.append(
            {
                "ln1": {"scale": sd[f"{b}.input_layernorm.weight"]},
                "q": _lin(sd, f"{b}.self_attn.q_proj"),
                "k": _lin(sd, f"{b}.self_attn.k_proj"),
                "v": _lin(sd, f"{b}.self_attn.v_proj"),
                "o": _lin_nobias(sd, f"{b}.self_attn.o_proj"),
                "ln2": {"scale": sd[f"{b}.post_attention_layernorm.weight"]},
                "gate": _lin_nobias(sd, f"{b}.mlp.gate_proj"),
                "up": _lin_nobias(sd, f"{b}.mlp.up_proj"),
                "down": _lin_nobias(sd, f"{b}.mlp.down_proj"),
            }
        )
    params = {
        "embed": sd["model.embed_tokens.weight"],
        "blocks": _stack(blocks),
        "final_ln": {"scale": sd["model.norm.weight"]},
    }
    if "lm_head.weight" in sd and not cfg.tie_word_embeddings:
        params["lm_head"] = _lin_nobias(sd, "lm_head")
    return params


def convert_qwen_vision_state(sd: dict[str, np.ndarray], cfg: QwenVLVisionConfig) -> dict:
    sd = _normalize_qwen_keys(sd)
    # conv3d (O, 3, tp, ps, ps) -> (3*tp*ps*ps, O), feature order (c, t, h, w)
    conv_w = sd["visual.patch_embed.proj.weight"]
    patch_w = conv_w.reshape(conv_w.shape[0], -1).T
    blocks = []
    for i in range(cfg.depth):
        b = f"visual.blocks.{i}"
        blocks.append(
            {
                "ln1": {"scale": sd[f"{b}.norm1.weight"]},
                "qkv": _lin(sd, f"{b}.attn.qkv"),
                "proj": _lin(sd, f"{b}.attn.proj"),
                "ln2": {"scale": sd[f"{b}.norm2.weight"]},
                "gate": _lin(sd, f"{b}.mlp.gate_proj"),
                "up": _lin(sd, f"{b}.mlp.up_proj"),
                "down": _lin(sd, f"{b}.mlp.down_proj"),
            }
        )
    return {
        "patch_embed": {"w": np.ascontiguousarray(patch_w)},
        "blocks": _stack(blocks),
        "merger": {
            "ln_q": {"scale": sd["visual.merger.ln_q.weight"]},
            "fc1": _lin(sd, "visual.merger.mlp.0"),
            "fc2": _lin(sd, "visual.merger.mlp.2"),
        },
    }


# ---------------------------------------------------------------------------
# SigLIP vision tower + NVILA projector (the NVILA verifier's pieces —
# checkpoint layout: VILA releases store llm/, vision_tower/, mm_projector/
# as separate standard-HF subdirs; /root/reference/tts/verifiers/
# nvila_verifier.py:4-10 loads the bundle via trust_remote_code)
# ---------------------------------------------------------------------------


def convert_siglip_state(sd: dict[str, np.ndarray], cfg: SiglipVisionConfig) -> dict:
    """transformers `SiglipVisionModel` state dict -> siglip.py tree.
    Accepts keys with or without the `vision_model.` prefix."""
    if any(k.startswith("vision_model.") for k in sd):
        sd = {k[len("vision_model."):]: v for k, v in sd.items() if k.startswith("vision_model.")}
    conv_w = sd["embeddings.patch_embedding.weight"]  # (H, 3, P, P)
    blocks = []
    for i in range(cfg.num_layers):
        b = f"encoder.layers.{i}"
        blocks.append(
            {
                "ln1": {"scale": sd[f"{b}.layer_norm1.weight"], "bias": sd[f"{b}.layer_norm1.bias"]},
                "q": _lin(sd, f"{b}.self_attn.q_proj"),
                "k": _lin(sd, f"{b}.self_attn.k_proj"),
                "v": _lin(sd, f"{b}.self_attn.v_proj"),
                "o": _lin(sd, f"{b}.self_attn.out_proj"),
                "ln2": {"scale": sd[f"{b}.layer_norm2.weight"], "bias": sd[f"{b}.layer_norm2.bias"]},
                "fc1": _lin(sd, f"{b}.mlp.fc1"),
                "fc2": _lin(sd, f"{b}.mlp.fc2"),
            }
        )
    return {
        "patch_embed": {
            # (H, 3, P, P) -> (3*P*P, H), feature order (c, ph, pw) matching
            # siglip.patchify_images
            "w": np.ascontiguousarray(conv_w.reshape(conv_w.shape[0], -1).T),
            "b": sd["embeddings.patch_embedding.bias"],
        },
        "pos_embed": sd["embeddings.position_embedding.weight"],
        "blocks": _stack(blocks),
        "post_ln": {"scale": sd["post_layernorm.weight"], "bias": sd["post_layernorm.bias"]},
    }


def convert_nvila_projector_state(sd: dict[str, np.ndarray]) -> dict:
    """VILA `mm_projector/` state dict -> projector tree.

    The torch module is `nn.Sequential(DownSampleBlock(), LayerNorm,
    Linear, GELU, Linear)` saved as `layers.{1,2,4}.*` (the downsample and
    GELU are parameter-free). Also accepts the plain-`mlp` layout
    (`layers.{0,2}.*` = Linear, GELU, Linear — no LN, no downsample)."""
    sd = {k.removeprefix("mm_projector."): v for k, v in sd.items()}
    if "layers.1.weight" in sd:  # mlp_downsample[_3x3_fix]
        return {
            "ln": {"scale": sd["layers.1.weight"], "bias": sd["layers.1.bias"]},
            "fc1": _lin(sd, "layers.2"),
            "fc2": _lin(sd, "layers.4"),
        }
    return {"fc1": _lin(sd, "layers.0"), "fc2": _lin(sd, "layers.2")}

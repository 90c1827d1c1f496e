"""Load published HF snapshots (local dirs, no network) into param trees.

Directory layouts follow the HF hubs the reference points at:
  * FLUX.1-dev: `transformer/`, `vae/`, `text_encoder/` (CLIP),
    `text_encoder_2/` (T5), `tokenizer/`, `tokenizer_2/`;
  * Qwen2.5-VL: flat safetensors shards + config.json + tokenizer files.

Everything streams shard-by-shard through numpy to bound host memory.
"""

from __future__ import annotations

import glob
import json
import os

import jax.numpy as jnp
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
from . import hf_convert


def load_safetensors_dir(path: str) -> dict[str, np.ndarray]:
    """All tensors from every *.safetensors under `path` (flat key space)."""
    from safetensors.numpy import load_file

    sd: dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors found under {path}")
    for f in files:
        sd.update(load_file(f))
    return sd


def _read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# FLUX
# ---------------------------------------------------------------------------


def flux_dit_config_from_json(cfg_json: dict) -> FluxDiTConfig:
    return FluxDiTConfig(
        in_channels=cfg_json.get("in_channels", 64),
        hidden_size=cfg_json.get("num_attention_heads", 24) * cfg_json.get("attention_head_dim", 128),
        num_heads=cfg_json.get("num_attention_heads", 24),
        head_dim=cfg_json.get("attention_head_dim", 128),
        num_double_blocks=cfg_json.get("num_layers", 19),
        num_single_blocks=cfg_json.get("num_single_layers", 38),
        text_dim=cfg_json.get("joint_attention_dim", 4096),
        pooled_dim=cfg_json.get("pooled_projection_dim", 768),
        axes_dims_rope=tuple(cfg_json.get("axes_dims_rope", (16, 56, 56))),
        guidance_embeds=cfg_json.get("guidance_embeds", True),
    )


def load_flux_pipeline(cls, model_dir: str, dtype=jnp.bfloat16, components: tuple[str, ...] | None = None):
    """Build a FluxPipeline (cls) from a local FLUX.1 snapshot dir."""
    from ..utils.tokenizers import load_tokenizer
    from ..utils.tree import cast_tree

    dit_json = _read_json(os.path.join(model_dir, "transformer", "config.json"))
    dit_cfg = flux_dit_config_from_json(dit_json)
    vae_json = _read_json(os.path.join(model_dir, "vae", "config.json"))
    vae_cfg = FluxVAEConfig(
        in_channels=vae_json.get("in_channels", 3),
        latent_channels=vae_json.get("latent_channels", 16),
        block_out_channels=tuple(vae_json.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=vae_json.get("layers_per_block", 2),
        norm_num_groups=vae_json.get("norm_num_groups", 32),
        scaling_factor=vae_json.get("scaling_factor", 0.3611),
        shift_factor=vae_json.get("shift_factor", 0.1159),
    )
    t5_json = _read_json(os.path.join(model_dir, "text_encoder_2", "config.json"))
    t5_cfg = T5Config(
        vocab_size=t5_json["vocab_size"],
        d_model=t5_json["d_model"],
        d_kv=t5_json["d_kv"],
        d_ff=t5_json["d_ff"],
        num_layers=t5_json["num_layers"],
        num_heads=t5_json["num_heads"],
    )
    clip_json = _read_json(os.path.join(model_dir, "text_encoder", "config.json"))
    clip_cfg = CLIPTextConfig(
        vocab_size=clip_json["vocab_size"],
        hidden_size=clip_json["hidden_size"],
        intermediate_size=clip_json["intermediate_size"],
        num_layers=clip_json["num_hidden_layers"],
        num_heads=clip_json["num_attention_heads"],
        max_position_embeddings=clip_json["max_position_embeddings"],
        eos_token_id=clip_json.get("eos_token_id", 2),
    )

    params = {
        "dit": hf_convert.convert_flux_dit_state(
            load_safetensors_dir(os.path.join(model_dir, "transformer")), dit_cfg
        ),
        "vae": hf_convert.convert_flux_vae_state(
            load_safetensors_dir(os.path.join(model_dir, "vae")), vae_cfg
        ),
        "t5": hf_convert.convert_t5_state(
            load_safetensors_dir(os.path.join(model_dir, "text_encoder_2")), t5_cfg
        ),
        "clip": hf_convert.convert_clip_text_state(
            load_safetensors_dir(os.path.join(model_dir, "text_encoder")), clip_cfg
        ),
    }
    params = cast_tree(params, dtype)
    return cls(
        dit_cfg=dit_cfg,
        vae_cfg=vae_cfg,
        t5_cfg=t5_cfg,
        clip_cfg=clip_cfg,
        params=params,
        t5_tokenizer=load_tokenizer(os.path.join(model_dir, "tokenizer_2"), "t5", t5_cfg.vocab_size, 1),
        clip_tokenizer=load_tokenizer(os.path.join(model_dir, "tokenizer"), "clip", clip_cfg.vocab_size, clip_cfg.eos_token_id),
        dtype=dtype,
    )


# ---------------------------------------------------------------------------
# Qwen2.5-VL
# ---------------------------------------------------------------------------


def qwen_configs_from_json(cfg_json: dict) -> tuple[QwenLMConfig, QwenVLVisionConfig]:
    text = cfg_json.get("text_config", cfg_json)
    vis = cfg_json["vision_config"]
    lm_cfg = QwenLMConfig(
        vocab_size=text["vocab_size"],
        hidden_size=text["hidden_size"],
        intermediate_size=text["intermediate_size"],
        num_layers=text["num_hidden_layers"],
        num_heads=text["num_attention_heads"],
        num_kv_heads=text["num_key_value_heads"],
        head_dim=text["hidden_size"] // text["num_attention_heads"],
        rope_theta=text.get("rope_theta", 1000000.0),
        mrope_section=tuple(text.get("rope_scaling", {}).get("mrope_section", (16, 24, 24))),
        tie_word_embeddings=text.get("tie_word_embeddings", False),
    )
    vis_cfg = QwenVLVisionConfig(
        depth=vis["depth"],
        hidden_size=vis["hidden_size"],
        intermediate_size=vis["intermediate_size"],
        num_heads=vis["num_heads"],
        patch_size=vis["patch_size"],
        temporal_patch_size=vis["temporal_patch_size"],
        spatial_merge_size=vis["spatial_merge_size"],
        window_size=vis["window_size"],
        fullatt_block_indexes=tuple(vis["fullatt_block_indexes"]),
        out_hidden_size=vis["out_hidden_size"],
    )
    return lm_cfg, vis_cfg


def load_qwen_vl(model_dir: str, dtype=jnp.bfloat16):
    """-> (QwenVLModel, tokenizer)."""
    from ..models.qwen_vl.model import QwenVLModel
    from ..utils.tree import cast_tree

    cfg_json = _read_json(os.path.join(model_dir, "config.json"))
    lm_cfg, vis_cfg = qwen_configs_from_json(cfg_json)
    sd = load_safetensors_dir(model_dir)
    lm_params = cast_tree(hf_convert.convert_qwen_lm_state(sd, lm_cfg), dtype)
    vis_params = cast_tree(hf_convert.convert_qwen_vision_state(sd, vis_cfg), dtype)
    tokenizer = None
    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_dir, local_files_only=True)
    except Exception:
        pass
    model = QwenVLModel(lm_params, vis_params, lm_cfg, vis_cfg, dtype=dtype)
    return model, tokenizer


# ---------------------------------------------------------------------------
# NVILA (VILA-family bundle: llm/ + vision_tower/ + mm_projector/ subdirs)
# ---------------------------------------------------------------------------

_PROJECTOR_DOWNSAMPLE = {
    "mlp": 1,
    "mlp_downsample": 2,
    "mlp_downsample_2x2_fix": 2,
    "mlp_downsample_3x3": 3,
    "mlp_downsample_3x3_fix": 3,
}


def qwen2_lm_config_from_json(cfg_json: dict) -> QwenLMConfig:
    """Plain Qwen2/Qwen2.5 CausalLM config (no vision_config) — the `llm/`
    half of a VILA bundle. 1-D RoPE is expressed as an M-RoPE whose first
    section spans the whole frequency axis (exactly standard rotate-half)."""
    head_dim = cfg_json.get("head_dim") or cfg_json["hidden_size"] // cfg_json["num_attention_heads"]
    return QwenLMConfig(
        vocab_size=cfg_json["vocab_size"],
        hidden_size=cfg_json["hidden_size"],
        intermediate_size=cfg_json["intermediate_size"],
        num_layers=cfg_json["num_hidden_layers"],
        num_heads=cfg_json["num_attention_heads"],
        num_kv_heads=cfg_json["num_key_value_heads"],
        head_dim=head_dim,
        rope_theta=cfg_json.get("rope_theta", 1000000.0),
        rms_norm_eps=cfg_json.get("rms_norm_eps", 1e-6),
        mrope_section=(head_dim // 2, 0, 0),
        tie_word_embeddings=cfg_json.get("tie_word_embeddings", False),
    )


def siglip_config_from_json(cfg_json: dict) -> SiglipVisionConfig:
    v = cfg_json.get("vision_config", cfg_json)
    return SiglipVisionConfig(
        hidden_size=v["hidden_size"],
        intermediate_size=v["intermediate_size"],
        num_layers=v["num_hidden_layers"],
        num_heads=v["num_attention_heads"],
        patch_size=v["patch_size"],
        image_size=v["image_size"],
        layer_norm_eps=v.get("layer_norm_eps", 1e-6),
    )


def load_nvila(model_dir: str, dtype=jnp.bfloat16):
    """VILA checkpoint bundle -> NvilaModel (the reference loads the same
    bundle through `trust_remote_code`,
    /root/reference/tts/verifiers/nvila_verifier.py:4-10).

    Expects the released layout: `llm/` (standard Qwen2ForCausalLM +
    tokenizer), `vision_tower/` (standard SiglipVisionModel),
    `mm_projector/` (Sequential with `layers.{1,2,4}` = LN/Linear/Linear).
    Projector compression and tower tap come from the configs
    (`mm_projector_type`, root `mm_vision_select_layer`, default -2)."""
    from ..config import NvilaConfig
    from ..models.nvila.model import NvilaModel
    from .tree import cast_tree

    root_cfg = {}
    root_cfg_path = os.path.join(model_dir, "config.json")
    if os.path.exists(root_cfg_path):
        root_cfg = _read_json(root_cfg_path)

    lm_dir = os.path.join(model_dir, "llm")
    vis_dir = os.path.join(model_dir, "vision_tower")
    proj_dir = os.path.join(model_dir, "mm_projector")
    lm_cfg = qwen2_lm_config_from_json(_read_json(os.path.join(lm_dir, "config.json")))
    vis_cfg = siglip_config_from_json(_read_json(os.path.join(vis_dir, "config.json")))

    proj_type = root_cfg.get("mm_projector", "mlp_downsample_3x3_fix")
    proj_cfg_path = os.path.join(proj_dir, "config.json")
    if os.path.exists(proj_cfg_path):
        proj_type = _read_json(proj_cfg_path).get("mm_projector_type", proj_type)
    if isinstance(proj_type, dict):  # some releases nest {"mm_projector_type": ...}
        proj_type = proj_type.get("mm_projector_type", "mlp_downsample_3x3_fix")
    try:
        downsample = _PROJECTOR_DOWNSAMPLE[proj_type]
    except KeyError:
        raise ValueError(f"unsupported mm_projector type: {proj_type!r}") from None

    lm_params = cast_tree(
        hf_convert.convert_qwen_lm_state(load_safetensors_dir(lm_dir), lm_cfg), dtype
    )
    vis_params = cast_tree(
        hf_convert.convert_siglip_state(load_safetensors_dir(vis_dir), vis_cfg), dtype
    )
    proj_params = cast_tree(
        hf_convert.convert_nvila_projector_state(load_safetensors_dir(proj_dir)), dtype
    )

    tokenizer = None
    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(lm_dir, local_files_only=True)
    except Exception:
        pass

    cfg = NvilaConfig(
        select_layer=root_cfg.get("mm_vision_select_layer", -2), downsample=downsample
    )
    return NvilaModel(
        vis_params=vis_params, proj_params=proj_params, lm_params=lm_params,
        vis_cfg=vis_cfg, lm_cfg=lm_cfg, cfg=cfg, tokenizer=tokenizer,
    )

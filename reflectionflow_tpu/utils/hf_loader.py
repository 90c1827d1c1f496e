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
        latent_channels=vae_json.get("latent_channels", 16),
        block_out_channels=tuple(vae_json.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=vae_json.get("layers_per_block", 2),
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

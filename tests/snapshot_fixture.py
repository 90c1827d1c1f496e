"""Tiny HF-layout FLUX snapshot on disk — the hermetic stand-in for a real
FLUX.1 checkpoint directory.

Builds the torch/transformers reference modules the converter suites are
parity-tested against (`torch_flux_ref.TorchFluxRef`,
`torch_flux_vae_ref.TorchFluxVAERef`, transformers T5/CLIP) at tiny widths
and writes their state dicts as `*.safetensors` + `config.json` in the
diffusers component layout `load_flux_pipeline` expects
(transformer/ vae/ text_encoder/ text_encoder_2/). This makes
`FluxPipeline.from_pretrained` and `tools/parity_real_weights.py` — the
weights-day turn-key paths — testable with no weights in the image.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np


def _save(sd: dict, dirpath: str, cfg_json: dict) -> None:
    from safetensors.numpy import save_file

    os.makedirs(dirpath, exist_ok=True)
    # safetensors ignores strides — contiguity before save (CLAUDE.md rule)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              os.path.join(dirpath, "model.safetensors"))
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(cfg_json, f)


def write_tiny_flux_snapshot(root: str):
    """-> (dit_cfg, vae_cfg, t5_cfg, clip_cfg) written under `root`."""
    import torch
    import transformers

    from reflectionflow_tpu.config import (
        CLIPTextConfig, FluxDiTConfig, FluxVAEConfig, T5Config,
    )

    from torch_flux_ref import TorchFluxRef
    from torch_flux_vae_ref import TorchFluxVAERef

    # time_freq_dim is not a diffusers config key (fixed 256 upstream) —
    # the snapshot must use the loader's default so shapes agree
    dit_cfg = dataclasses.replace(FluxDiTConfig.tiny(), time_freq_dim=256)
    vae_cfg = FluxVAEConfig.tiny()
    t5_cfg = T5Config.tiny()
    clip_cfg = CLIPTextConfig.tiny()

    torch.manual_seed(0)
    dit = TorchFluxRef(
        in_channels=dit_cfg.in_channels, hidden=dit_cfg.hidden_size,
        heads=dit_cfg.num_heads, head_dim=dit_cfg.head_dim,
        mlp_hidden=dit_cfg.mlp_hidden, n_double=dit_cfg.num_double_blocks,
        n_single=dit_cfg.num_single_blocks, text_dim=dit_cfg.text_dim,
        pooled_dim=dit_cfg.pooled_dim, axes_dims=dit_cfg.axes_dims_rope,
        time_freq_dim=dit_cfg.time_freq_dim, guidance_embeds=dit_cfg.guidance_embeds,
    ).eval()
    with torch.no_grad():  # break near-zero bias symmetry (real-weight-like)
        for p in dit.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    _save(
        {k: v.detach().numpy() for k, v in dit.state_dict().items()},
        os.path.join(root, "transformer"),
        {
            "in_channels": dit_cfg.in_channels,
            "num_attention_heads": dit_cfg.num_heads,
            "attention_head_dim": dit_cfg.head_dim,
            "num_layers": dit_cfg.num_double_blocks,
            "num_single_layers": dit_cfg.num_single_blocks,
            "joint_attention_dim": dit_cfg.text_dim,
            "pooled_projection_dim": dit_cfg.pooled_dim,
            "axes_dims_rope": list(dit_cfg.axes_dims_rope),
            "guidance_embeds": dit_cfg.guidance_embeds,
        },
    )

    vae = TorchFluxVAERef(
        in_channels=vae_cfg.in_channels, latent_channels=vae_cfg.latent_channels,
        block_out_channels=vae_cfg.block_out_channels,
        layers_per_block=vae_cfg.layers_per_block,
        norm_num_groups=vae_cfg.norm_num_groups,
        scaling_factor=vae_cfg.scaling_factor, shift_factor=vae_cfg.shift_factor,
    ).eval()
    _save(
        {k: v.detach().numpy() for k, v in vae.state_dict().items()},
        os.path.join(root, "vae"),
        {
            "in_channels": vae_cfg.in_channels,
            "latent_channels": vae_cfg.latent_channels,
            "block_out_channels": list(vae_cfg.block_out_channels),
            "layers_per_block": vae_cfg.layers_per_block,
            "norm_num_groups": vae_cfg.norm_num_groups,
            "scaling_factor": vae_cfg.scaling_factor,
            "shift_factor": vae_cfg.shift_factor,
        },
    )

    t5 = transformers.T5EncoderModel(transformers.T5Config(
        vocab_size=t5_cfg.vocab_size, d_model=t5_cfg.d_model, d_kv=t5_cfg.d_kv,
        d_ff=t5_cfg.d_ff, num_layers=t5_cfg.num_layers, num_heads=t5_cfg.num_heads,
        relative_attention_num_buckets=t5_cfg.relative_attention_num_buckets,
        relative_attention_max_distance=t5_cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
    )).eval()
    _save(
        {k: v.numpy() for k, v in t5.state_dict().items()},
        os.path.join(root, "text_encoder_2"),
        {"vocab_size": t5_cfg.vocab_size, "d_model": t5_cfg.d_model,
         "d_kv": t5_cfg.d_kv, "d_ff": t5_cfg.d_ff,
         "num_layers": t5_cfg.num_layers, "num_heads": t5_cfg.num_heads},
    )

    clip = transformers.CLIPTextModel(transformers.CLIPTextConfig(
        vocab_size=clip_cfg.vocab_size, hidden_size=clip_cfg.hidden_size,
        intermediate_size=clip_cfg.intermediate_size,
        num_hidden_layers=clip_cfg.num_layers, num_attention_heads=clip_cfg.num_heads,
        max_position_embeddings=clip_cfg.max_position_embeddings,
        hidden_act="quick_gelu", eos_token_id=clip_cfg.eos_token_id,
        bos_token_id=0, pad_token_id=1,
    )).eval()
    _save(
        {k: v.numpy() for k, v in clip.state_dict().items()},
        os.path.join(root, "text_encoder"),
        {"vocab_size": clip_cfg.vocab_size, "hidden_size": clip_cfg.hidden_size,
         "intermediate_size": clip_cfg.intermediate_size,
         "num_hidden_layers": clip_cfg.num_layers,
         "num_attention_heads": clip_cfg.num_heads,
         "max_position_embeddings": clip_cfg.max_position_embeddings,
         "eos_token_id": clip_cfg.eos_token_id},
    )
    return dit_cfg, vae_cfg, t5_cfg, clip_cfg

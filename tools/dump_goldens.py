"""Golden-activation dumper — run in an environment WITH diffusers/torch+weights.

Produces `tests/goldens/*.npz` consumed by `tests/test_goldens.py` (which
skips when absent): fixed random inputs -> reference activations at fp32 for
the FLUX DiT, VAE decode, and text encoders. This is the activation-level
parity gate of SURVEY.md §7.3 item 1 for REAL weights; the hermetic
tiny-config parity tests cover the same code paths without weights.

Usage (on a GPU/CPU box with diffusers installed):
    python tools/dump_goldens.py --model_dir /path/to/FLUX.1-dev --out tests/goldens
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--out", default="tests/goldens")
    p.add_argument("--seq", type=int, default=64, help="image tokens (small grid for speed)")
    args = p.parse_args()

    import torch
    from diffusers import AutoencoderKL, FluxTransformer2DModel

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(0)

    # --- DiT forward ---
    dit = FluxTransformer2DModel.from_pretrained(
        os.path.join(args.model_dir, "transformer"), torch_dtype=torch.float32
    ).eval()
    B, L, Lt = 1, args.seq, 16
    side = int(np.sqrt(L))
    hidden = rng.standard_normal((B, L, 64)).astype(np.float32)
    txt = rng.standard_normal((B, Lt, 4096)).astype(np.float32)
    pooled = rng.standard_normal((B, 768)).astype(np.float32)
    img_ids = np.zeros((L, 3), np.float32)
    img_ids[:, 1] = np.repeat(np.arange(side), side)
    img_ids[:, 2] = np.tile(np.arange(side), side)
    txt_ids = np.zeros((Lt, 3), np.float32)
    with torch.no_grad():
        out = dit(
            hidden_states=torch.tensor(hidden),
            encoder_hidden_states=torch.tensor(txt),
            pooled_projections=torch.tensor(pooled),
            timestep=torch.tensor([0.5]),
            guidance=torch.tensor([3.5]),
            img_ids=torch.tensor(img_ids),
            txt_ids=torch.tensor(txt_ids),
            return_dict=False,
        )[0].numpy()
    np.savez(
        os.path.join(args.out, "flux_dit.npz"),
        hidden=hidden, txt=txt, pooled=pooled, img_ids=img_ids, txt_ids=txt_ids,
        timestep=np.array([0.5], np.float32), guidance=np.array([3.5], np.float32),
        expected=out,
    )
    print("dit golden:", out.shape)

    # --- VAE decode ---
    vae = AutoencoderKL.from_pretrained(os.path.join(args.model_dir, "vae"), torch_dtype=torch.float32).eval()
    lat = rng.standard_normal((1, 16, 8, 8)).astype(np.float32)
    with torch.no_grad():
        img = vae.decode(torch.tensor(lat) / vae.config.scaling_factor + vae.config.shift_factor).sample.numpy()
    np.savez(os.path.join(args.out, "flux_vae_decode.npz"), latents=lat, expected=img)
    print("vae golden:", img.shape)

    # --- text encoders ---
    from transformers import CLIPTextModel, T5EncoderModel

    t5 = T5EncoderModel.from_pretrained(os.path.join(args.model_dir, "text_encoder_2"), torch_dtype=torch.float32).eval()
    ids = rng.integers(3, 1000, (1, 16)).astype(np.int64)
    ids[0, -1] = 1
    with torch.no_grad():
        t5_out = t5(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    np.savez(os.path.join(args.out, "t5.npz"), input_ids=ids, expected=t5_out)

    clip = CLIPTextModel.from_pretrained(os.path.join(args.model_dir, "text_encoder"), torch_dtype=torch.float32).eval()
    cids = rng.integers(3, 1000, (1, 8)).astype(np.int64)
    cids[0, 0] = 49406
    cids[0, -1] = 49407
    with torch.no_grad():
        cout = clip(input_ids=torch.tensor(cids))
    np.savez(
        os.path.join(args.out, "clip.npz"),
        input_ids=cids, expected_hidden=cout.last_hidden_state.numpy(),
        expected_pooled=cout.pooler_output.numpy(),
    )
    print("text goldens written")


if __name__ == "__main__":
    main()

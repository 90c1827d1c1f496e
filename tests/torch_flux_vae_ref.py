"""Independent torch transcription of the FLUX AutoencoderKL — the parity
oracle for `models/flux/vae.py` + `utils/hf_convert.convert_flux_vae_state`.

Mirrors the math the reference delegates to diffusers' `AutoencoderKL`
(encode path `/root/reference/train_flux/flux/pipeline_tools.py:7-30`,
decode path `/root/reference/train_flux/flux/generate.py:298-307`):
encoder/decoder resnet stacks (GroupNorm(eps 1e-6) + SiLU), asymmetric-pad
stride-2 downsampling, nearest-2x upsampling, the single-head linear-QKV
mid-block attention, and the diagonal-Gaussian + shift/scale latent
contract. Parameter names follow the diffusers checkpoint layout
(`encoder.down_blocks.{i}.resnets.{j}.conv1...`) so `state_dict()` feeds
`convert_flux_vae_state` exactly like a real FLUX `vae/` safetensors file —
the conversion path itself is under test, not just the forward.

Written from the published FLUX VAE architecture (f8, 16 latent channels,
KL autoencoder); NOT copied from diffusers or the reference.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class ResnetBlock(nn.Module):
    def __init__(self, c_in: int, c_out: int, groups: int):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, c_in, eps=1e-6)
        self.conv1 = nn.Conv2d(c_in, c_out, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, c_out, eps=1e-6)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, padding=1)
        if c_in != c_out:
            self.conv_shortcut = nn.Conv2d(c_in, c_out, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class MidAttention(nn.Module):
    """Single-head spatial self-attention over flattened H*W tokens with a
    residual connection — the VAE mid-block attention. Q/K/V/out are Linear
    (the newer diffusers layout `convert_flux_vae_state` handles via its
    `lin_as_conv` 2D branch); the output projection sits at `to_out.0`
    (checkpoint layout: Linear inside a list with a dropout slot)."""

    def __init__(self, c: int, groups: int):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x)
        tokens = h.flatten(2).transpose(1, 2)  # (B, HW, C)
        q, k, v = self.to_q(tokens), self.to_k(tokens), self.to_v(tokens)
        logits = (q.float() @ k.float().transpose(1, 2)) / (C ** 0.5)
        probs = torch.softmax(logits, dim=-1).to(v.dtype)
        out = self.to_out[0](probs @ v)
        return x + out.transpose(1, 2).reshape(B, C, H, W)


class MidBlock(nn.Module):
    def __init__(self, c: int, groups: int):
        super().__init__()
        self.resnets = nn.ModuleList([ResnetBlock(c, c, groups), ResnetBlock(c, c, groups)])
        self.attentions = nn.ModuleList([MidAttention(c, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class Downsampler(nn.Module):
    """Asymmetric (0,1,0,1) pad + stride-2 VALID conv."""

    def __init__(self, c: int):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class Upsampler(nn.Module):
    """Nearest-2x upsample + SAME conv."""

    def __init__(self, c: int):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class DownBlock(nn.Module):
    def __init__(self, c_in: int, c_out: int, layers: int, groups: int, last: bool):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(c_in if j == 0 else c_out, c_out, groups) for j in range(layers)]
        )
        if not last:
            self.downsamplers = nn.ModuleList([Downsampler(c_out)])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0](x)
        return x


class UpBlock(nn.Module):
    def __init__(self, c_in: int, c_out: int, layers: int, groups: int, last: bool):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(c_in if j == 0 else c_out, c_out, groups) for j in range(layers + 1)]
        )
        if not last:
            self.upsamplers = nn.ModuleList([Upsampler(c_out)])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "upsamplers"):
            x = self.upsamplers[0](x)
        return x


class Encoder(nn.Module):
    def __init__(self, in_channels, latent_channels, chans, layers, groups):
        super().__init__()
        self.conv_in = nn.Conv2d(in_channels, chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList(
            [
                DownBlock(chans[i - 1] if i else chans[0], c, layers, groups, i == len(chans) - 1)
                for i, c in enumerate(chans)
            ]
        )
        self.mid_block = MidBlock(chans[-1], groups)
        self.conv_norm_out = nn.GroupNorm(groups, chans[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chans[-1], 2 * latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class Decoder(nn.Module):
    def __init__(self, in_channels, latent_channels, chans, layers, groups):
        super().__init__()
        rev = list(reversed(chans))
        self.conv_in = nn.Conv2d(latent_channels, rev[0], 3, padding=1)
        self.mid_block = MidBlock(rev[0], groups)
        self.up_blocks = nn.ModuleList(
            [
                UpBlock(rev[i - 1] if i else rev[0], c, layers, groups, i == len(rev) - 1)
                for i, c in enumerate(rev)
            ]
        )
        self.conv_norm_out = nn.GroupNorm(groups, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], in_channels, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for b in self.up_blocks:
            x = b(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TorchFluxVAERef(nn.Module):
    """encode: image (B,3,H,W) in [-1,1] -> moments (B, 2*latent, h, w);
    the diagonal-Gaussian mode latent is the mean half, then
    (mean - shift) * scale. decode: z / scale + shift -> image."""

    def __init__(
        self,
        in_channels=3,
        latent_channels=4,
        block_out_channels=(8, 16),
        layers_per_block=1,
        norm_num_groups=4,
        scaling_factor=1.0,
        shift_factor=0.0,
    ):
        super().__init__()
        self.scaling_factor = scaling_factor
        self.shift_factor = shift_factor
        self.encoder = Encoder(
            in_channels, latent_channels, block_out_channels, layers_per_block, norm_num_groups
        )
        self.decoder = Decoder(
            in_channels, latent_channels, block_out_channels, layers_per_block, norm_num_groups
        )

    @torch.no_grad()
    def encode_moments(self, images: torch.Tensor) -> torch.Tensor:
        return self.encoder(images)

    @torch.no_grad()
    def encode_mode(self, images: torch.Tensor) -> torch.Tensor:
        mean, _ = self.encode_moments(images).chunk(2, dim=1)
        return (mean - self.shift_factor) * self.scaling_factor

    @torch.no_grad()
    def decode(self, latents: torch.Tensor) -> torch.Tensor:
        return self.decoder(latents / self.scaling_factor + self.shift_factor)

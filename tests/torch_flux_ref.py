"""Hermetic torch oracle for the conditioned FLUX DiT.

An independent transcription of the math the reference computes through
diffusers' FluxTransformer2DModel plus its custom 3-stream condition
branch (/root/reference/train_flux/flux/transformer.py:47-244,
/root/reference/train_flux/flux/block.py:7-333), written module-by-module
in plain torch so parity tests need neither diffusers nor real weights.

Parameter names follow the diffusers checkpoint layout exactly, so
`model.state_dict()` feeds `utils.hf_convert.convert_flux_dit_state`
unchanged — the same conversion path real FLUX.1-dev weights take.

Math covered (and asserted equal by tests/test_flux_torch_parity.py):
  * sinusoidal timestep/guidance embedding, cos-first, freq/half scaling
    (diffusers Timesteps flip_sin_to_cos=True, downscale_freq_shift=0);
  * AdaLN-Zero 6-chunk (double) / 3-chunk (single) modulation order;
  * QK RMSNorm (eps 1e-6) per head;
  * 3-axis RoPE with repeat-interleaved frequencies and (even, odd)
    pair rotation, fp32;
  * the condition stream: shared image-side weights, cond_temb at
    c_t * 1000 with guidance forced to 1.0, its own RoPE ids;
  * union_cond_attn mask / log(c_factor) bias (c_factor wins when both,
    block.py:106-122);
  * add_cond_attn residual into the image stream;
  * AdaLayerNormContinuous final norm (scale-first 2-chunk) + proj_out.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class RMSNorm(nn.Module):
    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps) * self.weight.float()).to(x.dtype)


def sinusoidal(t: torch.Tensor, dim: int, max_period: float = 10000.0) -> torch.Tensor:
    half = dim // 2
    freqs = torch.exp(-math.log(max_period) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class MLPEmbed(nn.Module):
    """linear_1 -> silu -> linear_2 (diffusers TimestepEmbedding /
    PixArtAlphaTextProjection)."""

    def __init__(self, d_in: int, d_out: int):
        super().__init__()
        self.linear_1 = nn.Linear(d_in, d_out)
        self.linear_2 = nn.Linear(d_out, d_out)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TimeTextEmbed(nn.Module):
    """CombinedTimestep(Guidance)TextProjEmbeddings: sum of timestep,
    (optional) guidance, and pooled-text projections."""

    def __init__(self, freq_dim: int, pooled_dim: int, hidden: int, guidance: bool):
        super().__init__()
        self.freq_dim = freq_dim
        self.timestep_embedder = MLPEmbed(freq_dim, hidden)
        if guidance:
            self.guidance_embedder = MLPEmbed(freq_dim, hidden)
        self.text_embedder = MLPEmbed(pooled_dim, hidden)

    def forward(self, t, guidance, pooled):
        emb = self.timestep_embedder(sinusoidal(t, self.freq_dim))
        if guidance is not None:
            emb = emb + self.guidance_embedder(sinusoidal(guidance, self.freq_dim))
        return emb + self.text_embedder(pooled)


def rope_tables(ids: torch.Tensor, axes_dims, theta: float = 10000.0):
    """(L, 3) ids -> cos/sin (L, head_dim), each frequency repeated twice."""
    cos_parts, sin_parts = [], []
    for axis, dim in enumerate(axes_dims):
        freqs = 1.0 / theta ** (torch.arange(0, dim, 2, dtype=torch.float64) / dim)
        ang = ids[:, axis].double()[:, None] * freqs[None, :]
        ang = ang.repeat_interleave(2, dim=-1)
        cos_parts.append(ang.cos())
        sin_parts.append(ang.sin())
    return (
        torch.cat(cos_parts, dim=-1).float(),
        torch.cat(sin_parts, dim=-1).float(),
    )


def apply_rope(x: torch.Tensor, cos: torch.Tensor, sin: torch.Tensor) -> torch.Tensor:
    """x: (B, nH, L, D); rotate (even, odd) element pairs."""
    xr, xi = x.float().reshape(*x.shape[:-1], -1, 2).unbind(-1)
    rotated = torch.stack([-xi, xr], dim=-1).flatten(-2)
    return (x.float() * cos + rotated * sin).to(x.dtype)


class JointAttention(nn.Module):
    def __init__(self, hidden: int, heads: int, head_dim: int, dual: bool):
        super().__init__()
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(hidden, hidden)
        self.to_k = nn.Linear(hidden, hidden)
        self.to_v = nn.Linear(hidden, hidden)
        self.norm_q = RMSNorm(head_dim)
        self.norm_k = RMSNorm(head_dim)
        if dual:
            self.add_q_proj = nn.Linear(hidden, hidden)
            self.add_k_proj = nn.Linear(hidden, hidden)
            self.add_v_proj = nn.Linear(hidden, hidden)
            self.norm_added_q = RMSNorm(head_dim)
            self.norm_added_k = RMSNorm(head_dim)
            self.to_out = nn.ModuleList([nn.Linear(hidden, hidden)])
            self.to_add_out = nn.Linear(hidden, hidden)

    def _qkv(self, x, q_proj, k_proj, v_proj, q_norm, k_norm):
        B, L, _ = x.shape
        q = q_proj(x).view(B, L, self.heads, self.head_dim).transpose(1, 2)
        k = k_proj(x).view(B, L, self.heads, self.head_dim).transpose(1, 2)
        v = v_proj(x).view(B, L, self.heads, self.head_dim).transpose(1, 2)
        return q_norm(q), k_norm(k), v

    def qkv_main(self, x):
        return self._qkv(x, self.to_q, self.to_k, self.to_v, self.norm_q, self.norm_k)

    def qkv_txt(self, x):
        return self._qkv(
            x, self.add_q_proj, self.add_k_proj, self.add_v_proj, self.norm_added_q, self.norm_added_k
        )


def joint_sdpa(q, k, v, cond_len: int, union_cond_attn: bool, c_factor):
    """SDPA over concatenated streams with the reference's cond modifiers.

    c_factor overrides the union mask when both are given (the reference
    builds the mask then overwrites it, block.py:106-122)."""
    mask = None
    L = q.shape[2]
    if cond_len:
        if c_factor is not None:
            mask = torch.zeros(L, L, dtype=q.dtype)
            bias = math.log(c_factor)
            mask[-cond_len:, :-cond_len] = bias
            mask[:-cond_len, -cond_len:] = bias
        elif not union_cond_attn:
            mask = torch.ones(L, L, dtype=torch.bool)
            mask[-cond_len:, :-cond_len] = False
            mask[:-cond_len, -cond_len:] = False
    out = F.scaled_dot_product_attention(q, k, v, attn_mask=mask)
    B, H, _, D = out.shape
    return out.transpose(1, 2).reshape(B, L, H * D)


class AdaLNZero(nn.Module):
    """norm1 / norm: LN(elementwise_affine=False) modulated from silu(emb)."""

    def __init__(self, hidden: int, n_chunks: int):
        super().__init__()
        self.linear = nn.Linear(hidden, n_chunks * hidden)
        self.norm = nn.LayerNorm(hidden, elementwise_affine=False, eps=1e-6)
        self.n_chunks = n_chunks

    def forward(self, x, emb):
        parts = self.linear(F.silu(emb)).chunk(self.n_chunks, dim=-1)
        shift, scale = parts[0], parts[1]
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None], parts[2:]


class FeedForward(nn.Module):
    """ff / ff_context: net.0.proj -> gelu(tanh) -> net.2."""

    def __init__(self, hidden: int, inner: int):
        super().__init__()
        self.net = nn.ModuleDict(
            {"0": nn.ModuleDict({"proj": nn.Linear(hidden, inner)}), "2": nn.Linear(inner, hidden)}
        )

    def forward(self, x):
        return self.net["2"](F.gelu(self.net["0"]["proj"](x), approximate="tanh"))


class DoubleBlock(nn.Module):
    def __init__(self, hidden: int, heads: int, head_dim: int, mlp_hidden: int):
        super().__init__()
        self.norm1 = AdaLNZero(hidden, 6)
        self.norm1_context = AdaLNZero(hidden, 6)
        self.attn = JointAttention(hidden, heads, head_dim, dual=True)
        self.ff = FeedForward(hidden, mlp_hidden)
        self.ff_context = FeedForward(hidden, mlp_hidden)
        self.norm2 = nn.LayerNorm(hidden, elementwise_affine=False, eps=1e-6)
        self.norm2_context = nn.LayerNorm(hidden, elementwise_affine=False, eps=1e-6)

    def forward(self, img, txt, cond, temb, cond_temb, rope_main, rope_cond, flags):
        use_cond = cond is not None
        img_n, (i_gate, i_shift2, i_scale2, i_gate2) = self.norm1(img, temb)
        txt_n, (t_gate, t_shift2, t_scale2, t_gate2) = self.norm1_context(txt, temb)

        q_img, k_img, v_img = self.attn.qkv_main(img_n)
        q_txt, k_txt, v_txt = self.attn.qkv_txt(txt_n)
        q = apply_rope(torch.cat([q_txt, q_img], dim=2), *rope_main)
        k = apply_rope(torch.cat([k_txt, k_img], dim=2), *rope_main)
        v = torch.cat([v_txt, v_img], dim=2)

        cond_len = 0
        if use_cond:
            cond_n, (c_gate, c_shift2, c_scale2, c_gate2) = self.norm1(cond, cond_temb)
            q_c, k_c, v_c = self.attn.qkv_main(cond_n)
            q = torch.cat([q, apply_rope(q_c, *rope_cond)], dim=2)
            k = torch.cat([k, apply_rope(k_c, *rope_cond)], dim=2)
            v = torch.cat([v, v_c], dim=2)
            cond_len = cond.shape[1]

        joint = joint_sdpa(q, k, v, cond_len, flags["union_cond_attn"], flags["c_factor"])
        Lt = txt.shape[1]
        Li = img.shape[1]
        txt_attn = self.attn.to_add_out(joint[:, :Lt])
        img_attn = self.attn.to_out[0](joint[:, Lt : Lt + Li])
        img = img + i_gate[:, None] * img_attn
        txt = txt + t_gate[:, None] * txt_attn
        if use_cond:
            gated_cond = c_gate[:, None] * self.attn.to_out[0](joint[:, Lt + Li :])
            cond = cond + gated_cond
            if flags["add_cond_attn"]:
                img = img + gated_cond

        img_m = self.norm2(img) * (1 + i_scale2[:, None]) + i_shift2[:, None]
        img = img + i_gate2[:, None] * self.ff(img_m)
        txt_m = self.norm2_context(txt) * (1 + t_scale2[:, None]) + t_shift2[:, None]
        txt = txt + t_gate2[:, None] * self.ff_context(txt_m)
        if use_cond:
            cond_m = self.norm2(cond) * (1 + c_scale2[:, None]) + c_shift2[:, None]
            cond = cond + c_gate2[:, None] * self.ff(cond_m)
        return img, txt, cond


class SingleBlock(nn.Module):
    def __init__(self, hidden: int, heads: int, head_dim: int, mlp_hidden: int):
        super().__init__()
        self.norm = AdaLNZero(hidden, 3)
        self.attn = JointAttention(hidden, heads, head_dim, dual=False)
        self.proj_mlp = nn.Linear(hidden, mlp_hidden)
        self.proj_out = nn.Linear(hidden + mlp_hidden, hidden)

    def forward(self, hidden, cond, temb, cond_temb, rope_main, rope_cond, flags):
        use_cond = cond is not None
        h_n, (gate,) = self.norm(hidden, temb)
        mlp = F.gelu(self.proj_mlp(h_n), approximate="tanh")
        q, k, v = self.attn.qkv_main(h_n)
        q = apply_rope(q, *rope_main)
        k = apply_rope(k, *rope_main)

        cond_len = 0
        if use_cond:
            c_n, (c_gate,) = self.norm(cond, cond_temb)
            c_mlp = F.gelu(self.proj_mlp(c_n), approximate="tanh")
            q_c, k_c, v_c = self.attn.qkv_main(c_n)
            q = torch.cat([q, apply_rope(q_c, *rope_cond)], dim=2)
            k = torch.cat([k, apply_rope(k_c, *rope_cond)], dim=2)
            v = torch.cat([v, v_c], dim=2)
            cond_len = cond.shape[1]

        joint = joint_sdpa(q, k, v, cond_len, flags["union_cond_attn"], flags["c_factor"])
        Lh = hidden.shape[1]
        hidden = hidden + gate[:, None] * self.proj_out(torch.cat([joint[:, :Lh], mlp], dim=-1))
        if use_cond:
            cond = cond + c_gate[:, None] * self.proj_out(torch.cat([joint[:, Lh:], c_mlp], dim=-1))
        return hidden, cond


class AdaLNContinuous(nn.Module):
    """norm_out: scale-first 2-chunk modulation (AdaLayerNormContinuous)."""

    def __init__(self, hidden: int):
        super().__init__()
        self.linear = nn.Linear(hidden, 2 * hidden)
        self.norm = nn.LayerNorm(hidden, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        scale, shift = self.linear(F.silu(emb)).chunk(2, dim=-1)
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None]


class TorchFluxRef(nn.Module):
    """Tiny-config FLUX DiT with the reference's condition branch."""

    def __init__(
        self,
        in_channels: int,
        hidden: int,
        heads: int,
        head_dim: int,
        mlp_hidden: int,
        n_double: int,
        n_single: int,
        text_dim: int,
        pooled_dim: int,
        axes_dims,
        time_freq_dim: int,
        guidance_embeds: bool = True,
    ):
        super().__init__()
        self.axes_dims = tuple(axes_dims)
        self.guidance_embeds = guidance_embeds
        self.x_embedder = nn.Linear(in_channels, hidden)
        self.context_embedder = nn.Linear(text_dim, hidden)
        self.time_text_embed = TimeTextEmbed(time_freq_dim, pooled_dim, hidden, guidance_embeds)
        self.transformer_blocks = nn.ModuleList(
            [DoubleBlock(hidden, heads, head_dim, mlp_hidden) for _ in range(n_double)]
        )
        self.single_transformer_blocks = nn.ModuleList(
            [SingleBlock(hidden, heads, head_dim, mlp_hidden) for _ in range(n_single)]
        )
        self.norm_out = AdaLNContinuous(hidden)
        self.proj_out = nn.Linear(hidden, in_channels)
        # rename the TimeTextEmbed children to the diffusers key layout
        # (timestep_embedder/guidance_embedder/text_embedder already match)

    def forward(
        self,
        img: torch.Tensor,  # (B, L_img, in_channels)
        txt: torch.Tensor,  # (B, L_txt, text_dim)
        pooled: torch.Tensor,  # (B, pooled_dim)
        timestep: torch.Tensor,  # (B,) in [0, 1]
        img_ids: torch.Tensor,  # (L_img, 3)
        txt_ids: torch.Tensor,  # (L_txt, 3)
        guidance: torch.Tensor | None = None,  # (B,)
        cond: torch.Tensor | None = None,
        cond_ids: torch.Tensor | None = None,
        c_t: float = 0.0,
        union_cond_attn: bool = True,
        add_cond_attn: bool = False,
        c_factor: float | None = None,
        controlnet_block_samples=None,  # list of (B, L_img, hidden)
        controlnet_single_block_samples=None,  # list of (B, L_img, hidden)
    ) -> torch.Tensor:
        use_cond = cond is not None
        flags = {
            "union_cond_attn": union_cond_attn,
            "add_cond_attn": add_cond_attn,
            "c_factor": c_factor,
        }
        img = self.x_embedder(img)
        cond_h = self.x_embedder(cond) if use_cond else None
        txt = self.context_embedder(txt)

        g = guidance * 1000 if (self.guidance_embeds and guidance is not None) else None
        temb = self.time_text_embed(timestep * 1000, g, pooled)
        cond_temb = None
        if use_cond:
            cond_temb = self.time_text_embed(
                torch.full_like(timestep, c_t) * 1000,
                torch.ones_like(timestep) * 1000 if self.guidance_embeds else None,
                pooled,
            )

        rope_main = rope_tables(torch.cat([txt_ids, img_ids], dim=0), self.axes_dims)
        rope_cond = rope_tables(cond_ids, self.axes_dims) if use_cond else None

        for i, block in enumerate(self.transformer_blocks):
            img, txt, cond_h = block(img, txt, cond_h, temb, cond_temb, rope_main, rope_cond, flags)
            if controlnet_block_samples is not None:
                # hook i//interval serves this block (transformer.py:172-181)
                interval = math.ceil(len(self.transformer_blocks) / len(controlnet_block_samples))
                img = img + controlnet_block_samples[i // interval]

        hidden = torch.cat([txt, img], dim=1)
        for i, block in enumerate(self.single_transformer_blocks):
            hidden, cond_h = block(hidden, cond_h, temb, cond_temb, rope_main, rope_cond, flags)
            if controlnet_single_block_samples is not None:
                interval = math.ceil(
                    len(self.single_transformer_blocks) / len(controlnet_single_block_samples)
                )
                hidden = torch.cat(
                    [
                        hidden[:, : txt.shape[1]],
                        hidden[:, txt.shape[1] :] + controlnet_single_block_samples[i // interval],
                    ],
                    dim=1,
                )

        img = hidden[:, txt.shape[1] :]
        return self.proj_out(self.norm_out(img, temb))

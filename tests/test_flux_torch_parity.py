"""Hermetic numerical parity: JAX FLUX DiT + sampler vs the torch oracle.

Random torch weights flow through `convert_flux_dit_state` (the exact path
real FLUX.1-dev safetensors take) into `flux_dit_apply`; activations must
match `tests/torch_flux_ref.TorchFluxRef` — an independent transcription of
the reference's conditioned forward
(/root/reference/train_flux/flux/transformer.py:47-244,
/root/reference/train_flux/flux/block.py:7-333) — to fp32 tolerance.

Covers: cond stream, c_t=0 temb with guidance forced to 1.0,
position-delta RoPE, union_cond_attn, c_factor (incl. precedence over the
union mask), add_cond_attn, guidance-free (schnell-style) configs, the
dynamic-shift sigma schedule, and the full Euler denoise loop with image
CFG (reference runs two serial forwards; ours one doubled batch).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reflectionflow_tpu.config import FluxDiTConfig
from reflectionflow_tpu.models.flux.dit import flux_dit_apply
from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids
from reflectionflow_tpu.sampler.generate import denoise
from reflectionflow_tpu.sampler.scheduler import FlowMatchSchedule
from reflectionflow_tpu.utils.hf_convert import convert_flux_dit_state

from torch_flux_ref import TorchFluxRef

ATOL = 1e-4

B, TY, TX, LT = 2, 4, 4, 6
CTY, CTX = 2, 2
DELTA = (0, -CTX)


def _cfg(guidance=True):
    return FluxDiTConfig(
        in_channels=8,
        hidden_size=64,
        num_heads=2,
        head_dim=32,
        mlp_ratio=4.0,
        num_double_blocks=2,
        num_single_blocks=3,
        text_dim=48,
        pooled_dim=24,
        axes_dims_rope=(8, 12, 12),
        guidance_embeds=guidance,
        time_freq_dim=32,
    )


def _torch_model(cfg: FluxDiTConfig) -> TorchFluxRef:
    torch.manual_seed(0)
    m = TorchFluxRef(
        in_channels=cfg.in_channels,
        hidden=cfg.hidden_size,
        heads=cfg.num_heads,
        head_dim=cfg.head_dim,
        mlp_hidden=cfg.mlp_hidden,
        n_double=cfg.num_double_blocks,
        n_single=cfg.num_single_blocks,
        text_dim=cfg.text_dim,
        pooled_dim=cfg.pooled_dim,
        axes_dims=cfg.axes_dims_rope,
        time_freq_dim=cfg.time_freq_dim,
        guidance_embeds=cfg.guidance_embeds,
    )
    m.eval()
    # break the default near-zero bias symmetry so parity is a real check
    with torch.no_grad():
        for p in m.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return m


def _params_from(m: TorchFluxRef, cfg: FluxDiTConfig):
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    return jax.tree.map(jnp.asarray, convert_flux_dit_state(sd, cfg))


def _inputs(cfg, rng, cond_grid=(CTY, CTX), delta=DELTA):
    img = rng.standard_normal((B, TY * TX, cfg.in_channels), dtype=np.float32)
    txt = rng.standard_normal((B, LT, cfg.text_dim), dtype=np.float32)
    pooled = rng.standard_normal((B, cfg.pooled_dim), dtype=np.float32)
    cond = rng.standard_normal((B, cond_grid[0] * cond_grid[1], cfg.in_channels), dtype=np.float32)
    t = np.asarray([0.7, 0.3], dtype=np.float32)
    g = np.asarray([3.5, 3.5], dtype=np.float32)
    img_ids = make_image_ids(TY, TX)
    txt_ids = make_text_ids(LT)
    cond_ids = make_image_ids(*cond_grid, position_delta=delta)
    return img, txt, pooled, cond, t, g, img_ids, txt_ids, cond_ids


def _torch_fwd(m, inputs, **kw):
    img, txt, pooled, cond, t, g, img_ids, txt_ids, cond_ids = inputs
    with torch.no_grad():
        out = m(
            torch.from_numpy(img),
            torch.from_numpy(txt),
            torch.from_numpy(pooled),
            torch.from_numpy(t),
            torch.from_numpy(np.asarray(img_ids)),
            torch.from_numpy(np.asarray(txt_ids)),
            guidance=torch.from_numpy(g) if m.guidance_embeds else None,
            cond=torch.from_numpy(cond) if kw.get("use_cond") else None,
            cond_ids=torch.from_numpy(np.asarray(cond_ids)) if kw.get("use_cond") else None,
            c_t=kw.get("c_t", 0.0),
            union_cond_attn=kw.get("union_cond_attn", True),
            add_cond_attn=kw.get("add_cond_attn", False),
            c_factor=kw.get("c_factor"),
            controlnet_block_samples=[torch.from_numpy(x) for x in kw["ctrl_d"]]
            if kw.get("ctrl_d") is not None else None,
            controlnet_single_block_samples=[torch.from_numpy(x) for x in kw["ctrl_s"]]
            if kw.get("ctrl_s") is not None else None,
        )
    return out.numpy()


def _jax_fwd(params, cfg, inputs, **kw):
    img, txt, pooled, cond, t, g, img_ids, txt_ids, cond_ids = inputs
    out = flux_dit_apply(
        params,
        cfg,
        jnp.asarray(img),
        jnp.asarray(txt),
        jnp.asarray(pooled),
        jnp.asarray(t),
        jnp.asarray(img_ids),
        jnp.asarray(txt_ids),
        guidance=jnp.asarray(g) if cfg.guidance_embeds else None,
        cond=jnp.asarray(cond) if kw.get("use_cond") else None,
        cond_ids=jnp.asarray(cond_ids) if kw.get("use_cond") else None,
        c_t=kw.get("c_t", 0.0),
        union_cond_attn=kw.get("union_cond_attn", True),
        add_cond_attn=kw.get("add_cond_attn", False),
        c_factor=kw.get("c_factor"),
        controlnet_block_samples=jnp.asarray(np.stack(kw["ctrl_d"]))
        if kw.get("ctrl_d") is not None else None,
        controlnet_single_block_samples=jnp.asarray(np.stack(kw["ctrl_s"]))
        if kw.get("ctrl_s") is not None else None,
    )
    return np.asarray(out)


CASES = [
    ("no_cond", {"use_cond": False}),
    ("cond_default", {"use_cond": True}),
    ("cond_no_union", {"use_cond": True, "union_cond_attn": False}),
    ("cond_c_factor", {"use_cond": True, "c_factor": 0.5}),
    # c_factor must override the union mask (block.py:106-122 order)
    ("cond_c_factor_over_mask", {"use_cond": True, "union_cond_attn": False, "c_factor": 2.0}),
    ("cond_ct_half", {"use_cond": True, "c_t": 0.5}),
]


@pytest.mark.parametrize("name,kw", CASES, ids=[c[0] for c in CASES])
def test_dit_parity(name, kw):
    cfg = _cfg()
    m = _torch_model(cfg)
    params = _params_from(m, cfg)
    inputs = _inputs(cfg, np.random.default_rng(1))
    ours = _jax_fwd(params, cfg, inputs, **kw)
    ref = _torch_fwd(m, inputs, **kw)
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-4)


@pytest.mark.parametrize("use_cond", [False, True], ids=["no_cond", "cond"])
def test_dit_parity_controlnet_residuals(use_cond):
    """ControlNet hook residuals: fewer hooks than blocks exercises the
    ceil-interval block->hook mapping (transformer.py:172-181,230-239) —
    1 hook over 2 double blocks, 2 hooks over 3 single blocks."""
    cfg = _cfg()
    m = _torch_model(cfg)
    params = _params_from(m, cfg)
    rng = np.random.default_rng(7)
    inputs = _inputs(cfg, rng)
    kw = {
        "use_cond": use_cond,
        "ctrl_d": [rng.standard_normal((B, TY * TX, cfg.hidden_size), dtype=np.float32) * 0.1],
        "ctrl_s": [
            rng.standard_normal((B, TY * TX, cfg.hidden_size), dtype=np.float32) * 0.1
            for _ in range(2)
        ],
    }
    ours = _jax_fwd(params, cfg, inputs, **kw)
    ref = _torch_fwd(m, inputs, **kw)
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-4)
    # the residuals must actually change the output (hooks are live)
    base = _jax_fwd(params, cfg, inputs, use_cond=use_cond)
    assert np.abs(ours - base).max() > 1e-3


def test_dit_parity_add_cond_attn():
    # add_cond_attn requires matching img/cond grids
    cfg = _cfg()
    m = _torch_model(cfg)
    params = _params_from(m, cfg)
    inputs = _inputs(cfg, np.random.default_rng(2), cond_grid=(TY, TX), delta=(0, -TX))
    kw = {"use_cond": True, "add_cond_attn": True}
    ours = _jax_fwd(params, cfg, inputs, **kw)
    ref = _torch_fwd(m, inputs, **kw)
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-4)


def test_dit_parity_no_guidance():
    # schnell-style config: no guidance embedder anywhere (incl. cond_temb)
    cfg = _cfg(guidance=False)
    m = _torch_model(cfg)
    params = _params_from(m, cfg)
    inputs = _inputs(cfg, np.random.default_rng(3))
    kw = {"use_cond": True}
    ours = _jax_fwd(params, cfg, inputs, **kw)
    ref = _torch_fwd(m, inputs, **kw)
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-4)


def test_dynamic_shift_schedule_matches_reference_formula():
    """Independent transcription of FlowMatchEulerDiscreteScheduler as driven
    by /root/reference/train_flux/flux/generate.py:192-209."""
    for n, seq_len in [(30, 4096), (4, 16), (8, 1024)]:
        sig = np.linspace(1.0, 1.0 / n, n)
        m = (1.15 - 0.5) / (4096 - 256)
        mu = seq_len * m + (0.5 - m * 256)
        expected = np.exp(mu) / (np.exp(mu) + (1.0 / sig - 1.0))
        sched = FlowMatchSchedule.create(n, seq_len)
        np.testing.assert_allclose(sched.sigmas[:-1], expected, rtol=1e-6)
        assert sched.sigmas[-1] == 0.0
        np.testing.assert_allclose(sched.timesteps, expected, rtol=1e-6)


def test_denoise_loop_parity_with_image_cfg():
    """Full Euler loop: our single doubled-batch CFG forward vs the
    reference's two serial forwards (generate.py:216-296)."""
    cfg = _cfg()
    m = _torch_model(cfg)
    params = _params_from(m, cfg)
    rng = np.random.default_rng(4)
    img, txt, pooled, cond, _, _, img_ids, txt_ids, cond_ids = _inputs(cfg, rng)
    cond_empty = rng.standard_normal(cond.shape).astype(np.float32) * 0.1
    n_steps = 4
    sched = FlowMatchSchedule.create(n_steps, TY * TX)
    igs = 1.5

    # torch reference loop
    lat = torch.from_numpy(img.copy())
    with torch.no_grad():
        for i in range(n_steps):
            t = torch.full((B,), float(sched.timesteps[i]))
            common = dict(
                txt=torch.from_numpy(txt),
                pooled=torch.from_numpy(pooled),
                timestep=t,
                img_ids=torch.from_numpy(np.asarray(img_ids)),
                txt_ids=torch.from_numpy(np.asarray(txt_ids)),
                cond_ids=torch.from_numpy(np.asarray(cond_ids)),
            )
            v_c = m(lat, guidance=torch.full((B,), 3.5), cond=torch.from_numpy(cond), **common)
            v_u = m(lat, guidance=torch.ones(B), cond=torch.from_numpy(cond_empty), **common)
            v = v_u + igs * (v_c - v_u)
            lat = lat + float(sched.sigmas[i + 1] - sched.sigmas[i]) * v
    ref = lat.numpy()

    ours = denoise(
        params,
        cfg,
        jnp.asarray(img),
        jnp.asarray(txt),
        jnp.asarray(pooled),
        jnp.asarray(img_ids),
        jnp.asarray(txt_ids),
        jnp.asarray(sched.sigmas),
        jnp.asarray(3.5),
        n_steps,
        cond=jnp.asarray(cond),
        cond_ids=jnp.asarray(cond_ids),
        cond_empty=jnp.asarray(cond_empty),
        image_guidance_scale=igs,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=1e-3)

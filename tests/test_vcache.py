"""Velocity cache (training-free step skipping — DeepCache/TeaCache family,
beyond the reference): mechanics pinned hermetically.

Covered: the disabled path is bit-identical to the baseline scan; a static
`step_mask` reuses the previous velocity exactly where the mask says so
(checked against a hand-rolled Euler loop); TeaCache-style dynamic skipping
honors warmup/tail forcing, reports full-forward counts, and degenerates to
the baseline at epsilon threshold; the pipeline/config plumbing rejects
ambiguous settings. Quality/threshold trade-offs are real-weight questions
(docs/DEPLOYMENT.md) — these tests pin the control flow, not image quality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reflectionflow_tpu.config import FluxDiTConfig
from reflectionflow_tpu.models.flux.dit import flux_dit_apply, flux_dit_init
from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids
from reflectionflow_tpu.sampler.generate import denoise, make_schedule, make_step_mask

CFG = FluxDiTConfig.tiny()
B, TY, TX, LT = 2, 4, 4, 8
N_STEPS = 6


@pytest.fixture(scope="module")
def setup():
    params = flux_dit_init(jax.random.PRNGKey(0), CFG, jnp.float32)
    rng = jax.random.PRNGKey(1)
    ks = jax.random.split(rng, 3)
    latents = jax.random.normal(ks[0], (B, TY * TX, CFG.in_channels), jnp.float32)
    txt = jax.random.normal(ks[1], (B, LT, CFG.text_dim), jnp.float32)
    pooled = jax.random.normal(ks[2], (B, CFG.pooled_dim), jnp.float32)
    img_ids = jnp.asarray(make_image_ids(TY, TX))
    txt_ids = jnp.asarray(make_text_ids(LT))
    sigmas = make_schedule(N_STEPS, TY * TX)
    return params, latents, txt, pooled, img_ids, txt_ids, sigmas


def _denoise(setup, **kw):
    params, latents, txt, pooled, img_ids, txt_ids, sigmas = setup
    return denoise(
        params, CFG, latents, txt, pooled, img_ids, txt_ids, sigmas,
        jnp.asarray(3.5, jnp.float32), N_STEPS, **kw,
    )


def test_make_step_mask_properties():
    m = make_step_mask(10, interval=2, warmup=1, tail=1)
    assert m.shape == (10,) and m.dtype == bool
    assert m[0] and m[-1]
    assert not m[2] and m[1] and m[3]
    # interval=1 = every step full
    assert make_step_mask(5, interval=1).all()
    # warmup is clamped to >=1 (step 0 has no cached velocity)
    assert make_step_mask(5, interval=3, warmup=0)[0]
    with pytest.raises(ValueError):
        make_step_mask(0, interval=1)
    with pytest.raises(ValueError):
        make_step_mask(5, interval=0)


def test_all_true_mask_is_bit_identical_to_baseline(setup):
    base = _denoise(setup)
    full = _denoise(setup, step_mask=jnp.ones(N_STEPS, bool))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(full))


def test_static_mask_matches_manual_velocity_reuse(setup):
    params, latents, txt, pooled, img_ids, txt_ids, sigmas = setup
    mask = np.array([True, False, True, False, False, True])
    out = _denoise(setup, step_mask=jnp.asarray(mask))

    # hand-rolled Euler loop with explicit velocity reuse
    guidance = jnp.full((B,), 3.5, jnp.float32)
    lat, v = latents, None
    for i in range(N_STEPS):
        if mask[i]:
            v = flux_dit_apply(
                params, CFG, lat, txt, pooled,
                jnp.broadcast_to(sigmas[i], (B,)).astype(lat.dtype),
                img_ids, txt_ids,
                guidance=guidance if CFG.guidance_embeds else None,
            )
        lat = (lat.astype(jnp.float32)
               + (sigmas[i + 1] - sigmas[i]) * v.astype(jnp.float32)).astype(lat.dtype)
    np.testing.assert_allclose(np.asarray(out), np.asarray(lat), rtol=2e-5, atol=2e-5)
    # and the skipping actually changed the result vs the full run
    assert not np.allclose(np.asarray(out), np.asarray(_denoise(setup)))


def test_dynamic_huge_threshold_runs_only_forced_steps(setup):
    out, n_full = _denoise(
        setup, vcache_threshold=1e9, vcache_warmup=2, vcache_tail=1,
        return_vcache_stats=True,
    )
    assert int(n_full) == 3  # warmup 2 + tail 1, nothing in between
    # identical to the equivalent static schedule (interval larger than the gap)
    mask = np.zeros(N_STEPS, bool)
    mask[:2] = True
    mask[-1] = True
    static = _denoise(setup, step_mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(static))


def test_dynamic_epsilon_threshold_degenerates_to_baseline(setup):
    out, n_full = _denoise(
        setup, vcache_threshold=1e-9, return_vcache_stats=True,
    )
    assert int(n_full) == N_STEPS  # the signal always crosses epsilon
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_denoise(setup)), rtol=2e-5, atol=2e-5)


def test_stats_flag_on_disabled_path(setup):
    out, n_full = _denoise(setup, return_vcache_stats=True)
    assert int(n_full) == N_STEPS
    np.testing.assert_array_equal(np.asarray(out), np.asarray(_denoise(setup)))


def test_mask_and_threshold_are_mutually_exclusive(setup):
    with pytest.raises(ValueError):
        _denoise(setup, step_mask=jnp.ones(N_STEPS, bool), vcache_threshold=0.5)


def test_vcache_composes_with_conditioned_image_cfg(setup):
    """The corrector path (cond stream + image CFG's doubled batch) must
    accept both cache modes — velocity() wraps the whole CFG mix, so the
    cached velocity IS the mixed velocity."""
    from reflectionflow_tpu.models.flux.rope import make_image_ids

    params, latents, txt, pooled, img_ids, txt_ids, sigmas = setup
    Lc = 4
    cond = jax.random.normal(jax.random.PRNGKey(9), (B, Lc, CFG.in_channels), jnp.float32)
    cond_ids = jnp.asarray(make_image_ids(2, 2))
    kw = dict(cond=cond, cond_ids=cond_ids, cond_empty=jnp.zeros_like(cond),
              image_guidance_scale=1.5)
    base = _denoise(setup, **kw)
    mask = np.array([True, True, False, True, False, True])
    static = _denoise(setup, step_mask=jnp.asarray(mask), **kw)
    assert static.shape == base.shape
    assert not np.allclose(np.asarray(static), np.asarray(base))
    dyn, n_full = _denoise(setup, vcache_threshold=1e9, vcache_warmup=1,
                           vcache_tail=1, return_vcache_stats=True, **kw)
    assert int(n_full) == 2
    assert np.isfinite(np.asarray(dyn, np.float32)).all()


def test_dynamic_signal_works_on_quantized_tree(setup):
    """The skip signal reuses `linear`, so it must run on the int8 serving
    tree (W8A8 leaves) exactly like on the float tree."""
    from reflectionflow_tpu.ops.quant import quantize_dit_params

    params, latents, txt, pooled, img_ids, txt_ids, sigmas = setup
    qparams = quantize_dit_params(params, min_size=64 * 64, act_quant=True)
    out, n_full = denoise(
        qparams, CFG, latents, txt, pooled, img_ids, txt_ids, sigmas,
        jnp.asarray(3.5, jnp.float32), N_STEPS,
        vcache_threshold=1e9, vcache_warmup=1, vcache_tail=1,
        return_vcache_stats=True,
    )
    assert int(n_full) == 2
    assert np.isfinite(np.asarray(out, np.float32)).all()


def _manual_predictive(setup, mask, order):
    """Hand-rolled Euler loop with Newton divided-difference prediction on
    skipped steps — the reference for `vcache_order` (mirrors the kernel's
    per-candidate history and degenerate fallbacks)."""
    params, latents, txt, pooled, img_ids, txt_ids, sigmas = setup
    guidance = jnp.full((B,), 3.5, jnp.float32)
    lat = np.asarray(latents, np.float32)
    hist, sigs = [], []  # most recent first
    for i in range(N_STEPS):
        s = float(sigmas[i])
        if mask[i]:
            v = np.asarray(flux_dit_apply(
                params, CFG, jnp.asarray(lat), txt, pooled,
                jnp.broadcast_to(sigmas[i], (B,)).astype(jnp.float32),
                img_ids, txt_ids,
                guidance=guidance if CFG.guidance_embeds else None,
            ), np.float32)
            hist = [v] + hist[:order]
            sigs = [s] + sigs[:order]
        else:
            v = hist[0].copy()
            if len(hist) >= 2:
                d1 = (hist[0] - hist[1]) / (sigs[0] - sigs[1])
                v = v + d1 * (s - sigs[0])
                if order >= 2 and len(hist) >= 3:
                    d1b = (hist[1] - hist[2]) / (sigs[1] - sigs[2])
                    d2 = (d1 - d1b) / (sigs[0] - sigs[2])
                    v = v + d2 * (s - sigs[0]) * (s - sigs[1])
        lat = lat + (float(sigmas[i + 1]) - s) * v
    return lat


@pytest.mark.parametrize("order", [1, 2])
def test_predictive_static_matches_manual(setup, order):
    mask = np.array([True, True, False, False, True, False])
    out = _denoise(setup, step_mask=jnp.asarray(mask), vcache_order=order)
    ref = _manual_predictive(setup, mask, order)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-5, atol=3e-5)
    # prediction differs from order-0 reuse once two history points exist
    reuse = _denoise(setup, step_mask=jnp.asarray(mask))
    assert not np.allclose(np.asarray(out), np.asarray(reuse))


def test_predictive_single_point_falls_back_to_reuse(setup):
    # only one full forward before the skips -> no divided difference to
    # take; order 1 must be exactly order-0 reuse
    mask = np.array([True, False, False, False, False, True])
    np.testing.assert_array_equal(
        np.asarray(_denoise(setup, step_mask=jnp.asarray(mask), vcache_order=1)),
        np.asarray(_denoise(setup, step_mask=jnp.asarray(mask))),
    )


@pytest.mark.parametrize("degree", [1, 2])
def test_predictive_tracks_smooth_field_exactly(monkeypatch, degree):
    """The reason `order` exists: where the velocity field IS smooth
    (polynomial in sigma here; trained flow models empirically — arXiv
    2503.06923), order-`degree` prediction reproduces the dense trajectory
    on skipped steps exactly, while order-0 reuse freezes the velocity and
    drifts. This isolates the extrapolation math from model smoothness,
    which random tiny weights do NOT have (a trained model's is the
    calibration harness's job to verify). Shapes are DISTINCT from the
    `setup` fixture's and the jit cache is cleared afterwards: `denoise`
    is module-jitted, so a same-shape call would reuse the executable
    traced with the real model instead of the patched field."""
    from reflectionflow_tpu.sampler import generate as gen

    B2, L2 = 3, 9
    shape = (B2, L2, CFG.in_channels)
    coef = [
        0.31 * jnp.cos(jnp.arange(np.prod(shape)).reshape(shape) * (0.13 * (d + 1)))
        for d in range(degree + 1)
    ]

    def fake_apply(params, cfg, lat, txt, pooled, timestep, *a, **k):
        s = timestep[:, None, None].astype(jnp.float32)
        v = jnp.zeros(shape, jnp.float32)
        for d, c in enumerate(coef):
            v = v + c * s**d
        return v.astype(lat.dtype)

    monkeypatch.setattr(gen, "flux_dit_apply", fake_apply)

    def run(**kw):
        lat0 = jax.random.normal(jax.random.PRNGKey(7), shape, jnp.float32)
        txt = jnp.zeros((B2, 4, CFG.text_dim))
        pooled = jnp.zeros((B2, CFG.pooled_dim))
        sigmas = make_schedule(N_STEPS, L2)
        return np.asarray(denoise(
            None, CFG, lat0, txt, pooled, jnp.zeros((L2, 3)), jnp.zeros((4, 3)),
            sigmas, jnp.asarray(3.5, jnp.float32), N_STEPS, **kw,
        ), np.float32)

    try:
        dense = run()
        mask = jnp.asarray(
            np.array([True] * (degree + 1) + [False] * (N_STEPS - degree - 2) + [True]))
        err = {
            o: float(np.max(np.abs(run(step_mask=mask, vcache_order=o) - dense)))
            for o in (0, degree)
        }
    finally:
        denoise.clear_cache()  # drop executables traced with the fake field
    assert err[degree] < 1e-4, err
    assert err[0] > 100 * err[degree], err


def test_predictive_dynamic_mode_composes(setup):
    out, n_full = _denoise(
        setup, vcache_threshold=1e9, vcache_warmup=2, vcache_tail=1,
        vcache_order=1, return_vcache_stats=True,
    )
    assert int(n_full) == 3
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # warmup gives two history points; the gap steps must extrapolate, so
    # the result differs from the order-0 dynamic run
    reuse, _ = _denoise(
        setup, vcache_threshold=1e9, vcache_warmup=2, vcache_tail=1,
        return_vcache_stats=True,
    )
    assert not np.allclose(np.asarray(out), np.asarray(reuse))


def test_vcache_order_validation_and_plumbing(setup):
    from reflectionflow_tpu.sampler.generate import vcache_kwargs

    with pytest.raises(ValueError):
        _denoise(setup, step_mask=jnp.ones(N_STEPS, bool), vcache_order=3)
    kw = vcache_kwargs({"interval": 3, "order": 1}, N_STEPS)
    assert kw["vcache_order"] == 1 and "step_mask" in kw
    kw = vcache_kwargs({"threshold": 0.3, "order": 2}, N_STEPS)
    assert kw["vcache_order"] == 2
    assert "vcache_order" not in vcache_kwargs({"interval": 3}, N_STEPS)


def test_residual_decode_identity(setup):
    """The TeaCache cache contract: re-embedding the SAME latents and adding
    the captured transformer residual through the live output head must
    reproduce the full forward (this is what makes the skipped-step graph
    `flux_residual_decode` the cited method's, not an approximation of it)."""
    from reflectionflow_tpu.models.flux.dit import flux_residual_decode

    params, latents, txt, pooled, img_ids, txt_ids, sigmas = setup
    t = jnp.broadcast_to(sigmas[0], (B,)).astype(jnp.float32)
    guidance = jnp.full((B,), 3.5, jnp.float32)
    g = guidance if CFG.guidance_embeds else None
    v_full, resid = flux_dit_apply(
        params, CFG, latents, txt, pooled, t, img_ids, txt_ids,
        guidance=g, return_img_residual=True,
    )
    assert resid.shape == (B, TY * TX, CFG.hidden_size)
    v_dec = flux_residual_decode(params, CFG, latents, resid, pooled, t, guidance=g)
    np.testing.assert_allclose(
        np.asarray(v_dec), np.asarray(v_full), rtol=1e-5, atol=1e-5)
    # and the plain forward is unchanged by the flag
    v_plain = flux_dit_apply(
        params, CFG, latents, txt, pooled, t, img_ids, txt_ids, guidance=g)
    np.testing.assert_allclose(
        np.asarray(v_full), np.asarray(v_plain), rtol=1e-6, atol=1e-6)


def test_residual_mode_static_matches_manual(setup):
    """vcache_cached='residual' against a hand-rolled loop: full steps run
    the DiT and capture the residual; skipped steps embed the CURRENT
    latents, add the cached residual, and run the real output head."""
    from reflectionflow_tpu.models.flux.dit import flux_residual_decode

    params, latents, txt, pooled, img_ids, txt_ids, sigmas = setup
    mask = np.array([True, False, True, False, False, True])
    out = _denoise(setup, step_mask=jnp.asarray(mask), vcache_cached="residual")

    guidance = jnp.full((B,), 3.5, jnp.float32)
    g = guidance if CFG.guidance_embeds else None
    lat, resid = latents, None
    for i in range(N_STEPS):
        t = jnp.broadcast_to(sigmas[i], (B,)).astype(jnp.float32)
        if mask[i]:
            v, resid = flux_dit_apply(
                params, CFG, lat, txt, pooled, t, img_ids, txt_ids,
                guidance=g, return_img_residual=True,
            )
        else:
            v = flux_residual_decode(params, CFG, lat, resid, pooled, t, guidance=g)
        lat = (lat.astype(jnp.float32)
               + (sigmas[i + 1] - sigmas[i]) * v.astype(jnp.float32)).astype(lat.dtype)
    np.testing.assert_allclose(np.asarray(out), np.asarray(lat), rtol=3e-5, atol=3e-5)
    # the residual skip differs from velocity reuse (fresh input embedding
    # re-reads the advanced latents) and from the dense run
    reuse = _denoise(setup, step_mask=jnp.asarray(mask))
    assert not np.allclose(np.asarray(out), np.asarray(reuse))
    assert not np.allclose(np.asarray(out), np.asarray(_denoise(setup)))


def test_residual_mode_all_true_matches_baseline(setup):
    full = _denoise(setup, step_mask=jnp.ones(N_STEPS, bool), vcache_cached="residual")
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(_denoise(setup)), rtol=1e-6, atol=1e-6)


def test_residual_dynamic_and_cfg_compose(setup):
    from reflectionflow_tpu.models.flux.rope import make_image_ids

    out, n_full = _denoise(
        setup, vcache_threshold=1e9, vcache_warmup=1, vcache_tail=1,
        vcache_cached="residual", return_vcache_stats=True,
    )
    assert int(n_full) == 2
    assert np.isfinite(np.asarray(out, np.float32)).all()

    # corrector path: cond stream + image CFG's doubled batch keeps one
    # residual per CFG branch
    params, latents, txt, pooled, img_ids, txt_ids, sigmas = setup
    cond = jax.random.normal(jax.random.PRNGKey(9), (B, 4, CFG.in_channels), jnp.float32)
    kw = dict(cond=cond, cond_ids=jnp.asarray(make_image_ids(2, 2)),
              cond_empty=jnp.zeros_like(cond), image_guidance_scale=1.5)
    mask = np.array([True, True, False, True, False, True])
    res = _denoise(setup, step_mask=jnp.asarray(mask), vcache_cached="residual", **kw)
    assert res.shape == latents.shape
    assert np.isfinite(np.asarray(res, np.float32)).all()
    assert not np.allclose(np.asarray(res), np.asarray(_denoise(setup, **kw)))


def test_module_cache_identities(setup):
    """TaylorSeer per-module contract: (a) return_module_outs leaves the
    forward unchanged; (b) the glue-only predict forward consuming the
    TRUE module outputs reproduces the full forward exactly (fresh AdaLN
    gates + residual adds are the only recomputation)."""
    params, latents, txt, pooled, img_ids, txt_ids, sigmas = setup
    t = jnp.broadcast_to(sigmas[0], (B,)).astype(jnp.float32)
    g = jnp.full((B,), 3.5, jnp.float32) if CFG.guidance_embeds else None
    plain = flux_dit_apply(params, CFG, latents, txt, pooled, t, img_ids, txt_ids, guidance=g)
    full, cache = flux_dit_apply(params, CFG, latents, txt, pooled, t, img_ids, txt_ids,
                                 guidance=g, return_module_outs=True)
    np.testing.assert_allclose(np.asarray(full), np.asarray(plain), rtol=1e-6, atol=1e-6)
    assert cache["double"][0].shape == (CFG.num_double_blocks, B, TY * TX, CFG.hidden_size)
    assert cache["single"].shape == (CFG.num_single_blocks, B, LT + TY * TX, CFG.hidden_size)
    pred = flux_dit_apply(params, CFG, latents, txt, pooled, t, img_ids, txt_ids,
                          guidance=g, module_cache=cache)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(full), rtol=1e-6, atol=1e-6)
    # the mode covers the plain t2i path only
    cond = jnp.zeros((B, 4, CFG.in_channels))
    with pytest.raises(ValueError):
        flux_dit_apply(params, CFG, latents, txt, pooled, t, img_ids, txt_ids,
                       guidance=g, cond=cond, return_module_outs=True)


def test_module_mode_static_matches_manual(setup):
    """vcache_cached='module' against a hand-rolled TaylorSeer loop: full
    steps collect every block's module outputs; skipped steps forecast
    each by first-order divided difference (per-module, the citation's
    granularity) and run the glue-only forward."""
    params, latents, txt, pooled, img_ids, txt_ids, sigmas = setup
    mask = np.array([True, True, False, True, False, True])
    out = _denoise(setup, step_mask=jnp.asarray(mask), vcache_cached="module")

    g = jnp.full((B,), 3.5, jnp.float32) if CFG.guidance_embeds else None
    f32 = lambda c: jax.tree.map(lambda a: np.asarray(a, np.float32), c)  # noqa: E731
    lat = latents
    hist, sigs = [], []
    for i in range(N_STEPS):
        s = float(sigmas[i])
        t = jnp.broadcast_to(sigmas[i], (B,)).astype(jnp.float32)
        if mask[i]:
            v, cache = flux_dit_apply(params, CFG, lat, txt, pooled, t, img_ids, txt_ids,
                                      guidance=g, return_module_outs=True)
            hist = [f32(cache)] + hist[:1]
            sigs = [s] + sigs[:1]
        else:
            if len(hist) >= 2:
                d = (s - sigs[0]) / (sigs[0] - sigs[1])
                hat = jax.tree.map(lambda a0, a1: a0 + (a0 - a1) * d, hist[0], hist[1])
            else:
                hat = hist[0]
            v = flux_dit_apply(params, CFG, lat, txt, pooled, t, img_ids, txt_ids,
                               guidance=g, module_cache=hat)
        lat = (lat.astype(jnp.float32)
               + (sigmas[i + 1] - sigmas[i]) * v.astype(jnp.float32)).astype(lat.dtype)
    np.testing.assert_allclose(np.asarray(out), np.asarray(lat), rtol=3e-5, atol=3e-5)
    # differs from both the dense run and the output-velocity Taylor variant
    assert not np.allclose(np.asarray(out), np.asarray(_denoise(setup)))
    vel = _denoise(setup, step_mask=jnp.asarray(mask), vcache_order=1)
    assert not np.allclose(np.asarray(out), np.asarray(vel))


def test_module_mode_cfg_and_validation(setup):
    from reflectionflow_tpu.models.flux.rope import make_image_ids
    from reflectionflow_tpu.sampler.generate import vcache_kwargs

    # image CFG doubles the cache rows (one per branch)
    params, latents, txt, pooled, img_ids, txt_ids, sigmas = setup
    mask = jnp.asarray(np.array([True, True, False, True, False, True]))
    # module mode + cond stream is rejected
    cond = jax.random.normal(jax.random.PRNGKey(9), (B, 4, CFG.in_channels), jnp.float32)
    with pytest.raises(ValueError):
        _denoise(setup, step_mask=mask, vcache_cached="module",
                 cond=cond, cond_ids=jnp.asarray(make_image_ids(2, 2)),
                 cond_empty=jnp.zeros_like(cond), image_guidance_scale=1.5)
    with pytest.raises(ValueError):
        _denoise(setup, step_mask=mask, vcache_cached="module", vcache_order=1)
    kw = vcache_kwargs({"interval": 3, "module": True}, N_STEPS)
    assert kw["vcache_cached"] == "module"
    with pytest.raises(ValueError):
        vcache_kwargs({"interval": 3, "module": True, "residual": True}, N_STEPS)


def test_pinned_mask_and_force_mask(setup):
    """`make_pinned_mask` + `vcache_force_mask`: the bench's lever for
    pinning a dynamic schedule's forward count to a known operating point
    on weight trees whose signal trajectory is meaningless (random init).
    Forcing can only ADD full forwards; static mode rejects the kwarg."""
    from reflectionflow_tpu.sampler.generate import make_pinned_mask

    m = make_pinned_mask(30, 15)
    assert m.sum() == 15 and m[0] and m[-1]
    assert make_pinned_mask(6, 2).tolist() == [True, False, False, False, False, True]
    with pytest.raises(ValueError):
        make_pinned_mask(6, 1)
    with pytest.raises(ValueError):
        make_pinned_mask(6, 7)

    # huge threshold -> the signal never fires -> n_full == the pin exactly
    pin = make_pinned_mask(N_STEPS, 4)
    out, n_full = _denoise(
        setup, vcache_threshold=1e9, vcache_warmup=1, vcache_tail=1,
        vcache_cached="residual", vcache_force_mask=jnp.asarray(pin),
        return_vcache_stats=True,
    )
    assert int(n_full) == 4
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # epsilon threshold -> the signal fires on top of the pin (adds, never removes)
    _, n_all = _denoise(
        setup, vcache_threshold=1e-9, vcache_force_mask=jnp.asarray(pin),
        return_vcache_stats=True,
    )
    assert int(n_all) == N_STEPS
    with pytest.raises(ValueError):
        _denoise(setup, step_mask=jnp.ones(N_STEPS, bool),
                 vcache_force_mask=jnp.asarray(pin))


def test_residual_validation_and_grammar(setup):
    from reflectionflow_tpu.sampler.generate import vcache_kwargs
    from reflectionflow_tpu.sampler.vcache_calibrate import (
        TEACACHE_FLUX_POLY,
        teacache_flux_schedule,
    )

    # residual caches ONE residual — Taylor orders are a velocity-mode lever
    with pytest.raises(ValueError):
        _denoise(setup, step_mask=jnp.ones(N_STEPS, bool),
                 vcache_cached="residual", vcache_order=1)
    with pytest.raises(ValueError):
        _denoise(setup, step_mask=jnp.ones(N_STEPS, bool), vcache_cached="bogus")

    kw = vcache_kwargs({"interval": 3, "residual": True}, N_STEPS)
    assert kw["vcache_cached"] == "residual" and "step_mask" in kw
    # the method-exact TeaCache preset parses through the one grammar:
    # their threshold, their poly, their cached quantity
    kw = vcache_kwargs(teacache_flux_schedule(), N_STEPS)
    assert kw["vcache_cached"] == "residual"
    assert kw["vcache_threshold"] == 0.6
    assert kw["vcache_poly"] == TEACACHE_FLUX_POLY
    out = _denoise(setup, vcache_threshold=kw["vcache_threshold"],
                   vcache_poly=kw["vcache_poly"], vcache_cached="residual")
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_pipeline_vcache_plumbing():
    from reflectionflow_tpu.config import CLIPTextConfig, FluxVAEConfig, T5Config
    from reflectionflow_tpu.sampler.pipeline import FluxPipeline

    pipe = FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(), vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(), clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    base = pipe.generate(["x"], height=16, width=16, num_inference_steps=4, seed=1)
    pipe.vcache = {"interval": 3, "warmup": 1, "tail": 1}
    skipped = pipe.generate(["x"], height=16, width=16, num_inference_steps=4, seed=1)
    assert skipped.shape == base.shape
    pipe.vcache = {"threshold": 1e9, "warmup": 1, "tail": 1}
    dyn = pipe.generate(["x"], height=16, width=16, num_inference_steps=4, seed=1)
    assert dyn.shape == base.shape
    pipe.vcache = {"interval": 2, "threshold": 0.5}
    with pytest.raises(ValueError):
        pipe.generate(["x"], height=16, width=16, num_inference_steps=4, seed=1)
    pipe.vcache = {"warmup": 2}
    with pytest.raises(ValueError):
        pipe.generate(["x"], height=16, width=16, num_inference_steps=4, seed=1)


def test_vcache_sharded_matches_unsharded():
    """Per-candidate decisions under the candidate (data) mesh: sharding the
    batch axis must not change dynamic-mode outputs (the accumulators are
    per-row; the any-row launch predicate is replicated by construction)."""
    from reflectionflow_tpu.config import CLIPTextConfig, FluxVAEConfig, T5Config
    from reflectionflow_tpu.parallel.mesh import make_mesh, replicate_params
    from reflectionflow_tpu.sampler.pipeline import FluxPipeline

    pipe = FluxPipeline.random_init(
        jax.random.PRNGKey(0),
        dit_cfg=FluxDiTConfig.tiny(), vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(), clip_cfg=CLIPTextConfig.tiny(),
        dtype=jnp.float32,
    )
    pipe.vcache = {"threshold": 0.35, "warmup": 1, "tail": 1}
    prompts = [f"prompt {i}" for i in range(8)]
    base = pipe.generate(prompts, height=16, width=16, num_inference_steps=4, seed=0)
    mesh = make_mesh()
    pipe.mesh = mesh
    pipe.params = replicate_params(pipe.params, mesh)
    sharded = pipe.generate(prompts, height=16, width=16, num_inference_steps=4, seed=0)
    np.testing.assert_allclose(base.astype(np.int32), sharded.astype(np.int32), atol=1)


def test_config_carries_vcache(tmp_path):
    import json

    from reflectionflow_tpu.config import TTSConfig

    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({
        "pipeline_args": {"height": 16, "width": 16,
                          "vcache": {"interval": 2, "warmup": 2}},
    }))
    cfg = TTSConfig.load(str(p), {})
    assert cfg.pipeline_args.vcache == {"interval": 2, "warmup": 2}

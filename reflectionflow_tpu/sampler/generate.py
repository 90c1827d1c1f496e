"""The jitted FLUX sampling core + user-facing pipeline.

Re-design of the reference's conditioned Euler pipeline
(`/root/reference/train_flux/flux/generate.py:75-320`) as pure jitted
functions:

  * the denoise loop is a `lax.scan` over the precomputed sigma schedule —
    zero host round-trips between steps;
  * image CFG runs the conditional and black-condition branches as one
    doubled batch through the DiT (the reference does two serial forwards);
  * candidate parallelism is the batch axis: the search loops shard it over
    the mesh (`parallel.sharding`), not a serial micro-batch loop.

Everything here takes explicit params/config — state lives in
`pipeline.FluxPipeline`, which owns weights and tokenizers.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FluxDiTConfig
from ..models.flux.dit import flux_dit_apply, flux_mod_signal, flux_residual_decode
from .scheduler import FlowMatchSchedule


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "union_cond_attn",
        "add_cond_attn",
        "attn_impl",
        "rope_layout",
        "num_steps",
        "c_factor",  # static so the Pallas path can burn log(c) into the kernel
        "vcache_threshold",
        "vcache_warmup",
        "vcache_tail",
        "vcache_poly",
        "vcache_order",
        "vcache_cached",
        "return_vcache_stats",
    ),
)
def denoise(
    dit_params,
    cfg: FluxDiTConfig,
    latents: jnp.ndarray,  # (B, L_img, C) packed noise
    txt: jnp.ndarray,  # (B, L_txt, text_dim)
    pooled: jnp.ndarray,  # (B, pooled_dim)
    img_ids: jnp.ndarray,  # (L_img, 3)
    txt_ids: jnp.ndarray,  # (L_txt, 3)
    sigmas: jnp.ndarray,  # (num_steps + 1,)
    guidance_scale: jnp.ndarray,  # scalar
    num_steps: int,
    cond: jnp.ndarray | None = None,  # (B, L_c, C)
    cond_ids: jnp.ndarray | None = None,
    cond_empty: jnp.ndarray | None = None,  # (B, L_c, C) black-image tokens
    cond_dit_params=None,  # LoRA-folded weights for the cond stream
    image_guidance_scale: float | jnp.ndarray = 1.0,
    c_factor: float | None = None,
    union_cond_attn: bool = True,
    add_cond_attn: bool = False,
    attn_impl: str = "xla",
    rope_layout: str = "pair",
    step_mask: jnp.ndarray | None = None,  # (num_steps,) bool: True = full forward
    vcache_threshold: float = 0.0,  # >0: TeaCache-style dynamic skipping
    vcache_warmup: int = 1,  # dynamic mode: first W steps always full
    vcache_tail: int = 1,  # dynamic mode: last T steps always full
    vcache_poly: tuple[float, ...] | None = None,  # optional model-fit rescale
    vcache_order: int = 0,  # 0=reuse cached v; 1/2=Taylor-predict skipped v
    vcache_cached: str = "velocity",  # what skipped steps consume (or "residual")
    vcache_force_mask: jnp.ndarray | None = None,  # dynamic mode: extra forced-full steps
    return_vcache_stats: bool = False,  # also return the full-forward count
) -> jnp.ndarray:
    """Run the full Euler loop; returns final packed latents (B, L_img, C).

    Velocity cache (OPT-IN; beyond the reference): skipped steps reuse the
    previous velocity instead of running the DiT — training-free
    acceleration in the DeepCache/TeaCache family. Two modes:

      * `step_mask`: a static schedule (see `make_step_mask`) — full
        forwards only where the mask is True (step 0 is always forced).
      * `vcache_threshold > 0`: data-dependent skipping à la TeaCache
        (arXiv 2411.19108) — every step computes the cheap modulated-input
        signal (`flux_mod_signal`, ~0.05% of a forward), accumulates its
        relative L1 change (optionally rescaled by the `vcache_poly`
        polynomial, highest-order coefficient first), and runs the full
        forward only when the accumulator crosses the threshold (then
        resets). First `vcache_warmup` / last `vcache_tail` steps always
        run full. Decisions are PER CANDIDATE (each batch row keeps its own
        accumulator and cached velocity), so a candidate's output does not
        depend on its micro-batch composition; the batch forward launches
        whenever any row crosses (with `return_vcache_stats`, n_full counts
        those launches). The launch decision lives in one `lax.cond` inside
        the scan — it never leaves the device.

    `vcache_cached` picks WHAT skipped steps consume (either mode):
      * "velocity" (default) — the raw DiT output velocity;
      * "residual" — TeaCache's exact cached quantity (arXiv 2411.19108,
        reference impl `teacache_flux.py`): the image-stream residual
        across the transformer blocks. A skipped step embeds the CURRENT
        latents (`img_in`), adds the cached residual, and runs the real
        final AdaLN + projection (`flux_residual_decode`) — so the input
        embedding and output head stay live every step, exactly the
        cited method's skip-step compute graph. Combined with
        `vcache_threshold` + the published FLUX.1-dev rescale polynomial
        (`vcache_calibrate.TEACACHE_FLUX_POLY`) this is method-exact
        TeaCache: their signal, their rescale, their thresholds, their
        cached quantity — our only deltas are per-candidate accumulators
        (identical at B=1) and TPU timing. Costs one (B, L_img, hidden)
        carry buffer + two thin matmuls per skipped step.
      * "module" — TaylorSeer-faithful PER-MODULE forecasting (arXiv
        2503.06923): every block's pre-gate attn/MLP outputs are cached
        (order-1 divided-difference forecast; history stored in the
        model compute dtype with fp32 divided differences, per
        candidate) and skipped steps run the glue-only forward — fresh
        AdaLN gates from the recomputed temb, residual adds, output
        head. Plain t2i only (no cond stream). Costs TWO cache snapshots
        in the carry (1.076G values each at 1024px full depth — fits
        <=512px on 16 GB; the infeasibility arithmetic lives in
        `vcache_calibrate.LITERATURE_ANCHORS["taylor_o2_interval6"]`).

    `vcache_order` upgrades what a SKIPPED step uses (velocity mode):
      * 0 (default) — reuse the last computed velocity unchanged;
      * 1 / 2 — TaylorSeer-style prediction (arXiv 2503.06923): keep the
        last `order+1` full-forward velocities with the sigmas they were
        computed at, and evaluate the Newton divided-difference polynomial
        at the current sigma. Where the velocity field is smooth along the
        flow trajectory (trained flow models — the cited paper's finding
        on FLUX.1-dev; NOT random test weights), extrapolation tracks its
        drift while order-0 reuse freezes it, so deeper skip schedules
        hold quality (`vcache_calibrate.LITERATURE_ANCHORS`; exactness on
        polynomial fields pinned in test_vcache.py). Costs `order` extra
        latent-sized fp32 buffers and a few elementwise ops per skipped
        step — no extra DiT launches. History and the divided differences
        are PER CANDIDATE (degenerate histories fall back: 2 points =
        linear, 1 point = reuse).

    Defaults leave the feature off and take the exact unmodified path.
    Quality/threshold trade-offs are model-specific — validate on real
    weights before production use (docs/DEPLOYMENT.md)."""
    B = latents.shape[0]
    guidance = jnp.broadcast_to(jnp.asarray(guidance_scale, latents.dtype), (B,))
    use_image_cfg = cond_empty is not None

    def velocity(lat, t_scalar):
        timestep = jnp.broadcast_to(t_scalar, (B,)).astype(lat.dtype)
        if use_image_cfg:
            # one doubled-batch forward: [conditional | black-condition]
            lat2 = jnp.concatenate([lat, lat], axis=0)
            t2 = jnp.concatenate([timestep, timestep], axis=0)
            g2 = jnp.concatenate([guidance, jnp.ones_like(guidance)], axis=0)
            cond2 = jnp.concatenate([cond, cond_empty], axis=0)
            txt2 = jnp.concatenate([txt, txt], axis=0)
            pooled2 = jnp.concatenate([pooled, pooled], axis=0)
            v2 = flux_dit_apply(
                dit_params, cfg, lat2, txt2, pooled2, t2, img_ids, txt_ids,
                guidance=g2 if cfg.guidance_embeds else None,
                cond=cond2, cond_ids=cond_ids, c_factor=c_factor,
                union_cond_attn=union_cond_attn, add_cond_attn=add_cond_attn,
                attn_impl=attn_impl, cond_params=cond_dit_params,
                rope_layout=rope_layout,
            )
            v_cond, v_unc = v2[:B], v2[B:]
            return v_unc + jnp.asarray(image_guidance_scale, v2.dtype) * (v_cond - v_unc)
        return flux_dit_apply(
            dit_params, cfg, lat, txt, pooled, timestep, img_ids, txt_ids,
            guidance=guidance if cfg.guidance_embeds else None,
            cond=cond, cond_ids=cond_ids, c_factor=c_factor,
            union_cond_attn=union_cond_attn, add_cond_attn=add_cond_attn,
            attn_impl=attn_impl, cond_params=cond_dit_params,
            rope_layout=rope_layout,
        )

    def velocity_resid(lat, t_scalar):
        """velocity() that also returns the image-stream transformer
        residual (the TeaCache cached quantity; (2B, ...) rows under
        image CFG — each CFG branch keeps its own residual)."""
        timestep = jnp.broadcast_to(t_scalar, (B,)).astype(lat.dtype)
        if use_image_cfg:
            lat2 = jnp.concatenate([lat, lat], axis=0)
            t2 = jnp.concatenate([timestep, timestep], axis=0)
            g2 = jnp.concatenate([guidance, jnp.ones_like(guidance)], axis=0)
            cond2 = jnp.concatenate([cond, cond_empty], axis=0)
            txt2 = jnp.concatenate([txt, txt], axis=0)
            pooled2 = jnp.concatenate([pooled, pooled], axis=0)
            v2, r2 = flux_dit_apply(
                dit_params, cfg, lat2, txt2, pooled2, t2, img_ids, txt_ids,
                guidance=g2 if cfg.guidance_embeds else None,
                cond=cond2, cond_ids=cond_ids, c_factor=c_factor,
                union_cond_attn=union_cond_attn, add_cond_attn=add_cond_attn,
                attn_impl=attn_impl, cond_params=cond_dit_params,
                rope_layout=rope_layout, return_img_residual=True,
            )
            v_cond, v_unc = v2[:B], v2[B:]
            return v_unc + jnp.asarray(image_guidance_scale, v2.dtype) * (v_cond - v_unc), r2
        return flux_dit_apply(
            dit_params, cfg, lat, txt, pooled, timestep, img_ids, txt_ids,
            guidance=guidance if cfg.guidance_embeds else None,
            cond=cond, cond_ids=cond_ids, c_factor=c_factor,
            union_cond_attn=union_cond_attn, add_cond_attn=add_cond_attn,
            attn_impl=attn_impl, cond_params=cond_dit_params,
            rope_layout=rope_layout, return_img_residual=True,
        )

    def velocity_modules(lat, t_scalar):
        """velocity() that also returns the TaylorSeer module cache (every
        block's pre-gate attn/MLP outputs; (2B, ...) rows under image CFG).
        History is STORED in the model compute dtype — the fp32-history
        variant measured-OOMs by 69 MB at 512px full depth next to the
        11.9 GB W8A8 DiT (15.81/15.75 GB hbm) — and the divided
        differences are computed in fp32 from the stored snapshots."""
        timestep = jnp.broadcast_to(t_scalar, (B,)).astype(lat.dtype)
        if use_image_cfg:
            lat2 = jnp.concatenate([lat, lat], axis=0)
            t2 = jnp.concatenate([timestep, timestep], axis=0)
            g2 = jnp.concatenate([guidance, jnp.ones_like(guidance)], axis=0)
            txt2 = jnp.concatenate([txt, txt], axis=0)
            pooled2 = jnp.concatenate([pooled, pooled], axis=0)
            v2, cache = flux_dit_apply(
                dit_params, cfg, lat2, txt2, pooled2, t2, img_ids, txt_ids,
                guidance=g2 if cfg.guidance_embeds else None,
                attn_impl=attn_impl, rope_layout=rope_layout,
                return_module_outs=True,
            )
            v_cond, v_unc = v2[:B], v2[B:]
            v = v_unc + jnp.asarray(image_guidance_scale, v2.dtype) * (v_cond - v_unc)
            return v, cache
        v, cache = flux_dit_apply(
            dit_params, cfg, lat, txt, pooled, timestep, img_ids, txt_ids,
            guidance=guidance if cfg.guidance_embeds else None,
            attn_impl=attn_impl, rope_layout=rope_layout,
            return_module_outs=True,
        )
        return v, cache

    def velocity_from_modules(lat, t_scalar, cache):
        """TaylorSeer skip step: every block adds its FORECAST module
        outputs through fresh AdaLN gates (temb recomputed) — the glue
        runs, only the attention/MLP matmuls are skipped."""
        timestep = jnp.broadcast_to(t_scalar, (B,)).astype(lat.dtype)
        if use_image_cfg:
            lat2 = jnp.concatenate([lat, lat], axis=0)
            t2 = jnp.concatenate([timestep, timestep], axis=0)
            g2 = jnp.concatenate([guidance, jnp.ones_like(guidance)], axis=0)
            txt2 = jnp.concatenate([txt, txt], axis=0)
            pooled2 = jnp.concatenate([pooled, pooled], axis=0)
            v2 = flux_dit_apply(
                dit_params, cfg, lat2, txt2, pooled2, t2, img_ids, txt_ids,
                guidance=g2 if cfg.guidance_embeds else None,
                attn_impl=attn_impl, rope_layout=rope_layout, module_cache=cache,
            )
            v_cond, v_unc = v2[:B], v2[B:]
            return v_unc + jnp.asarray(image_guidance_scale, v2.dtype) * (v_cond - v_unc)
        return flux_dit_apply(
            dit_params, cfg, lat, txt, pooled, timestep, img_ids, txt_ids,
            guidance=guidance if cfg.guidance_embeds else None,
            attn_impl=attn_impl, rope_layout=rope_layout, module_cache=cache,
        )

    def velocity_from_resid(lat, t_scalar, resid):
        """TeaCache skip step: fresh input embedding + cached residual +
        real output head (flux_residual_decode), CFG-combined the same
        way as a full forward."""
        timestep = jnp.broadcast_to(t_scalar, (B,)).astype(lat.dtype)
        if use_image_cfg:
            lat2 = jnp.concatenate([lat, lat], axis=0)
            t2 = jnp.concatenate([timestep, timestep], axis=0)
            g2 = jnp.concatenate([guidance, jnp.ones_like(guidance)], axis=0)
            pooled2 = jnp.concatenate([pooled, pooled], axis=0)
            v2 = flux_residual_decode(
                dit_params, cfg, lat2, resid, pooled2, t2,
                guidance=g2 if cfg.guidance_embeds else None,
            )
            v_cond, v_unc = v2[:B], v2[B:]
            return v_unc + jnp.asarray(image_guidance_scale, v2.dtype) * (v_cond - v_unc)
        return flux_residual_decode(
            dit_params, cfg, lat, resid, pooled, timestep,
            guidance=guidance if cfg.guidance_embeds else None,
        )

    def _advance(lat, v, sigma, sigma_next):
        # fp32 state update to avoid bf16 drift over 30 steps
        return (lat.astype(jnp.float32) + (sigma_next - sigma) * v.astype(jnp.float32)).astype(lat.dtype)

    steps = (sigmas[:num_steps], sigmas[1 : num_steps + 1])
    use_vcache = step_mask is not None or vcache_threshold > 0.0
    if not use_vcache:  # the exact, unmodified serving path
        def euler_step(lat, step_inputs):
            sigma, sigma_next = step_inputs
            return _advance(lat, velocity(lat, sigma), sigma, sigma_next), None

        latents, _ = jax.lax.scan(euler_step, latents, steps)
        return (latents, jnp.asarray(num_steps, jnp.int32)) if return_vcache_stats else latents

    dynamic = vcache_threshold > 0.0
    if step_mask is not None:
        if dynamic:
            raise ValueError("step_mask and vcache_threshold are mutually exclusive")
        assert step_mask.shape[0] == num_steps, (step_mask.shape, num_steps)
    if dynamic:
        warmup = max(int(vcache_warmup), 1)  # step 0 must run full (no cached v yet)
        idx = jnp.arange(num_steps)
        forced = (idx < warmup) | (idx >= num_steps - max(int(vcache_tail), 0))
        if vcache_force_mask is not None:
            # extra forced-full steps OR into the warmup/tail bits — the
            # live threshold machinery still runs every step and can only
            # ADD full forwards beyond this floor. The bench uses this to
            # pin a dynamic schedule's skip pattern to a known operating
            # point (the signal trajectory is a property of the weights).
            forced = forced | jnp.asarray(vcache_force_mask, bool)
    else:
        if vcache_force_mask is not None:
            raise ValueError("vcache_force_mask is a dynamic-mode lever; "
                             "fold it into step_mask for static schedules")
        forced = jnp.asarray(step_mask, bool).at[0].set(True)
    v0 = jnp.zeros_like(latents)
    order = int(vcache_order)
    if order not in (0, 1, 2):
        raise ValueError(f"vcache_order must be 0, 1, or 2 (got {vcache_order})")
    if vcache_cached not in ("velocity", "residual", "module"):
        raise ValueError(f"vcache_cached must be velocity|residual|module (got {vcache_cached!r})")
    residual_mode = vcache_cached == "residual"
    module_mode = vcache_cached == "module"
    if residual_mode and order != 0:
        raise ValueError(
            "vcache_cached='residual' is TeaCache's exact cache (one residual, "
            "order-0 reuse); Taylor prediction (vcache_order>0) is a velocity-mode lever"
        )
    if module_mode and order != 0:
        raise ValueError(
            "vcache_cached='module' has its own order-1 TaylorSeer forecast "
            "built in; vcache_order is a velocity-mode lever"
        )
    if module_mode and cond is not None:
        raise ValueError("vcache_cached='module' covers the plain t2i path (no cond stream)")

    def decide(lat, sigma, forced_bit, sig_prev, acc):
        """-> (do_full (B,), sig_prev', acc'). PER-CANDIDATE decision state:
        each candidate's accumulator sees only its own signal, so its output
        trajectory does not depend on which other candidates share the
        micro-batch (the pipeline's same-latents -> same-images contract).
        The batch forward LAUNCHES when any candidate crosses, but
        candidates whose accumulator stayed under threshold keep their
        cached velocity (the DiT is per-sample independent)."""
        if not dynamic:
            return jnp.broadcast_to(forced_bit, (B,)), sig_prev, acc
        sig = flux_mod_signal(
            dit_params, cfg, lat, pooled,
            jnp.broadcast_to(sigma, (B,)).astype(lat.dtype),
            guidance=guidance if cfg.guidance_embeds else None,
        ).astype(jnp.float32)
        rel = jnp.sum(jnp.abs(sig - sig_prev), axis=(1, 2)) / (
            jnp.sum(jnp.abs(sig_prev), axis=(1, 2)) + 1e-8)  # (B,)
        est = jnp.polyval(jnp.asarray(vcache_poly, jnp.float32), rel) if vcache_poly else rel
        acc = acc + est
        do_full = forced_bit | (acc >= vcache_threshold)  # (B,)
        acc = jnp.where(do_full, 0.0, acc)
        return do_full, sig, acc

    def cached_step(carry, step_inputs):
        lat, v_prev, sig_prev, acc, n_full = carry
        sigma, sigma_next, forced_bit = step_inputs
        do_full, sig_prev, acc = decide(lat, sigma, forced_bit, sig_prev, acc)
        any_full = jnp.any(do_full)
        v_new = jax.lax.cond(any_full, lambda l: velocity(l, sigma), lambda l: v_prev, lat)
        v = jnp.where(do_full[:, None, None], v_new, v_prev)
        lat = _advance(lat, v, sigma, sigma_next)
        return (lat, v, sig_prev, acc, n_full + any_full.astype(jnp.int32)), None

    def residual_step(carry, step_inputs):
        """TeaCache-exact body: the carry holds the image-stream
        transformer residual; skipped candidates re-embed the current
        latents, add the residual, and run the output head. The (cheap)
        skip velocity is computed unconditionally to keep the scan body
        shape-static — only the full forward hides behind the lax.cond."""
        lat, resid_prev, sig_prev, acc, n_full = carry
        sigma, sigma_next, forced_bit = step_inputs
        do_full, sig_prev, acc = decide(lat, sigma, forced_bit, sig_prev, acc)
        any_full = jnp.any(do_full)
        v_skip = velocity_from_resid(lat, sigma, resid_prev)
        v_new, resid_new = jax.lax.cond(
            any_full, lambda l: velocity_resid(l, sigma),
            lambda l: (v_skip, resid_prev), lat,
        )
        v = jnp.where(do_full[:, None, None], v_new, v_skip)
        rmask = jnp.concatenate([do_full, do_full]) if use_image_cfg else do_full
        resid = jnp.where(rmask[:, None, None], resid_new, resid_prev)
        lat = _advance(lat, v, sigma, sigma_next)
        return (lat, resid, sig_prev, acc, n_full + any_full.astype(jnp.int32)), None

    def module_step(carry, step_inputs):
        """TaylorSeer per-module body (arXiv 2503.06923, m=1): the carry
        holds the last TWO full-forward module caches with the sigmas they
        were computed at (per candidate); a skipped step forecasts every
        module's output by first-order divided difference (single-point
        histories fall back to reuse) and runs the glue-only forward. The
        skip velocity is computed unconditionally (shape-static body);
        only the full forward hides behind the lax.cond."""
        lat, h0, h1, sigs, kcnt, sig_prev, acc, n_full = carry
        sigma, sigma_next, forced_bit = step_inputs
        do_full, sig_prev, acc = decide(lat, sigma, forced_bit, sig_prev, acc)
        any_full = jnp.any(do_full)

        def col(s):  # (B,) -> broadcast over (n_blocks, rows, L, H)
            s2 = jnp.concatenate([s, s]) if use_image_cfg else s
            return s2[None, :, None, None]

        have2 = kcnt >= 2
        den = jnp.where(have2, sigs[:, 0] - sigs[:, 1], 1.0)

        def forecast(a0, a1):
            # divided differences in fp32; snapshots stay in storage dtype
            a0f = a0.astype(jnp.float32)
            d1 = jnp.where(col(have2), (a0f - a1.astype(jnp.float32)) / col(den), 0.0)
            return (a0f + d1 * (sigma - col(sigs[:, 0]))).astype(a0.dtype)

        cache_hat = jax.tree.map(forecast, h0, h1)
        v_skip = velocity_from_modules(lat, sigma, cache_hat)
        v_new, cache_new = jax.lax.cond(
            any_full, lambda l: velocity_modules(l, sigma),
            lambda l: (v_skip, h0), lat,
        )
        v = jnp.where(do_full[:, None, None], v_new, v_skip)
        full = col(do_full)
        h1 = jax.tree.map(lambda a0, a1: jnp.where(full, a0, a1), h0, h1)
        h0 = jax.tree.map(lambda new, a0: jnp.where(full, new, a0), cache_new, h0)
        sigs = jnp.where(do_full[:, None],
                         jnp.stack([jnp.full_like(sigs[:, 0], sigma), sigs[:, 0]], axis=1),
                         sigs)
        kcnt = kcnt + do_full.astype(jnp.int32)
        lat = _advance(lat, v, sigma, sigma_next)
        return (lat, h0, h1, sigs, kcnt, sig_prev, acc,
                n_full + any_full.astype(jnp.int32)), None

    def predictive_step(carry, step_inputs):
        """order >= 1: `hist`/`sigs` hold the last order+1 full-forward
        velocities (fp32 — bf16 divided differences would cancel) and the
        sigmas they were computed at; `k` counts full forwards so degenerate
        histories fall back gracefully (1 point = reuse, 2 = linear)."""
        lat, hist, sigs, k, sig_prev, acc, n_full = carry
        sigma, sigma_next, forced_bit = step_inputs
        do_full, sig_prev, acc = decide(lat, sigma, forced_bit, sig_prev, acc)
        any_full = jnp.any(do_full)
        v_new = jax.lax.cond(
            any_full, lambda l: velocity(l, sigma),
            lambda l: hist[0].astype(lat.dtype), lat,
        )
        # Newton divided-difference extrapolation at the current sigma,
        # from the PRE-step history (per candidate)
        col = lambda x: x[:, None, None]  # (B,) -> broadcastable  # noqa: E731
        have2, have3 = k >= 2, k >= 3
        den1 = jnp.where(have2, sigs[0] - sigs[1], 1.0)
        d1 = jnp.where(col(have2), (hist[0] - hist[1]) / col(den1), 0.0)
        vhat = hist[0] + d1 * (sigma - col(sigs[0]))
        if order >= 2:
            den1b = jnp.where(have3, sigs[1] - sigs[2], 1.0)
            d1b = jnp.where(col(have3), (hist[1] - hist[2]) / col(den1b), 0.0)
            den2 = jnp.where(have3, sigs[0] - sigs[2], 1.0)
            d2 = jnp.where(col(have3), (d1 - d1b) / col(den2), 0.0)
            vhat = vhat + d2 * (sigma - col(sigs[0])) * (sigma - col(sigs[1]))
        full = col(do_full)
        v = jnp.where(full, v_new.astype(jnp.float32), vhat)
        lat = _advance(lat, v, sigma, sigma_next)
        # shift the per-candidate history where this step ran full
        hist = (jnp.where(full, v_new.astype(jnp.float32), hist[0]),) + tuple(
            jnp.where(full, hist[i - 1], hist[i]) for i in range(1, order + 1)
        )
        sigs = (jnp.where(do_full, sigma, sigs[0]),) + tuple(
            jnp.where(do_full, sigs[i - 1], sigs[i]) for i in range(1, order + 1)
        )
        k = k + do_full.astype(jnp.int32)
        return (lat, hist, sigs, k, sig_prev, acc, n_full + any_full.astype(jnp.int32)), None

    # static mode never reads the signal — keep its carry slot scalar
    sig0 = (
        jnp.zeros(latents.shape[:2] + (cfg.hidden_size,), jnp.float32)
        if dynamic else jnp.zeros((), jnp.float32)
    )
    acc0 = jnp.zeros((B,), jnp.float32)
    n0 = jnp.asarray(0, jnp.int32)
    if module_mode:
        rows = 2 * B if use_image_cfg else B
        Li, Lt, H = latents.shape[1], txt.shape[1], cfg.hidden_size
        # history snapshots in the model compute dtype (bf16 serving):
        # the fp32 variant measured-OOMs by 69 MB at 512px full depth;
        # divided differences upcast per leaf inside forecast()
        zi = lambda L: jnp.zeros((cfg.num_double_blocks, rows, L, H), latents.dtype)  # noqa: E731
        cache0 = {
            "double": (zi(Li), zi(Lt), zi(Li), zi(Lt)),
            "single": jnp.zeros((cfg.num_single_blocks, rows, Lt + Li, H), latents.dtype),
        }
        carry0 = (latents, cache0, cache0, jnp.full((B, 2), -1.0, jnp.float32),
                  jnp.zeros((B,), jnp.int32), sig0, acc0, n0)
        (latents, _, _, _, _, _, _, n_full), _ = jax.lax.scan(
            module_step, carry0, steps + (forced,))
    elif residual_mode:
        rrows = 2 * B if use_image_cfg else B
        resid0 = jnp.zeros((rrows, latents.shape[1], cfg.hidden_size), latents.dtype)
        carry0 = (latents, resid0, sig0, acc0, n0)
        (latents, _, _, _, n_full), _ = jax.lax.scan(residual_step, carry0, steps + (forced,))
    elif order == 0:
        carry0 = (latents, v0, sig0, acc0, n0)
        (latents, _, _, _, n_full), _ = jax.lax.scan(cached_step, carry0, steps + (forced,))
    else:
        hist0 = tuple(jnp.zeros(latents.shape, jnp.float32) for _ in range(order + 1))
        sigs0 = tuple(jnp.full((B,), -1.0, jnp.float32) for _ in range(order + 1))
        carry0 = (latents, hist0, sigs0, jnp.zeros((B,), jnp.int32), sig0, acc0, n0)
        (latents, _, _, _, _, _, n_full), _ = jax.lax.scan(
            predictive_step, carry0, steps + (forced,))
    return (latents, n_full) if return_vcache_stats else latents


def make_schedule(num_steps: int, image_seq_len: int) -> jnp.ndarray:
    """Dynamic-shifted sigma array (host-precomputed, fp32)."""
    return jnp.asarray(FlowMatchSchedule.create(num_steps, image_seq_len).sigmas)


def vcache_kwargs(vcache: dict | None, num_steps: int) -> dict:
    """`pipeline_args.vcache` payload -> `denoise(...)` kwargs (the one
    schedule grammar, shared by FluxPipeline and the calibration harness):
    {"interval": k[, warmup, tail, order, residual]} static or
    {"threshold": x[, warmup, tail, poly, order, residual, pin_n_full]}
    dynamic; "order" (0/1/2, default 0) turns skipped-step reuse into
    Taylor prediction; "residual": true caches TeaCache's exact quantity
    (the transformer residual) instead of the output velocity;
    "pin_n_full": k forces k evenly spaced full forwards on top of the
    dynamic decision (a MEASUREMENT lever: pins the skip rate to a known
    operating point on weight trees whose signal trajectory is
    meaningless, e.g. random init — the threshold can only add forwards)."""
    if not vcache:
        return {}
    vc = dict(vcache)
    if "interval" in vc and "threshold" in vc:
        raise ValueError("vcache: interval and threshold are mutually exclusive")
    extra = {"vcache_order": int(vc["order"])} if vc.get("order") else {}
    if vc.get("residual") and vc.get("module"):
        raise ValueError("vcache: residual and module are mutually exclusive")
    if vc.get("residual"):
        extra["vcache_cached"] = "residual"
    if vc.get("module"):  # TaylorSeer per-module order-1 forecast
        extra["vcache_cached"] = "module"
    if "interval" in vc:
        if "pin_n_full" in vc:
            raise ValueError("vcache: pin_n_full is a dynamic-mode lever")
        return {"step_mask": jnp.asarray(make_step_mask(
            num_steps, int(vc["interval"]),
            warmup=int(vc.get("warmup", 1)), tail=int(vc.get("tail", 1)))), **extra}
    if "threshold" in vc:
        if not float(vc["threshold"]) > 0:
            raise ValueError("vcache threshold must be > 0 (omit vcache to disable)")
        # presence check, not truthiness: an explicit invalid pin (0, the
        # exact overclaim the pin exists to prevent) must ERROR in
        # make_pinned_mask, never silently leave the schedule unpinned
        if vc.get("pin_n_full") is not None:
            extra["vcache_force_mask"] = jnp.asarray(make_pinned_mask(
                num_steps, min(int(vc["pin_n_full"]), num_steps)))
        return {
            "vcache_threshold": float(vc["threshold"]),
            "vcache_warmup": int(vc.get("warmup", 1)),
            "vcache_tail": int(vc.get("tail", 1)),
            "vcache_poly": tuple(vc["poly"]) if vc.get("poly") else None,
            **extra,
        }
    raise ValueError(f"vcache needs 'interval' or 'threshold': {vc}")


def make_step_mask(num_steps: int, interval: int, warmup: int = 1, tail: int = 1) -> np.ndarray:
    """Static velocity-cache schedule (DeepCache/FORA-style): full forwards
    for the first `warmup` and last `tail` steps, and every `interval`-th
    step in between; the rest reuse the previous velocity. interval=1 means
    every step runs full (the mask is all-True)."""
    if num_steps < 1 or interval < 1:
        raise ValueError(f"num_steps={num_steps}, interval={interval}")
    warmup = max(int(warmup), 1)  # step 0 has no cached velocity to reuse
    mask = np.zeros(num_steps, dtype=bool)
    mask[:warmup] = True
    if tail > 0:
        mask[num_steps - tail:] = True
    mask[warmup::interval] = True
    return mask


def make_pinned_mask(num_steps: int, n_full: int) -> np.ndarray:
    """Exactly `n_full` evenly spaced full-forward steps (first and last
    always included). Used to pin a DYNAMIC schedule's forward count to a
    known operating point via `vcache_force_mask` — e.g. the bench forcing
    a threshold schedule to its citation's published skip rate when the
    weight tree is random-init (the decision signal is weight-dependent)."""
    n_full = int(n_full)
    if not 2 <= n_full <= num_steps:
        raise ValueError(f"n_full must be in [2, {num_steps}] (got {n_full})")
    mask = np.zeros(num_steps, dtype=bool)
    mask[np.round(np.linspace(0, num_steps - 1, n_full)).astype(int)] = True
    assert int(mask.sum()) == n_full  # linspace endpoints are distinct ints
    return mask

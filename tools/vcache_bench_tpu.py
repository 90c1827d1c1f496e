"""Velocity-cache mechanical speedup on hardware (synthetic weights).

Measures the full-depth W8A8 FLUX denoise (30 steps, 1024px, pallas flash
attention) with the opt-in velocity cache at static intervals and one
dynamic-threshold point, against the interval-1 (no-skip) baseline.

This is a MECHANICAL measurement: with synthetic weights the skip schedule's
quality impact is meaningless — the number shows what a calibrated real-
weight schedule would buy in wall-clock (DEPLOYMENT.md "Velocity cache").
The headline bench (bench.py) never uses the cache.

Usage: python tools/vcache_bench_tpu.py [tiny]
  tiny — CPU control-flow smoke (tiny config, interpret pallas).
"""

import json
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from reflectionflow_tpu.config import FluxDiTConfig  # noqa: E402
from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids  # noqa: E402
from reflectionflow_tpu.sampler.generate import denoise, make_step_mask  # noqa: E402
from reflectionflow_tpu.sampler.scheduler import FlowMatchSchedule  # noqa: E402


def build_vcache_runner(cfg, params, attn_impl, **vc_kwargs):
    img_ids = jnp.asarray(make_image_ids(bench.TY, bench.TX))
    txt_ids = jnp.asarray(make_text_ids(bench.LT))
    sigmas = jnp.asarray(FlowMatchSchedule.create(bench.NUM_STEPS, bench.TY * bench.TX).sigmas)
    rng = np.random.default_rng(1)
    latents = jnp.asarray(rng.standard_normal((1, bench.TY * bench.TX, cfg.in_channels)), jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal((1, bench.LT, cfg.text_dim)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)), jnp.bfloat16)

    def run_sum():
        out = denoise(
            params, cfg, latents, txt, pooled, img_ids, txt_ids, sigmas,
            jnp.asarray(3.5, jnp.float32), bench.NUM_STEPS,
            attn_impl=attn_impl, rope_layout=bench.ROPE_LAYOUT, **vc_kwargs,
        )
        return bench._SUM(out)

    return run_sum


def main():
    tiny = len(sys.argv) > 1 and sys.argv[1] == "tiny"
    if tiny:
        bench._enable_tiny()
    attn = bench.ATTN_PALLAS
    cfg = FluxDiTConfig.tiny() if tiny else FluxDiTConfig()
    rtt = bench.measure_rtt()
    params = bench.init_int8_on_device(cfg)
    n = bench.NUM_STEPS
    out = {"steps": n, "attn": attn, "rtt_ms": round(rtt * 1e3, 1),
           "note": "mechanical skip-rate speedup, synthetic weights; quality "
                   "needs real-weight calibration (DEPLOYMENT.md)"}
    base = bench.time_runner(build_vcache_runner(cfg, params, attn), rtt)
    out["baseline_s"] = round(base, 3)
    for interval in (2, 3):
        mask = make_step_mask(n, interval, warmup=2, tail=1)
        t = bench.time_runner(
            build_vcache_runner(cfg, params, attn, step_mask=jnp.asarray(mask)), rtt)
        key = f"interval{interval}"
        out[key + "_s"] = round(t, 3)
        out[key + "_full_fwd"] = int(mask.sum())
        out[key + "_speedup"] = round(base / t, 3)
    # dynamic mode overhead probe: epsilon threshold = every step still runs
    # full, so (t - baseline) isolates the per-step signal + cond cost
    t_dyn = bench.time_runner(
        build_vcache_runner(cfg, params, attn, vcache_threshold=1e-9), rtt)
    out["dynamic_allfull_s"] = round(t_dyn, 3)
    out["dynamic_signal_overhead_s"] = round(t_dyn - base, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

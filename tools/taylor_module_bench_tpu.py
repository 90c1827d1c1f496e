"""TaylorSeer-faithful PER-MODULE velocity cache, measured on TPU at 512px.

VERDICT r4 item 2: the per-module variant (vcache {"module": true} —
order-1 divided-difference forecast of EVERY block's pre-gate attn/MLP
outputs, glue recomputed fresh; `models.flux.dit.flux_dit_apply`
return_module_outs/module_cache) cannot fit 1024px serving on a 16 GB
v5e: two history snapshots of 1.076G values each = 4.3 GB even in bf16
(8.6 GB fp32) next to the 11.9 GB W8A8 DiT (arithmetic in
`sampler/vcache_calibrate.LITERATURE_ANCHORS["taylor_o2_interval6"]`).
At 512px (1024 img + 512 txt tokens) the history is stored in the model
compute dtype — bf16, 2 x 0.72 GB — and fits; the fp32 variant
measured-OOMs by 69 MB there (`sampler/generate.py` module_mode comment).
This tool measures the denoise there, against the dense loop and
the output-velocity Taylor variant at the SAME schedule, so the
per-module fidelity cost is a number instead of a claim.

Usage: python tools/taylor_module_bench_tpu.py [steps] [px] [tiny]
Prints one JSON line -> record in BENCH_NOTES.taylor_module_512px_v5e.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _log(msg):
    print(f"[taylor_module +{time.monotonic() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.monotonic()


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    px = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    tiny = len(sys.argv) > 3 and sys.argv[3] == "tiny"
    if tiny:
        jax.config.update("jax_platforms", "cpu")

    import bench
    from reflectionflow_tpu.config import FluxDiTConfig
    from reflectionflow_tpu.models.flux.dit import flux_dit_init
    from reflectionflow_tpu.models.flux.rope import make_image_ids, make_text_ids
    from reflectionflow_tpu.sampler.generate import denoise, make_schedule, vcache_kwargs

    if tiny:
        cfg, TY, TX, LT, steps = FluxDiTConfig.tiny(), 4, 4, 8, min(steps, 6)
        params = flux_dit_init(jax.random.PRNGKey(0), cfg, jnp.float32)
        attn = "xla"
        dtype = jnp.float32
    else:
        cfg = FluxDiTConfig()
        TY = TX = px // 16  # packed latent grid (2x2-packed 8px latents)
        LT = 512
        _log("building int8 DiT on device...")
        params = bench.init_int8_on_device(cfg)
        attn = "pallas"
        dtype = jnp.bfloat16
        _log("DiT resident")

    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, TY * TX, cfg.in_channels)), dtype)
    txt = jnp.asarray(rng.standard_normal((1, LT, cfg.text_dim)), dtype)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)), dtype)
    iid = jnp.asarray(make_image_ids(TY, TX))
    tid = jnp.asarray(make_text_ids(LT))
    sig = make_schedule(steps, TY * TX)
    rtt = bench.measure_rtt() if not tiny else 0.0

    schedule = {"interval": 6, "warmup": 3, "tail": 1}

    def run(extra):
        def go():
            out = denoise(params, cfg, lat, txt, pooled, iid, tid, sig,
                          jnp.asarray(3.5, jnp.float32), steps, attn_impl=attn,
                          rope_layout="split" if not tiny else "pair", **extra)
            return float(np.asarray(jnp.sum(out.astype(jnp.float32))))

        go()  # compile + warmup
        times = []
        for _ in range(2 if tiny else 3):
            t0 = time.perf_counter()
            go()
            times.append(time.perf_counter() - t0)
        return max(min(times) - rtt, 1e-6)

    _log("dense...")
    t_dense = run({})
    _log(f"dense {t_dense:.2f}s; per-module (interval 6)...")
    t_module = run(vcache_kwargs(dict(schedule, module=True), steps))
    _log(f"module {t_module:.2f}s; output-velocity order-2 (interval 6)...")
    t_velocity = run(vcache_kwargs(dict(schedule, order=2), steps))
    _log(f"velocity {t_velocity:.2f}s")

    print(json.dumps({
        "metric": "taylor_module_denoise_s",
        "value": round(t_module, 3),
        "unit": "s",
        "detail": {
            "px": px if not tiny else 16, "steps": steps,
            "schedule": dict(schedule, n_full=9 if steps == 30 else None),
            "t_dense_s": round(t_dense, 3),
            "t_module_o1_s": round(t_module, 3),
            "t_velocity_o2_s": round(t_velocity, 3),
            "speedup_module": round(t_dense / t_module, 3),
            "speedup_velocity": round(t_dense / t_velocity, 3),
            "scale": ("tiny-CPU (control-flow check)" if tiny else
                      f"int8 W8A8 FLUX-dev DiT 19/38, {px}px, pallas flash attn, B=1"),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()

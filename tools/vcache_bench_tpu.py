"""Velocity-cache mechanical speedup on hardware (synthetic weights).

Measures the full-depth W8A8 FLUX denoise (30 steps, 1024px, pallas flash
attention) with the opt-in velocity cache at static intervals and one
dynamic-threshold point, against the interval-1 (no-skip) baseline.

Each measurement runs in its OWN subprocess / TPU client: a RESOURCE_EXHAUSTED
allocation poisons later allocations in the same client (the reason bench.py
stages are subprocesses too), so one failing config must not skew the rest.

This is a MECHANICAL measurement: with synthetic weights the skip schedule's
quality impact is meaningless — the number shows what a quality-evidenced
schedule buys in wall-clock (DEPLOYMENT.md "Velocity cache"). The headline
bench stage (bench.py e2e_swap_vcache) runs the literature-anchored or
real-weight-calibrated schedule; this tool isolates the denoise phase and
A/Bs order-0 reuse vs Taylor prediction on identical masks.

Usage: python tools/vcache_bench_tpu.py [tiny]
  tiny — CPU control-flow smoke (tiny config, interpret pallas).
Internal: python tools/vcache_bench_tpu.py [tiny] <substage>
  substage in {baseline, interval2, interval3, dynamic} — one measurement,
  one JSON line (spawned by the parent sweep).
"""

import json
import subprocess
import sys

sys.path.insert(0, ".")

SUBSTAGES = ("baseline", "interval2", "interval3", "interval6_o2_w3", "dynamic")

# interval substage grammar: interval<K>[_o<order>][_w<warmup>] — e.g.
# interval6_o2_w3 is the literature-anchored headline schedule
# (sampler/vcache_calibrate.py LITERATURE_ANCHORS["taylor_o2_interval6"]);
# order adds Taylor prediction on skipped steps (its elementwise cost on
# the latent is what this measures vs the same-mask order-0 run)
_INTERVAL_RE = __import__("re").compile(r"^interval(\d+)(?:_o(\d))?(?:_w(\d+))?$")


def run_substage(name: str, tiny: bool) -> None:
    import jax.numpy as jnp

    import bench
    from reflectionflow_tpu.config import FluxDiTConfig
    from reflectionflow_tpu.sampler.generate import make_step_mask

    if tiny:
        bench._enable_tiny()
    cfg = FluxDiTConfig.tiny() if tiny else FluxDiTConfig()
    rtt = bench.measure_rtt()
    params = bench.init_int8_on_device(cfg)
    n = bench.NUM_STEPS
    kwargs, extra = {}, {}
    if m := _INTERVAL_RE.match(name):
        k, order, warmup = int(m[1]), int(m[2] or 0), int(m[3] or 2)
        mask = make_step_mask(n, k, warmup=warmup, tail=1)
        kwargs = {"step_mask": jnp.asarray(mask)}
        if order:
            kwargs["vcache_order"] = order
        extra["full_fwd"] = int(mask.sum())
    elif name == "dynamic":
        # epsilon threshold = every step still runs full; (t - baseline)
        # isolates the per-step signal + launch-decision overhead
        kwargs = {"vcache_threshold": 1e-9}
    t = bench.time_runner(
        bench.build_runner(cfg, params, attn_impl=bench.ATTN_PALLAS, denoise_kwargs=kwargs),
        rtt,
    )
    print(json.dumps({"substage": name, "t_s": round(t, 3), **extra}))


def main():
    argv = sys.argv[1:]
    tiny = bool(argv) and argv[0] == "tiny"
    rest = argv[1:] if tiny else argv
    if rest:
        run_substage(rest[0], tiny)
        return
    out = {"steps": None, "note": "mechanical skip-rate speedup, synthetic weights; "
                                  "quality needs real-weight calibration (DEPLOYMENT.md)"}
    results = {}
    for name in SUBSTAGES:
        cmd = [sys.executable, __file__] + (["tiny"] if tiny else []) + [name]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=5400)
        sys.stderr.write(proc.stderr)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        if proc.returncode != 0 or not line.startswith("{"):
            print(f"# substage {name} failed (rc={proc.returncode})", file=sys.stderr)
            continue
        results[name] = json.loads(line)
    import bench

    if tiny:
        bench._enable_tiny()
    out["steps"] = bench.NUM_STEPS
    out["attn"] = bench.ATTN_PALLAS
    if "baseline" in results:
        base = results["baseline"]["t_s"]
        out["baseline_s"] = base
        for name in SUBSTAGES:
            if name.startswith("interval") and name in results:
                out[name + "_s"] = results[name]["t_s"]
                out[name + "_full_fwd"] = results[name]["full_fwd"]
                out[name + "_speedup"] = round(base / results[name]["t_s"], 3)
        if "dynamic" in results:
            out["dynamic_allfull_s"] = results["dynamic"]["t_s"]
            out["dynamic_signal_overhead_s"] = round(results["dynamic"]["t_s"] - base, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

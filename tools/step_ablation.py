"""Ablate pieces of the serving DiT step on hardware to locate overhead.

The gap between the measured 30-step denoise and the pure-MXU floor is a
mix of attention, RoPE/norm elementwise passes, per-token activation-quant
passes, and layout transposes around the flash kernel. Guessing their
shares from first principles has been unreliable; this tool measures them
by monkeypatching one piece at a time to a no-op and timing the full-depth
denoise (same shapes/tree as bench.py).

Ablations (each vs the serving config: W8A8 + fused single layout +
pallas_int8 attention):
  * full        — serving config, the reference point
  * attn_skip   — joint_attention returns the V streams unchanged (no
                  kernel, no transposes): non-attention time
  * attn_bf16   — pallas bf16 kernel (no q/k quant pass, bf16 dots)
  * rope_skip   — RoPE tables applied as identity (saves the rotate pass)
  * w8a16       — strip act_q markers: weight-only int8 (no act quant)

Prints one JSON line. Times are 30-step seconds, RTT-corrected.
"""

import json
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402
from reflectionflow_tpu.config import FluxDiTConfig  # noqa: E402


def strip_act_q(tree):
    if isinstance(tree, dict):
        return {k: strip_act_q(v) for k, v in tree.items() if k != "act_q"}
    return tree


def main():
    import reflectionflow_tpu.models.flux.dit as dit_mod
    from reflectionflow_tpu.sampler.generate import denoise

    # CRITICAL: jax.jit caches by (function, shapes, statics) and does NOT
    # see monkeypatched globals — without clearing, every "ablated" run
    # re-executes the cached full graph and measures nothing.
    def clear():
        denoise.clear_cache()

    rtt = bench.measure_rtt()
    cfg = FluxDiTConfig()
    params = bench.init_int8_on_device(cfg)
    out = {"rtt_ms": round(rtt * 1e3, 1), "steps": bench.NUM_STEPS, "batch": bench.BATCH}

    def run(attn_impl="pallas"):
        return bench.time_runner(bench.build_runner(cfg, params, attn_impl=attn_impl), rtt)

    out["full_s"] = round(run(), 3)

    # --- attention -> pass-through (keeps projections + splits, drops the
    # kernel and its layout transposes)
    orig_attn = dit_mod.joint_attention

    def attn_skip(streams_q, streams_k, streams_v, **kw):
        return list(streams_v)

    dit_mod.joint_attention = attn_skip
    clear()
    try:
        out["attn_skip_s"] = round(run(), 3)
    finally:
        dit_mod.joint_attention = orig_attn
        clear()

    out["attn_int8_s"] = round(run(attn_impl="pallas_int8"), 3)

    # --- RoPE -> identity (tables still computed, apply skipped)
    orig_rope = dit_mod._rope_qk

    def rope_skip(q, k, tables):
        return q, k

    dit_mod._rope_qk = rope_skip
    clear()
    try:
        out["rope_skip_s"] = round(run(), 3)
    finally:
        dit_mod._rope_qk = orig_rope
        clear()

    # --- QK-norm -> identity (keeps rope + attention)
    orig_norm = dit_mod._qk_norm

    def norm_skip(x, scale, fast):
        return x

    dit_mod._qk_norm = norm_skip
    clear()
    try:
        out["qknorm_skip_s"] = round(run(attn_impl="pallas"), 3)
    finally:
        dit_mod._qk_norm = orig_norm
        clear()

    # --- bf16 attention + rope skip + norm skip together: the full
    # "qk prep" share of the serving step
    dit_mod._qk_norm = norm_skip
    dit_mod._rope_qk = rope_skip
    clear()
    try:
        out["qkprep_skip_s"] = round(run(attn_impl="pallas"), 3)
    finally:
        dit_mod._qk_norm = orig_norm
        dit_mod._rope_qk = orig_rope
        clear()

    # --- weight-only int8 (no per-token activation quant, bf16 MXU dots)
    params = strip_act_q(params)
    out["w8a16_s"] = round(run(), 3)

    d = out
    d["attn_share_s"] = round(d["full_s"] - d["attn_skip_s"], 3)
    d["rope_share_s"] = round(d["full_s"] - d["rope_skip_s"], 3)
    d["int8qk_gain_s"] = round(d["full_s"] - d["attn_int8_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

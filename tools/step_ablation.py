"""Ablate pieces of the serving DiT step on hardware to locate overhead.

The gap between the measured 30-step denoise and the pure-MXU floor is a
mix of attention, QK prep (norm + RoPE), per-token activation-quant
passes, and layout glue around the flash kernel. Guessing their shares
from first principles has been unreliable; this tool measures them by
monkeypatching one piece at a time to a no-op and timing the full-depth
denoise (same shapes/tree as bench.py).

Ablations (each vs the serving config: W8A8 + fused single layout +
pallas bf16 attention + fused norm+rope kernel):
  * full         — serving config, the reference point
  * attn_skip    — joint_attention returns the V streams unchanged (no
                   kernel, no transposes): non-attention time
  * attn_int8    — in-kernel-quant int8-QK^T kernel instead of bf16
  * nr_fused_off — fused norm+rope kernel disabled (XLA norm + rope
                   passes): what the fused kernel buys
  * rope_skip    — RoPE applied as identity (fused kernel ALSO disabled,
                   else the skip is a silent no-op — the serving path
                   never calls _rope_qk/_qk_norm when the kernel is on)
  * qknorm_skip  — QK-norm as identity (fused kernel also disabled)
  * qkprep_skip  — both skips: the whole XLA qk-prep share
  * w8a16        — strip act_q markers: weight-only int8 (no act quant)

rope/qknorm/qkprep shares are computed against nr_fused_off (the same
XLA-prep configuration they're carved out of). Prints one JSON line.
Times are 30-step seconds, RTT-corrected.
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

    orig_attn = dit_mod.joint_attention
    orig_rope = dit_mod._rope_qk
    orig_norm = dit_mod._qk_norm
    orig_gate = dit_mod._nr_gate

    def attn_skip(streams_q, streams_k, streams_v, **kw):
        return list(streams_v)

    def rope_skip(q, k, tables):
        return q, k

    def norm_skip(x, scale, fast):
        return x

    def gate_off(*a, **kw):
        return False

    def ablated(**patches):
        """Time one configuration with the given dit module attrs patched."""
        for name, fn in patches.items():
            setattr(dit_mod, name, fn)
        clear()
        try:
            return round(run(), 3)
        finally:
            for name, orig in (
                ("joint_attention", orig_attn), ("_rope_qk", orig_rope),
                ("_qk_norm", orig_norm), ("_nr_gate", orig_gate),
            ):
                setattr(dit_mod, name, orig)
            clear()

    out["full_s"] = round(run(), 3)
    # attention -> pass-through (keeps projections + splits, drops the
    # kernel and its layout transposes)
    out["attn_skip_s"] = ablated(joint_attention=attn_skip)
    out["attn_int8_s"] = round(run(attn_impl="pallas_int8"), 3)
    # the XLA-prep configuration (fused norm+rope kernel off) and its
    # component skips — the skips MUST also turn the gate off, or the
    # serving path never reaches the patched _rope_qk/_qk_norm
    out["nr_fused_off_s"] = ablated(_nr_gate=gate_off)
    out["rope_skip_s"] = ablated(_nr_gate=gate_off, _rope_qk=rope_skip)
    out["qknorm_skip_s"] = ablated(_nr_gate=gate_off, _qk_norm=norm_skip)
    out["qkprep_skip_s"] = ablated(_nr_gate=gate_off, _rope_qk=rope_skip, _qk_norm=norm_skip)

    # weight-only int8 (no per-token activation quant, bf16 MXU dots)
    params = strip_act_q(params)
    out["w8a16_s"] = round(run(), 3)

    d = out
    d["attn_share_s"] = round(d["full_s"] - d["attn_skip_s"], 3)
    d["nr_fused_gain_s"] = round(d["nr_fused_off_s"] - d["full_s"], 3)
    d["rope_share_s"] = round(d["nr_fused_off_s"] - d["rope_skip_s"], 3)
    d["qknorm_share_s"] = round(d["nr_fused_off_s"] - d["qknorm_skip_s"], 3)
    d["qkprep_share_s"] = round(d["nr_fused_off_s"] - d["qkprep_skip_s"], 3)
    d["int8qk_gain_s"] = round(d["full_s"] - d["attn_int8_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

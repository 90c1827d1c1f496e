"""A/B the full-depth FLUX DiT denoise on hardware: W8A8 vs w8a16.

Reuses bench.py's synthetic int8 tree; w8a16 is the SAME tree with the
act_q markers stripped (same int8 weights, dequant-fused bf16 matmuls).
Prints one JSON line with 30-step times for each under pallas attention.
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
    args = [a for a in sys.argv[1:] if a != "unfused"]
    if "unfused" in sys.argv:
        bench.FUSE_SINGLE_IO = False
    attn = args[0] if len(args) > 0 else "pallas"
    batch = int(args[1]) if len(args) > 1 else 1
    skip_w8a16 = len(args) > 2 and args[2] == "w8a8_only"
    bench.BATCH = batch
    rtt = bench.measure_rtt()
    cfg = FluxDiTConfig()
    params = bench.init_int8_on_device(cfg)
    out = {"rtt_ms": round(rtt * 1e3, 1), "steps": bench.NUM_STEPS, "attn": attn, "batch": batch,
           "single_layout": "fused" if bench.FUSE_SINGLE_IO else "unfused"}
    t8 = bench.time_runner(bench.build_runner(cfg, params, attn_impl=attn), rtt)
    out["w8a8_s"] = round(t8, 3)
    out["w8a8_img_per_s"] = round(batch / t8, 4)
    if not skip_w8a16:
        params16 = strip_act_q(params)
        t16 = bench.time_runner(bench.build_runner(cfg, params16, attn_impl=attn), rtt)
        out["w8a16_s"] = round(t16, 3)
        out["w8a8_speedup"] = round(t16 / t8, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

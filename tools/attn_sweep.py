"""Sweep flash-attention block sizes on the real TPU at the FLUX shape.

The kernel default (bq 256, bk 512) measured ~59 TFLOP/s at 5632 tokens;
attention is ~half the serving step, so block-shape tuning is a first-order
lever. Prints one JSON line of ms per (block_q, block_k).

Usage: python tools/attn_sweep.py [L] [H]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from reflectionflow_tpu.ops.pallas_attention import (  # noqa: E402
    flash_attention_int8,
    flash_attention_structured,
)

_SUM = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))


def fetch(x):
    return float(np.asarray(_SUM(x)))


def main():
    # usage: attn_sweep.py [L] [H] [int8]
    int8 = "int8" in sys.argv[1:]
    args = [a for a in sys.argv[1:] if a != "int8"]
    attn_fn = flash_attention_int8 if int8 else flash_attention_structured
    L = int(args[0]) if len(args) > 0 else 4608  # T2I serving shape
    H = int(args[1]) if len(args) > 1 else 24
    B, D = 1, 128
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.bfloat16) for _ in range(3))

    small = jnp.ones((8, 8), jnp.bfloat16)
    fetch(small)
    t0 = time.perf_counter()
    fetch(small)
    rtt = time.perf_counter() - t0

    inner = 16  # loop inside jit: single-call times are below the tunnel RTT
    flops = 4.0 * L * L * H * D * inner
    out = {"shape": f"B{B} L{L} H{H} D{D} {'int8qk' if int8 else 'bf16'} (x{inner} inner)",
           "rtt_ms": round(rtt * 1e3, 1),
           "ideal_ms_at_peak": round(flops / inner / 197e12 * 1e3, 2)}
    for bq in (256, 512, 1024):
        for bk in (512, 1024, 2304, 4608):
            if L % bq or L % bk:
                continue
            try:
                @jax.jit
                def many(q, k, v, _bq=bq, _bk=bk):
                    def body(i, acc):
                        o = attn_fn(
                            jnp.roll(q, i, axis=1), k, v, block_q=_bq, block_k=_bk
                        )
                        return acc + jnp.sum(o.astype(jnp.float32))

                    return jax.lax.fori_loop(0, inner, body, jnp.zeros((), jnp.float32))

                fetch(many(q, k, v))  # compile
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    fetch(many(q, k, v))
                    ts.append(time.perf_counter() - t0)
                t = max(min(ts) - rtt, 1e-9)
                out[f"bq{bq}_bk{bk}"] = {
                    "ms": round(t * 1e3 / inner, 2), "tflops": round(flops / t / 1e12, 1),
                }
            except Exception as e:
                out[f"bq{bq}_bk{bk}"] = f"failed: {type(e).__name__}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()

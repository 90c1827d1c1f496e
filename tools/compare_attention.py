"""Micro-benchmark: Pallas flash vs XLA attention at FLUX shapes (real TPU).

Usage: python tools/compare_attention.py [seq_len] [heads]
Prints per-call times (RTT-corrected, see bench.py) for both impls plus the
implied HBM savings. Safe to run standalone; one process, no retries.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from reflectionflow_tpu.ops.attention import sdpa  # noqa: E402
from reflectionflow_tpu.ops.pallas_attention import flash_attention  # noqa: E402


def fetch(x):
    return float(np.asarray(jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))(x)))


def time_call(fn, reps=3, rtt=0.0):
    fetch(fn())  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - rtt, 1e-6)


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 4608
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    B, D = 1, 128
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.bfloat16) for _ in range(3))

    # RTT
    small = jnp.ones((8, 8), jnp.bfloat16)
    fetch(small)
    t0 = time.perf_counter()
    fetch(small)
    rtt = time.perf_counter() - t0
    print(f"rtt={rtt*1e3:.1f}ms")

    t_pallas = time_call(lambda: flash_attention(q, k, v), rtt=rtt)
    print(f"pallas flash: {t_pallas*1e3:.2f} ms")
    sdpa_jit = jax.jit(sdpa)
    t_xla = time_call(lambda: sdpa_jit(q, k, v), rtt=rtt)
    print(f"xla sdpa:     {t_xla*1e3:.2f} ms")
    print(f"speedup: {t_xla / t_pallas:.2f}x  (logits buffer avoided: "
          f"{B * H * L * L * 4 / 1e9:.2f} GB)")


if __name__ == "__main__":
    main()

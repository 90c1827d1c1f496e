"""Pallas flash vs XLA attention at FLUX shapes (real TPU): speed + numerics.

Runs the REAL joint-attention shape (512 txt + 4096 img + 1024 cond = 5632
tokens, 24 heads x 128) with the structural cond bias, forward and backward,
and prints one JSON line with per-call times (RTT-corrected) and
max-abs-diff / cosine vs the XLA path — the on-hardware numeric artifact for
docs/BENCH_NOTES.json.

Usage: python tools/compare_attention.py [main_len] [cond_len] [heads]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from reflectionflow_tpu.ops.attention import cond_attention_bias, sdpa  # noqa: E402
from reflectionflow_tpu.ops.pallas_attention import (  # noqa: E402
    flash_attention_int8,
    flash_attention_structured,
)


_SUM = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))


def fetch(x):
    return float(np.asarray(_SUM(x)))


def time_call(fn, reps=3, rtt=0.0):
    fetch(fn())  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - rtt, 1e-6)


def stats(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
    return {"max_abs_diff": float(np.max(np.abs(a - b))), "cosine": round(cos, 6)}


def main():
    main_len = int(sys.argv[1]) if len(sys.argv) > 1 else 512 + 4096
    cond_len = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    B, D = 1, 128
    L = main_len + cond_len
    c_factor = 2.0
    cross_bias = float(np.log(c_factor))
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.bfloat16) for _ in range(3))
    w = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.bfloat16)  # cotangent

    small = jnp.ones((8, 8), jnp.bfloat16)
    fetch(small)
    t0 = time.perf_counter()
    fetch(small)
    rtt = time.perf_counter() - t0

    bias = cond_attention_bias(L, cond_len, True, c_factor)

    def pallas_fwd():
        return flash_attention_structured(q, k, v, main_len=main_len, cross_bias=cross_bias)

    def xla_fwd():
        return sdpa(q, k, v, bias=bias)

    out = {"shape": f"B{B} L{L} (main {main_len} + cond {cond_len}) H{H} D{D} bf16",
           "rtt_ms": round(rtt * 1e3, 1)}
    # numerics first (forward)
    o_p, o_x = pallas_fwd(), xla_fwd()
    out["forward"] = stats(o_p, o_x)
    out["forward"]["pallas_ms"] = round(time_call(pallas_fwd, rtt=rtt) * 1e3, 2)

    # serving int8-QK^T kernel: numerics vs the exact XLA path + speed
    def int8_fwd():
        return flash_attention_int8(q, k, v, main_len=main_len, cross_bias=cross_bias)

    out["forward_int8qk"] = stats(int8_fwd(), o_x)
    out["forward_int8qk"]["pallas_ms"] = round(time_call(int8_fwd, rtt=rtt) * 1e3, 2)
    try:
        out["forward"]["xla_ms"] = round(time_call(jax.jit(xla_fwd), rtt=rtt) * 1e3, 2)
        out["forward"]["speedup"] = round(out["forward"]["xla_ms"] / out["forward"]["pallas_ms"], 2)
    except Exception as e:  # 5632^2 fp32 logits can OOM next to other users
        out["forward"]["xla_ms"] = f"failed: {type(e).__name__}"

    # backward: value_and_grad of a weighted sum through both paths
    def loss_p(q, k, v):
        return jnp.sum(
            flash_attention_structured(q, k, v, main_len=main_len, cross_bias=cross_bias).astype(jnp.float32)
            * w.astype(jnp.float32)
        )

    def loss_x(q, k, v):
        return jnp.sum(sdpa(q, k, v, bias=bias).astype(jnp.float32) * w.astype(jnp.float32))

    grad_p = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))
    out["backward"] = {}
    g_p = grad_p(q, k, v)
    out["backward"]["pallas_ms"] = round(time_call(lambda: grad_p(q, k, v)[0], rtt=rtt) * 1e3, 2)
    try:
        grad_x = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))
        g_x = grad_x(q, k, v)
        for name, a, b in zip(("dq", "dk", "dv"), g_p, g_x):
            out["backward"][name] = stats(a, b)
        out["backward"]["xla_ms"] = round(time_call(lambda: grad_x(q, k, v)[0], rtt=rtt) * 1e3, 2)
    except Exception as e:
        out["backward"]["xla"] = f"failed: {type(e).__name__}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()

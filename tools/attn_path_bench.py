"""Decompose the serving attention path's cost on hardware.

Times the full int8/bf16 flash paths and the bare layout transposes at the
real FLUX single-block shape with an inner fori loop (single calls are
below the tunnel RTT). Both paths now quantize IN-KERNEL, so there is no
XLA-side prep subgraph to time separately; the transposes measure ~free
(XLA layout assignment satisfies the custom-call operand layouts at the
producers — see CLAUDE.md).

Prints one JSON line of per-call ms.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from reflectionflow_tpu.ops.pallas_attention import (  # noqa: E402
    _from_bh,
    _to_bh,
    flash_attention,
)

_SUM = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))


def fetch(x):
    return float(np.asarray(_SUM(x)))


def timed(fn, args, rtt, inner, reps=3):
    fetch(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return (min(ts) - rtt) * 1e3 / inner


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 4608
    B, H, D = 1, 24, 128
    inner = 8
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.bfloat16) for _ in range(3))

    small = jnp.ones((8, 8), jnp.bfloat16)
    fetch(small)
    t0 = time.perf_counter()
    fetch(small)
    rtt = time.perf_counter() - t0
    out = {"shape": f"B{B} L{L} H{H} D{D}", "rtt_ms": round(rtt * 1e3, 1), "inner": inner}

    def loop(body):
        @jax.jit
        def many(q, k, v):
            def it(i, acc):
                return acc + body(jnp.roll(q, i, axis=1), k, v)

            return jax.lax.fori_loop(0, inner, it, jnp.zeros((), jnp.float32))

        return many

    # whole int8 path (quant + transposes + kernel + back-transpose)
    out["full_int8_ms"] = round(
        timed(loop(lambda q, k, v: jnp.sum(flash_attention(q, k, v, int8=True).astype(jnp.float32))),
              (q, k, v), rtt, inner), 2)
    # whole bf16 path
    out["full_bf16_ms"] = round(
        timed(loop(lambda q, k, v: jnp.sum(flash_attention(q, k, v).astype(jnp.float32))),
              (q, k, v), rtt, inner), 2)

    # transposes only (both int8 and bf16 paths pay the same bf16 shuffles
    # now that the int8 kernel quantizes in VMEM)
    def trans(q, k, v):
        qb = _to_bh(q, B, H, L, D)
        vb = _to_bh(v, B, H, L, D)
        back = _from_bh(qb, B, H, L, D)
        return jnp.sum(qb.astype(jnp.float32)) + jnp.sum(vb.astype(jnp.float32)) + jnp.sum(
            back.astype(jnp.float32))

    out["three_transposes_ms"] = round(timed(loop(trans), (q, k, v), rtt, inner), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Microbenchmark the serving matmul variants on the real TPU.

Decides the quantized-linear default: does XLA:v5e actually run int8 x int8
dot_general on the MXU at 2x bf16 rate, and what do the dynamic-activation
quant and the int4/NF4 dequant epilogues cost?

Variants at the FLUX hot shape (L=4608 tokens x 3072 -> 3072):
  bf16          — plain bf16 matmul (reference rate)
  w8a16         — int8 weights, dequant fused into the operand read
  w8a8          — dynamic per-token act quant + int8 dot (ops.quant.int8_matmul)
  int8dot       — int8 dot alone (pre-quantized activations; peak int8 check)
  w4a16         — packed NF4 + select-tree dequant + bf16 matmul

Prints one JSON line: ms per call and effective TFLOP/s for each.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from reflectionflow_tpu.ops.quant import (  # noqa: E402
    int4_matmul, int4_matmul_plane, int8_matmul, quantize_linear,
    quantize_linear_int4, quantize_linear_int4_plane,
)


_SUM = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))


def _dequant_pair(w_p4, w_scale4):
    from reflectionflow_tpu.ops.quant import _nf4_decode

    lo = _nf4_decode(w_p4 & 0xF)
    hi = _nf4_decode(w_p4 >> 4)
    q = jnp.stack([lo, hi], axis=-2)
    G, half, _, dout = q.shape
    return (q * w_scale4[:, :, None, :]).reshape(G * half * 2, dout)


def fetch(x):
    return float(np.asarray(_SUM(x)))


def time_call(fn, rtt, reps=5):
    fetch(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - rtt, 1e-9)


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 4608
    d_in = int(sys.argv[2]) if len(sys.argv) > 2 else 3072
    d_out = int(sys.argv[3]) if len(sys.argv) > 3 else 3072
    # loop the matmul inside jit so tunnel RTT (can be 100s of ms) is <1%
    reps_inner = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((L, d_in)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((d_in, d_out)) * d_in**-0.5, jnp.float32)
    q8 = quantize_linear({"w": w}, act_quant=True)
    q4 = quantize_linear_int4({"w": w}, group=128)
    q4p = quantize_linear_int4_plane({"w": w}, group=128)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * 8), -127, 127).astype(jnp.int8)
    w_q = q8["w_q"]

    def loop(f):
        # all operands are jit ARGUMENTS — a zero-arg closure would
        # constant-fold the whole benchmark (CLAUDE.md pitfall)
        @jax.jit
        def run(*ops):
            def body(i, acc):
                # make the first operand iteration-dependent so XLA cannot
                # hoist the matmul out of the loop
                return acc + f(jnp.roll(ops[0], i, axis=0), *ops[1:])

            return jax.lax.fori_loop(0, reps_inner, body, jnp.zeros((), jnp.float32))

        return run

    w_bf16 = w.astype(jnp.bfloat16)
    variants = {
        "bf16": (loop(lambda a, b: jnp.sum(a @ b, dtype=jnp.float32)), (x, w_bf16)),
        "w8a16": (
            loop(
                lambda a, wq, ws: jnp.sum(
                    a @ (wq.astype(jnp.float32) * ws).astype(jnp.bfloat16), dtype=jnp.float32
                )
            ),
            (x, q8["w_q"], q8["w_scale"]),
        ),
        "w8a8": (
            loop(lambda a, wq, ws: jnp.sum(int8_matmul(a, wq, ws).astype(jnp.float32))),
            (x, q8["w_q"], q8["w_scale"]),
        ),
        "int8dot": (
            loop(
                lambda a, b: jnp.sum(
                    jax.lax.dot_general(
                        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
                    ).astype(jnp.float32)
                )
            ),
            (x_q, w_q),
        ),
        "w4a16": (
            loop(lambda a, wp, ws: jnp.sum(int4_matmul(a, wp, ws).astype(jnp.float32))),
            (x, q4["w_p4"], q4["w_scale4"]),
        ),
        # hypothesis: the pair layout's even/odd stack+reshape relayout,
        # not the select-tree decode, is most of the w4a16 cost — the plane
        # layout dequantizes with a plain concat
        "w4a16_plane": (
            loop(lambda a, wp, ws: jnp.sum(int4_matmul_plane(a, wp, ws).astype(jnp.float32))),
            (x, q4p["w_p4p"], q4p["w_scale4"]),
        ),
        # hypothesis: forcing one materialized dequant (barrier) beats
        # XLA's fused-into-operand-read choice when the weight is re-read
        "w4a16_mat": (
            loop(
                lambda a, wp, ws: jnp.sum(
                    (a @ jax.lax.optimization_barrier(
                        _dequant_pair(wp, ws).astype(jnp.bfloat16)
                    )).astype(jnp.float32)
                )
            ),
            (x, q4["w_p4"], q4["w_scale4"]),
        ),
    }

    small = jnp.ones((8, 8), jnp.bfloat16)
    fetch(small)
    t0 = time.perf_counter()
    fetch(small)
    rtt = time.perf_counter() - t0

    flops = 2.0 * L * d_in * d_out * reps_inner
    out = {"shape": f"{L}x{d_in}x{d_out} (x{reps_inner} inner)", "rtt_ms": round(rtt * 1e3, 1)}
    for name, (fn, ops) in variants.items():
        try:
            t = time_call(lambda: fn(*ops), rtt)
            out[name] = {"ms": round(t * 1e3 / reps_inner, 3), "tflops": round(flops / t / 1e12, 1)}
        except Exception as e:
            out[name] = f"failed: {type(e).__name__}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()

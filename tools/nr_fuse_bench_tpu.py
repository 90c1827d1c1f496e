"""Denoise-glue experiment: in-kernel QK-norm+RoPE flash vs separate passes.

Measures, at the FLUX joint-attention shape (B1 L4608 H24 D128 bf16):
  A. today's serving path: ops.pallas_quant.norm_rope on the q and k
     panels (one read+write of each, ~112 MB/layer) + flash_attention;
  B. flash_attention_nr: norm+rope fused into the flash kernel (K stripe
     transformed once per head into VMEM scratch, q tiles on the fly).

Tries the winning 512x512 blocks first (the round-2 fused variant was
rejected by the 16 MB scoped-VMEM cap — this one carries 2 bf16 tables +
1 bf16 scratch instead of 4 fp32 tables), then 512x256 / 256x256
fallbacks. Prints one JSON line of per-call ms per variant; parity error
vs path A included so a silently-wrong kernel can't win.

Usage: python tools/nr_fuse_bench_tpu.py [L] [tiny]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

_SUM = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))


def fetch(x):
    return float(np.asarray(_SUM(x)))


def main():
    args = sys.argv[1:]
    tiny = "tiny" in args
    L = int(args[0]) if args and args[0] != "tiny" else (64 if tiny else 4608)
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    from reflectionflow_tpu.ops.pallas_attention import (
        flash_attention_nr, flash_attention_structured,
    )
    from reflectionflow_tpu.ops.pallas_quant import norm_rope

    B, H, D = (1, 2, 16) if tiny else (1, 24, 128)
    interp = tiny
    inner = 1 if tiny else 64
    txt_len = 16 if tiny else 512
    rng = np.random.default_rng(0)
    dt = jnp.float32 if tiny else jnp.bfloat16
    q_pan, k_pan = (jnp.asarray(rng.standard_normal((B, L, H * D)), dt) for _ in range(2))
    v = jnp.asarray(rng.standard_normal((B, L, H, D)), dt)
    scq = jnp.asarray(1.0 + 0.1 * rng.standard_normal((2, D)), jnp.float32)
    sck = jnp.asarray(1.0 + 0.1 * rng.standard_normal((2, D)), jnp.float32)
    ang = rng.uniform(0, 6.28, (L, D // 2))
    cos = jnp.asarray(np.concatenate([np.cos(ang), np.cos(ang)], -1), dt)
    sin = jnp.asarray(np.concatenate([np.sin(ang), np.sin(ang)], -1), dt)
    q_raw = q_pan.reshape(B, L, H, D)
    k_raw = k_pan.reshape(B, L, H, D)

    bq0 = 16 if tiny else 512

    # Path A: separate norm_rope passes (per segment scale: approximate with
    # one scale row — the traffic, not the select, is what's being timed).
    # q/k panels are jit ARGUMENTS: as closure constants XLA constant-folds
    # the norm_rope passes at compile time (first run measured exactly that).
    @jax.jit
    def path_a(q_p, k_p, v_in):
        qn = norm_rope(q_p, scq[1].astype(dt), cos, sin, D, block_rows=bq0 // 2, interpret=interp)
        kn = norm_rope(k_p, sck[1].astype(dt), cos, sin, D, block_rows=bq0 // 2, interpret=interp)
        return flash_attention_structured(
            qn.reshape(B, L, H, D), kn.reshape(B, L, H, D), v_in,
            block_q=bq0, block_k=bq0, interpret=interp,
        )

    def timed(fn1, reps=3):
        # dispatch `inner` chained single calls back-to-back (the device
        # queue is serial; each dispatch is a distinct execution so nothing
        # is CSE'd away), fetch ONCE — compute must dwarf the tunnel RTT,
        # which at 43 ms hides ~10 ms of device time entirely (measured)
        fetch(fn1(v))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn1(v)
            for _ in range(inner - 1):
                out = fn1(out.astype(dt))
            fetch(out)
            ts.append(time.perf_counter() - t0)
        return (min(ts) - rtt) * 1e3 / inner

    small = jnp.ones((8, 8), dt)
    fetch(small)
    t0 = time.perf_counter()
    fetch(small)
    rtt = time.perf_counter() - t0

    out = {"shape": f"B{B} L{L} H{H} D{D}", "rtt_ms": round(rtt * 1e3, 1), "inner": inner}
    a_fn = lambda v_in: path_a(q_pan, k_pan, v_in)
    out["separate_ms"] = round(timed(a_fn), 3)
    ref = np.asarray(a_fn(v), np.float32)

    # jitted like path A (one dispatch per chained call — eager per-op
    # dispatch overhead is comparable to the ~1.5 ms kernel at this shape);
    # q/k are jit ARGUMENTS, v_in varies per call, so nothing folds.
    import functools

    @functools.partial(jax.jit, static_argnames=("bq", "bk"))
    def path_b(q_in, k_in, v_in, bq, bk):
        return flash_attention_nr(
            q_in, k_in, v_in, cos, sin, scq, sck, txt_len=0,
            block_q=bq, block_k=bk, interpret=interp,
        )

    for bq, bk in ((bq0, bq0), (512, 256), (256, 256)) if not tiny else ((16, 16),):
        name = f"fused_{bq}x{bk}"
        try:
            b_fn = lambda v_in, bq=bq, bk=bk: path_b(q_raw, k_raw, v_in, bq=bq, bk=bk)
            # txt_len=0 + scale row 1 == path A's single-scale transform
            got = np.asarray(b_fn(v), np.float32)
            err = float(np.max(np.abs(got - ref)))
            out[name + "_ms"] = round(timed(b_fn), 3)
            out[name + "_maxerr"] = round(err, 5)
        except Exception as e:
            out[name + "_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()

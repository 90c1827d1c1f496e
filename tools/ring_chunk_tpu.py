"""Hardware validation of the dynamic-offset flash chunk kernels.

The ring-attention modifier path feeds ring-global start positions into
the Pallas chunk kernels as SMEM scalars (`ops/pallas_attention.py`
`flash_chunk_fwd/bwd(q_offset=..., k_offset=...)`). Mosaic lowering rules
only surface on REAL TPU (CLAUDE.md) — this script runs the offset kernels
on one chip (no mesh needed: the kernels are per-chunk) against the XLA
chunk math at ring-realistic shapes and prints parity + timing.

Usage: python tools/ring_chunk_tpu.py [tiny]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    tiny = len(sys.argv) > 1 and sys.argv[1] == "tiny"
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    from reflectionflow_tpu.ops.pallas_attention import flash_chunk_bwd, flash_chunk_fwd
    from reflectionflow_tpu.ops.ring_attention import _xla_chunk_bwd, _xla_chunk_fwd

    # ring-realistic chunk: joint seq 5632 over a 4-ring -> 1408-token chunks
    B, L, H, D = (1, 64, 2, 16) if tiny else (1, 1408, 24, 128)
    main_len, q_off, k_off = (96, 64, 128) if tiny else (4608, 1408, 2816)
    cross = -1e30
    key = jax.random.PRNGKey(0)
    dt = jnp.float32 if tiny else jnp.bfloat16
    q, k, v, g = (jax.random.normal(jax.random.fold_in(key, i), (B, L, H, D), dt)
                  for i in range(4))
    scale = D ** -0.5

    def bias():
        qpos = q_off + np.arange(L)
        kpos = k_off + np.arange(L)
        crossm = (qpos[:, None] >= main_len) != (kpos[None, :] >= main_len)
        return jnp.asarray(np.where(crossm, cross, 0.0), jnp.float32)

    ref_out, ref_lse = _xla_chunk_fwd(q, k, v, scale=scale, bias=bias())
    t0 = time.perf_counter()
    out, lse = flash_chunk_fwd(q, k, v, interpret=tiny, main_len=main_len,
                               cross_bias=cross,
                               q_offset=jnp.asarray(q_off, jnp.int32),
                               k_offset=jnp.asarray(k_off, jnp.int32))
    err_out = float(jnp.max(jnp.abs(out - ref_out)))
    t_fwd = time.perf_counter() - t0
    err_lse = float(jnp.max(jnp.abs(lse - ref_lse)))

    delta = jnp.sum(g.astype(jnp.float32) * ref_out, axis=-1, keepdims=True)
    ref_grads = _xla_chunk_bwd(q, k, v, g, ref_lse, delta, scale=scale, bias=bias())
    t0 = time.perf_counter()
    grads = flash_chunk_bwd(q, k, v, g, ref_lse, delta, interpret=tiny,
                            main_len=main_len, cross_bias=cross,
                            q_offset=jnp.asarray(q_off, jnp.int32),
                            k_offset=jnp.asarray(k_off, jnp.int32))
    errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
            for a, b in zip(grads, ref_grads)]
    t_bwd = time.perf_counter() - t0
    tol = 1e-4 if tiny else 3e-2  # bf16 inputs at D=128
    ok = err_out < tol and all(e < tol * 20 for e in errs)
    print(json.dumps({
        "shape": [B, L, H, D], "offsets": [q_off, k_off], "main_len": main_len,
        "err_out": err_out, "err_lse": err_lse, "err_grads": errs,
        "t_fwd_incl_compile_s": round(t_fwd, 3), "t_bwd_incl_compile_s": round(t_bwd, 3),
        "ok": bool(ok),
    }))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()

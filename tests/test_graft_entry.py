"""CI guard for the driver entry points (`__graft_entry__.py`).

The driver compile-checks `entry()` on hardware and runs
`dryrun_multichip(n)` on a virtual CPU mesh; an API drift in either is a
round-level failure discovered only at scoring time. This pins the cheap
half (entry) in CI — the dryrun is exercised by the driver itself and by
the mesh/ring tests that cover the same code paths.
"""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    latents = example_args[0]
    assert out.shape == latents.shape  # velocity prediction, same packing
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()
    # the contract is (fn, example_args) with fn jittable — re-tracing with
    # different batch must also work (driver may probe other shapes)
    half = tuple(a[:1] for a in example_args)
    out2 = jax.jit(fn)(*half)
    assert out2.shape == latents[:1].shape

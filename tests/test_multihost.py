"""Multi-host serving smoke (SURVEY §2.5 DCN row / VERDICT r3 item 6).

Two REAL OS processes, each its own `jax.distributed.initialize` over 4
virtual CPU devices: a cross-host psum on the global 8-device mesh plus
the sharded noise-scaling block on host-contiguous prompt shards, asserted
byte-identical to a single-process run. Runs entirely in subprocesses via
`__graft_entry__.dryrun_multihost` (the parent's JAX state is untouched).
"""

import os
import sys


def test_dryrun_multihost_artifacts_identical():
    # subprocess-of-subprocess: keep the entry import free of this
    # process's XLA flags by importing fresh from the repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    g.dryrun_multihost(n_processes=2, devices_per_process=4, port=12391)

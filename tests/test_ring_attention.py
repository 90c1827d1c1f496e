"""Ring attention (sequence parallel) vs dense sdpa on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from reflectionflow_tpu.ops.attention import sdpa
from reflectionflow_tpu.ops.ring_attention import ring_attention


def test_ring_matches_dense():
    B, L, H, D = 2, 64, 2, 16  # L divisible by 8 devices
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (B, L, H, D), jnp.float32)
        for i in range(3)
    )
    ref = sdpa(q, k, v)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    spec = NamedSharding(mesh, P(None, "data"))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    out = ring_attention(qs, ks, vs, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_sharding_preserved():
    B, L, H, D = 1, 32, 1, 8
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    spec = NamedSharding(mesh, P(None, "data"))
    x = jax.device_put(jnp.ones((B, L, H, D)), spec)
    out = ring_attention(x, x, x, mesh)
    assert out.shape == (B, L, H, D)
    assert out.sharding.spec == P(None, "data", None, None)

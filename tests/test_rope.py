import jax
import jax.numpy as jnp
import numpy as np

from reflectionflow_tpu.models.flux.rope import apply_rope, make_image_ids, rope_tables


AXES = (4, 6, 6)


def test_tables_shape():
    ids = jnp.asarray(make_image_ids(4, 4))
    cos, sin = rope_tables(ids, AXES)
    assert cos.shape == (16, 16)
    assert sin.shape == (16, 16)
    # zero position -> identity rotation
    cos0, sin0 = rope_tables(jnp.zeros((1, 3)), AXES)
    assert np.allclose(cos0, 1.0) and np.allclose(sin0, 0.0)


def test_rope_preserves_norm(key):
    ids = jnp.asarray(make_image_ids(4, 4))
    cos, sin = rope_tables(ids, AXES)
    x = jax.random.normal(key, (2, 16, 3, 16))
    y = apply_rope(x, cos, sin)
    assert np.allclose(jnp.linalg.norm(x, axis=-1), jnp.linalg.norm(y, axis=-1), atol=1e-5)


def test_rope_relative_property(key):
    """<rope(q, p1), rope(k, p2)> depends only on p1 - p2."""
    k1, k2 = jax.random.split(key)
    q = jax.random.normal(k1, (1, 1, 1, 16))
    k = jax.random.normal(k2, (1, 1, 1, 16))

    def dot_at(p1, p2):
        ids1 = jnp.array([[0.0, p1[0], p1[1]]])
        ids2 = jnp.array([[0.0, p2[0], p2[1]]])
        c1, s1 = rope_tables(ids1, AXES)
        c2, s2 = rope_tables(ids2, AXES)
        qr = apply_rope(q, c1, s1)
        kr = apply_rope(k, c2, s2)
        return float(jnp.sum(qr * kr))

    a = dot_at((3, 5), (1, 2))
    b = dot_at((12, 23), (10, 20))  # same delta (2, 3)
    assert np.isclose(a, b, atol=1e-4)
    c = dot_at((4, 5), (1, 2))  # different delta
    assert not np.isclose(a, c, atol=1e-3)

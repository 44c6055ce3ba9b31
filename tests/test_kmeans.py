"""Tests for the jitted Lloyd's kmeans (models/kmeans.py).

Reference semantics: init/kmeans.py:8-74 (random init, empty-cluster reseed,
stop at max centroid shift < 1e-10).
"""
import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.models.kmeans import kmeans


def test_recovers_separated_clusters():
    rng = np.random.RandomState(0)
    centers = np.array([[10.0, 0.0], [-10.0, 0.0], [0.0, 10.0]])
    x = np.concatenate([c + 0.1 * rng.randn(50, 2) for c in centers]).astype(np.float32)
    out = kmeans(jax.random.PRNGKey(0), jnp.asarray(x), k=3)
    got = np.sort(np.asarray(out.centroids), axis=0)
    expected = np.sort(centers, axis=0)
    np.testing.assert_allclose(got, expected, atol=0.2)


def test_assignment_is_nearest_centroid():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(64, 4).astype(np.float32))
    out = kmeans(jax.random.PRNGKey(1), x, k=8)
    d = ((np.asarray(x)[:, None, :] - np.asarray(out.centroids)[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(out.assignment), d.argmin(-1))


def test_k_equals_b():
    """k == number of points: every point is its own centroid."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 3).astype(np.float32))
    out = kmeans(jax.random.PRNGKey(2), x, k=8)
    got = np.sort(np.asarray(out.centroids), axis=0)
    np.testing.assert_allclose(got, np.sort(np.asarray(x), axis=0), atol=1e-5)


def test_jit_compiles():
    x = jnp.asarray(np.random.RandomState(3).randn(32, 4).astype(np.float32))
    f = jax.jit(lambda r, xx: kmeans(r, xx, k=4))
    out = f(jax.random.PRNGKey(3), x)
    assert out.centroids.shape == (4, 4)
    assert np.isfinite(np.asarray(out.centroids)).all()

import pytest
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.utils import rng


pytestmark = pytest.mark.smoke

def test_xxhash32_matches_reference_algorithm():
    # Independent evaluation of the public xxhash32-style avalanche for a
    # couple of fixed inputs, computed with numpy uint32 arithmetic.
    def ref1(p):
        P2, P3, P4, P5 = 2246822519, 3266489917, 668265263, 374761393
        M = 0xFFFFFFFF
        h = (p + P5) & M
        h = (P4 * (((h << 17) | (h >> 15)) & M)) & M
        h = (P2 * (h ^ (h >> 15))) & M
        h = (P3 * (h ^ (h >> 13))) & M
        return h ^ (h >> 16)

    for p in [0, 1, 12345, 0xDEADBEEF]:
        assert int(rng.xxhash32(jnp.uint32(p))) == ref1(p)


def test_uniform_range_and_mean():
    key = jnp.uint32(1234)
    ctr = jnp.arange(200000, dtype=jnp.uint32)
    u = np.asarray(rng.uniform(key, ctr))
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 2e-3
    assert abs(u.var() - 1.0 / 12.0) < 1e-3


def test_normal2_moments():
    key = jnp.uint32(77)
    ctr = jnp.arange(100000, dtype=jnp.uint32)
    a, b = rng.normal2(key, ctr)
    x = np.concatenate([np.asarray(a), np.asarray(b)])
    assert abs(x.mean()) < 0.01
    assert abs(x.std() - 1.0) < 0.01


def test_streams_are_decorrelated():
    ctr = jnp.arange(50000, dtype=jnp.uint32)
    u1 = np.asarray(rng.uniform(jnp.uint32(1), ctr))
    u2 = np.asarray(rng.uniform(jnp.uint32(2), ctr))
    corr = np.corrcoef(u1, u2)[0, 1]
    assert abs(corr) < 0.01


def test_bernoulli():
    key = jnp.uint32(5)
    ctr = jnp.arange(100000, dtype=jnp.uint32)
    w = np.asarray(rng.bernoulli_pm1(rng.uniform(key, ctr)))
    assert set(np.unique(w)) == {-1.0, 1.0}
    assert abs(w.mean()) < 0.01

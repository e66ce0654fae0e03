"""Sobol/QMC sampler: stratification quality and determinism."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.models.integrator import _make_draw, _ray_key
from tungsten_tpu.utils import rng as trng
from tungsten_tpu.utils.sobol import DIMS, sobol_point


pytestmark = pytest.mark.smoke

def test_sobol_points_low_discrepancy():
    pts = np.stack([sobol_point(i) for i in range(16)])
    assert pts.shape == (16, DIMS)
    # first dim of the first 16 Sobol points stratifies into 16ths
    d0 = np.sort(pts[:, 0])
    gaps = np.diff(np.concatenate([[0.0], d0, [1.0]]))
    assert gaps.max() < 2.0 / 16 + 1e-3


def test_cp_rotation_preserves_stratification():
    """Rotated Sobol draws per pixel still stratify over sample index."""
    key = trng.xxhash32_4(jnp.uint32(3), jnp.uint32(5), jnp.uint32(0),
                          jnp.uint32(17))
    key_pix = trng.xxhash32_4(jnp.uint32(3), jnp.uint32(5),
                              jnp.uint32(0x51CB0113), jnp.uint32(99))
    b0 = jnp.zeros((), jnp.int32)
    us = []
    for s in range(16):
        draw = _make_draw(key, key_pix, jnp.asarray(sobol_point(s)))
        us.append(float(draw(b0, 7)))
    us = np.sort(np.asarray(us))
    gaps = np.diff(np.concatenate([[0.0], us, [1.0]]))
    # wrapped stratification: at most one doubled gap from the mod-1 seam
    assert gaps.max() < 3.0 / 16, us


def test_hash_fallback_beyond_qmc_bounces():
    key = trng.xxhash32_4(jnp.uint32(1), jnp.uint32(2), jnp.uint32(3),
                          jnp.uint32(4))
    draw_q = _make_draw(key, key, jnp.asarray(sobol_point(0)))
    draw_h = _make_draw(key, key, None)
    b_deep = jnp.int32(10)
    assert float(draw_q(b_deep, 5)) == float(draw_h(b_deep, 5))

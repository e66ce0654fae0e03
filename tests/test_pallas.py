"""The Mosaic noise kernel (interpret mode on CPU) must match the unrolled
XLA fast path exactly — same RNG streams, same splat math."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tungsten_tpu.ops import sparse_conv as sc
from tungsten_tpu.ops import sparse_conv_fast as fast
from tungsten_tpu.ops.covariance import SquaredExponentialCov
from tungsten_tpu.ops.means import SphericalMean


@pytest.mark.parametrize("iso", [False, True])
def test_pallas_matches_unrolled(iso, monkeypatch):
    gp = sc.GP(mean=SphericalMean.create(radius=0.5),
               cov=SquaredExponentialCov.create(sigma=0.4, l=0.3,
                                                aniso=(1.0, 1.7, 0.6)))
    cfg = sc.SparseConvConfig.create(ctxt=sc.CTXT_RENEWAL, isotropic_3d=iso)
    r = np.random.RandomState(5)
    R = 32
    ro = jnp.asarray(r.randn(R, 3), jnp.float32)
    rd = jnp.asarray(r.randn(R, 3), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    pss = jnp.asarray(r.randint(0, 50, (R, 4)), jnp.uint32)
    c3 = sc.Coeffs(value_scale=jnp.asarray(r.randn(R), jnp.float32) * 0.2,
                   gradient_scale=jnp.asarray(r.randn(R, 3), jnp.float32) * 0.1,
                   ray_origin=jnp.asarray(r.randn(R, 3), jnp.float32))
    t = jnp.asarray(r.rand(R), jnp.float32)

    monkeypatch.setenv("TUNGSTEN_TPU_PALLAS", "0")
    va_ref = fast.make_value_at(cfg, gp, c3, ro, rd, pss, jnp.uint32(9))
    v_ref, id_ref = va_ref(t)

    monkeypatch.setenv("TUNGSTEN_TPU_PALLAS", "1")
    va_pl = fast.make_value_at(cfg, gp, c3, ro, rd, pss, jnp.uint32(9))
    v_pl, id_pl = va_pl(t)

    np.testing.assert_allclose(np.asarray(v_pl), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(id_pl), np.asarray(id_ref))

    # block-shaped input [S, R] (the chunked march)
    ts = jnp.stack([t, t + 0.1, t + 0.2, t + 0.3])
    v_ref2, _ = va_ref(ts)
    v_pl2, _ = va_pl(ts)
    np.testing.assert_allclose(np.asarray(v_pl2), np.asarray(v_ref2),
                               rtol=1e-5, atol=1e-6)

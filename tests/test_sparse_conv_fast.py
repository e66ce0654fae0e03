import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tungsten_tpu.ops import sparse_conv as sc
from tungsten_tpu.ops import sparse_conv_fast as fast
from tungsten_tpu.ops.covariance import SquaredExponentialCov
from tungsten_tpu.ops.means import SphericalMean


def setup(iso, aniso=(1.0, 1.0, 1.0), ctxt=sc.CTXT_RENEWAL_PLUS,
          single=False):
    gp = sc.GP(mean=SphericalMean.create(radius=0.6),
               cov=SquaredExponentialCov.create(sigma=0.4, l=0.3,
                                                aniso=aniso))
    cfg = sc.SparseConvConfig.create(ctxt=ctxt, isotropic_3d=iso,
                                     use_single_realization=single)
    return cfg, gp


@pytest.mark.parametrize("iso", [False, True])
@pytest.mark.parametrize("aniso", [(1.0, 1.0, 1.0), (1.0, 2.0, 0.5)])
def test_fast_matches_general(iso, aniso):
    cfg, gp = setup(iso, aniso)
    R = 16
    r = np.random.RandomState(3)
    ro = jnp.asarray(r.randn(R, 3), jnp.float32)
    rd = jnp.asarray(r.randn(R, 3), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    pss = jnp.asarray(r.randint(0, 100, (R, 4)), jnp.uint32)
    seed = jnp.uint32(17)

    # nonzero conditioning coefficients
    c3 = sc.Coeffs(value_scale=jnp.asarray(r.randn(R), jnp.float32) * 0.3,
                   gradient_scale=jnp.asarray(r.randn(R, 3), jnp.float32) * 0.2,
                   ray_origin=jnp.asarray(r.randn(R, 3), jnp.float32))
    zero1 = sc.Coeffs(value_scale=jnp.zeros(R),
                      gradient_scale=jnp.zeros((R, 3)),
                      ray_origin=jnp.zeros((R, 3)))

    value_at = fast.make_value_at(cfg, gp, c3, ro, rd, pss, seed)
    t = jnp.asarray(r.rand(R), jnp.float32) * 2.0
    v_fast, id_fast = value_at(t)

    def one(c3_i, p, rd_i, pss_i):
        return sc.eval_value(cfg, gp, c3_i,
                             sc.Coeffs.zero(), p, 0.0, rd_i, pss_i, seed, 0.0)

    p = ro + t[:, None] * rd
    v_ref, id_ref = jax.vmap(one)(c3, p, rd, pss)
    np.testing.assert_allclose(np.asarray(v_fast), np.asarray(v_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(id_fast), np.asarray(id_ref))


def test_fast_supports_gating():
    cfg, gp = setup(False)
    assert fast.supports(cfg, gp)
    cfg1d = sc.SparseConvConfig.create(one_d=True)
    assert not fast.supports(cfg1d, gp)
    assert fast.supports_1d(cfg1d, gp)


@pytest.mark.parametrize("ctxt", [sc.CTXT_RENEWAL_PLUS, sc.CTXT_RENEWAL,
                                  sc.CTXT_NONE])
@pytest.mark.parametrize("corrxy", [False, True])
def test_fast_1d_matches_general(ctxt, corrxy):
    """SoA 1D evaluator vs the general path (evaluateValueNoise1D,
    SparseConvolutionNoise.cpp:126-135) with nonzero conditioning."""
    gp = sc.GP(mean=SphericalMean.create(radius=0.45,
                                         center=(0.0, 0.9, 0.0)),
               cov=SquaredExponentialCov.create(sigma=0.06, l=0.12))
    cfg = sc.SparseConvConfig.create(ctxt=ctxt, one_d=True,
                                     scheme=sc.SCHEME_MIS,
                                     correlation_xy=corrxy)
    R = 16
    r = np.random.RandomState(7)
    ro = jnp.asarray(r.randn(R, 3), jnp.float32)
    rd = jnp.asarray(r.randn(R, 3), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    pss = jnp.asarray(r.randint(0, 100, (R, 4)), jnp.uint32)
    seed = jnp.uint32(42)
    c1 = sc.Coeffs(value_scale=jnp.asarray(r.randn(R), jnp.float32) * 0.3,
                   gradient_scale=jnp.asarray(r.randn(R, 3),
                                              jnp.float32) * 0.2,
                   ray_origin=jnp.asarray(r.randn(R, 3), jnp.float32))

    value_at = fast.make_value_at_1d(cfg, gp, c1, ro, rd, pss, seed)
    t = jnp.asarray(r.rand(R), jnp.float32) * 2.0
    v_fast, id_fast = value_at(t)
    # block-march [S, R] shape must broadcast identically
    v_blk, _ = value_at(jnp.stack([t, t * 0.5]))
    np.testing.assert_allclose(np.asarray(v_blk[0]), np.asarray(v_fast),
                               rtol=1e-6)

    def one(c1_i, p, rd_i, pss_i):
        return sc.eval_value(cfg, gp, sc.Coeffs.zero(), c1_i, p, 0.0, rd_i,
                             pss_i, seed, 0.0)

    p = ro + t[:, None] * rd
    v_ref, id_ref = jax.vmap(one)(c1, p, rd, pss)
    np.testing.assert_allclose(np.asarray(v_fast), np.asarray(v_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(id_fast), np.asarray(id_ref))


def _nonstat_gp(multi_res):
    from tungsten_tpu.ops.fields import Field
    from tungsten_tpu.ops.nonstationary import ProceduralNonstationaryCov
    base = SquaredExponentialCov.create(sigma=0.35, l=0.25,
                                        aniso=(1.0, 1.6, 0.7))
    r = np.random.RandomState(11)
    ls = Field.regular_grid(0.5 + 1.5 * r.rand(4, 4, 4),
                            (-2.0, -2.0, -2.0), (2.0, 2.0, 2.0))
    var = Field.regular_grid(0.5 + r.rand(4, 4, 4),
                             (-2.0, -2.0, -2.0), (2.0, 2.0, 2.0))
    cov = ProceduralNonstationaryCov.create(base, var_field=var, ls_field=ls,
                                            use_multi_res_grid=multi_res)
    return sc.GP(mean=SphericalMean.create(radius=0.6), cov=cov)


@pytest.mark.parametrize("iso", [False, True])
@pytest.mark.parametrize("multi_res", [False, True])
def test_fast_matches_general_nonstationary(iso, multi_res):
    """New r3 coverage: the fast/Pallas path must reproduce the general
    evaluator for brute-force nonstationary (GPFunctions.cpp:1219-1332)
    and multi-res grid noise (SparseConvolutionNoise.cpp:60-123)."""
    gp = _nonstat_gp(multi_res)
    cfg = sc.SparseConvConfig.create(ctxt=sc.CTXT_RENEWAL_PLUS,
                                     isotropic_3d=iso)
    assert fast.supports(cfg, gp)
    assert cfg.multi_res(gp) == multi_res
    R = 16
    r = np.random.RandomState(3)
    ro = jnp.asarray(r.randn(R, 3), jnp.float32)
    rd = jnp.asarray(r.randn(R, 3), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    pss = jnp.asarray(r.randint(0, 100, (R, 4)), jnp.uint32)
    seed = jnp.uint32(17)
    c3 = sc.Coeffs(value_scale=jnp.asarray(r.randn(R), jnp.float32) * 0.3,
                   gradient_scale=jnp.asarray(r.randn(R, 3),
                                              jnp.float32) * 0.2,
                   ray_origin=jnp.asarray(r.randn(R, 3), jnp.float32))

    value_at = fast.make_value_at(cfg, gp, c3, ro, rd, pss, seed)
    t = jnp.asarray(r.rand(R), jnp.float32)
    v_fast, id_fast = value_at(t)

    def one(c3_i, p, rd_i, pss_i):
        return sc.eval_value(cfg, gp, c3_i, sc.Coeffs.zero(), p, 0.0, rd_i,
                             pss_i, seed, 0.0)

    p = ro + t[:, None] * rd
    v_ref, id_ref = jax.vmap(one)(c3, p, rd, pss)
    np.testing.assert_allclose(np.asarray(v_fast), np.asarray(v_ref),
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_array_equal(np.asarray(id_fast), np.asarray(id_ref))


@pytest.mark.parametrize("multi_res", [False, True])
def test_fast_matches_general_nonstationary_iso_plain(multi_res):
    from dataclasses import replace
    gp = _nonstat_gp(multi_res)
    # isotropic_3d defaults to iso-RAY space; exercise plain iso space here
    cfg = replace(sc.SparseConvConfig.create(ctxt=sc.CTXT_RENEWAL,
                                             isotropic_3d=True),
                  isotropic_ray_3d=False)
    R = 8
    r = np.random.RandomState(5)
    ro = jnp.asarray(r.randn(R, 3), jnp.float32)
    rd = jnp.asarray(r.randn(R, 3), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    pss = jnp.asarray(r.randint(0, 100, (R, 4)), jnp.uint32)
    seed = jnp.uint32(29)
    c3 = sc.Coeffs(value_scale=jnp.asarray(r.randn(R), jnp.float32) * 0.3,
                   gradient_scale=jnp.asarray(r.randn(R, 3),
                                              jnp.float32) * 0.2,
                   ray_origin=ro)
    value_at = fast.make_value_at(cfg, gp, c3, ro, rd, pss, seed)
    t = jnp.asarray(r.rand(R), jnp.float32)
    v_fast, _ = value_at(t)

    def one(c3_i, p, rd_i, pss_i):
        return sc.eval_value(cfg, gp, c3_i, sc.Coeffs.zero(), p, 0.0, rd_i,
                             pss_i, seed, 0.0)

    p = ro + t[:, None] * rd
    v_ref, _ = jax.vmap(one)(c3, p, rd, pss)
    np.testing.assert_allclose(np.asarray(v_fast), np.asarray(v_ref),
                               rtol=3e-4, atol=3e-5)

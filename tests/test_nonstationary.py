import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tungsten_tpu.ops import sparse_conv as sc
from tungsten_tpu.ops.covariance import SquaredExponentialCov
from tungsten_tpu.ops.fields import Field, fbm, parse_field
from tungsten_tpu.ops.means import HomogeneousMean
from tungsten_tpu.ops.nonstationary import ProceduralNonstationaryCov


def make_ns(var=None, ls=None, multi_res=False, l=0.4):
    base = SquaredExponentialCov.create(sigma=1.0, l=l)
    return ProceduralNonstationaryCov.create(
        base=base, var_field=var, ls_field=ls,
        use_multi_res_grid=multi_res)


def test_fields():
    f = Field.constant(2.5)
    p = jnp.zeros((4, 3))
    np.testing.assert_allclose(np.asarray(f(p)), 2.5)

    ramp = Field.noise_field("bottom_top", mn=1.0, mx=4.0, start=0.0, end=1.0)
    lo = float(ramp(jnp.array([0.0, -1.0, 0.0])))
    hi = float(ramp(jnp.array([0.0, 2.0, 0.0])))
    mid = float(ramp(jnp.array([0.0, 0.5, 0.0])))
    np.testing.assert_allclose(lo, 1.0, rtol=1e-5)
    np.testing.assert_allclose(hi, 4.0, rtol=1e-5)
    np.testing.assert_allclose(mid, 2.0, rtol=1e-5)  # log-space midpoint

    assert np.isfinite(float(fbm(jnp.array([0.3, 0.2, 0.7]))))


def test_variance_field_scales_amplitude_and_cov():
    var = Field.noise_field("bottom_top", mn=0.5, mx=2.0)
    ns = make_ns(var=var)
    p_lo = jnp.array([0.0, -1.0, 0.0])
    p_hi = jnp.array([0.0, 2.0, 0.0])
    np.testing.assert_allclose(float(ns.amplitude(p_lo)), 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(ns.amplitude(p_hi)), 2.0, rtol=1e-5)
    # cov(a,a) = sigma(a)^2
    np.testing.assert_allclose(float(ns.cov(p_hi, p_hi)), 4.0, rtol=1e-4)


def test_paciorek_cov_reduces_to_stationary():
    """ls == const c: Paciorek form == stationary kernel at scale c."""
    ns = make_ns(ls=Field.constant(2.0), l=0.4)
    a = jnp.array([0.1, 0.2, 0.3])
    b = jnp.array([0.5, -0.1, 0.2])
    d2 = float(jnp.sum((a - b) ** 2))
    expected = np.exp(-(d2 / 4.0) / (2 * 0.4**2))
    np.testing.assert_allclose(float(ns.cov(a, b)), expected, rtol=1e-4)


@pytest.mark.parametrize("multi_res", [False, True])
def test_nonstationary_noise_unit_variance(multi_res):
    """Normalized sparse-conv noise keeps unit variance under a varying
    length-scale field (both brute-force and multi-res paths)."""
    ls = Field.noise_field("bottom_top", mn=0.5, mx=2.0, start=-3.0, end=3.0)
    ns = make_ns(ls=ls, multi_res=multi_res)
    gp = sc.GP(mean=HomogeneousMean.create(0.0), cov=ns)
    cfg = sc.SparseConvConfig.create(ctxt=sc.CTXT_NONE)
    assert cfg.multi_res(gp) == multi_res
    zero = sc.Coeffs.zero()
    rd = jnp.array([0.0, 0.0, 1.0])

    def one(i):
        u = jnp.stack([sc.rng.uniform(jnp.uint32(7), 3 * i),
                       sc.rng.uniform(jnp.uint32(7), 3 * i + 1),
                       sc.rng.uniform(jnp.uint32(7), 3 * i + 2)])
        p = (u - 0.5) * jnp.array([20.0, 5.0, 20.0])
        v, g = sc.eval_noise3d(cfg, gp, zero, p, rd, jnp.uint32(1) + i, False)
        return v

    vals = np.asarray(jax.vmap(one)(jnp.arange(3000, dtype=jnp.uint32)))
    assert abs(vals.mean()) < 0.06
    assert abs(vals.var() - 1.0) < 0.12


def test_conditioning_nonstationary():
    """Renewal conditioning still reproduces the target value under a
    length-scale field (sanity check parity,
    SparseConvolutionNoise.cpp:469-474)."""
    ls = Field.noise_field("bottom_top", mn=0.7, mx=1.5, start=-2.0, end=2.0)
    ns = make_ns(ls=ls)
    gp = sc.GP(mean=HomogeneousMean.create(0.3), cov=ns)
    cfg = sc.SparseConvConfig.create(ctxt=sc.CTXT_RENEWAL)
    p = jnp.array([0.2, 0.4, -0.1])
    rd = sc.normalize(jnp.array([0.3, -0.2, 0.9]))
    pss = jnp.array([3, 4, 1, 2], jnp.uint32)
    c3 = sc.conditioning_3d(cfg, gp, p, rd, jnp.float32(0.0),
                            jnp.zeros(3), pss, jnp.uint32(5))
    val, _ = sc.eval_value(cfg, gp, c3, sc.Coeffs.zero(), p, 0.0, rd, pss,
                           jnp.uint32(5), 0.0)
    assert abs(float(val)) < 1e-2


def test_multi_res_level_blend_weights():
    ls = Field.constant(1.0)
    ns = make_ns(ls=Field.noise_field("bottom_top", mn=0.5, mx=5.0),
                 multi_res=True)
    gp = sc.GP(mean=HomogeneousMean.create(0.0), cov=ns)
    cfg = sc.SparseConvConfig.create()
    s_lo, s_hi, r_lo, r_hi = sc.kernel_scale_level_ratio(
        cfg, gp, jnp.array([0.0, 0.5, 0.0]))
    # blend ratios normalize the variance: r_lo^2 + r_hi^2 == 1
    np.testing.assert_allclose(float(r_lo**2 + r_hi**2), 1.0, rtol=1e-5)
    assert float(s_hi) == pytest.approx(float(s_lo) * 2.5, rel=1e-5)

"""Gabor covariances: splat value/grad match the reference closed forms,
autodiff Hessian is consistent, MC noise variance matches variance3, and the
evaluator runs end-to-end with a gabor kernel."""
import jax
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.ops.covariance import GaborAnisoCov, GaborIsoCov


def _ref_aniso_val(ab, a, f, omega):
    return np.exp(-np.pi * a**2 * (ab**2).sum()) * np.cos(
        2 * np.pi * f * omega.dot(ab))


def _ref_aniso_grad(ab, a, f, omega):
    A = np.exp(-np.pi * a**2 * (ab**2).sum())
    B = np.cos(2 * np.pi * f * omega.dot(ab))
    return (-(A * np.sin(2 * np.pi * f * omega.dot(ab)) * 2 * np.pi * f)
            * omega - (B * A * 2 * np.pi * a**2) * ab)


def test_gabor_aniso_splat_matches_reference():
    cov = GaborAnisoCov.create(sigma=1.0, a_inv=0.5, f_inv=0.8,
                               omega=(0.3, 0.8, 0.5))
    a, f = float(cov.a), float(cov.f)
    om = np.asarray(cov.omega)
    rng = np.random.default_rng(0)
    for _ in range(16):
        ab = rng.uniform(-0.4, 0.4, 3).astype(np.float32)
        v, g = cov.splat3_val_grad(jnp.asarray(ab), False, False, 1.0, None)
        np.testing.assert_allclose(float(v), _ref_aniso_val(ab, a, f, om),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g),
                                   _ref_aniso_grad(ab, a, f, om),
                                   rtol=1e-3, atol=1e-5)


def test_gabor_iso_splat_matches_reference():
    cov = GaborIsoCov.create(sigma=1.0, a_inv=0.5, f_inv=0.9)
    a, f = float(cov.a), float(cov.f)
    rng = np.random.default_rng(1)
    for _ in range(16):
        ab = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
        r = np.linalg.norm(ab)
        ref = np.exp(-np.pi * (a * r) ** 2) * 2 * f / r * np.sin(
            2 * np.pi * f * r)
        v = float(cov.splat3_val(jnp.asarray(ab)))
        np.testing.assert_allclose(v, ref, rtol=1e-3, atol=1e-4)


def test_gabor_hessian_consistent():
    cov = GaborAnisoCov.create(sigma=1.0, a_inv=0.5, f_inv=0.8,
                               omega=(0.0, 1.0, 0.0))
    ab = jnp.asarray([0.1, -0.2, 0.15])
    g, h = cov.splat3_grad_hess(ab, False, False, 1.0, None)
    # finite differences of the gradient
    eps = 1e-3
    for k in range(3):
        e = jnp.zeros(3).at[k].set(eps)
        g_p, _ = cov.splat3_val_grad(ab + e, False, False, 1.0, None)
        g_m, _ = cov.splat3_val_grad(ab - e, False, False, 1.0, None)
        fd = (np.asarray(cov.splat3_val_grad(ab + e, False, False, 1.0,
                                             None)[1])
              - np.asarray(cov.splat3_val_grad(ab - e, False, False, 1.0,
                                               None)[1])) / (2 * eps)
        np.testing.assert_allclose(np.asarray(h)[:, k], fd, rtol=2e-2,
                                   atol=2e-3)


def test_gabor_noise_variance():
    """MC variance of the sparse-conv gabor noise == variance3 normalizer."""
    from tungsten_tpu.ops import sparse_conv as sc
    from tungsten_tpu.ops.means import HomogeneousMean

    cov = GaborAnisoCov.create(sigma=1.0, a_inv=0.35, f_inv=1.2,
                               omega=(1.0, 0.0, 0.0))
    gp = sc.GP(mean=HomogeneousMean.create(offset=0.0), cov=cov)
    cfg = sc.SparseConvConfig.create(impulse_density=4.0)
    rng = np.random.default_rng(2)
    n = 4096
    pts = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    pss = jnp.asarray(rng.integers(0, 2**31, (n, 4)).astype(np.uint32))

    def one(p, s):
        v, _gp_id = sc.eval_value(cfg, gp, sc.Coeffs.zero(),
                                  sc.Coeffs.zero(), p, jnp.float32(0.0),
                                  jnp.asarray([0.0, 0.0, 1.0]), s,
                                  jnp.uint32(7), jnp.float32(0.0))
        return v

    vals = jax.jit(jax.vmap(one))(pts, pss)
    v = np.asarray(vals)
    assert np.isfinite(v).all()
    # normalized noise has unit variance (amplitude sigma=1)
    assert abs(v.var() - 1.0) < 0.15, v.var()

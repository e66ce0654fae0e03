import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.ops.covariance import SquaredExponentialCov


def make_cov(aniso=(1.0, 1.0, 1.0), sigma=1.3, l=0.7):
    return SquaredExponentialCov.create(sigma=sigma, l=l, aniso=aniso)


pytestmark = pytest.mark.smoke

def test_splat3_grad_matches_autodiff():
    cov = make_cov(aniso=(1.0, 2.0, 0.5))
    ab = jnp.array([0.3, -0.2, 0.5])
    for is_cov in (False, True):
        for is_iso in (False, True):
            val_fn = lambda x: cov.splat3_val_grad(x, is_cov, is_iso, 1.0, x)[0]
            v, g = cov.splat3_val_grad(ab, is_cov, is_iso, 1.0, ab)
            g_ad = jax.grad(val_fn)(ab)
            np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad),
                                       rtol=1e-5, atol=1e-6)


def test_splat3_hess_matches_autodiff():
    cov = make_cov(aniso=(1.0, 2.0, 0.5))
    ab = jnp.array([0.3, -0.2, 0.5])
    g, h = cov.splat3_grad_hess(ab, True, False, 1.0, ab)
    h_ad = jax.jacfwd(jax.grad(
        lambda x: cov.splat3_val_grad(x, True, False, 1.0, x)[0]))(ab)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ad), rtol=5e-3,
                               atol=1e-4)


def test_splat_conv_reproduces_cov():
    """(splat * splat)(d) ∝ cov(d): for SE with l_conv = l*sqrt(2)/2 the
    convolution of two splats has the covariance's length scale
    (GPFunctions.cpp:658 '_l_conv')."""
    cov = make_cov(aniso=(1.0, 1.0, 1.0), sigma=1.0, l=0.9)
    # world-space splat is exp(-|d|^2/(2 l_conv^2)); its autocorrelation is
    # exp(-|d|^2/(4 l_conv^2)) = exp(-|d|^2/(2 l^2))  [4 l_conv^2 = 2 l^2]
    d = jnp.array([0.4, 0.0, 0.0])
    v_cov, _ = cov.splat3_val_grad(d, True, False, 1.0, d)
    expected = jnp.exp(-0.4**2 / (2 * 0.9**2))
    np.testing.assert_allclose(float(v_cov), float(expected), rtol=1e-3)


def test_transforms_roundtrip():
    cov = make_cov(aniso=(1.0, 2.0, 0.5))
    v = jnp.array([0.2, -1.0, 3.0])
    w = cov.pos_local_to_world(cov.pos_world_to_local(v, 1.0), 1.0)
    np.testing.assert_allclose(np.asarray(w), np.asarray(v), rtol=1e-5)
    g = cov.grad_local_to_world(cov.grad_world_to_local(v, 1.0), 1.0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(v), rtol=1e-5)


def test_grad_transform_is_inverse_transpose():
    """Gradients transform by the inverse-transpose of positions."""
    cov = make_cov(aniso=(1.5, 0.7, 1.0))
    l2w = np.asarray(cov.local_to_world)
    gw = np.asarray(cov.grad_local_to_world(jnp.eye(3), 1.0))
    np.testing.assert_allclose(gw, np.linalg.inv(l2w).T @ np.eye(3),
                               rtol=1e-5, atol=1e-6)


def test_one_over_second_derivative_iso():
    cov = make_cov()
    m = np.asarray(cov.one_over_second_derivative(jnp.zeros(3), True))
    # iso covariance splat exp(-|d|^2/4): Hessian at 0 = -I/2 -> inverse -2I
    np.testing.assert_allclose(m, -2.0 * np.eye(3), rtol=1e-5)


def test_one_over_second_derivative_matches_splat_hess():
    cov = make_cov(aniso=(1.0, 2.0, 0.5))
    for is_iso in (False, True):
        _, h = cov.splat3_grad_hess(jnp.zeros(3), True, is_iso, 1.0,
                                    jnp.zeros(3))
        inv = np.asarray(cov.one_over_second_derivative(jnp.zeros(3), is_iso))
        np.testing.assert_allclose(inv @ np.asarray(h), np.eye(3), atol=1e-4)


def test_cov1_kernels_consistent():
    cov = make_cov()
    dt = jnp.float32(0.37)
    v, g = cov.cov1_val_grad(dt, None, None, None)
    g1, g2 = cov.cov1_grad_grad2(dt, None, None, None)
    f = lambda t: jnp.exp(-0.25 * t * t)
    np.testing.assert_allclose(float(v), float(f(dt)), rtol=1e-5)
    np.testing.assert_allclose(float(g), float(jax.grad(f)(dt)), rtol=1e-4)
    np.testing.assert_allclose(float(g2), float(jax.grad(jax.grad(f))(dt)),
                               rtol=1e-4)


def test_spectral_sampling_matches_density():
    """Empirical spectrum of sampled frequencies vs the SE spectral density:
    omega ~ N(0, 1/l^2) per axis (GPFunctions.hpp:1812-1815)."""
    cov = make_cov(sigma=1.0, l=0.8, aniso=(1.0, 1.0, 1.0))
    ctr = jnp.arange(20000, dtype=jnp.uint32)
    omega = np.asarray(jax.vmap(
        lambda c: cov.sample_spectral_3d(jnp.uint32(9), c))(ctr))
    assert abs(omega.mean()) < 0.02
    np.testing.assert_allclose(omega.std(axis=0), np.ones(3) / 0.8, rtol=0.05)


def test_beckmann_roughness():
    cov = make_cov(sigma=2.0, l=0.5, aniso=(1.0, 1.0, 1.0))
    # E[f_x'^2] = sigma^2/l^2 for SE; alpha = sqrt(2 sigma^2 / l^2)
    np.testing.assert_allclose(float(cov.compute_beckmann_roughness(jnp.zeros(3))),
                               float(np.sqrt(2.0) * 2.0 / 0.5), rtol=1e-5)

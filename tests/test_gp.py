import jax
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.ops import gp as gpmod
from tungsten_tpu.ops import sparse_conv as sc
from tungsten_tpu.ops.covariance import SquaredExponentialCov
from tungsten_tpu.ops.means import SphericalMean


def make_gp(sigma=1.0, l=0.5):
    return sc.GP(mean=SphericalMean.create(radius=1.0),
                 cov=SquaredExponentialCov.create(sigma=sigma, l=l))


def test_cov_entry_derivatives_match_fd():
    gp = make_gp()
    cov_fn = gpmod.make_cov_fn(gp)
    pa = jnp.array([0.1, 0.2, 0.3])
    pb = jnp.array([0.4, 0.1, 0.0])
    da = jnp.array([1.0, 0.0, 0.0])
    db = jnp.array([0.0, 1.0, 0.0])
    eps = 1e-3

    # d/da
    v10 = gpmod.cov_entry(cov_fn, pa, gpmod.D_FIRST, da, pb, gpmod.D_NONE, db)
    fd = (cov_fn(pa + eps * da, pb) - cov_fn(pa - eps * da, pb)) / (2 * eps)
    np.testing.assert_allclose(float(v10), float(fd), rtol=1e-2)

    # d2/dadb against the closed form for the SE kernel in float64:
    # k = s^2 exp(-|d|^2/(2 l^2));  d2k/(da.dira)(db.dirb) =
    #   k * [ (dira.dirb)/l^2 - (d.dira)(d.dirb)/l^4 ] with d = a-b
    v11 = gpmod.cov_entry(cov_fn, pa, gpmod.D_FIRST, da, pb, gpmod.D_FIRST,
                          db)
    l = 0.5
    dvec = np.asarray(pa - pb, np.float64)
    k = float(cov_fn(pa, pb))
    closed = k * (np.dot(da, db) / l**2
                  - np.dot(dvec, np.asarray(da)) * np.dot(dvec, np.asarray(db))
                  / l**4)
    np.testing.assert_allclose(float(v11), closed, rtol=1e-3)


def test_conditioning_interpolates():
    """Conditioned GP reproduces the conditioned values exactly at the
    conditioning points (create_mvn_cond, GaussianProcess.cpp:664-753)."""
    gp = make_gp(sigma=0.5, l=0.4)
    cov_fn = gpmod.make_cov_fn(gp)
    cond_pts = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    cond_dts = jnp.zeros(2, jnp.int32)
    cond_dirs = jnp.zeros((2, 3))
    cond_vals = jnp.array([0.3, -0.2])

    # query AT the conditioning points: mean == cond values, variance ~ 0
    mean, sqrt_cov, _ = gpmod.conditional_mvn(
        gp, cov_fn, cond_pts, cond_dts, cond_dirs, cond_pts, cond_dts,
        cond_dirs, cond_vals)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(cond_vals),
                               atol=1e-3)
    assert float(jnp.max(jnp.abs(sqrt_cov))) < 0.05


def test_conditioning_matches_closed_form_1d():
    """Single-point conditioning: posterior mean/var have the textbook form
    m(x) = m0(x) + k(x,x0)/k(x0,x0) (y - m0(x0))."""
    gp = make_gp(sigma=1.0, l=0.6)
    cov_fn = gpmod.make_cov_fn(gp)
    x0 = jnp.array([[0.0, 0.0, 0.0]])
    y0 = jnp.array([0.7])
    xq = jnp.array([[0.3, 0.0, 0.0]])
    dts1 = jnp.zeros(1, jnp.int32)
    dirs1 = jnp.zeros((1, 3))

    mean, sqrt_cov, _ = gpmod.conditional_mvn(
        gp, cov_fn, xq, dts1, dirs1, x0, dts1, dirs1, y0)

    m0q, _ = gp.mean_and_id(xq)
    m00, _ = gp.mean_and_id(x0)
    k = float(cov_fn(xq[0], x0[0]))
    k00 = float(cov_fn(x0[0], x0[0]))
    expected_mean = float(m0q[0]) + k / k00 * (float(y0[0]) - float(m00[0]))
    expected_var = k00 - k * k / k00
    np.testing.assert_allclose(float(mean[0]), expected_mean, rtol=1e-3,
                               atol=1e-4)
    var = float((sqrt_cov @ sqrt_cov.T)[0, 0])
    np.testing.assert_allclose(var, expected_var, rtol=1e-2, atol=1e-4)


def test_sample_mvn_statistics():
    mean = jnp.array([1.0, -2.0])
    cov = jnp.array([[0.5, 0.3], [0.3, 0.4]])
    sqrt_c = jnp.linalg.cholesky(cov)
    draws = jax.vmap(lambda c: gpmod.sample_mvn(mean, sqrt_c, jnp.uint32(3),
                                                c))(
        jnp.arange(20000, dtype=jnp.uint32))
    d = np.asarray(draws)
    np.testing.assert_allclose(d.mean(axis=0), [1.0, -2.0], atol=0.02)
    np.testing.assert_allclose(np.cov(d.T), np.asarray(cov), atol=0.02)


def test_truncated_normal():
    draws = jax.vmap(lambda c: gpmod.sample_truncated_normal(
        0.5, 1.0, 0.0, jnp.uint32(7), c))(jnp.arange(20000, dtype=jnp.uint32))
    d = np.asarray(draws)
    assert d.min() >= 0.0
    # analytic mean of N(0.5,1) truncated at 0
    from scipy.stats import truncnorm
    expected = truncnorm.mean(-0.5, np.inf, loc=0.5, scale=1.0)
    np.testing.assert_allclose(d.mean(), expected, rtol=0.02)


def test_gp_cdf():
    gp = make_gp(sigma=1.0)
    cov_fn = gpmod.make_cov_fn(gp)
    # at the mean surface (|p| = 1): P(f<0) = 0.5
    p = jnp.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(float(gpmod.gp_cdf(gp, cov_fn, p)), 0.5,
                               atol=1e-4)


def test_constrained_mvn_rejection():
    """Box-constrained rejection sampling (Gaussian.cpp:179-234): the
    constrained entry respects the box; unconstrained stats are preserved."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tungsten_tpu.ops import gp as gpmod
    from tungsten_tpu.utils import rng as trng

    n = 8
    mean = jnp.zeros(n)
    cov_sqrt = jnp.eye(n)
    cmask = jnp.arange(n) == 0
    keys = jnp.arange(512, dtype=jnp.uint32)

    def draw(k):
        key = trng.xxhash32_4(k, jnp.uint32(1), jnp.uint32(2), jnp.uint32(3))
        return gpmod.sample_mvn_constrained(mean, cov_sqrt, key,
                                            jnp.uint32(0), 0.0,
                                            jnp.float32(3e38), cmask)

    vals, ok = jax.vmap(draw)(keys)
    vals = np.asarray(vals)
    ok = np.asarray(ok)
    assert ok.mean() > 0.95            # P(pass in 16 tries) = 1 - 2^-16
    assert (vals[ok, 0] >= 0.0).all()  # constraint honored when satisfied
    # entry 0 is a positive half-normal: mean ~ sqrt(2/pi)
    assert abs(vals[ok, 0].mean() - np.sqrt(2 / np.pi)) < 0.1
    # unconstrained entries keep ~N(0,1) stats
    assert abs(vals[:, 1:].mean()) < 0.1
    assert abs(vals[:, 1:].std() - 1.0) < 0.1


def test_newton_schulz_sqrt_and_inverse():
    """The TPU matmul-only root/inverse (Newton-Schulz) reproduces
    B B^T ~= A and A^-1 across condition numbers covering the FS
    conditioning systems (run explicitly on CPU; _use_eigh normally
    routes CPU to eigh)."""
    import jax.numpy as jnp
    import numpy as np
    from tungsten_tpu.ops import gp as gpmod

    rng = np.random.default_rng(0)
    for cond in (1e2, 1e4, 1e6):
        n = 33
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        w = np.geomspace(1.0, 1.0 / cond, n)
        a = (q * w) @ q.T
        a = 0.5 * (a + a.T)
        A = jnp.asarray(a, jnp.float32)
        Y, Z, s = gpmod._ns_sqrt_pair(A, jitter=1e-5)
        B = np.asarray(Y * jnp.sqrt(s))
        err = np.abs(B @ B.T - a).max() / np.abs(a).max()
        assert err < 5e-3, (cond, err)
        inv = np.asarray((Z @ Z) / s)
        resid = np.abs(inv @ a - np.eye(n)).max()
        # ill-conditioned tail is floored by the relative jitter, exactly
        # like the Cholesky ladder it replaces
        assert resid < np.sqrt(cond) * 5e-4 + 5e-2, (cond, resid)

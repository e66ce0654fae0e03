"""Chromatic classic media: per-channel free-flight sampling must give an
unbiased estimator per color channel (HomogeneousMedium.cpp:83-103,
ExponentialMedium.cpp:124-146; VERDICT r1 weak #5 — gray-averaged sigma)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tungsten_tpu.models import media as md
from tungsten_tpu.ops import sparse_conv as sc



# compile-heavy integrator suite: mid tier (default run stays <15 min)
pytestmark = pytest.mark.mid

def _medium(kind, sigma_a, sigma_s, **kw):
    from tungsten_tpu.scene.parse import parse_gp
    cfg = sc.SparseConvConfig.create()
    gp = parse_gp({})
    return md.Medium(sigma_a=jnp.asarray(sigma_a, jnp.float32),
                     sigma_s=jnp.asarray(sigma_s, jnp.float32),
                     density=jnp.float32(1.0), step_size=jnp.float32(0.01),
                     cfg=cfg, gp=gp, hg_g=jnp.float32(0.0), kind=kind, **kw)


def _run(med, L=2.0, n=20000):
    R = n
    ro = jnp.zeros((R, 3))
    rd = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (R, 1))
    near = jnp.zeros(R)
    far = jnp.full(R, L)
    state = md.MediumState.make(R)
    lane = jnp.arange(R, dtype=jnp.uint32)
    pss = jnp.stack([lane, lane * 7 + 3, jnp.zeros(R, jnp.uint32),
                     jnp.zeros(R, jnp.uint32)], axis=-1)
    from tungsten_tpu.utils import rng as trng
    uj = trng.uniform(trng.xxhash32_2(lane, jnp.uint32(0xABCD)),
                      jnp.uint32(0))
    act = jnp.ones(R, bool)
    res, _ = jax.jit(lambda u: md.sample_distance(
        med, jnp.uint32(0), ro, rd, near, far, state, pss, u, act))(uj)
    return res


@pytest.mark.smoke
def test_homogeneous_chromatic_unbiased():
    sig_a = np.array([0.1, 0.0, 0.5])
    sig_s = np.array([0.4, 1.0, 1.5])
    sig_t = sig_a + sig_s
    L = 2.0
    res = _run(_medium(md.MEDIUM_HOMOGENEOUS, sig_a, sig_s), L=L)
    hit = ~np.asarray(res["exited"])
    w = np.asarray(res["weight"])
    # E[w * 1_exit] = Tr(L) per channel; E[w * 1_hit] = sigs/sigt(1-Tr(L))
    est_exit = np.where(~hit[:, None], w, 0.0).mean(axis=0)
    est_hit = np.where(hit[:, None], w, 0.0).mean(axis=0)
    np.testing.assert_allclose(est_exit, np.exp(-sig_t * L),
                               rtol=0.05, atol=5e-3)
    np.testing.assert_allclose(est_hit,
                               sig_s / sig_t * (1.0 - np.exp(-sig_t * L)),
                               rtol=0.05, atol=5e-3)


def test_exponential_chromatic_unbiased():
    sig_a = np.array([0.0, 0.2, 0.0])
    sig_s = np.array([0.6, 0.8, 2.0])
    sig_t = sig_a + sig_s
    L = 2.0
    fall = 1.3
    fp = jnp.asarray(np.concatenate([[0, 0, 1.0], [fall], [0, 0, 0], [0.0]],
                                    axis=None).astype(np.float32))
    res = _run(_medium(md.MEDIUM_EXPONENTIAL, sig_a, sig_s, field_params=fp),
               L=L)
    hit = ~np.asarray(res["exited"])
    w = np.asarray(res["weight"])
    # D(t) = (1 - exp(-fall t))/fall; Tr_c(t) = exp(-sigt_c D(t))
    D = (1.0 - np.exp(-fall * L)) / fall
    est_exit = np.where(~hit[:, None], w, 0.0).mean(axis=0)
    np.testing.assert_allclose(est_exit, np.exp(-sig_t * D),
                               rtol=0.05, atol=5e-3)
    # E[w 1_hit] = int_0^L sigs_c rho Tr_c dt = sigs/sigt (1 - Tr_c(L))
    est_hit = np.where(hit[:, None], w, 0.0).mean(axis=0)
    np.testing.assert_allclose(est_hit,
                               sig_s / sig_t * (1.0 - np.exp(-sig_t * D)),
                               rtol=0.05, atol=5e-3)


@pytest.mark.smoke
def test_gray_medium_unchanged():
    """Gray sigma: chromatic sampling must reduce to the scalar case."""
    sig = np.array([1.0, 1.0, 1.0])
    L = 1.5
    res = _run(_medium(md.MEDIUM_HOMOGENEOUS, 0 * sig, sig), L=L, n=8000)
    w = np.asarray(res["weight"])
    assert np.allclose(w[:, 0], w[:, 1]) and np.allclose(w[:, 1], w[:, 2])
    hit = ~np.asarray(res["exited"])
    est_exit = np.where(~hit[:, None], w, 0.0).mean(axis=0)
    np.testing.assert_allclose(est_exit, np.exp(-L), rtol=0.05, atol=5e-3)

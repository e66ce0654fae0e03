"""Microfacet BSDFs: the sampled weight must equal eval/pdf pointwise
(the internal-consistency identity f(wi,wo)|cos|/pdf(wo) == sample.weight),
VNDF pdfs must normalize, and energy must be conserved."""
import jax
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.models import bsdfs as bs
from tungsten_tpu.models import ndf as nd


def _rand_wi(rng, n, up=True):
    w = rng.normal(size=(n, 3)).astype(np.float32)
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    if up:
        w[:, 2] = np.abs(w[:, 2]) + 0.05
        w /= np.linalg.norm(w, axis=-1, keepdims=True)
    return jnp.asarray(w)


def _consistency(kind, dist, n=256, ior=1.5, rough=0.35, tol=0.03,
                 albedo=(1.0, 1.0, 1.0)):
    table = bs.build_table([{"kind": kind, "albedo": albedo, "ior": ior,
                             "roughness": rough, "distribution": dist}])
    rng = np.random.default_rng(3)
    wi = _rand_wi(rng, n)
    u = jnp.asarray(rng.uniform(size=(n, 4)).astype(np.float32))
    bi = jnp.zeros(n, jnp.int32)
    s = jax.vmap(lambda b, w, uu: bs.sample_bsdf(table, b, w, uu))(bi, wi, u)
    f = jax.vmap(lambda b, w, wo: bs.eval_bsdf(table, b, w, wo))(
        bi, wi, s["wo"])
    p = jax.vmap(lambda b, w, wo: bs.pdf_bsdf(table, b, w, wo))(
        bi, wi, s["wo"])
    ok = np.asarray(s["valid"]) & ~np.asarray(s["specular"]) \
        & (np.asarray(p) > 1e-5)
    ratio = np.asarray(f)[ok] / np.asarray(p)[ok][:, None]
    w = np.asarray(s["weight"])[ok]
    assert ok.sum() > n // 4, f"too few valid samples: {ok.sum()}"
    err = np.abs(ratio - w) / np.maximum(np.abs(w), 1e-2)
    assert np.quantile(err, 0.9) < tol, (
        f"kind={kind} dist={dist}: q90 rel err {np.quantile(err, 0.9)}")


def test_rough_conductor_ggx_consistent():
    _consistency(bs.ROUGH_CONDUCTOR, 0)


def test_rough_conductor_beckmann_consistent():
    _consistency(bs.ROUGH_CONDUCTOR, 1)


def test_rough_plastic_consistent():
    _consistency(bs.ROUGH_PLASTIC, 0, tol=0.05)


def test_rough_dielectric_consistent():
    _consistency(bs.ROUGH_DIELECTRIC, 0, tol=0.08)


def test_plastic_diffuse_consistent():
    _consistency(bs.PLASTIC, 0)


def test_vndf_ggx_normalizes():
    """∫ pdf_m(m) dm over the hemisphere == 1 (visible-normal pdf)."""
    rng = np.random.default_rng(0)
    n = 200000
    # uniform hemisphere quadrature
    u = rng.uniform(size=(n, 2))
    z = u[:, 0]
    phi = 2 * np.pi * u[:, 1]
    s = np.sqrt(np.maximum(1 - z * z, 0))
    m = jnp.asarray(np.stack([s * np.cos(phi), s * np.sin(phi), z], -1)
                    .astype(np.float32))
    wi = jnp.asarray(np.tile([0.4, 0.1, 0.91], (n, 1)).astype(np.float32))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    pdf = jax.vmap(lambda w, mm: nd.pdf_m(0, w, mm, jnp.float32(0.4)))(wi, m)
    integral = float(jnp.mean(pdf)) * 2 * np.pi  # domain area
    assert abs(integral - 1.0) < 0.02, integral


def test_beckmann_d_normalizes():
    """∫ D(m) cos dm == 1."""
    rng = np.random.default_rng(1)
    n = 200000
    u = rng.uniform(size=(n, 2))
    z = u[:, 0]
    phi = 2 * np.pi * u[:, 1]
    s = np.sqrt(np.maximum(1 - z * z, 0))
    m = jnp.asarray(np.stack([s * np.cos(phi), s * np.sin(phi), z], -1)
                    .astype(np.float32))
    d = jax.vmap(lambda mm: nd.d_beckmann(mm, jnp.float32(0.5)))(m)
    integral = float(jnp.mean(d * m[:, 2])) * 2 * np.pi
    assert abs(integral - 1.0) < 0.03, integral


def test_energy_conservation_rough_conductor():
    """E[weight] <= max Fresnel (no energy gain)."""
    table = bs.build_table([{"kind": bs.ROUGH_CONDUCTOR,
                             "albedo": (1, 1, 1), "roughness": 0.5}])
    rng = np.random.default_rng(5)
    n = 2048
    wi = _rand_wi(rng, n)
    u = jnp.asarray(rng.uniform(size=(n, 4)).astype(np.float32))
    bi = jnp.zeros(n, jnp.int32)
    s = jax.vmap(lambda b, w, uu: bs.sample_bsdf(table, b, w, uu))(bi, wi, u)
    w = np.asarray(s["weight"])
    v = np.asarray(s["valid"])
    assert np.isfinite(w).all()
    assert (w[v] <= 1.05).all()


def test_thin_sheet_energy():
    table = bs.build_table([{"kind": bs.THIN_SHEET, "ior": 1.5}])
    rng = np.random.default_rng(6)
    n = 512
    wi = _rand_wi(rng, n)
    u = jnp.asarray(rng.uniform(size=(n, 4)).astype(np.float32))
    bi = jnp.zeros(n, jnp.int32)
    s = jax.vmap(lambda b, w, uu: bs.sample_bsdf(table, b, w, uu))(bi, wi, u)
    np.testing.assert_allclose(np.asarray(s["weight"]), 1.0)
    assert bool(jnp.all(s["specular"]))
    # both lobes occur
    refl = np.asarray(s["wo"][:, 2]) * np.asarray(wi[:, 2]) > 0
    assert refl.any() and (~refl).any()

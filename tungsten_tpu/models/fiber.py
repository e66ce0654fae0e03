"""Fiber/hair BCSDFs: rough wire, Lambertian fiber, and the d'Eon-style
energy-conserving hair model.

Re-designs of src/core/bsdfs/RoughWireBcsdf.cpp (181 LoC),
LambertianFiberBcsdf.cpp (70), HairBcsdf.cpp (447) +
PrecomputedAzimuthalLobe.hpp.  Local-frame convention matches the
reference's curve shading frame: +y = fiber tangent, wi/wo unit vectors,
sin(theta) = w.y, azimuth measured in the xz normal plane
(RoughWireBcsdf.cpp:125-133).  Like the reference, fiber BCSDF eval()
returns the full BCSDF integrand (curve integrals carry no extra |cos|
factor — the h-offset average is folded into the azimuthal N term).

The hair model's azimuthal distributions N_p (p = R, TT, TRT) are
precomputed on a 64x64 (phi, cosThetaD) grid by Gauss-Legendre integration
over the fiber width h at scene-build time with numpy
(HairBcsdf::precomputeAzimuthalDistributions, HairBcsdf.cpp:319-415) —
load-time work stays off the device; render-time lookups are bilinear
gathers, TPU-friendly.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_TWO_PI = 2.0 * np.pi
_RES = 64            # PrecomputedAzimuthalLobe::AzimuthalResolution
_ETA_HAIR = 1.55     # HairBcsdf.hpp Eta


def _trig_inverse(s):
    return jnp.sqrt(jnp.maximum(1.0 - s * s, 0.0))


def _i0(x):
    """Modified Bessel I0 via the reference's 10-term series
    (RoughWireBcsdf.cpp:31-43)."""
    result = jnp.ones_like(x)
    x_sq = x * x
    xi = x_sq
    denom = 4.0
    for i in range(1, 11):
        result = result + xi / denom
        xi = xi * x_sq
        denom = denom * 4.0 * float((i + 1) * (i + 1))
    return result


def _log_i0(x):
    return jnp.where(
        x > 12.0,
        x + 0.5 * (jnp.log(1.0 / (_TWO_PI * jnp.maximum(x, 1e-9)))
                   + 1.0 / (8.0 * jnp.maximum(x, 1e-9))),
        jnp.log(jnp.maximum(_i0(jnp.minimum(x, 12.0)), 1e-30)))


def m_longitudinal(v, sin_ti, sin_to, cos_ti, cos_to):
    """Energy-conserving longitudinal scattering M(v) with the stable
    small-roughness branch (RoughWireBcsdf.cpp:64-75)."""
    v = jnp.maximum(v, 1e-5)
    a = cos_ti * cos_to / v
    b = sin_ti * sin_to / v
    small = jnp.exp(-b + _log_i0(a) - 1.0 / v + 0.6931
                    + jnp.log(1.0 / (2.0 * v)))
    big = jnp.exp(-b) * _i0(jnp.minimum(a, 500.0)) \
        / (2.0 * v * jnp.sinh(jnp.minimum(1.0 / v, 30.0)))
    return jnp.where(v < 0.1, small, big)


def sample_m(v, sin_ti, cos_ti, xi1, xi2):
    """Returns sin_theta_o (stable vMF sampling, RoughWireBcsdf.cpp:84-96)."""
    v = jnp.maximum(v, 1e-5)
    cos_t = 1.0 + v * jnp.log(jnp.maximum(
        xi1 + (1.0 - xi1) * jnp.exp(-2.0 / v), 1e-30))
    sin_t = _trig_inverse(cos_t)
    cos_phi = jnp.cos(_TWO_PI * xi2)
    return -cos_t * sin_ti + sin_t * cos_phi * cos_ti


# ---------------------------------------------------------------------------
# Rough wire (RoughWireBcsdf)
# ---------------------------------------------------------------------------

def wire_v(roughness):
    return jnp.square(roughness * (np.pi / 2.0))


def wire_eval_pdf(wi, wo, v):
    """Returns N(cosPhi)*M(...) — both the scalar BCSDF shape and the pdf
    (RoughWireBcsdf.cpp:120-174: pdf == shape; the conductor Fresnel rides
    on top for eval only)."""
    sin_ti, sin_to = wi[..., 1], wo[..., 1]
    cos_ti, cos_to = _trig_inverse(sin_ti), _trig_inverse(sin_to)
    cos_phi = wo[..., 2] / jnp.sqrt(jnp.maximum(
        wo[..., 0] ** 2 + wo[..., 2] ** 2, 1e-12))
    n_az = 0.25 * jnp.sqrt(jnp.maximum(0.5 * (1.0 + cos_phi), 0.0))
    return n_az * m_longitudinal(v, sin_ti, sin_to, cos_ti, cos_to)


def wire_sample(wi, v, u1, u2, u3):
    """Sample wo; returns (wo, shape_pdf)."""
    sin_ti = wi[..., 1]
    cos_ti = _trig_inverse(sin_ti)
    sin_phi = 2.0 * u1 - 1.0
    sin_to = sample_m(v, sin_ti, cos_ti, u2, u3)
    cos_phi = _trig_inverse(sin_phi)
    cos_to = _trig_inverse(sin_to)
    wo = jnp.stack([sin_phi * cos_to, sin_to, cos_phi * cos_to], -1)
    return wo, wire_eval_pdf(wi, wo, v)


# ---------------------------------------------------------------------------
# Lambertian fiber (LambertianFiberBcsdf)
# ---------------------------------------------------------------------------

def lambertian_cylinder(wo):
    """Closed-form far-field Lambertian cylinder
    (LambertianFiberBcsdf.cpp:20-28)."""
    cos_to = _trig_inverse(wo[..., 1])
    phi = jnp.arctan2(wo[..., 0], wo[..., 2])
    phi = jnp.where(phi < 0.0, phi + _TWO_PI, phi)
    return cos_to * jnp.abs(((np.pi - phi) * jnp.cos(phi) + jnp.sin(phi))
                            / (4.0 * np.pi))


def lambertian_fiber_sample(wi, u1, u2, u3):
    """h-offset + cosine-hemisphere sampling
    (LambertianFiberBcsdf.cpp:44-61).  Returns (wo, pdf)."""
    h = u1 * 2.0 - 1.0
    nx = h
    nz = _trig_inverse(nx)
    phi_d = u2 * _TWO_PI
    r = jnp.sqrt(u3)
    dx = r * jnp.cos(phi_d)
    dy = r * jnp.sin(phi_d)
    dz = jnp.sqrt(jnp.maximum(1.0 - u3, 1e-12))
    wo = jnp.stack([dz * nx + dx * nz, dy, dz * nz - dx * nx], -1)
    return wo, lambertian_cylinder(wo)


# ---------------------------------------------------------------------------
# Hair (HairBcsdf) — numpy precompute + JAX runtime lookups
# ---------------------------------------------------------------------------

_EUMELANIN = np.array([0.419, 0.697, 1.37], np.float32)
_PHEOMELANIN = np.array([0.187, 0.4, 1.05], np.float32)


def hair_sigma_a(melanin_ratio, melanin_concentration):
    """Pigment mixture -> absorption (HairBcsdf.cpp:428-436)."""
    return melanin_concentration * (
        (1.0 - melanin_ratio) * _EUMELANIN + melanin_ratio * _PHEOMELANIN)


def _np_dielectric_reflectance(eta_rel, cos_i):
    cos_i = np.clip(cos_i, 0.0, 1.0)
    sin_t2 = eta_rel * eta_rel * (1.0 - cos_i * cos_i)
    cos_t = np.sqrt(np.maximum(1.0 - sin_t2, 0.0))
    rs = (eta_rel * cos_i - cos_t) / np.maximum(eta_rel * cos_i + cos_t,
                                                1e-12)
    rp = (eta_rel * cos_t - cos_i) / np.maximum(eta_rel * cos_t + cos_i,
                                                1e-12)
    return np.where(sin_t2 >= 1.0, 1.0, 0.5 * (rs * rs + rp * rp))


def precompute_hair(sigma_a, roughness, n_quad=140):
    """Numpy port of HairBcsdf::precomputeAzimuthalDistributions
    (HairBcsdf.cpp:319-415).  Returns dict with
      table [3, RES(y=cosThetaD), RES(phi), 3]  N_p values,
      cdf   [3, RES, RES+1]  per-row phi-bin CDF (mean-channel weighted),
      wsum  [3, RES]         lobe energies (weight() numerators).
    """
    sigma_a = np.asarray(sigma_a, np.float32).reshape(3)
    beta_r = max(np.pi / 2.0 * float(roughness), 0.04)
    betas = np.array([beta_r, beta_r * 0.5, beta_r * 2.0])

    # Gauss-Legendre nodes over h in [-1, 1]
    points, weights = np.polynomial.legendre.leggauss(n_quad)
    gamma_i = np.arcsin(np.clip(points, -1.0, 1.0))

    # wrapped Gaussian detector tables, one per lobe (2048 samples)
    ns = 2048
    phis = np.arange(ns) / (ns - 1.0) * _TWO_PI

    def wrapped_d(beta, phi):
        result = np.zeros_like(phi)
        shift = 0.0
        for _ in range(32):
            g1 = np.exp(-(phi + shift) ** 2 / (2 * beta * beta))
            g2 = np.exp(-(phi - shift - _TWO_PI) ** 2 / (2 * beta * beta))
            delta = (g1 + g2) / (np.sqrt(2 * np.pi) * beta)
            result += delta
            if delta.max() < 1e-4:
                break
            shift += _TWO_PI
        return result

    ds = np.stack([wrapped_d(b, phis) for b in betas])  # [3, ns]

    def approx_d(p, phi):
        u = np.abs(phi * ((ns - 1) / _TWO_PI))
        x0 = u.astype(np.int64)
        frac = u - x0
        return (ds[p][x0 % ns] * (1.0 - frac) + ds[p][(x0 + 1) % ns] * frac)

    table = np.zeros((3, _RES, _RES, 3), np.float32)
    ys = np.arange(_RES) / (_RES - 1.0)              # cosThetaD rows
    for yi, cos_half in enumerate(ys):
        ch = max(cos_half, 1e-4)
        ior_prime = np.sqrt(_ETA_HAIR ** 2 - (1.0 - ch * ch)) / ch
        cos_theta_t = np.sqrt(1.0 - (1.0 - ch * ch) / _ETA_HAIR ** 2)
        sigma_ap = sigma_a / cos_theta_t
        gamma_t = np.arcsin(np.clip(points / ior_prime, -1.0, 1.0))
        fres = _np_dielectric_reflectance(1.0 / _ETA_HAIR,
                                          ch * np.cos(gamma_i))
        absorb = np.exp(-sigma_ap[None, :] * 2.0 * np.cos(gamma_t)[:, None])

        a_r = fres                                            # [n_quad]
        a_tt = ((1.0 - fres) ** 2)[:, None] * absorb          # [n_quad,3]
        a_trt = a_tt * fres[:, None] * absorb

        for phi_i in range(_RES):
            phi = _TWO_PI * phi_i / (_RES - 1.0)
            # Phi(gammaI, gammaT, p) = 2 p gammaT - 2 gammaI + p pi
            for p, ap in ((0, a_r[:, None]), (1, a_tt), (2, a_trt)):
                dphi = phi - (2.0 * p * gamma_t - 2.0 * gamma_i + p * np.pi)
                dval = approx_d(p, dphi)
                table[p, yi, phi_i] = 0.5 * np.sum(
                    weights[:, None] * dval[:, None] * ap, axis=0)

    # sampling CDFs: per (lobe, row) over the phi bins, mean-channel weight
    w = table.mean(-1)                                       # [3, RES, RES]
    wsum = w.sum(-1)                                         # [3, RES]
    cdf = np.concatenate([np.zeros((3, _RES, 1)), np.cumsum(w, -1)], -1)
    cdf = cdf / np.maximum(cdf[..., -1:], 1e-30)
    return dict(table=table.astype(np.float32),
                cdf=cdf.astype(np.float32),
                wsum=wsum.astype(np.float32))


def _bilerp_table(table, phi, cos_td):
    """table [RES, RES, 3] bilinear lookup (PrecomputedAzimuthalLobe::eval)."""
    u = (_RES - 1) * phi / _TWO_PI
    v = (_RES - 1) * jnp.clip(cos_td, 0.0, 1.0)
    x0 = jnp.clip(u.astype(jnp.int32), 0, _RES - 2)
    y0 = jnp.clip(v.astype(jnp.int32), 0, _RES - 2)
    fu = jnp.clip(u - x0, 0.0, 1.0)[..., None]
    fv = jnp.clip(v - y0, 0.0, 1.0)[..., None]
    t00 = table[y0, x0]
    t10 = table[y0, x0 + 1]
    t01 = table[y0 + 1, x0]
    t11 = table[y0 + 1, x0 + 1]
    return ((t00 * (1 - fu) + t10 * fu) * (1 - fv)
            + (t01 * (1 - fu) + t11 * fu) * fv)


def _row_lerp(arr, cos_td):
    """Linear interpolation across cosThetaD rows; arr [RES, ...]."""
    v = (_RES - 1) * jnp.clip(cos_td, 0.0, 1.0)
    y0 = jnp.clip(v.astype(jnp.int32), 0, _RES - 2)
    fv = jnp.clip(v - y0, 0.0, 1.0)
    lo = arr[y0]
    hi = arr[y0 + 1]
    fshape = fv.reshape(fv.shape + (1,) * (lo.ndim - fv.ndim))
    return lo * (1 - fshape) + hi * fshape


def hair_lobe_pdf(cdf_l, phi, cos_td):
    """pdf(phi) of one azimuthal lobe via the row-lerped bin masses."""
    c = _row_lerp(cdf_l, cos_td)                       # [..., RES+1]
    # RES bins of width 2pi/RES — the SAME convention hair_lobe_sample uses
    # (phi = 2pi (x+frac)/RES), so pdf(phi) is registered to the sampled phi
    # and integrates to 1.  (The reference's PrecomputedAzimuthalLobe::pdf
    # indexes with (RES-1)/2pi, a ~RES/(RES-1) registration bias we fix.)
    u = _RES * phi / _TWO_PI
    x0 = jnp.clip(u.astype(jnp.int32), 0, _RES - 1)
    mass = jnp.take_along_axis(c, x0[..., None] + 1, -1)[..., 0] \
        - jnp.take_along_axis(c, x0[..., None], -1)[..., 0]
    return mass * (_RES / _TWO_PI)


def hair_lobe_sample(cdf_l, cos_td, xi):
    """Inverse-CDF phi sample of one azimuthal lobe; returns (phi, pdf)."""
    c = _row_lerp(cdf_l, cos_td)                       # [..., RES+1]
    x = jnp.clip(
        jnp.sum((c[..., :-1] <= xi[..., None]).astype(jnp.int32), -1) - 1,
        0, _RES - 1)
    c_lo = jnp.take_along_axis(c, x[..., None], -1)[..., 0]
    c_hi = jnp.take_along_axis(c, x[..., None] + 1, -1)[..., 0]
    mass = jnp.maximum(c_hi - c_lo, 1e-12)
    frac = jnp.clip((xi - c_lo) / mass, 0.0, 1.0)
    phi = _TWO_PI * (x.astype(jnp.float32) + frac) / _RES
    return phi, mass * (_RES / _TWO_PI)


def hair_angles(wi, wo):
    sin_ti = jnp.clip(wi[..., 1], -1.0, 1.0)
    sin_to = jnp.clip(wo[..., 1], -1.0, 1.0)
    theta_i = jnp.arcsin(sin_ti)
    theta_o = jnp.arcsin(sin_to)
    cos_td = jnp.cos((theta_o - theta_i) * 0.5)
    phi = jnp.arctan2(wo[..., 0], wo[..., 2])
    phi = jnp.where(phi < 0.0, phi + _TWO_PI, phi)
    return theta_i, sin_to, _trig_inverse(sin_to), cos_td, phi


def hair_eval(hair, wi, wo, scale_rad, vR, vTT, vTRT):
    """Full three-lobe eval (HairBcsdf::eval, HairBcsdf.cpp:186-216).
    `hair` = dict(table [3,RES,RES,3], cdf, wsum) as jnp arrays."""
    theta_i, sin_to, cos_to, cos_td, phi = hair_angles(wi, wo)
    th = [theta_i - 2.0 * scale_rad, theta_i + scale_rad,
          theta_i + 4.0 * scale_rad]
    vs = [vR, vTT, vTRT]
    out = 0.0
    for p in range(3):
        mp = m_longitudinal(vs[p], jnp.sin(th[p]), sin_to,
                            jnp.cos(th[p]), cos_to)
        np_ = _bilerp_table(hair["table"][p], phi, cos_td)
        out = out + mp[..., None] * np_
    return out


def hair_pdf(hair, wi, wo, scale_rad, vR, vTT, vTRT):
    theta_i, sin_to, cos_to, cos_td, phi = hair_angles(wi, wo)
    cos_ti = jnp.cos(theta_i)
    ws = [_row_lerp(hair["wsum"][p], jnp.clip(cos_ti, 0.0, 1.0))
          for p in range(3)]
    wtot = jnp.maximum(ws[0] + ws[1] + ws[2], 1e-12)
    th = [theta_i - 2.0 * scale_rad, theta_i + scale_rad,
          theta_i + 4.0 * scale_rad]
    vs = [vR, vTT, vTRT]
    pdf = 0.0
    for p in range(3):
        mp = m_longitudinal(vs[p], jnp.sin(th[p]), sin_to,
                            jnp.cos(th[p]), cos_to)
        pp = hair_lobe_pdf(hair["cdf"][p], phi, cos_td)
        pdf = pdf + ws[p] * mp * pp
    return pdf / wtot


def hair_sample(hair, wi, scale_rad, vR, vTT, vTRT, u):
    """Lobe-select + M/N sampling (HairBcsdf::sample).  u: [..., 4].
    Returns (wo, pdf)."""
    sin_ti = jnp.clip(wi[..., 1], -1.0, 1.0)
    theta_i = jnp.arcsin(sin_ti)
    cos_ti = jnp.cos(theta_i)
    ws = jnp.stack([_row_lerp(hair["wsum"][p],
                              jnp.clip(cos_ti, 0.0, 1.0))
                    for p in range(3)], -1)
    wtot = jnp.maximum(ws.sum(-1), 1e-12)
    target = u[..., 0] * wtot
    sel = jnp.where(target < ws[..., 0], 0,
                    jnp.where(target < ws[..., 0] + ws[..., 1], 1, 2))
    th = jnp.stack([theta_i - 2.0 * scale_rad, theta_i + scale_rad,
                    theta_i + 4.0 * scale_rad], -1)
    vs = jnp.stack([jnp.broadcast_to(v, theta_i.shape)
                    for v in (vR, vTT, vTRT)], -1)
    theta_s = jnp.take_along_axis(th, sel[..., None], -1)[..., 0]
    v_s = jnp.take_along_axis(vs, sel[..., None], -1)[..., 0]
    sin_to = sample_m(v_s, jnp.sin(theta_s), jnp.cos(theta_s),
                      u[..., 2], u[..., 3])
    cos_to = _trig_inverse(sin_to)
    theta_o = jnp.arcsin(jnp.clip(sin_to, -1.0, 1.0))
    cos_td = jnp.cos((theta_o - theta_i) * 0.5)
    # gather the selected lobe's cdf rows
    cdf_sel = jnp.stack([hair_lobe_sample(hair["cdf"][p], cos_td,
                                          u[..., 1])[0]
                         for p in range(3)], -1)
    phi = jnp.take_along_axis(cdf_sel, sel[..., None], -1)[..., 0]
    wo = jnp.stack([jnp.sin(phi) * cos_to, sin_to,
                    jnp.cos(phi) * cos_to], -1)
    pdf = hair_pdf(hair, wi, wo, scale_rad, vR, vTT, vTRT)
    return wo, pdf

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
from ..utils.vecmath import tlookup, dot, normalize
from . import fiber as fb
from . import ndf as nd

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
PHONG = 12
DIFFUSE_TRANSMISSION = 13
TRANSPARENCY = 14
MIXED = 15
SMOOTH_COAT = 16
ROUGH_COAT = 17
NDF_BSDF = 18
ROUGH_WIRE = 19
LAMBERT_FIBER = 20
HAIR = 21

# fiber/hair BCSDFs (RoughWireBcsdf.cpp, LambertianFiberBcsdf.cpp,
# HairBcsdf.cpp) — local frame has +y along the fiber tangent; eval returns
# the full BCSDF integrand (no extra |cos| — see models/fiber.py)
FIBER_KINDS = (ROUGH_WIRE, LAMBERT_FIBER, HAIR)

SPECULAR_KINDS = (MIRROR, CONDUCTOR, DIELECTRIC, THIN_SHEET)
# kinds that hold a reference to another table row (one nesting level only,
# mirroring MixedBsdf.cpp:54 "Recursive mixed BSDF not supported")
NESTED_KINDS = (TRANSPARENCY, MIXED, SMOOTH_COAT, ROUGH_COAT)


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
    p0: jnp.ndarray  # [B] phong exponent / diff-trans T / mixed ratio / coat thickness
    p1: jnp.ndarray  # [B] phong diffuse_ratio / transparency alpha
    sigma_a: jnp.ndarray  # [B,3] coat absorption (SmoothCoatBsdf.cpp:15)
    sub_a: jnp.ndarray  # [B] substrate / base / bsdf0 row index
    sub_b: jnp.ndarray  # [B] bsdf1 row index (mixed)
    kinds_static: tuple = ()  # python-side mirror of `kind` for static queries
    # hair BCSDF azimuthal tables (precomputed at build, models/fiber.py);
    # H = number of hair rows in the scene (1 dummy slot when none)
    hair_idx: jnp.ndarray = None    # [B] int32 row -> hair slot (-1 = none)
    hair_table: jnp.ndarray = None  # [H,3,64,64,3]
    hair_cdf: jnp.ndarray = None    # [H,3,64,65]
    hair_wsum: jnp.ndarray = None   # [H,3,64]


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
    p0 = np.zeros(B, np.float32)
    p1 = np.zeros(B, np.float32)
    sa = np.zeros((B, 3), np.float32)
    sub_a = np.zeros(B, np.int32)
    sub_b = np.zeros(B, np.int32)
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
        if b["kind"] == PHONG:
            p0[i] = b.get("exponent", 64.0)
            p1[i] = b.get("diffuse_ratio", 0.2)
        elif b["kind"] == DIFFUSE_TRANSMISSION:
            p0[i] = b.get("transmittance", 0.5)
        elif b["kind"] == TRANSPARENCY:
            p1[i] = b.get("alpha", 1.0)
        elif b["kind"] == MIXED:
            p0[i] = b.get("ratio", 0.5)
        elif b["kind"] in (SMOOTH_COAT, ROUGH_COAT):
            p0[i] = b.get("thickness", 1.0)
            ior[i] = b.get("ior", 1.3)
        elif b["kind"] == HAIR:
            p0[i] = np.radians(b.get("scale_angle", 2.0))
        sa[i] = np.asarray(b.get("sigma_a", (0.0, 0.0, 0.0)), np.float32)
        sub_a[i] = b.get("sub_a", i)
        sub_b[i] = b.get("sub_b", i)
    # hair azimuthal tables (build-time numpy precompute, models/fiber.py)
    hair_rows = [i for i, b in enumerate(bsdfs) if b["kind"] == HAIR]
    H = max(len(hair_rows), 1)
    hidx = np.full(B, -1, np.int32)
    htab = np.zeros((H, 3, fb._RES, fb._RES, 3), np.float32)
    hcdf = np.zeros((H, 3, fb._RES, fb._RES + 1), np.float32)
    hw = np.zeros((H, 3, fb._RES), np.float32)
    for hslot, i in enumerate(hair_rows):
        b = bsdfs[i]
        sig = b.get("sigma_a")
        if sig is None:
            sig = fb.hair_sigma_a(b.get("melanin_ratio", 0.5),
                                  b.get("melanin_concentration", 0.25))
        pre = fb.precompute_hair(sig, b.get("roughness", 0.1))
        htab[hslot], hcdf[hslot], hw[hslot] = (pre["table"], pre["cdf"],
                                               pre["wsum"])
        hidx[i] = hslot
    return BsdfTable(kind=jnp.asarray(kind), albedo=jnp.asarray(albedo),
                     ior=jnp.asarray(ior), roughness=jnp.asarray(rough),
                     eta=jnp.asarray(eta), k=jnp.asarray(kk),
                     enable_refraction=jnp.asarray(refr),
                     dist=jnp.asarray(dist), albedo_tex=jnp.asarray(atex),
                     p0=jnp.asarray(p0), p1=jnp.asarray(p1),
                     sigma_a=jnp.asarray(sa),
                     sub_a=jnp.asarray(sub_a), sub_b=jnp.asarray(sub_b),
                     kinds_static=tuple(int(k) for k in kind),
                     hair_idx=jnp.asarray(hidx), hair_table=jnp.asarray(htab),
                     hair_cdf=jnp.asarray(hcdf), hair_wsum=jnp.asarray(hw))


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
    k = tlookup(table.kind, bi)
    return ((k == MIRROR) | (k == CONDUCTOR) | (k == DIELECTRIC)
            | (k == THIN_SHEET))


def _diffuse_fresnel(ior):
    """Average diffuse Fresnel reflectance F_dr (Egan & Hilgeman fit, the
    standard smooth-plastic internal-scattering correction)."""
    return (-1.440 / (ior * ior) + 0.710 / ior + 0.668 + 0.0636 * ior)


def is_forward(table, bi):
    return tlookup(table.kind, bi) == FORWARD


def is_null(table, bi):
    return tlookup(table.kind, bi) == NULL


def _hair_params(table, bi):
    """(scale_rad, vR, vTT, vTRT) from the row's roughness/p0
    (HairBcsdf::prepareForRender, HairBcsdf.cpp:417-427)."""
    beta_r = jnp.maximum(np.pi / 2.0 * tlookup(table.roughness, bi), 0.04)
    return (tlookup(table.p0, bi), beta_r * beta_r,
            (beta_r * 0.5) ** 2, (beta_r * 2.0) ** 2)


def _kind_gate(table, *kinds):
    """Trace-time lobe gate: skip compiling a lobe when no table row has the
    kind.  Empty kinds_static (hand-built test tables) keeps every lobe.
    Cuts both XLA compile time and per-bounce VPU work — the branch-free
    design otherwise evaluates all 19 kinds for every batch."""
    ks = table.kinds_static
    return (not ks) or any(kk in ks for kk in kinds)


def _eval_simple(table, bi, wi, wo):
    """f(wi, wo) * |cos(wo)| for non-Dirac, non-nested lobes (NEE path).

    Specular/forward/null kinds evaluate to 0 (TraceBase estimateDirect skips
    them, TraceBase.cpp:432)."""
    k = tlookup(table.kind, bi)
    albedo = tlookup(table.albedo, bi)
    czi, czo = wi[..., 2], wo[..., 2]
    same_side = (czi > 0) & (czo > 0)
    has = lambda *kk: _kind_gate(table, *kk)  # noqa: E731

    f_lam = albedo / jnp.pi * jnp.maximum(czo, 0.0)[..., None]
    conds, vals = [k == LAMBERT], [f_lam]

    if has(OREN_NAYAR):
        # Oren-Nayar (OrenNayarBsdf.cpp; standard Fujii-style approximation)
        sigma = tlookup(table.roughness, bi)
        s2 = sigma * sigma
        A = 1.0 - 0.5 * s2 / (s2 + 0.33)
        Bc = 0.45 * s2 / (s2 + 0.09)
        # cos(phi_i - phi_o)
        denom = jnp.sqrt(jnp.maximum((1 - czi**2) * (1 - czo**2), 1e-12))
        cos_dphi = jnp.clip((wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1])
                            / denom, -1.0, 1.0)
        sin_alpha = jnp.sqrt(jnp.maximum(1.0 - jnp.minimum(czi, czo) ** 2,
                                         1e-12))
        tan_beta = (jnp.sqrt(jnp.maximum(1.0 - jnp.maximum(czi, czo) ** 2,
                                         1e-12))
                    / jnp.maximum(jnp.maximum(czi, czo), 1e-6))
        f_on = (albedo / jnp.pi
                * ((A + Bc * jnp.maximum(cos_dphi, 0.0) * sin_alpha * tan_beta)
                   * jnp.maximum(czo, 0.0))[..., None])
        conds.append(k == OREN_NAYAR)
        vals.append(f_on)

    # ---- microfacet lobes (RoughConductor/RoughPlastic/RoughDielectric,
    # NDFs from models/ndf.py replacing facet-forge) -----------------------
    if has(ROUGH_CONDUCTOR, ROUGH_PLASTIC, ROUGH_DIELECTRIC, NDF_BSDF,
           ROUGH_COAT):
        alpha = jnp.maximum(tlookup(table.roughness, bi), 1e-3)
        dist = tlookup(table.dist, bi)
        m = wi + wo
        # sqrt(max(.,eps)) keeps the backward finite at m == 0 (wo == -wi
        # rows: jnp.linalg.norm has a NaN gradient at exactly zero)
        m = m / jnp.sqrt(jnp.maximum(
            jnp.sum(m * m, axis=-1, keepdims=True), 1e-24))
        m = m * jnp.sign(m[..., 2:3])  # upper hemisphere
        wi_dot_m = jnp.sum(wi * m, axis=-1)
        D = nd.d_ndf(dist, m, alpha)
        G = nd.g2(dist, wi, wo, m, alpha)
        denom_r = 4.0 * jnp.maximum(jnp.abs(czi), 1e-6)

    if has(ROUGH_CONDUCTOR):
        F_cond = conductor_fresnel(tlookup(table.eta, bi),
                                   tlookup(table.k, bi),
                                   jnp.abs(wi_dot_m)[..., None])
        f_rc = albedo * F_cond * (D * G / denom_r)[..., None]
        conds.append(k == ROUGH_CONDUCTOR)
        vals.append(f_rc)

    if has(PLASTIC, ROUGH_PLASTIC, ROUGH_DIELECTRIC):
        ior = tlookup(table.ior, bi)

    if has(PLASTIC, ROUGH_PLASTIC):
        # plastic diffuse base with internal-scattering compensation
        F_i, _ = dielectric_fresnel(1.0 / ior, jnp.maximum(czi, 0.0))
        F_o, _ = dielectric_fresnel(1.0 / ior, jnp.maximum(czo, 0.0))
        F_dr = _diffuse_fresnel(ior)
        f_pl_diff = (albedo / jnp.pi * jnp.maximum(czo, 0.0)[..., None]
                     * ((1.0 - F_i) * (1.0 - F_o))[..., None]
                     / jnp.maximum(1.0 - albedo * F_dr, 1e-3))
        if has(PLASTIC):
            conds.append(k == PLASTIC)
            vals.append(f_pl_diff)
        if has(ROUGH_PLASTIC):
            F_im, _ = dielectric_fresnel(1.0 / ior, jnp.abs(wi_dot_m))
            f_rp = (F_im * D * G / denom_r)[..., None] + f_pl_diff
            conds.append(k == ROUGH_PLASTIC)
            vals.append(f_rp)

    if has(ROUGH_DIELECTRIC, DIFFUSE_TRANSMISSION):
        opp_side = (czi > 0) != (czo > 0)

    if has(ROUGH_DIELECTRIC):
        # rough dielectric: reflection (same side) or refraction (opposite)
        eta_rel = jnp.where(czi < 0.0, ior, 1.0 / ior)
        # transmission half-vector (Walter 2007 eq. 16); eta_i/eta_o relative
        ht = -(eta_rel[..., None] * wi + wo)
        ht = ht / jnp.sqrt(jnp.maximum(
            jnp.sum(ht * ht, axis=-1, keepdims=True), 1e-24))
        ht = ht * jnp.sign(ht[..., 2:3])
        i_dot_ht = jnp.sum(wi * ht, axis=-1)
        o_dot_ht = jnp.sum(wo * ht, axis=-1)
        F_t, _ = dielectric_fresnel(eta_rel, jnp.abs(i_dot_ht))
        Dt = nd.d_ndf(dist, ht, alpha)
        Gt = nd.g2(dist, wi, wo, ht, alpha)
        denom_t = (eta_rel * i_dot_ht + o_dot_ht) ** 2
        F_r, _ = dielectric_fresnel(eta_rel, jnp.abs(wi_dot_m))
        f_rd_refl = albedo * (F_r * D * G / denom_r)[..., None]
        f_rd_trans = albedo * (jnp.abs(i_dot_ht) * jnp.abs(o_dot_ht)
                               * (1.0 - F_t) * Dt * Gt
                               / jnp.maximum(jnp.abs(czi) * denom_t,
                                             1e-9))[..., None]
        f_rd = jnp.where(opp_side[..., None], f_rd_trans, f_rd_refl)
        conds.append(k == ROUGH_DIELECTRIC)
        vals.append(f_rd)

    if has(PHONG):
        # modified Phong (PhongBsdf.cpp:39-120): diffuse_ratio mix of lambert
        # and an (e+2)/(2pi) cos^e lobe around the mirror direction
        e = jnp.maximum(tlookup(table.p0, bi), 1.0)
        dr = jnp.clip(tlookup(table.p1, bi), 0.0, 1.0)
        cos_r = jnp.clip(-wi[..., 0] * wo[..., 0] - wi[..., 1] * wo[..., 1]
                         + czi * czo, 0.0, 1.0)
        f_ph = (albedo * ((1.0 - dr) * (e + 2.0) / (2.0 * jnp.pi)
                          * jnp.power(cos_r, e)
                          + dr / jnp.pi)[..., None]
                * jnp.maximum(czo, 0.0)[..., None])
        conds.append(k == PHONG)
        vals.append(f_ph)

    if has(DIFFUSE_TRANSMISSION):
        # diffuse transmission (DiffuseTransmissionBsdf): two-sided lambert
        # with transmit fraction T = p0
        T = jnp.clip(tlookup(table.p0, bi), 0.0, 1.0)
        f_dt = (albedo / jnp.pi * jnp.abs(czo)[..., None]
                * jnp.where(opp_side, T, 1.0 - T)[..., None])
        conds.append(k == DIFFUSE_TRANSMISSION)
        vals.append(f_dt)

    if has(NDF_BSDF):
        # NDF bsdf (NDFBsdf.hpp): bare microfacet mirror, F = 1
        f_ndf = albedo * (D * G / denom_r)[..., None]
        conds.append(k == NDF_BSDF)
        vals.append(f_ndf)

    f = jnp.select([jnp.broadcast_to(c, f_lam.shape) for c in conds],
                   vals, 0.0)
    two_sided = (k == ROUGH_DIELECTRIC) | (k == DIFFUSE_TRANSMISSION)
    f = jnp.where((same_side | two_sided)[..., None], f, 0.0)

    # ---- fiber BCSDFs (full-sphere, +y tangent frame; models/fiber.py) ----
    if any(kk in FIBER_KINDS for kk in table.kinds_static):
        c_half = jnp.sqrt(jnp.maximum(
            0.5 * (1.0 + jnp.sum(wi * wo, -1)), 0.0))
        Fw = conductor_fresnel(tlookup(table.eta, bi), tlookup(table.k, bi),
                               c_half[..., None])
        f_wire = albedo * Fw * fb.wire_eval_pdf(
            wi, wo, fb.wire_v(tlookup(table.roughness, bi)))[..., None]
        f = jnp.where(jnp.broadcast_to(k == ROUGH_WIRE, f.shape),
                      f_wire, f)
        f_lf = albedo * fb.lambertian_cylinder(wo)[..., None]
        f = jnp.where(jnp.broadcast_to(k == LAMBERT_FIBER, f.shape),
                      f_lf, f)
        if HAIR in table.kinds_static:
            sr, vR, vTT, vTRT = _hair_params(table, bi)
            for h in range(table.hair_table.shape[0]):
                hd = dict(table=table.hair_table[h],
                          cdf=table.hair_cdf[h], wsum=table.hair_wsum[h])
                fh = fb.hair_eval(hd, wi, wo, sr, vR, vTT, vTRT)
                f = jnp.where(jnp.broadcast_to(
                    (k == HAIR) & (tlookup(table.hair_idx, bi) == h), f.shape),
                    fh, f)
    return f


def _pdf_simple(table, bi, wi, wo):
    """pdf of sample() for non-Dirac, non-nested lobes."""
    k = tlookup(table.kind, bi)
    czi, czo = wi[..., 2], wo[..., 2]
    has = lambda *kk: _kind_gate(table, *kk)  # noqa: E731
    p_cos = jnp.maximum(czo, 0.0) / jnp.pi
    diffuse = (k == LAMBERT) | (k == OREN_NAYAR)
    pdf = jnp.where(diffuse & (czi > 0), p_cos, 0.0)

    if has(ROUGH_CONDUCTOR, ROUGH_PLASTIC, ROUGH_DIELECTRIC, NDF_BSDF):
        alpha = jnp.maximum(tlookup(table.roughness, bi), 1e-3)
        dist = tlookup(table.dist, bi)
        m = wi + wo
        # sqrt(max(.,eps)) keeps the backward finite at m == 0 (wo == -wi
        # rows: jnp.linalg.norm has a NaN gradient at exactly zero)
        m = m / jnp.sqrt(jnp.maximum(
            jnp.sum(m * m, axis=-1, keepdims=True), 1e-24))
        m = m * jnp.sign(m[..., 2:3])
        wi_dot_m = jnp.sum(wi * m, axis=-1)
        p_spec = nd.pdf_m(dist, wi, m, alpha) / jnp.maximum(
            4.0 * jnp.abs(wi_dot_m), 1e-9)

    if has(ROUGH_CONDUCTOR):
        pdf = jnp.where((k == ROUGH_CONDUCTOR) & (czi > 0) & (czo > 0),
                        p_spec, pdf)

    if has(PLASTIC, ROUGH_PLASTIC, ROUGH_DIELECTRIC):
        ior = tlookup(table.ior, bi)
    if has(PLASTIC, ROUGH_PLASTIC):
        F_i, _ = dielectric_fresnel(1.0 / ior, jnp.maximum(czi, 0.0))
    if has(PLASTIC):
        pdf = jnp.where((k == PLASTIC) & (czi > 0) & (czo > 0),
                        (1.0 - F_i) * p_cos, pdf)
    if has(ROUGH_PLASTIC):
        pdf = jnp.where((k == ROUGH_PLASTIC) & (czi > 0) & (czo > 0),
                        F_i * p_spec + (1.0 - F_i) * p_cos, pdf)

    if has(ROUGH_DIELECTRIC, DIFFUSE_TRANSMISSION):
        opp = (czi > 0) != (czo > 0)

    if has(ROUGH_DIELECTRIC):
        # rough dielectric: Fresnel-weighted reflect/refract jacobians
        eta_rel = jnp.where(czi < 0.0, ior, 1.0 / ior)
        ht = -(eta_rel[..., None] * wi + wo)
        ht = ht / jnp.sqrt(jnp.maximum(
            jnp.sum(ht * ht, axis=-1, keepdims=True), 1e-24))
        ht = ht * jnp.sign(ht[..., 2:3])
        i_dot_ht = jnp.sum(wi * ht, axis=-1)
        o_dot_ht = jnp.sum(wo * ht, axis=-1)
        F_m, _ = dielectric_fresnel(eta_rel, jnp.abs(wi_dot_m))
        F_ht, _ = dielectric_fresnel(eta_rel, jnp.abs(i_dot_ht))
        wi_up = jnp.stack([wi[..., 0], wi[..., 1], jnp.abs(czi)], axis=-1)
        m_up = jnp.stack([m[..., 0], m[..., 1], jnp.abs(m[..., 2])], axis=-1)
        ht_up = jnp.stack([ht[..., 0], ht[..., 1], jnp.abs(ht[..., 2])],
                          axis=-1)
        p_refl = (F_m * nd.pdf_m(dist, wi_up, m_up, alpha)
                  / jnp.maximum(4.0 * jnp.abs(wi_dot_m), 1e-9))
        jac_t = jnp.abs(o_dot_ht) / jnp.maximum(
            (eta_rel * i_dot_ht + o_dot_ht) ** 2, 1e-9)
        p_trans = (1.0 - F_ht) * nd.pdf_m(dist, wi_up, ht_up, alpha) * jac_t
        pdf = jnp.where(k == ROUGH_DIELECTRIC,
                        jnp.where(opp, p_trans, p_refl), pdf)

    if has(PHONG):
        # phong: diffuse_ratio mix of cosine and (e+1)/(2pi) cos^e lobe
        e = jnp.maximum(tlookup(table.p0, bi), 1.0)
        dr = jnp.clip(tlookup(table.p1, bi), 0.0, 1.0)
        cos_r = jnp.clip(-wi[..., 0] * wo[..., 0] - wi[..., 1] * wo[..., 1]
                         + czi * czo, 0.0, 1.0)
        p_ph = (dr * p_cos + (1.0 - dr) * (e + 1.0) / (2.0 * jnp.pi)
                * jnp.power(cos_r, e))
        pdf = jnp.where((k == PHONG) & (czi > 0) & (czo > 0), p_ph, pdf)

    if has(DIFFUSE_TRANSMISSION):
        T = jnp.clip(tlookup(table.p0, bi), 0.0, 1.0)
        p_dt = jnp.abs(czo) / jnp.pi * jnp.where(opp, T, 1.0 - T)
        pdf = jnp.where(k == DIFFUSE_TRANSMISSION, p_dt, pdf)

    if has(NDF_BSDF):
        pdf = jnp.where((k == NDF_BSDF) & (czi > 0) & (czo > 0), p_spec, pdf)

    # fiber BCSDFs: pdf == azimuthal*longitudinal shape (RoughWireBcsdf
    # .cpp:162-175, LambertianFiberBcsdf.cpp:64-69, HairBcsdf::pdf)
    if any(kk in FIBER_KINDS for kk in table.kinds_static):
        pdf = jnp.where(k == ROUGH_WIRE, fb.wire_eval_pdf(
            wi, wo, fb.wire_v(tlookup(table.roughness, bi))), pdf)
        pdf = jnp.where(k == LAMBERT_FIBER, fb.lambertian_cylinder(wo), pdf)
        if HAIR in table.kinds_static:
            sr, vR, vTT, vTRT = _hair_params(table, bi)
            for h in range(table.hair_table.shape[0]):
                hd = dict(table=table.hair_table[h],
                          cdf=table.hair_cdf[h], wsum=table.hair_wsum[h])
                pdf = jnp.where((k == HAIR) & (tlookup(table.hair_idx, bi) == h),
                                fb.hair_pdf(hd, wi, wo, sr, vR, vTT, vTRT),
                                pdf)
    return pdf


def _sample_simple(table, bi, wi, u):
    """Sample wo given wi in local frame; u is [>=5] uniforms.

    Returns dict(wo, weight[3], pdf, specular(bool), valid(bool)).
    The medium-boundary dielectric handles refraction with relative IOR.
    Each lobe compiles only when its kind is in table.kinds_static
    (_kind_gate): per-kind entries are folded most-specific-last."""
    k = tlookup(table.kind, bi)
    albedo = tlookup(table.albedo, bi)
    czi = wi[..., 2]
    has = lambda *kk: _kind_gate(table, *kk)  # noqa: E731
    _T = jnp.ones((), bool)

    # diffuse: cosine hemisphere (also the default wo and several lobes' base)
    wo_d = cosine_hemisphere(u[0], u[1])
    pdf_d = jnp.maximum(wo_d[..., 2], 1e-6) / jnp.pi
    diffuse_ok = czi > 0

    # mirror direction (mirror/conductor/dielectric/plastic/thin-sheet/phong)
    wo_m = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    wo_f = -wi  # forward

    # (cond, wo, weight, pdf, specular, valid) per kind present
    entries = [(k == LAMBERT, wo_d, albedo, pdf_d, ~_T, diffuse_ok)]

    if has(OREN_NAYAR):
        f_on = eval_bsdf(table, bi, wi, wo_d)
        w_on = f_on / jnp.maximum(pdf_d, 1e-12)[..., None]
        entries.append((k == OREN_NAYAR, wo_d, w_on, pdf_d, ~_T, diffuse_ok))

    if has(MIRROR):
        # mirror (MirrorBsdf.cpp:31-48)
        entries.append((k == MIRROR, wo_m, albedo, 1.0, _T, _T))

    if has(CONDUCTOR):
        F_c = conductor_fresnel(tlookup(table.eta, bi), tlookup(table.k, bi),
                                jnp.abs(czi)[..., None])
        entries.append((k == CONDUCTOR, wo_m, albedo * F_c, 1.0, _T, _T))

    if has(DIELECTRIC):
        # dielectric (DielectricBsdf): reflect or refract by Fresnel
        eta_rel = jnp.where(czi < 0.0, tlookup(table.ior, bi),
                            1.0 / tlookup(table.ior, bi))
        F_d, cos_t = dielectric_fresnel(eta_rel, jnp.abs(czi))
        reflect = (u[2] < F_d) | ~tlookup(table.enable_refraction, bi)
        wo_refr = jnp.stack([-wi[..., 0] * eta_rel, -wi[..., 1] * eta_rel,
                             -jnp.sign(czi) * cos_t], axis=-1)
        wo_di = jnp.where(reflect[..., None], wo_m, wo_refr)
        # weight 1 * albedo; Fresnel handled by RR choice
        entries.append((k == DIELECTRIC, wo_di, albedo, 1.0, _T, _T))

    if has(FORWARD):
        entries.append((k == FORWARD, wo_f, jnp.ones(3), 1.0, _T, _T))

    # ---- microfacet lobes -------------------------------------------------
    if has(ROUGH_CONDUCTOR, ROUGH_PLASTIC, ROUGH_DIELECTRIC, NDF_BSDF):
        alpha = jnp.maximum(tlookup(table.roughness, bi), 1e-3)
        dist = tlookup(table.dist, bi)
        sgn = jnp.sign(jnp.where(czi == 0, 1.0, czi))
        wi_up = jnp.stack([wi[..., 0], wi[..., 1], jnp.abs(czi)], axis=-1)
        m_g = nd.sample_vndf_ggx(wi_up, alpha, u[2], u[3])
        m_b = nd.sample_vndf_beckmann(wi_up, alpha, u[2], u[3])
        m_up = jnp.where(dist == nd.GGX, m_g, m_b)
        i_dot_m = jnp.sum(wi_up * m_up, axis=-1)
        pdf_m_up = nd.pdf_m(dist, wi_up, m_up, alpha)
        # energy weight of m-sampling: f_r*cos/pdf with F=1 (Fresnel applied
        # by each lobe).  GGX VNDF: G2/G1; Beckmann D-sampling: Walter.
        wo_r_up = nd.reflect(wi_up, m_up)
        G2r = nd.g2(dist, wi_up, wo_r_up, m_up, alpha)
        G1r = jnp.maximum(nd.g1(dist, wi_up, m_up, alpha), 1e-6)
        w_vndf = G2r / G1r
        w_walter = (jnp.abs(i_dot_m) * G2r
                    / jnp.maximum(jnp.abs(czi) * jnp.abs(m_up[..., 2]), 1e-6))
        w_micro = jnp.where(dist == nd.GGX, w_vndf, w_walter)
        wo_rc = jnp.stack([wo_r_up[..., 0], wo_r_up[..., 1],
                           wo_r_up[..., 2] * sgn], axis=-1)
        pdf_rc = pdf_m_up / jnp.maximum(4.0 * jnp.abs(i_dot_m), 1e-9)
        rc_ok = wo_r_up[..., 2] > 1e-5

    if has(ROUGH_CONDUCTOR):
        F_mc = conductor_fresnel(tlookup(table.eta, bi), tlookup(table.k, bi),
                                 jnp.abs(i_dot_m)[..., None])
        entries.append((k == ROUGH_CONDUCTOR, wo_rc,
                        albedo * F_mc * w_micro[..., None], pdf_rc, ~_T,
                        rc_ok & diffuse_ok))

    if has(PLASTIC, ROUGH_PLASTIC, ROUGH_DIELECTRIC, THIN_SHEET):
        ior = tlookup(table.ior, bi)

    if has(PLASTIC, ROUGH_PLASTIC):
        F_i, _ = dielectric_fresnel(1.0 / ior, jnp.abs(czi))
        spec_choice = u[2] < F_i

    if has(PLASTIC):
        # plastic (smooth): Fresnel-weighted dirac spec + diffuse
        # (PlasticBsdf: substrate with internal-scattering compensation)
        F_dr = _diffuse_fresnel(ior)
        czo_d = jnp.maximum(wo_d[..., 2], 0.0)
        F_od, _ = dielectric_fresnel(1.0 / ior, czo_d)
        w_pl_diff = (albedo * (1.0 - F_od)[..., None]
                     / jnp.maximum(1.0 - albedo * F_dr, 1e-3))
        wo_pl = jnp.where(spec_choice[..., None], wo_m, wo_d)
        w_pl = jnp.where(spec_choice[..., None], jnp.ones(3), w_pl_diff)
        pdf_pl = jnp.where(spec_choice, 1.0, (1.0 - F_i) * pdf_d)
        entries.append((k == PLASTIC, wo_pl, w_pl, pdf_pl, spec_choice,
                        diffuse_ok))

    if has(ROUGH_PLASTIC):
        # rough plastic: microfacet spec (chosen with prob F_i) + diffuse.
        # The two lobes OVERLAP in direction space, so the estimator weight
        # is f(wi,wo)/pdf_mixture(wi,wo) — conditional cancellation is wrong.
        wo_rp = jnp.where(spec_choice[..., None], wo_rc, wo_d)
        f_rp_at = eval_bsdf(table, bi, wi, wo_rp)
        pdf_rp = pdf_bsdf(table, bi, wi, wo_rp)
        w_rp = f_rp_at / jnp.maximum(pdf_rp, 1e-9)[..., None]
        rp_ok = (jnp.where(spec_choice, rc_ok, czi != 0)
                 & (pdf_rp > 1e-9) & (wo_rp[..., 2] > 0))
        entries.append((k == ROUGH_PLASTIC, wo_rp, w_rp, pdf_rp, ~_T,
                        rp_ok & diffuse_ok))

    if has(ROUGH_DIELECTRIC):
        # rough dielectric (Walter 2007): reflect/refract through sampled m
        eta_rel2 = jnp.where(czi < 0.0, ior, 1.0 / ior)
        F_rm, cos_tm = dielectric_fresnel(eta_rel2, jnp.abs(i_dot_m))
        refl_rd = (u[2] < F_rm) | ~tlookup(table.enable_refraction, bi)
        wo_rd_refr_up = (eta_rel2[..., None] * (-wi_up)
                         + (eta_rel2 * jnp.abs(i_dot_m) - cos_tm)[..., None]
                         * m_up)
        wo_rd_up = jnp.where(refl_rd[..., None], wo_r_up, wo_rd_refr_up)
        # undo the wi mirroring (z *= sgn) — the transmitted up-frame z is
        # already negative, so the same flip restores the true frame
        wo_rd = jnp.stack(
            [wo_rd_up[..., 0], wo_rd_up[..., 1],
             wo_rd_up[..., 2] * sgn], axis=-1)
        G2t = nd.g2(dist, wi_up, wo_rd_refr_up, m_up, alpha)
        w_micro_t = jnp.where(
            dist == nd.GGX, G2t / G1r,
            jnp.abs(i_dot_m) * G2t / jnp.maximum(
                jnp.abs(czi) * jnp.abs(m_up[..., 2]), 1e-6))
        w_rd = albedo * jnp.where(refl_rd, w_micro, w_micro_t)[..., None]
        o_dot_m_t = jnp.abs(jnp.sum(wo_rd_refr_up * m_up, axis=-1))
        pdf_rd = jnp.where(
            refl_rd, F_rm * pdf_rc,
            (1.0 - F_rm) * pdf_m_up * o_dot_m_t
            / jnp.maximum((eta_rel2 * jnp.abs(i_dot_m) - o_dot_m_t) ** 2,
                          1e-9))
        rd_ok = jnp.where(refl_rd, rc_ok,
                          (cos_tm > 0) & (wo_rd_refr_up[..., 2] < -1e-5))
        entries.append((k == ROUGH_DIELECTRIC, wo_rd, w_rd, pdf_rd, ~_T,
                        rd_ok))

    if has(THIN_SHEET):
        # thin sheet (ThinSheetBsdf): total multi-bounce reflectance 2R/(1+R)
        F_ts, _ = dielectric_fresnel(1.0 / ior, jnp.abs(czi))
        R_tot = 2.0 * F_ts / (1.0 + F_ts)
        ts_refl = u[2] < R_tot
        wo_ts = jnp.where(ts_refl[..., None], wo_m, wo_f)
        entries.append((k == THIN_SHEET, wo_ts, jnp.ones(3), 1.0, _T, _T))

    if has(PHONG):
        # phong: diffuse_ratio picks cosine vs cos^e lobe around mirror dir
        e = jnp.maximum(tlookup(table.p0, bi), 1.0)
        dr = jnp.clip(tlookup(table.p1, bi), 0.0, 1.0)
        ph_glossy = u[2] >= dr
        phi_g = 2.0 * jnp.pi * u[0]
        ct_g = jnp.power(jnp.clip(u[1], 1e-9, 1.0), 1.0 / (e + 1.0))
        st_g = jnp.sqrt(jnp.maximum(1.0 - ct_g * ct_g, 0.0))
        lobe = jnp.stack([st_g * jnp.cos(phi_g), st_g * jnp.sin(phi_g), ct_g],
                         axis=-1)
        # frame around mirror direction
        mz = wo_m / jnp.sqrt(jnp.maximum(
            jnp.sum(wo_m * wo_m, axis=-1, keepdims=True), 1e-24))
        hx = jnp.where(jnp.abs(mz[..., 0:1]) < 0.9,
                       jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
        mt = jnp.cross(hx, mz)
        mt = mt / jnp.sqrt(jnp.maximum(
            jnp.sum(mt * mt, axis=-1, keepdims=True), 1e-24))
        mb = jnp.cross(mz, mt)
        wo_ph_g = (lobe[..., 0:1] * mt + lobe[..., 1:2] * mb
                   + lobe[..., 2:3] * mz)
        wo_ph = jnp.where(ph_glossy[..., None], wo_ph_g, wo_d)
        f_ph_at = _eval_simple(table, bi, wi, wo_ph)
        p_ph_at = _pdf_simple(table, bi, wi, wo_ph)
        w_ph = f_ph_at / jnp.maximum(p_ph_at, 1e-9)[..., None]
        ph_ok = (czi > 0) & (wo_ph[..., 2] > 1e-6) & (p_ph_at > 1e-9)
        entries.append((k == PHONG, wo_ph, w_ph, p_ph_at, ~_T, ph_ok))

    if has(DIFFUSE_TRANSMISSION):
        # diffuse transmission: transmit w.p. T
        T = jnp.clip(tlookup(table.p0, bi), 0.0, 1.0)
        dt_trans = u[2] < T
        side = jnp.sign(jnp.where(czi == 0, 1.0, czi))
        flip = jnp.where(dt_trans, -side, side)
        wo_dt = jnp.stack([wo_d[..., 0], wo_d[..., 1], flip * wo_d[..., 2]],
                          axis=-1)
        pdf_dt = (jnp.abs(wo_dt[..., 2]) / jnp.pi
                  * jnp.where(dt_trans, T, 1.0 - T))
        entries.append((k == DIFFUSE_TRANSMISSION, wo_dt, albedo, pdf_dt,
                        ~_T, _T))

    if has(NDF_BSDF):
        # NDF bsdf: visible-normal mirror facet, weight G2/G1 (F = 1)
        entries.append((k == NDF_BSDF, wo_rc, albedo * w_micro[..., None],
                        pdf_rc, ~_T, rc_ok & diffuse_ok))

    # fold (kind conditions are mutually exclusive; defaults match the
    # pre-gating jnp.select fallbacks: wo_d / 0 / 1 / False / k != NULL)
    wo, weight = wo_d, jnp.zeros_like(wo_d)
    pdf = jnp.ones(czi.shape, jnp.float32)
    specular = jnp.zeros(czi.shape, bool)
    valid = k != NULL
    for c, wo_e, w_e, p_e, s_e, v_e in entries:
        cB = jnp.broadcast_to(c, czi.shape)
        wo = jnp.where(cB[..., None], wo_e, wo)
        weight = jnp.where(cB[..., None],
                           jnp.broadcast_to(w_e, wo_d.shape), weight)
        pdf = jnp.where(cB, p_e, pdf)
        specular = jnp.where(cB, s_e, specular)
        valid = jnp.where(cB, v_e, valid)

    # ---- fiber BCSDFs (models/fiber.py; +y tangent, full sphere) ----------
    if any(kk in FIBER_KINDS for kk in table.kinds_static):
        albedo_f = tlookup(table.albedo, bi)
        wo_w, p_w = fb.wire_sample(wi, fb.wire_v(tlookup(table.roughness, bi)),
                                   u[0], u[1], u[2])
        c_half = jnp.sqrt(jnp.maximum(
            0.5 * (1.0 + jnp.sum(wi * wo_w, -1)), 0.0))
        w_w = albedo_f * conductor_fresnel(tlookup(table.eta, bi), tlookup(table.k, bi),
                                           c_half[..., None])
        is_w = k == ROUGH_WIRE
        wo = jnp.where(jnp.broadcast_to(is_w, wo.shape), wo_w, wo)
        weight = jnp.where(jnp.broadcast_to(is_w, weight.shape), w_w, weight)
        pdf = jnp.where(is_w, p_w, pdf)
        valid = jnp.where(is_w, p_w > 1e-9, valid)
        specular = jnp.where(is_w, False, specular)

        wo_l, p_l = fb.lambertian_fiber_sample(wi, u[0], u[1], u[2])
        is_l = k == LAMBERT_FIBER
        wo = jnp.where(jnp.broadcast_to(is_l, wo.shape), wo_l, wo)
        weight = jnp.where(jnp.broadcast_to(is_l, weight.shape),
                           albedo_f, weight)
        pdf = jnp.where(is_l, p_l, pdf)
        valid = jnp.where(is_l, p_l > 1e-9, valid)
        specular = jnp.where(is_l, False, specular)

        if HAIR in table.kinds_static:
            sr, vR, vTT, vTRT = _hair_params(table, bi)
            u4 = jnp.stack([u[0], u[1], u[2], u[3]], -1)
            for h in range(table.hair_table.shape[0]):
                hd = dict(table=table.hair_table[h],
                          cdf=table.hair_cdf[h], wsum=table.hair_wsum[h])
                wo_h, p_h = fb.hair_sample(hd, wi, sr, vR, vTT, vTRT, u4)
                f_h = fb.hair_eval(hd, wi, wo_h, sr, vR, vTT, vTRT)
                w_h = f_h / jnp.maximum(p_h, 1e-9)[..., None]
                is_h = (k == HAIR) & (tlookup(table.hair_idx, bi) == h)
                wo = jnp.where(jnp.broadcast_to(is_h, wo.shape), wo_h, wo)
                weight = jnp.where(jnp.broadcast_to(is_h, weight.shape),
                                   w_h, weight)
                pdf = jnp.where(is_h, p_h, pdf)
                valid = jnp.where(is_h, p_h > 1e-9, valid)
                specular = jnp.where(is_h, False, specular)

    return {"wo": wo, "weight": weight, "pdf": pdf, "specular": specular,
            "valid": valid}


# ---------------------------------------------------------------------------
# Nested kinds: transparency / mixed / smooth+rough coat (one level deep,
# MixedBsdf.cpp:54 forbids recursion).  Public API dispatches to the simple
# path first, then overrides for nested rows.
# ---------------------------------------------------------------------------

def _coat_refract_in(wi, ior):
    """Refract wi (z>0) through the flat coat interface into the coat.

    Returns (wi_sub, Fi, cos_ti).  SmoothCoatBsdf.cpp:53-78."""
    eta = 1.0 / ior
    czi = jnp.abs(wi[..., 2])
    Fi, cti = dielectric_fresnel(eta, czi)
    wi_sub = jnp.stack([wi[..., 0] * eta, wi[..., 1] * eta, cti], axis=-1)
    return wi_sub, Fi, cti


def _coat_absorption(table, bi, cti, cto):
    """Beer absorption through the coat, [..., 3]."""
    th = tlookup(table.p0, bi)
    sa = tlookup(table.sigma_a, bi) * th[..., None]
    path = (-1.0 / jnp.maximum(cti, 1e-4)
            - 1.0 / jnp.maximum(cto, 1e-4))
    return jnp.exp(sa * path[..., None])


def _coat_spec_prob(table, bi, Fi):
    """specularWeight/(specularWeight+substrateWeight) with avgTransmittance
    approximated by the normal-incidence Beer factor
    (SmoothCoatBsdf::prepareForRender integrates this numerically)."""
    avg_t = jnp.exp(-2.0 * jnp.mean(tlookup(table.sigma_a, bi), axis=-1)
                    * tlookup(table.p0, bi))
    sw = Fi
    tw = avg_t * (1.0 - Fi)
    return sw / jnp.maximum(sw + tw, 1e-9)


def _has_nested(table):
    """Trace-time gate: scenes without nested rows compile the plain path."""
    return any(k in NESTED_KINDS for k in table.kinds_static)


def eval_bsdf(table, bi, wi, wo):
    """f(wi, wo) * |cos(wo)| for non-Dirac lobes, all kinds."""
    if not _has_nested(table):
        return _eval_simple(table, bi, wi, wo)
    k = tlookup(table.kind, bi)
    f = _eval_simple(table, bi, wi, wo)
    ba = tlookup(table.sub_a, bi)
    bb = tlookup(table.sub_b, bi)
    f_a = _eval_simple(table, ba, wi, wo)
    f_b = _eval_simple(table, bb, wi, wo)
    r = jnp.clip(tlookup(table.p0, bi), 0.0, 1.0)
    f = jnp.where(k == MIXED, r * f_a + (1.0 - r) * f_b, f)
    f = jnp.where(k == TRANSPARENCY, f_a, f)

    is_coat = (k == SMOOTH_COAT) | (k == ROUGH_COAT)
    ior = tlookup(table.ior, bi)
    wi_s, Fi, cti = _coat_refract_in(wi, ior)
    wo_s, Fo, cto = _coat_refract_in(wo, ior)
    f_sub = _eval_simple(table, ba, wi_s, wo_s)
    A = _coat_absorption(table, bi, cti, cto)
    jac = (1.0 / (ior * ior)) * jnp.abs(wo[..., 2]) / jnp.maximum(cto, 1e-4)
    f_coat = (f_sub * A * ((1.0 - Fi) * (1.0 - Fo) * jac)[..., None])
    # rough coat adds a glossy dielectric reflection on top
    # (RoughCoatBsdf: microfacet lobe with dielectric Fresnel)
    czi, czo = wi[..., 2], wo[..., 2]
    alpha = jnp.maximum(tlookup(table.roughness, bi), 1e-3)
    dist = tlookup(table.dist, bi)
    m = wi + wo
    # sqrt(max(.,eps)) keeps the backward finite at m == 0 (wo == -wi rows:
    # jnp.linalg.norm has a NaN gradient at exactly zero)
    m = m / jnp.sqrt(jnp.maximum(
        jnp.sum(m * m, axis=-1, keepdims=True), 1e-24))
    m = m * jnp.sign(m[..., 2:3])
    wi_dot_m = jnp.sum(wi * m, axis=-1)
    F_m, _ = dielectric_fresnel(1.0 / ior, jnp.abs(wi_dot_m))
    D = nd.d_ndf(dist, m, alpha)
    G = nd.g2(dist, wi, wo, m, alpha)
    f_top = (F_m * D * G / (4.0 * jnp.maximum(jnp.abs(czi), 1e-6)))[..., None]
    f_coat = f_coat + jnp.where(k == ROUGH_COAT,
                                jnp.broadcast_to(f_top, f_coat.shape), 0.0)
    ok = (czi > 0) & (czo > 0)
    f = jnp.where(is_coat, jnp.where(ok[..., None], f_coat, 0.0), f)
    return f


def pdf_bsdf(table, bi, wi, wo):
    """pdf of sample() for non-Dirac lobes, all kinds."""
    if not _has_nested(table):
        return _pdf_simple(table, bi, wi, wo)
    k = tlookup(table.kind, bi)
    pdf = _pdf_simple(table, bi, wi, wo)
    ba = tlookup(table.sub_a, bi)
    bb = tlookup(table.sub_b, bi)
    p_a = _pdf_simple(table, ba, wi, wo)
    p_b = _pdf_simple(table, bb, wi, wo)
    r = jnp.clip(tlookup(table.p0, bi), 0.0, 1.0)
    pdf = jnp.where(k == MIXED, r * p_a + (1.0 - r) * p_b, pdf)
    alpha_t = jnp.clip(tlookup(table.p1, bi), 0.0, 1.0)
    pdf = jnp.where(k == TRANSPARENCY, alpha_t * p_a, pdf)

    is_coat = (k == SMOOTH_COAT) | (k == ROUGH_COAT)
    ior = tlookup(table.ior, bi)
    wi_s, Fi, cti = _coat_refract_in(wi, ior)
    wo_s, Fo, cto = _coat_refract_in(wo, ior)
    p_sub = _pdf_simple(table, ba, wi_s, wo_s)
    jac = (1.0 / (ior * ior)) * jnp.abs(wo[..., 2]) / jnp.maximum(cto, 1e-4)
    sp = _coat_spec_prob(table, bi, Fi)
    p_coat = (1.0 - sp) * p_sub * jac
    # rough coat top lobe pdf
    czi = wi[..., 2]
    alpha = jnp.maximum(tlookup(table.roughness, bi), 1e-3)
    dist = tlookup(table.dist, bi)
    m = wi + wo
    # sqrt(max(.,eps)) keeps the backward finite at m == 0 (wo == -wi rows:
    # jnp.linalg.norm has a NaN gradient at exactly zero)
    m = m / jnp.sqrt(jnp.maximum(
        jnp.sum(m * m, axis=-1, keepdims=True), 1e-24))
    m = m * jnp.sign(m[..., 2:3])
    wi_dot_m = jnp.sum(wi * m, axis=-1)
    p_top = nd.pdf_m(dist, wi, m, alpha) / jnp.maximum(
        4.0 * jnp.abs(wi_dot_m), 1e-9)
    p_coat = p_coat + jnp.where(k == ROUGH_COAT, sp * p_top, 0.0)
    pdf = jnp.where(is_coat & (czi > 0) & (wo[..., 2] > 0), p_coat, pdf)
    return pdf


def sample_bsdf(table, bi, wi, u):
    """Sample wo given wi in local frame; u is [5] uniforms (u[4] selects the
    lobe for nested kinds).  All kinds."""
    s = _sample_simple(table, bi, wi, u)
    if not _has_nested(table):
        return s
    k = tlookup(table.kind, bi)
    ba = tlookup(table.sub_a, bi)
    bb = tlookup(table.sub_b, bi)

    # ---- transparency: w.p. alpha sample the base, else pass through ------
    alpha_t = jnp.clip(tlookup(table.p1, bi), 0.0, 1.0)
    s_a = _sample_simple(table, ba, wi, u)
    through = u[4] >= alpha_t
    s_tr = {
        "wo": jnp.where(through[..., None], -wi, s_a["wo"]),
        "weight": jnp.where(through[..., None], jnp.ones(3), s_a["weight"]),
        "pdf": jnp.where(through, 1.0, alpha_t * s_a["pdf"]),
        "specular": jnp.where(through, True, s_a["specular"]),
        "valid": jnp.where(through, True, s_a["valid"]),
    }

    # ---- mixed: pick bsdf0 w.p. ratio, mixture estimator for smooth lobes -
    r = jnp.clip(tlookup(table.p0, bi), 0.0, 1.0)
    pick_a = u[4] < r
    s_b = _sample_simple(table, bb, wi, u)
    wo_mx = jnp.where(pick_a[..., None], s_a["wo"], s_b["wo"])
    chosen_spec = jnp.where(pick_a, s_a["specular"], s_b["specular"])
    f_mx = (r * _eval_simple(table, ba, wi, wo_mx)
            + (1.0 - r) * _eval_simple(table, bb, wi, wo_mx))
    p_mx = (r * _pdf_simple(table, ba, wi, wo_mx)
            + (1.0 - r) * _pdf_simple(table, bb, wi, wo_mx))
    w_mx_smooth = f_mx / jnp.maximum(p_mx, 1e-9)[..., None]
    w_mx = jnp.where(chosen_spec[..., None],
                     jnp.where(pick_a[..., None], s_a["weight"],
                               s_b["weight"]),
                     w_mx_smooth)
    s_mx = {
        "wo": wo_mx,
        "weight": w_mx,
        "pdf": jnp.where(chosen_spec, jnp.where(pick_a, r, 1.0 - r), p_mx),
        "specular": chosen_spec,
        "valid": jnp.where(pick_a, s_a["valid"], s_b["valid"])
                 & jnp.where(chosen_spec, True, p_mx > 1e-9),
    }

    # ---- coats (SmoothCoatBsdf.cpp:40-100) --------------------------------
    ior = tlookup(table.ior, bi)
    wi_s, Fi, cti = _coat_refract_in(wi, ior)
    sp = _coat_spec_prob(table, bi, Fi)
    top = u[4] < sp
    # top lobe: smooth mirror or microfacet reflection off the coat
    czi = wi[..., 2]
    wo_mirror = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    alpha = jnp.maximum(tlookup(table.roughness, bi), 1e-3)
    dist = tlookup(table.dist, bi)
    wi_up = jnp.stack([wi[..., 0], wi[..., 1], jnp.abs(czi)], axis=-1)
    m_g = nd.sample_vndf_ggx(wi_up, alpha, u[2], u[3])
    m_b = nd.sample_vndf_beckmann(wi_up, alpha, u[2], u[3])
    m_up = jnp.where(dist == nd.GGX, m_g, m_b)
    i_dot_m = jnp.sum(wi_up * m_up, axis=-1)
    wo_top_rough = nd.reflect(wi_up, m_up)
    F_m, _ = dielectric_fresnel(1.0 / ior, jnp.abs(i_dot_m))
    G2r = nd.g2(dist, wi_up, wo_top_rough, m_up, alpha)
    G1r = jnp.maximum(nd.g1(dist, wi_up, m_up, alpha), 1e-6)
    p_top_r = nd.pdf_m(dist, wi_up, m_up, alpha) / jnp.maximum(
        4.0 * jnp.abs(i_dot_m), 1e-9)
    rough_top = k == ROUGH_COAT
    wo_top = jnp.where(rough_top[..., None], wo_top_rough, wo_mirror)
    w_top = jnp.where(rough_top[..., None],
                      (F_m * G2r / G1r / jnp.maximum(sp, 1e-9))[..., None]
                      * jnp.ones(3),
                      (Fi / jnp.maximum(sp, 1e-9))[..., None] * jnp.ones(3))
    pdf_top = jnp.where(rough_top, sp * p_top_r, sp)
    top_ok = wo_top[..., 2] > 1e-6

    # substrate: refract in, sample, refract out
    s_sub = _sample_simple(table, ba, wi_s, u)
    wo_sub = s_sub["wo"]
    czo_sub = wo_sub[..., 2]
    Fo, cto = dielectric_fresnel(ior, jnp.abs(czo_sub))
    tir = Fo >= 1.0 - 1e-6
    wo_out = jnp.stack([wo_sub[..., 0] * ior, wo_sub[..., 1] * ior, cto],
                       axis=-1)
    A = _coat_absorption(table, bi, cti, jnp.abs(czo_sub))
    w_sub = (s_sub["weight"] * A
             * ((1.0 - Fi) * (1.0 - Fo)
                / jnp.maximum(1.0 - sp, 1e-9))[..., None])
    pdf_sub = (s_sub["pdf"] * (1.0 - sp) * (1.0 / (ior * ior))
               * cto / jnp.maximum(jnp.abs(czo_sub), 1e-6))
    s_coat = {
        "wo": jnp.where(top[..., None], wo_top, wo_out),
        "weight": jnp.where(top[..., None], w_top, w_sub),
        "pdf": jnp.where(top, pdf_top, pdf_sub),
        "specular": jnp.where(top, k == SMOOTH_COAT, s_sub["specular"]),
        "valid": jnp.where(top, top_ok, s_sub["valid"] & ~tir)
                 & (czi > 0),
    }

    out = {}
    for key in ("wo", "weight", "pdf", "specular", "valid"):
        v = s[key]
        v = jnp.where(k == TRANSPARENCY, s_tr[key], v)
        v = jnp.where(k == MIXED, s_mx[key], v)
        v = jnp.where((k == SMOOTH_COAT) | (k == ROUGH_COAT), s_coat[key], v)
        out[key] = v
    return out


# ---------------------------------------------------------------------------
# PSS inversion (ReversibleJumpMLT): given (wi, wo), recover the uniform
# slots u[5] whose sample_bsdf(u) reproduces wo.  Mirrors the reference's
# per-Bsdf invert() family (LambertBsdf.cpp:49-60, DielectricBsdf.cpp:110-146,
# MirrorBsdf.cpp:82-90, PlasticBsdf/DiffuseTransmissionBsdf/ThinSheetBsdf).
# Discrete branch choices fill their accepting sub-interval with a fresh
# uniform (the reference's putBoolean/putDiscrete + untracked1D).
# Unsupported kinds (rough microfacet, fiber, nested) return ok=False — the
# RJ strategy jump is then rejected, which keeps the chain a valid MCMC
# (both directions fail symmetrically).
# ---------------------------------------------------------------------------

def _invert_cosine_hemisphere(wo):
    """(u_phi, u_r2) with cosine_hemisphere(u_phi, u_r2) == wo (z>0 side;
    callers pass |z|).  SampleWarp::invertCosineHemisphere analog."""
    phi = jnp.arctan2(wo[..., 1], wo[..., 0])
    u0 = jnp.mod(phi / (2.0 * jnp.pi), 1.0)
    u1 = jnp.clip(wo[..., 0] ** 2 + wo[..., 1] ** 2, 0.0, 1.0 - 1e-7)
    return u0, u1


def _mirror_match(wi, wo, tol=1e-3):
    m = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    return jnp.max(jnp.abs(wo - m), axis=-1) < tol


def invert_bsdf(table, bi, wi, wo, ur):
    """u[5], ok: PSS slots reproducing wo from sample_bsdf(table, bi, wi, u).

    ur [5]: fresh uniforms for unconstrained slots / accepting intervals."""
    k = tlookup(table.kind, bi)
    czi = wi[..., 2]
    czo = wo[..., 2]
    u = jnp.stack([ur[..., 0], ur[..., 1], ur[..., 2], ur[..., 3],
                   ur[..., 4]], axis=-1)

    ok = jnp.zeros(jnp.shape(czi), bool)

    # diffuse reflection family: cosine hemisphere in u[0:2]
    c0, c1 = _invert_cosine_hemisphere(
        jnp.stack([wo[..., 0], wo[..., 1], jnp.abs(czo)], axis=-1))
    is_diff = (k == LAMBERT) | (k == OREN_NAYAR)
    ok = jnp.where(is_diff, (czi > 0.0) & (czo > 0.0), ok)
    u = u.at[..., 0].set(jnp.where(is_diff, c0, u[..., 0]))
    u = u.at[..., 1].set(jnp.where(is_diff, c1, u[..., 1]))

    # deterministic mirrors
    mm = _mirror_match(wi, wo)
    is_mirror = (k == MIRROR) | (k == CONDUCTOR)
    ok = jnp.where(is_mirror, mm, ok)

    # forward / null passthrough
    fwd = jnp.max(jnp.abs(wo + wi), axis=-1) < 1e-3
    ok = jnp.where(k == FORWARD, fwd, ok)

    # dielectric: branch choice in u[2]
    ior = tlookup(table.ior, bi)
    eta_rel = jnp.where(czi < 0.0, ior, 1.0 / ior)
    F_d, cos_t = dielectric_fresnel(eta_rel, jnp.abs(czi))
    refr_dir = jnp.stack([-wi[..., 0] * eta_rel, -wi[..., 1] * eta_rel,
                          -jnp.sign(czi) * cos_t], axis=-1)
    rm = jnp.max(jnp.abs(wo - refr_dir), axis=-1) < 1e-3
    en_r = tlookup(table.enable_refraction, bi)
    is_di = k == DIELECTRIC
    di_refl = mm
    di_refr = rm & en_r & (F_d < 1.0 - 1e-6)
    u2_di = jnp.where(di_refl, F_d * ur[..., 2],
                      F_d + (1.0 - F_d) * ur[..., 2])
    ok = jnp.where(is_di, di_refl | di_refr, ok)
    u = u.at[..., 2].set(jnp.where(is_di, u2_di, u[..., 2]))

    # smooth plastic: Fresnel-choice spec mirror vs cosine diffuse
    F_i, _ = dielectric_fresnel(1.0 / ior, jnp.abs(czi))
    is_pl = k == PLASTIC
    pl_spec = mm
    pl_diff = (czo > 0.0) & ~mm
    u2_pl = jnp.where(pl_spec, F_i * ur[..., 2],
                      F_i + (1.0 - F_i) * ur[..., 2])
    ok = jnp.where(is_pl, (czi > 0.0) & (pl_spec | pl_diff), ok)
    u = u.at[..., 2].set(jnp.where(is_pl, u2_pl, u[..., 2]))
    u = u.at[..., 0].set(jnp.where(is_pl & pl_diff, c0, u[..., 0]))
    u = u.at[..., 1].set(jnp.where(is_pl & pl_diff, c1, u[..., 1]))

    # thin sheet: mirror w.p. R_tot else pass-through
    F_ts, _ = dielectric_fresnel(1.0 / ior, jnp.abs(czi))
    R_tot = 2.0 * F_ts / (1.0 + F_ts)
    is_ts = k == THIN_SHEET
    u2_ts = jnp.where(mm, R_tot * ur[..., 2],
                      R_tot + (1.0 - R_tot) * ur[..., 2])
    ok = jnp.where(is_ts, mm | fwd, ok)
    u = u.at[..., 2].set(jnp.where(is_ts, u2_ts, u[..., 2]))

    # diffuse transmission: side choice in u[2], cosine lobe in u[0:2]
    T = jnp.clip(tlookup(table.p0, bi), 0.0, 1.0)
    is_dt = k == DIFFUSE_TRANSMISSION
    dt_trans = czo * jnp.sign(jnp.where(czi == 0, 1.0, czi)) < 0.0
    u2_dt = jnp.where(dt_trans, T * ur[..., 2], T + (1.0 - T) * ur[..., 2])
    ok = jnp.where(is_dt, jnp.abs(czo) > 1e-6, ok)
    u = u.at[..., 2].set(jnp.where(is_dt, u2_dt, u[..., 2]))
    u = u.at[..., 0].set(jnp.where(is_dt, c0, u[..., 0]))
    u = u.at[..., 1].set(jnp.where(is_dt, c1, u[..., 1]))

    return u, ok

"""Wavefront path tracer: the whole light-transport loop, jit end-to-end.

Re-design of PathTracer/TraceBase (src/core/integrators/path_tracer/
PathTracer.cpp:17-204, integrators/TraceBase.cpp) as a fixed-shape wavefront:
a PathState SoA batch of rays advances one bounce per `lax.fori_loop`
iteration (intersect -> GPIS march -> NEE -> scatter) with active-ray masks;
the GPIS march runs as a batched lax.while_loop inside (models/media.py).
All control flow is uniform — terminated rays are masked, never compacted.

TPU-shaping decision: surface NEE and volume NEE, and both MIS strategies
(light sampling + material sampling, TraceBase.cpp:261-455), are fused into
ONE combined shadow-walk over a [2R] ray batch per bounce.  The reference
traces these sequentially per vertex; batching them keeps every GPIS
transmittance march a full-width VPU op and instantiates the march graph
once instead of four times.

Transport-semantics parity notes (each maps to a reference site):
- pixelSampleSegment = (px, py, spp, bounce) (PathTracer.cpp:46-48, 64); NEE
  uses bounce+1 so the shadow ray sees the NEXT segment's realization
  (TraceBase.cpp:547-549, 586-589) — the trick that makes NEE consistent
  with Renewal+ conditioning.
- surface NEE clones the medium state with firstScatter=true
  (TraceBase.cpp:291-294); volume NEE keeps conditioning and overrides
  lastAniso with phase->evalGrad for specular phases (TraceBase.cpp:370-374).
- GPIS-specular MIS gating on the 1D sampling scheme: UNI skips light
  sampling (:354), NEE disables MIS (:380-383), phase-sample pdf only used
  when non-UNI (:415-417).
- Emissive hits count only after specular chains (handleSurface:592-595),
  since NEE already contains the material-sampling MIS half.
- Russian roulette after bounce 2 at throughput < 0.1 (PathTracer.cpp:146-152).
"""
from __future__ import annotations

import dataclasses
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sparse_conv as sc
from ..utils import rng as trng
from ..utils.pytree import static_field, struct
from ..utils.vecmath import (dot, frame_to_local, frame_to_world, normalize,
                             oriented_frame, safe_normalize, tangent_frame, tlookup)
from . import bsdfs as bs
from . import envlight as ev
from . import media as md
from . import phase as ph
from . import primitives as pr
from .camera import Camera

_INF = np.float32(3.0e38)
_EPS = 1e-4
_ENV_DIST = np.float32(1.0e4)  # "infinity" for env shadow rays (marches stay
                               # bounded: GPIS media end at their boundary)


@struct(meta=("max_bounces", "min_bounces", "enable_light_sampling",
              "enable_volume_light_sampling", "low_order_scattering",
              "include_surfaces", "cam_medium", "shadow_hops"))
class Scene:
    prims: pr.PrimitiveSoA
    bsdfs: bs.BsdfTable
    media: tuple  # tuple[md.Medium]
    camera: Camera
    lights: jnp.ndarray  # [L] prim indices
    scene_seed: jnp.ndarray  # u32
    env: ev.EnvLight = dataclasses.field(default_factory=ev.no_env)
    max_bounces: int = static_field(default=64)
    min_bounces: int = static_field(default=0)
    enable_light_sampling: bool = static_field(default=True)
    enable_volume_light_sampling: bool = static_field(default=True)
    low_order_scattering: bool = static_field(default=True)
    include_surfaces: bool = static_field(default=True)
    cam_medium: int = static_field(default=-1)
    shadow_hops: int = static_field(default=3)


def _ray_key(scene, px, py, spp):
    return trng.xxhash32_4(px, py, spp,
                           scene.scene_seed ^ jnp.uint32(0x5F356495))


def _u(key, bounce, slot):
    return trng.uniform(key, bounce.astype(jnp.uint32) * jnp.uint32(64)
                        + jnp.uint32(slot))


def _make_draw(key, key_pix, qmc):
    """Per-ray uniform draws.  With a Sobol point `qmc` [D], the first
    QMC_BOUNCES bounces use Cranley-Patterson-rotated Sobol dims (offset
    fixed per pixel+dim, so stratification survives across samples);
    deeper bounces and qmc=None fall back to the hash sampler."""
    from ..utils.sobol import DIMS, QMC_BOUNCES, SLOTS

    def draw(bounce, slot):
        h = _u(key, bounce, slot)
        if qmc is None:
            return h
        off = trng.uniform(key_pix, bounce.astype(jnp.uint32)
                           * jnp.uint32(SLOTS) + jnp.uint32(slot))
        dim = jnp.minimum(bounce, QMC_BOUNCES - 1) * SLOTS + slot
        return jnp.where(bounce < QMC_BOUNCES,
                         jnp.mod(qmc[dim] + off, 1.0), h)

    return draw


def _power_heuristic(a, b):
    return a * a / jnp.maximum(a * a + b * b, 1e-20)


def _reattach_ratio(f):
    """f / stop_gradient(f): primal == 1, gradient == grad(log f).

    The detached-sampling estimator (SURVEY.md §7) detaches every sampling
    density; multiplying a detached-weight contribution by this ratio
    restores the integrand's differentiable dependence (d contrib/d theta =
    grad f / pdf_detached) without changing the primal value."""
    fd = jax.lax.stop_gradient(f)
    ok = jnp.abs(fd) > 1e-12
    return jnp.where(ok, f / jnp.where(ok, fd, 1.0), 1.0)


import os as _os_mod

_NANPROBE = bool(_os_mod.environ.get("TUNGSTEN_TPU_NANPROBE"))


def _nanprobe(x, name):
    """Debug identity: reports non-finite primal values and non-finite
    incoming cotangents during backward (enable TUNGSTEN_TPU_NANPROBE=1)."""
    if not _NANPROBE:
        return x

    @jax.custom_vjp
    def probe(v):
        return v

    def fwd(v):
        jax.debug.print(name + " fwd nonfinite={n}",
                        n=jnp.sum(~jnp.isfinite(v)))
        return v, None

    def bwd(_, g):
        jax.debug.print(name + " bwd nonfinite={n}",
                        n=jnp.sum(~jnp.isfinite(g)))
        return (g,)

    probe.defvjp(fwd, bwd)
    return probe(x)


def _cat(*xs):
    return jnp.concatenate(xs, axis=0)


def _cat_tree(a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.concatenate([x, y]), a, b)


# ---------------------------------------------------------------------------
# Shadow walk (generalizedShadowRay, TraceBase.cpp:62-154)
# ---------------------------------------------------------------------------

def shadow_walk(scene, ro, rd, dist, light_prim, med_idx, med_state, pss,
                u_jitter, active):
    """Walk forward-lobed surfaces x medium transmittance toward a light.
    Returns visibility/throughput [N,3] (chromatic classic media; binary
    per-channel for GPIS media)."""
    N = ro.shape[0]
    thr = jnp.ones((N, 3), jnp.float32)
    cur_o = ro
    remaining = dist
    cur_med = med_idx
    alive = active
    state = med_state

    for hop in range(scene.shadow_hops):
        isect = jax.vmap(lambda o, d, f: pr.intersect(scene.prims, o, d,
                                                      _EPS, f))(
            cur_o, rd, remaining * (1.0 - 1e-3))
        hit = isect["hit"] & alive
        hit_prim = isect["prim"]
        is_light_prim = hit_prim == light_prim
        fwd = jax.vmap(lambda b: bs.is_forward(scene.bsdfs, b))(
            tlookup(scene.prims.bsdf, hit_prim))
        blocked = hit & ~is_light_prim & ~fwd
        thr = jnp.where(blocked[:, None], 0.0, thr)
        alive = alive & ~blocked

        seg_far = jnp.where(hit & fwd & ~is_light_prim, isect["t"], remaining)

        for mi, medium in enumerate(scene.media):
            in_m = alive & (cur_med == mi)
            tr = md.transmittance(medium, scene.scene_seed, cur_o, rd,
                                  jnp.zeros(N), seg_far, state, pss,
                                  u_jitter, in_m)
            thr = thr * tr
            alive = alive & (jnp.where(in_m, jnp.max(tr, axis=-1), 1.0)
                             > 0.0)

        if hop == scene.shadow_hops - 1:
            break
        adv = alive & hit & fwd & ~is_light_prim
        geom_back = isect["back_side"]
        int_m = tlookup(scene.prims.int_medium, hit_prim)
        ext_m = tlookup(scene.prims.ext_medium, hit_prim)
        override = (int_m >= 0) | (ext_m >= 0)
        new_med = jnp.where(geom_back, ext_m, int_m)
        cur_med = jnp.where(adv & override, new_med, cur_med)
        cur_o = jnp.where(adv[:, None], cur_o + isect["t"][:, None] * rd,
                          cur_o)
        remaining = jnp.where(adv, remaining - isect["t"], remaining)
        # blank state for continued segments (mediumStateIterBlank,
        # TraceBase.cpp:79-85, 109, 128); seed ticks per forward hop
        state = state.reset_where(adv)
        pss = jnp.where(adv[:, None], pss.at[:, 3].add(1), pss)
        alive = alive & adv

    # binary visibility is a discrete event: zero gradient a.e.
    # (detached-sampling estimator; the march inside is a while_loop that
    # reverse-mode cannot traverse anyway)
    return jax.lax.stop_gradient(thr)


# ---------------------------------------------------------------------------
# Combined next-event estimation (TraceBase.cpp:261-455 fused)
# ---------------------------------------------------------------------------

def next_event(scene, p_vtx, is_vol, rd, aniso, scheme, t_seg,
               normal, tfr, bfr, wi_local, bsdf_idx,
               med_idx, med_state, pss_next, draw, bounce, gate):
    """One-light NEE with both MIS strategies for surface AND volume vertices
    in a single [2R] shadow walk.  Returns radiance [R,3]."""
    R = p_vtx.shape[0]
    nl = scene.lights.shape[0]
    has_env = scene.env.kind != ev.ENV_NONE and scene.env.sample
    n_total = nl + (1 if has_env else 0)
    if n_total == 0:
        return jnp.zeros((R, 3))

    ul = draw(bounce, 40)
    li_sel = jnp.minimum((ul * n_total).astype(jnp.int32), n_total - 1)
    is_env = (li_sel == nl) if has_env else jnp.zeros(R, bool)
    light = (tlookup(scene.lights, jnp.minimum(li_sel, nl - 1)) if nl > 0
             else jnp.full(R, -3, jnp.int32))
    light = jnp.where(is_env, -3, light)  # -3: matches no prim
    light_weight = jnp.float32(n_total)
    light_e = tlookup(scene.prims.emission, jnp.maximum(light, 0))

    # ---------------- strategy 1: light sampling --------------------------
    u1, u2 = draw(bounce, 41), draw(bounce, 42)
    d1, ldist, lpdf, lvalid = jax.vmap(
        lambda l, a, b_, q: pr.sample_direct(scene.prims, l, q, a, b_))(
        jnp.maximum(light, 0), u1, u2, p_vtx)
    if has_env:
        de, pe, ve = jax.vmap(lambda a, b_: ev.env_sample(scene.env, a, b_))(
            u1, u2)
        d1 = jnp.where(is_env[:, None], de, d1)
        ldist = jnp.where(is_env, _ENV_DIST, ldist)
        lpdf = jnp.where(is_env, pe, lpdf)
        lvalid = jnp.where(is_env, ve, lvalid)
        light_e = jnp.where(is_env[:, None],
                            jax.vmap(lambda w: ev.env_eval(scene.env, w))(de),
                            light_e)

    # Area-form reattachment for flat area lights (quad/disk): hold the
    # sampled light point fixed and let the geometric factor cos/r^2 vary
    # with the differentiable vertex position.  The estimator f*Le/pdf_sa
    # equals f*Le*G*A in area measure (Quad.cpp:172-186); detaching the
    # whole weight severs d contrib/d p_vtx, which is the main channel for
    # crossing-position (IFT) hyperparameter gradients.
    lk = tlookup(scene.prims.kind, jnp.maximum(light, 0))
    is_area = ((lk == pr.PRIM_QUAD) | (lk == pr.PRIM_DISK)) & ~is_env
    q_l = jax.lax.stop_gradient(p_vtx + d1 * ldist[:, None])
    dv = q_l - p_vtx
    r2q = jnp.maximum(dot(dv, dv), 1e-12)
    d1n = dv / jnp.sqrt(r2q)[:, None]
    n_l = jax.lax.stop_gradient(tlookup(scene.prims.n, jnp.maximum(light, 0)))
    G1 = jnp.abs(dot(n_l, d1n)) / r2q
    ratio1 = jnp.where(is_area, _reattach_ratio(G1), 1.0)
    d1 = jnp.where(is_area[:, None], d1n, d1)

    # surface eval
    wo_local = jax.vmap(frame_to_local)(tfr, bfr, normal, d1)
    f_surf = jax.vmap(lambda i, wi, wo: bs.eval_bsdf(scene.bsdfs, i, wi, wo))(
        bsdf_idx, wi_local, wo_local)
    pdf_surf = jax.vmap(lambda i, wi, wo: bs.pdf_bsdf(scene.bsdfs, i, wi, wo))(
        bsdf_idx, wi_local, wo_local)
    pure_spec = jax.vmap(lambda i: bs.is_pure_specular(scene.bsdfs, i)
                         | bs.is_forward(scene.bsdfs, i)
                         | bs.is_null(scene.bsdfs, i))(bsdf_idx)

    # volume eval (per medium; masks select)
    f_vol = jnp.zeros((R, 3))
    pdf_vol = jnp.zeros(R)
    aniso_shadow = aniso
    vol_lvalid = jnp.ones(R, bool)
    disable_mis = jnp.zeros(R, bool)
    for mi, medium in enumerate(scene.media):
        in_m = is_vol & (med_idx == mi)
        spec = ph.phase_is_specular(medium, scene.bsdfs)
        if spec and medium.cfg.one_d:
            half_n = safe_normalize(-rd + d1)

            def pdf_one(n_i, w_i, p_i, t_i, pss_i, it_i, c1):
                return sc.nee_pdf(medium.cfg, medium.gp, c1, w_i, n_i, p_i,
                                  t_i, pss_i, scene.scene_seed, it_i)

            npdf = jax.vmap(pdf_one)(half_n, rd, p_vtx, t_seg, pss_next,
                                     med_state.info_t, med_state.coeff1)
            albedo = scene.bsdfs.albedo[medium.phase_bsdf]
            f_m = albedo[None, :] * npdf[:, None]
            pdf_m = npdf

            def grad_one(n_i, w_i, p_i, pss_i, it_i, c1):
                return sc.nee_grad(medium.cfg, medium.gp, c1, w_i, n_i, p_i,
                                   pss_i, scene.scene_seed, it_i)

            g_ov = jax.vmap(grad_one)(half_n, rd, p_vtx, pss_next,
                                      med_state.info_t, med_state.coeff1)
            aniso_shadow = jnp.where(in_m[:, None], g_ov, aniso_shadow)
            vol_lvalid = vol_lvalid & jnp.where(
                in_m, scheme != sc.SCHEME_UNI, True)
            disable_mis = disable_mis | (in_m & (scheme == sc.SCHEME_NEE))
        elif spec:
            # smooth specular phase without 1D NEE support: no light sampling
            f_m = jnp.zeros((R, 3))
            pdf_m = jnp.zeros(R)
            vol_lvalid = vol_lvalid & ~in_m
        else:
            f_m = ph.eval_phase(medium, scene.bsdfs, rd, d1, aniso)
            pdf_m = ph.pdf_phase(medium, scene.bsdfs, rd, d1, aniso)
        f_vol = jnp.where(in_m[:, None], f_m, f_vol)
        pdf_vol = jnp.where(in_m, pdf_m, pdf_vol)

    f1 = jnp.where(is_vol[:, None], f_vol, f_surf)
    mat_pdf1 = jnp.where(is_vol, pdf_vol, pdf_surf)
    valid1 = gate & lvalid & (jnp.max(f1, axis=-1) > 0.0)
    valid1 = valid1 & jnp.where(is_vol, vol_lvalid, ~pure_spec)

    off1 = jnp.where(is_vol[:, None], 0.0,
                     normal * jnp.sign(wo_local[:, 2:3]) * _EPS)
    o1 = p_vtx + off1

    # ---------------- strategy 2: material sampling -----------------------
    u = jnp.stack([draw(bounce, 44), draw(bounce, 45),
                   draw(bounce, 46), draw(bounce, 47),
                   draw(bounce, 48)], axis=-1)
    s_surf = jax.vmap(lambda i, wi, uu: bs.sample_bsdf(scene.bsdfs, i, wi,
                                                       uu))(
        bsdf_idx, wi_local, u)
    d2_surf = jax.vmap(frame_to_world)(tfr, bfr, normal, s_surf["wo"])
    w2 = s_surf["weight"]
    pdf2 = s_surf["pdf"]
    d2 = d2_surf
    valid2 = gate & (~is_vol) & s_surf["valid"] & ~s_surf["specular"]
    for mi, medium in enumerate(scene.media):
        in_m = is_vol & (med_idx == mi)
        spec = ph.phase_is_specular(medium, scene.bsdfs)
        psamp = ph.sample_phase(medium, scene.bsdfs, rd, aniso, u)
        d2 = jnp.where(in_m[:, None], psamp["w"], d2)
        w2 = jnp.where(in_m[:, None], psamp["weight"], w2)
        v_m = psamp["valid"]
        if spec and medium.cfg.one_d:
            half_n2 = safe_normalize(-rd + psamp["w"])

            def pdf_one2(n_i, w_i, p_i, t_i, pss_i, it_i, c1):
                return sc.nee_pdf(medium.cfg, medium.gp, c1, w_i, n_i, p_i,
                                  t_i, pss_i, scene.scene_seed, it_i)

            spdf = jax.vmap(pdf_one2)(half_n2, rd, p_vtx, t_seg, pss_next,
                                      med_state.info_t, med_state.coeff1)
            pdf2 = jnp.where(in_m, spdf, pdf2)
            # UNI: direct light hits come from the main walk, skip here;
            # NEE: skip phase-sampled strategy entirely
            v_m = v_m & (scheme == sc.SCHEME_MIS)
        elif spec:
            v_m = jnp.zeros(R, bool)
        else:
            pdf2 = jnp.where(in_m, psamp["pdf"], pdf2)
        valid2 = valid2 | (gate & in_m & v_m)

    import os as _os
    if _os.environ.get("TUNGSTEN_TPU_NANCHECK"):
        for _nm, _ar in [("o1", o1), ("d2", d2), ("p_vtx", p_vtx),
                         ("off1", off1), ("d1", d1), ("wo_local", wo_local),
                         ("normal", normal), ("w2", w2), ("aniso", aniso)]:
            jax.debug.print(_nm + " nan={n} inf={i}",
                            n=jnp.isnan(_ar).sum(), i=jnp.isinf(_ar).sum())
    # strategy 2 must offset to ITS sampled direction's side of the surface
    # (o1 follows d1; reusing it self-occludes when the two straddle)
    off2 = jnp.where(is_vol[:, None], 0.0,
                     normal * jnp.sign(s_surf["wo"][:, 2:3]) * _EPS)
    o2 = p_vtx + off2
    # the strategy-2 occlusion query and all MIS/pdf weights below are
    # detached (detached-sampling estimator: sampling densities are not
    # differentiated; radiance factors f and Le stay differentiable)
    isect2 = jax.vmap(lambda o, w: pr.intersect(scene.prims, o, w, _EPS,
                                                _INF))(
        jax.lax.stop_gradient(o2), jax.lax.stop_gradient(d2))
    # front-side hits only: Primitive::evalDirect returns zero on backside
    # (a ceiling vertex just above the down-facing light otherwise collects
    # its full back-side emission — caught by golden parity, +8% energy)
    hit_light2 = valid2 & isect2["hit"] & (isect2["prim"] == light) \
        & ~isect2["back_side"]
    env_hit2 = (valid2 & is_env & ~isect2["hit"]) if has_env \
        else jnp.zeros(R, bool)
    t2_safe = jnp.where(hit_light2, isect2["t"], 1.0)
    ld_pdf2 = jax.vmap(lambda l, q, w, th, nh: pr.direct_pdf(
        scene.prims, l, q, w, th, nh))(jnp.maximum(light, 0), p_vtx, d2,
                                       t2_safe, isect2["normal"])
    light_e2 = light_e
    if has_env:
        ld_pdf2 = jnp.where(is_env,
                            jax.vmap(lambda w: ev.env_pdf(scene.env, w))(d2),
                            ld_pdf2)
        light_e2 = jnp.where(
            env_hit2[:, None],
            jax.vmap(lambda w: ev.env_eval(scene.env, w))(d2), light_e2)
        t2_safe = jnp.where(env_hit2, _ENV_DIST, t2_safe)
        hit_light2 = hit_light2 | env_hit2

    # ---------------- one combined shadow walk ----------------------------
    state1 = md._select(is_vol, replace(med_state, last_aniso=aniso_shadow),
                        med_state.reset_where(jnp.ones(R, bool)))
    state2 = md._select(is_vol, med_state,
                        med_state.reset_where(jnp.ones(R, bool)))
    uj = draw(bounce, 43)
    tr = shadow_walk(
        scene,
        _cat(o1, o2), _cat(d1, d2), _cat(jnp.where(valid1, ldist, 1.0),
                                         t2_safe),
        _cat(light, light), _cat(med_idx, med_idx),
        _cat_tree(state1, state2), _cat(pss_next, pss_next),
        _cat(uj, uj), _cat(valid1, hit_light2))
    tr1, tr2 = tr[:R], tr[R:]

    # Dirac point lights are unhittable by the material strategy — no MIS
    # (Point.cpp isDirac; TraceBase skips MIS for Dirac light samples)
    mis1 = jnp.where(disable_mis | (lk == pr.PRIM_POINT), 1.0,
                     _power_heuristic(lpdf, mat_pdf1))
    w_est1 = jax.lax.stop_gradient(
        tr1 * (mis1 / jnp.maximum(lpdf, 1e-9) * light_weight)[:, None]
    ) * ratio1[:, None]
    f1 = _nanprobe(f1, "f1")
    ratio1 = _nanprobe(ratio1, "ratio1")
    contrib1 = jnp.where((valid1 & (jnp.max(tr1, axis=-1) > 0))[:, None],
                         f1 * light_e * w_est1, 0.0)
    # strategy-2 weight reattachment: w2 was computed as f/pdf with the pdf
    # analytically cancelled (e.g. cosine-sampled lambert => constant), which
    # severs d f/d theta; restore it with the primal-1 ratio f/sg(f)
    f2_surf = jax.vmap(lambda i, wi, wo: bs.eval_bsdf(scene.bsdfs, i, wi,
                                                      wo))(
        bsdf_idx, wi_local, jax.lax.stop_gradient(s_surf["wo"]))
    f2 = jnp.where(is_vol[:, None], jnp.zeros((R, 3)), f2_surf)
    for mi, medium in enumerate(scene.media):
        in_m = is_vol & (med_idx == mi)
        if not ph.phase_is_specular(medium, scene.bsdfs):
            f2_m = ph.eval_phase(medium, scene.bsdfs, rd,
                                 jax.lax.stop_gradient(d2), aniso)
            f2 = jnp.where(in_m[:, None], f2_m, f2)
    w2 = w2 * _reattach_ratio(f2)
    mis2 = _power_heuristic(pdf2, ld_pdf2)
    w_est2 = jax.lax.stop_gradient(tr2 * (mis2 * light_weight)[:, None])
    w2 = _nanprobe(w2, "w2")
    contrib2 = jnp.where((hit_light2 & (jnp.max(tr2, axis=-1) > 0))[:, None],
                         w2 * light_e2 * w_est2, 0.0)
    if _os.environ.get("TUNGSTEN_TPU_DEBUG_NEE"):
        return contrib1 + contrib2, dict(c1=contrib1, c2=contrib2, tr1=tr1,
                                         tr2=tr2, f1=f1, valid1=valid1)
    return contrib1 + contrib2


# ---------------------------------------------------------------------------
# The main walk (PathTracer::traceSample, PathTracer.cpp:17-204)
# ---------------------------------------------------------------------------

def _make_pss_draw(u, fallback_key):
    """Draw uniforms from an explicit primary-sample-space vector u [R, D]
    (dim = bounce*64 + slot), hash fallback past D — the MLT path-space
    parameterization (KelemenMLT's PrimarySample array)."""
    D = u.shape[1]

    def draw(bounce, slot):
        dim = bounce * 64 + jnp.int32(slot)
        v = jnp.take_along_axis(u, jnp.minimum(dim, D - 1)[:, None],
                                axis=1)[:, 0]
        return jnp.where(dim < D, v, _u(fallback_key, bounce, slot))

    return draw


def trace(scene: Scene, px, py, spp_idx, want_aovs=False, qmc=None,
          pss_u=None):
    """Trace one sample for each pixel in the flat batch.
    px, py: int32 [R]; spp_idx: scalar int32.  Returns radiance [R,3], or
    (radiance, aovs) when want_aovs — depth/normal/albedo/visibility feature
    buffers at the first scattering vertex (PathTracer.cpp:107-125,
    cameras/OutputBufferSettings.hpp:11-18).  qmc: optional [D] Sobol point
    (utils/sobol.py) for low-discrepancy sampling of the first bounces.
    pss_u: optional [R, D] explicit uniform vector (MLT primary sample
    space) — overrides the hash sampler entirely for dims < D."""
    R = px.shape[0]
    key = _ray_key(scene, px.astype(jnp.uint32), py.astype(jnp.uint32),
                   jnp.uint32(spp_idx))
    key_pix = trng.xxhash32_4(px.astype(jnp.uint32), py.astype(jnp.uint32),
                              jnp.uint32(0x51CB0113),
                              scene.scene_seed ^ jnp.uint32(0xC9A01E77))
    draw = (_make_draw(key, key_pix, qmc) if pss_u is None
            else _make_pss_draw(pss_u, key))
    b0 = jnp.zeros(R, jnp.int32)
    uf = jnp.stack([draw(b0, 0), draw(b0, 1)], axis=-1)
    ul = jnp.stack([draw(b0, 2), draw(b0, 3)], axis=-1)
    ro, rd = scene.camera.sample_ray(px, py, uf, ul)

    carry0 = dict(
        ro=ro, rd=rd,
        throughput=jnp.ones((R, 3), jnp.float32),
        emission=jnp.zeros((R, 3), jnp.float32),
        active=jnp.ones(R, bool),
        was_specular=jnp.ones(R, bool),
        med_idx=jnp.full(R, scene.cam_medium, jnp.int32),
        med_state=md.MediumState.make(R),
        bounce=jnp.zeros(R, jnp.int32),
        medium_bounces=jnp.zeros(R, jnp.int32),
        aov_depth=jnp.zeros(R, jnp.float32),
        aov_normal=jnp.zeros((R, 3), jnp.float32),
        aov_albedo=jnp.zeros((R, 3), jnp.float32),
        aov_vis=jnp.zeros(R, jnp.float32),
        aov_seen=jnp.zeros(R, bool),
    )

    max_iters = scene.max_bounces + 4  # forward hops don't consume bounces

    def bounce_body(_, carry):
        ro, rd = carry["ro"], carry["rd"]
        throughput = carry["throughput"]
        emission = carry["emission"]
        active = carry["active"]
        was_specular = carry["was_specular"]
        med_idx = carry["med_idx"]
        med_state = carry["med_state"]
        bounce = carry["bounce"]
        medium_bounces = carry["medium_bounces"]
        pss = jnp.stack([px.astype(jnp.uint32), py.astype(jnp.uint32),
                         jnp.full(R, spp_idx, jnp.uint32),
                         bounce.astype(jnp.uint32)], axis=-1)

        isect = jax.vmap(lambda o, d: pr.intersect(scene.prims, o, d, _EPS,
                                                   _INF))(ro, rd)
        isect["t"] = _nanprobe(isect["t"], "isect_t")
        isect["normal"] = _nanprobe(isect["normal"], "isect_n")
        did_hit = isect["hit"]
        far = jnp.where(did_hit, isect["t"], _INF)

        # ---- medium distance sampling ------------------------------------
        vol_event = jnp.zeros(R, bool)
        med_t = far
        med_aniso = med_state.last_aniso
        med_weight = jnp.ones((R, 3), jnp.float32)
        scheme = jnp.zeros(R, jnp.int32)
        failed = jnp.zeros(R, bool)
        med_emis = jnp.zeros((R, 3), jnp.float32)
        import os as _os
        dbg_sd = {}
        for mi, medium in enumerate(scene.media):
            in_m = active & (med_idx == mi)
            uj = draw(bounce, 4)
            res, med_state_new = md.sample_distance(
                medium, scene.scene_seed, ro, rd, jnp.zeros(R), far,
                med_state, pss, uj, in_m)
            if _os.environ.get("TUNGSTEN_TPU_DEBUG_STASH"):
                dbg_sd = {k: v for k, v in res.items() if k.startswith("dbg_")}
            med_state = md._select(in_m, med_state_new, med_state)
            vol_event = vol_event | (in_m & ~res["exited"] & ~res["failed"])
            med_t = jnp.where(in_m & ~res["exited"], res["t"], med_t)
            med_aniso = jnp.where(in_m[:, None], res["aniso"], med_aniso)
            med_weight = jnp.where(in_m[:, None], res["weight"], med_weight)
            scheme = jnp.where(in_m, res["scheme"], scheme)
            failed = failed | (in_m & res["failed"])
            if "emission" in res:
                med_emis = jnp.where(in_m[:, None], res["emission"],
                                     med_emis)

        active = active & ~failed
        # volume emission BEFORE the scatter weight (PathTracer.cpp:72-73)
        emission = emission + jnp.where(active[:, None],
                                        throughput * med_emis, 0.0)
        throughput = throughput * jnp.where(vol_event[:, None], med_weight,
                                            1.0)
        escaped = active & ~vol_event & ~did_hit
        active = active & ~escaped
        surf_event = active & ~vol_event & did_hit

        # infinite lights (TraceBase::handleInfiniteLights): NEE already
        # carries the material-sampling MIS half, so escaped rays count the
        # environment only after specular chains
        if scene.env.kind != ev.ENV_NONE:
            env_gate = escaped & (bounce >= scene.min_bounces) \
                & (was_specular | (not scene.enable_light_sampling)
                   | (not scene.env.sample))
            env_rad = jax.vmap(lambda w: ev.env_eval(scene.env, w))(rd)
            emission = emission + jnp.where(env_gate[:, None],
                                            env_rad * throughput, 0.0)

        if not scene.low_order_scattering:
            kill = surf_event & (medium_bounces == 1)
            active = active & ~kill
            surf_event = surf_event & ~kill

        pss_next = pss.at[:, 3].add(1)

        # ---- event data ---------------------------------------------------
        # sanitize t for masked lanes: escaped rays carry t=INF which would
        # inject inf/NaN into masked arithmetic (and 0 * inf = NaN in
        # backward passes)
        med_t_safe = jnp.where(vol_event, med_t, 0.0)
        med_t_safe = _nanprobe(med_t_safe, "med_t_safe")
        vol_p = ro + med_t_safe[:, None] * rd
        hit_prim = isect["prim"]
        hit_p = ro + jnp.where(did_hit, isect["t"], 0.0)[:, None] * rd
        g_normal = isect["normal"]
        backside = dot(g_normal, rd) > 0.0
        sh_normal = jnp.where(backside[:, None], -g_normal, g_normal)
        bsdf_idx = tlookup(scene.prims.bsdf, hit_prim)

        if not scene.include_surfaces:
            pure_dirac = jax.vmap(
                lambda i: bs.is_pure_specular(scene.bsdfs, i)
                | bs.is_forward(scene.bsdfs, i))(bsdf_idx)
            kill = surf_event & ~pure_dirac & (medium_bounces == 0)
            active = active & ~kill
            surf_event = surf_event & ~kill

        # fiber-aware frame: the bitangent follows the strand tangent when
        # the hit carries one (curve tubes / cylinders), so fiber BCSDFs see
        # local +y = fiber direction (Curves.cpp tangentSpace convention)
        tfr, bfr = jax.vmap(oriented_frame)(sh_normal, isect["tangent"])
        wi_local = jax.vmap(frame_to_local)(tfr, bfr, sh_normal, -rd)

        # emissive surface hit (handleSurface:592-595); primitives emit
        # from the front side only (Primitive::emission returns zero on
        # hitBackside — caught by golden parity vs the reference)
        prim_em = tlookup(scene.prims.emission, hit_prim)
        em_gate = surf_event & ~backside \
            & (jnp.max(prim_em, axis=-1) > 0.0) \
            & (bounce >= scene.min_bounces) \
            & (was_specular | (not scene.enable_light_sampling))
        emission = emission + jnp.where(em_gate[:, None],
                                        prim_em * throughput, 0.0)

        # ---- combined NEE -------------------------------------------------
        surf_gate = (surf_event & (bounce < scene.max_bounces - 1)
                     if scene.enable_light_sampling
                     else jnp.zeros(R, bool))
        if scene.enable_light_sampling and not scene.include_surfaces:
            surf_gate = surf_gate & (medium_bounces > 0)
        vol_gate = (vol_event & ((medium_bounces > 0)
                                 | scene.low_order_scattering)
                    & (bounce < scene.max_bounces - 1)
                    if scene.enable_volume_light_sampling
                    else jnp.zeros(R, bool))
        gate = surf_gate | vol_gate
        p_vtx = jnp.where(vol_event[:, None], vol_p, hit_p)
        med_aniso = _nanprobe(med_aniso, "med_aniso")
        med_t = _nanprobe(med_t, "med_t")
        p_vtx = _nanprobe(p_vtx, "p_vtx")
        c = next_event(scene, p_vtx, vol_event, rd, med_aniso, scheme, med_t,
                       sh_normal, tfr, bfr, wi_local, bsdf_idx, med_idx,
                       med_state, pss_next, draw, bounce, gate)
        dbg_nee_parts = {}
        if _os.environ.get("TUNGSTEN_TPU_DEBUG_NEE"):
            c, dbg_nee_parts = c
            dbg_nee_parts = {"dbgn_" + k: v for k, v in dbg_nee_parts.items()}
            dbg_nee_parts["dbgn_isvol"] = vol_event
        c = _nanprobe(c, "nee_c")
        emission = emission + jnp.where(gate[:, None], throughput * c, 0.0)

        # ---- feature buffers at the first scattering vertex ----------------
        first_vtx = (surf_event | vol_event) & ~carry["aov_seen"]
        depth_here = jnp.where(vol_event, med_t,
                               jnp.where(did_hit, isect["t"], 0.0))
        normal_here = jnp.where(vol_event[:, None],
                                safe_normalize(med_aniso), sh_normal)
        albedo_here = jnp.where(vol_event[:, None], med_weight,
                                tlookup(scene.bsdfs.albedo, bsdf_idx))
        vis_here = (jnp.sum(c, axis=-1) > 0.0).astype(jnp.float32)
        aov_depth = jnp.where(first_vtx, depth_here, carry["aov_depth"])
        aov_normal = jnp.where(first_vtx[:, None], normal_here,
                               carry["aov_normal"])
        aov_albedo = jnp.where(first_vtx[:, None], albedo_here,
                               carry["aov_albedo"])
        aov_vis = jnp.where(first_vtx, vis_here, carry["aov_vis"])
        aov_seen = carry["aov_seen"] | first_vtx

        # ---- volume scattering (handleVolume:552-562) ---------------------
        new_rd = rd
        phase_ok = jnp.ones(R, bool)
        for mi, medium in enumerate(scene.media):
            in_m = vol_event & (med_idx == mi)
            u = jnp.stack([draw(bounce, 8), draw(bounce, 9),
                           draw(bounce, 10), draw(bounce, 11),
                           draw(bounce, 12)],
                          axis=-1)
            psamp = ph.sample_phase(medium, scene.bsdfs, rd, med_aniso, u)
            new_rd = jnp.where(in_m[:, None], psamp["w"], new_rd)
            w_m = psamp["weight"]
            if not ph.phase_is_specular(medium, scene.bsdfs):
                # detached-sampling reattachment: the sampled weight has the
                # pdf analytically cancelled; f/sg(f) restores d f/d theta
                # (theta enters through med_aniso = the GP gradient)
                f_m = ph.eval_phase(medium, scene.bsdfs, rd,
                                    jax.lax.stop_gradient(psamp["w"]),
                                    med_aniso)
                w_m = w_m * _reattach_ratio(f_m)
            w_m = _nanprobe(w_m, "w_m")
            throughput = throughput * jnp.where(in_m[:, None], w_m, 1.0)
            phase_ok = phase_ok & jnp.where(in_m, psamp["valid"], True)
            vol_was_spec = ~(scene.enable_volume_light_sampling
                             & ((medium_bounces > 0)
                                | scene.low_order_scattering))
            was_specular = jnp.where(in_m, vol_was_spec, was_specular)
        active = active & (phase_ok | ~vol_event)
        new_rd = _nanprobe(new_rd, "new_rd")
        vol_p = _nanprobe(vol_p, "vol_p2")
        ro = jnp.where(vol_event[:, None], vol_p, ro)
        rd = jnp.where(vol_event[:, None], new_rd, rd)
        medium_bounces = medium_bounces + vol_event.astype(jnp.int32)

        # ---- surface scattering (handleSurface:598-626) -------------------
        u = jnp.stack([draw(bounce, 16), draw(bounce, 17),
                       draw(bounce, 18), draw(bounce, 19),
                       draw(bounce, 20)], axis=-1)
        s = jax.vmap(lambda i, wi, uu: bs.sample_bsdf(scene.bsdfs, i, wi,
                                                      uu))(
            bsdf_idx, wi_local, u)
        bsdf_dead = surf_event & ~s["valid"]
        active = active & ~bsdf_dead
        surf_scatter = surf_event & s["valid"]

        wo_world = jax.vmap(frame_to_world)(tfr, bfr, sh_normal, s["wo"])
        is_fwd = jax.vmap(lambda i: bs.is_forward(scene.bsdfs, i))(bsdf_idx)
        wo_world = jnp.where((surf_scatter & is_fwd)[:, None], rd, wo_world)

        # reattach non-specular surface weights (f/sg(f); the shading frame
        # varies differentiably with the hit position on curved primitives)
        f_s = jax.vmap(lambda i, wi, wo: bs.eval_bsdf(scene.bsdfs, i, wi,
                                                      wo))(
            bsdf_idx, wi_local, jax.lax.stop_gradient(s["wo"]))
        s_w = s["weight"] * jnp.where(s["specular"][:, None], 1.0,
                                      _reattach_ratio(f_s))
        s_w = _nanprobe(s_w, "s_w")
        throughput = throughput * jnp.where(surf_scatter[:, None], s_w, 1.0)
        # forward/transparent passthrough keeps wasSpecular from the last
        # REAL scatter (TraceBase.cpp:577-611: the forward branch never
        # touches wasSpecular) — overwriting it with True double-counts
        # lights seen through transparent interfaces with NEE (caught by
        # golden parity: +38% energy on the Cornell scenes).  A passthrough
        # is the FORWARD kind or a transparency sample with wo == -wi.
        passthrough = is_fwd | (jnp.sum(jnp.abs(s["wo"] + wi_local),
                                        axis=-1) < 1e-6)
        was_specular = jnp.where(surf_scatter & ~passthrough, s["specular"],
                                 was_specular)

        geom_back = dot(wo_world, g_normal) < 0.0
        int_m = tlookup(scene.prims.int_medium, hit_prim)
        ext_m = tlookup(scene.prims.ext_medium, hit_prim)
        override = (int_m >= 0) | (ext_m >= 0)
        new_med = jnp.where(geom_back, int_m, ext_m)
        crossed = geom_back != (dot(-rd, g_normal) < 0.0)
        med_idx = jnp.where(surf_scatter & override, new_med, med_idx)
        med_state = med_state.reset_where(surf_scatter & crossed)

        wo_world = _nanprobe(wo_world, "wo_world")
        ro = jnp.where(surf_scatter[:, None], hit_p + wo_world * _EPS, ro)
        rd = jnp.where(surf_scatter[:, None], wo_world, rd)
        ro = _nanprobe(ro, "ro_end")
        rd = _nanprobe(rd, "rd_end")

        # ---- bookkeeping --------------------------------------------------
        thr_max = jnp.max(jnp.abs(throughput), axis=-1)
        active = active & (thr_max > 0.0)

        rr_u = draw(bounce, 30)
        rr = active & (bounce > 2) & (thr_max < 0.1)
        survive = rr_u < thr_max
        throughput = jnp.where(
            (rr & survive)[:, None],
            throughput / jnp.maximum(thr_max, 1e-9)[:, None], throughput)
        active = active & (~rr | survive)

        consumed = vol_event | (surf_scatter & ~is_fwd)
        bounce = bounce + jnp.where(active & consumed, 1, 0)
        active = active & (bounce < scene.max_bounces)

        nan_bad = ~jnp.isfinite(jnp.sum(throughput, axis=-1)
                                + jnp.sum(rd, axis=-1))
        active = active & ~nan_bad

        out_carry = dict(ro=ro, rd=rd, throughput=throughput,
                         emission=emission, active=active,
                         was_specular=was_specular, med_idx=med_idx,
                         med_state=med_state, bounce=bounce,
                         medium_bounces=medium_bounces,
                         aov_depth=aov_depth, aov_normal=aov_normal,
                         aov_albedo=aov_albedo, aov_vis=aov_vis,
                         aov_seen=aov_seen)
        import os as _os
        if _os.environ.get("TUNGSTEN_TPU_DEBUG_STASH"):
            out_carry.update(**dbg_sd)
            out_carry.update(dbg_wi_local=wi_local, dbg_sh_normal=sh_normal,
                             dbg_tfr=tfr, dbg_hp=hit_p,
                             dbg_it=jnp.where(did_hit, isect["t"], 0.0),
                             dbg_in=isect["normal"],
                             dbg_ro_in=ro, dbg_rd_in=rd)
            out_carry.update(dbg_nee=c, dbg_gate=gate, **dbg_nee_parts)
            out_carry.update(dbg_med_t=med_t, dbg_aniso=med_aniso,
                             dbg_vol_p=vol_p, dbg_hit_p=hit_p,
                             dbg_wo_world=wo_world, dbg_weight=med_weight,
                             dbg_s_weight=s["weight"], dbg_psamp_w=new_rd)
        return out_carry

    import os
    if os.environ.get("TUNGSTEN_TPU_UNROLL"):  # debug: python-level bounces
        n_it = int(os.environ.get("TUNGSTEN_TPU_MAX_ITERS", max_iters))
        out = carry0
        for it in range(n_it):
            out = bounce_body(it, out)
        if os.environ.get("TUNGSTEN_TPU_RETURN_CARRY"):
            return out
    else:
        out = jax.lax.fori_loop(0, max_iters, bounce_body, carry0)
    emission = jnp.where(jnp.isfinite(out["emission"]), out["emission"], 0.0)
    if want_aovs:
        return emission, {"depth": out["aov_depth"],
                          "normal": out["aov_normal"],
                          "albedo": out["aov_albedo"],
                          "visibility": out["aov_vis"]}
    return emission


def render_pass(scene: Scene, spp_idx, qmc=None):
    """One sample for every pixel; returns [H, W, 3]."""
    W, H = scene.camera.res_x, scene.camera.res_y
    px, py = jnp.meshgrid(jnp.arange(W, dtype=jnp.int32),
                          jnp.arange(H, dtype=jnp.int32))
    c = trace(scene, px.reshape(-1), py.reshape(-1), spp_idx, qmc=qmc)
    return c.reshape(H, W, 3)


def render_aovs(scene: Scene, spp_idx):
    """One sample per pixel + feature buffers.  Returns (img [H,W,3], dict of
    depth [H,W], normal [H,W,3], albedo [H,W,3], visibility [H,W])."""
    W, H = scene.camera.res_x, scene.camera.res_y
    px, py = jnp.meshgrid(jnp.arange(W, dtype=jnp.int32),
                          jnp.arange(H, dtype=jnp.int32))
    c, aovs = trace(scene, px.reshape(-1), py.reshape(-1), spp_idx,
                    want_aovs=True)
    return (c.reshape(H, W, 3),
            {"depth": aovs["depth"].reshape(H, W),
             "normal": aovs["normal"].reshape(H, W, 3),
             "albedo": aovs["albedo"].reshape(H, W, 3),
             "visibility": aovs["visibility"].reshape(H, W)})


def render_rows(scene: Scene, spp_idx, row0, n_rows, qmc=None):
    """One sample for `n_rows` image rows starting at `row0` (static count).

    The tiled analog of the reference's 16x16 render tiles
    (PathTraceIntegrator.cpp:26-41): bounds per-dispatch device work so a
    row-chunk stays within execution watchdogs and pipelines with host
    accumulation."""
    W = scene.camera.res_x
    rows = row0 + jnp.arange(n_rows, dtype=jnp.int32)
    px, py = jnp.meshgrid(jnp.arange(W, dtype=jnp.int32), rows)
    c = trace(scene, px.reshape(-1), py.reshape(-1), spp_idx, qmc=qmc)
    return c.reshape(n_rows, W, 3)

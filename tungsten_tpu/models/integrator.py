"""Wavefront path tracer: the whole light-transport loop, jit end-to-end.

Re-design of PathTracer/TraceBase (src/core/integrators/path_tracer/
PathTracer.cpp:17-204, integrators/TraceBase.cpp) as a fixed-shape wavefront:
a PathState SoA batch of rays advances one bounce per iteration (intersect ->
GPIS march -> NEE -> scatter) with active-ray masks; the GPIS march runs as a
batched lax.while_loop inside (models/media.py).  All control flow is uniform
— terminated rays are masked, never compacted, which on TPU beats divergent
per-ray loops.

Transport-semantics parity notes (each maps to a reference site):
- pixelSampleSegment = (px, py, spp, bounce), bounce updated per iteration
  (PathTracer.cpp:46-48, 64); NEE uses bounce+1 so the shadow ray sees the
  NEXT segment's realization (TraceBase.cpp:547-549, 586-589) — the key trick
  that makes NEE consistent with conditioning.
- surface NEE clones the medium state with firstScatter=true
  (TraceBase.cpp:291-294); volume NEE keeps conditioning and overrides
  lastAniso with phase->evalGrad for specular phases (TraceBase.cpp:370-374).
- GPIS-specular MIS gating on the 1D sampling scheme: UNI skips light
  sampling (:354), NEE disables MIS (:380-383), phase-sample pdf only
  used when non-UNI (:415-417).
- Emissive hits count only after specular chains (handleSurface:592-595),
  since estimateDirect already contains the bsdf-sampling MIS half.
- Russian roulette after bounce 2 at throughput < 0.1 (PathTracer.cpp:146-152).
"""
from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp

from ..ops import sparse_conv as sc
from ..utils import rng as trng
from ..utils.pytree import static_field, struct
from ..utils.vecmath import (dot, frame_to_local, frame_to_world, normalize,
                             safe_normalize, tangent_frame)
from . import bsdfs as bs
from . import media as md
from . import phase as ph
from . import primitives as pr
from .camera import Camera

_INF = jnp.float32(3.0e38)
_EPS = 1e-4


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


# ---------------------------------------------------------------------------
# Shadow rays (generalizedShadowRay, TraceBase.cpp:62-154)
# ---------------------------------------------------------------------------

def shadow_ray(scene, ro, rd, dist, light_prim, med_idx, med_state, pss,
               u_jitter, active):
    """Walk forward-lobed surfaces x medium transmittance toward a light.

    Returns throughput[R,3].  `med_idx` is the medium at the ray start;
    forward surfaces switch it (TraceBase.cpp:115-134).
    """
    R = ro.shape[0]
    thr = jnp.ones((R, 3), jnp.float32)
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
            scene.prims.bsdf[hit_prim])
        # opaque blocker (not the target light, not forward): kill
        blocked = hit & ~is_light_prim & ~fwd
        thr = jnp.where(blocked[:, None], 0.0, thr)
        alive = alive & ~blocked

        seg_far = jnp.where(hit & fwd, isect["t"], remaining)

        # per-medium transmittance over this segment
        for mi, medium in enumerate(scene.media):
            in_m = alive & (cur_med == mi)
            if medium is None:
                continue
            tr = md.transmittance(medium, scene.scene_seed, cur_o, rd,
                                  jnp.zeros(R), seg_far, state, pss,
                                  u_jitter, in_m)
            thr = thr * tr[:, None]
            alive = alive & (jnp.where(in_m, tr, 1.0) > 0.0)

        stop = ~(hit & fwd)  # reached the light / blocked / done
        if hop == scene.shadow_hops - 1:
            break
        # advance through the forward surface
        adv = alive & hit & fwd & ~is_light_prim
        back = jax.vmap(lambda i, d: dot(d, scene.prims.n[i]) < 0.0)(
            hit_prim, rd)
        # medium switch on crossing (Primitive::selectMedium)
        geom_back = isect["back_side"]
        int_m = scene.prims.int_medium[hit_prim]
        ext_m = scene.prims.ext_medium[hit_prim]
        override = (int_m >= 0) | (ext_m >= 0)
        new_med = jnp.where(geom_back, ext_m, int_m)
        cur_med = jnp.where(adv & override, new_med, cur_med)
        cur_o = jnp.where(adv[:, None], cur_o + isect["t"][:, None] * rd,
                          cur_o)
        remaining = jnp.where(adv, remaining - isect["t"], remaining)
        # fresh (blank) state for the continued segment keeps only info
        # (generalizedShadowRayImpl mediumStateIterBlank, TraceBase.cpp:79-85,
        #  109, 128); bounce seed ticks forward per forward-surface hop
        state = state.reset_where(adv)
        pss = jnp.where(adv[:, None],
                        pss.at[:, 3].add(1), pss)
        alive = alive & ~stop

    return thr


# ---------------------------------------------------------------------------
# NEE from a volume vertex (volumeLightSample + volumePhaseSample,
# TraceBase.cpp:346-420)
# ---------------------------------------------------------------------------

def _light_emission(scene, li):
    return scene.prims.emission[li]


def _power_heuristic(a, b):
    return a * a / jnp.maximum(a * a + b * b, 1e-20)


def volume_nee(scene, medium, mi, p, wi, aniso, scheme, t_seg, med_state,
               pss_next, key, bounce, active):
    """One-light NEE + phase-sample MIS from a medium scatter vertex.

    Returns radiance[R,3] (to be multiplied by throughput)."""
    R = p.shape[0]
    nl = scene.lights.shape[0]
    if nl == 0:
        return jnp.zeros((R, 3))

    # choose light uniformly (chooseLight with equal radiance estimates,
    # TraceBase.cpp:457-500 degenerates to uniform for our constant weights)
    ul = _u(key, bounce, 40)
    li_sel = jnp.minimum((ul * nl).astype(jnp.int32), nl - 1)
    light = scene.lights[li_sel]
    light_weight = jnp.float32(nl)

    spec = ph.phase_is_specular(medium, scene.bsdfs)
    one_d_nee = spec and medium.cfg.one_d

    # ---- strategy 1: light sampling --------------------------------------
    u1, u2 = _u(key, bounce, 41), _u(key, bounce, 42)
    d, ldist, lpdf, lvalid = jax.vmap(
        lambda l, a, b, q: pr.sample_direct(scene.prims, l, q, a, b))(
        light, u1, u2, p)

    f = ph.eval_phase(medium, scene.bsdfs, wi, d, aniso)
    aniso_shadow = aniso
    if spec:
        # mirror/conductor as GPIS micro-surface: eval via neePDF with the
        # half-vector normal (MirrorBsdf.cpp:50-72); evalGrad overrides the
        # shadow-ray conditioning gradient (TraceBase.cpp:370-374)
        half_n = safe_normalize(-wi + d)

        def pdf_one(n_i, w_i, p_i, t_i, pss_i, it_i, c1):
            return sc.nee_pdf(medium.cfg, medium.gp, c1, w_i, n_i, p_i, t_i,
                              pss_i, scene.scene_seed, it_i)

        npdf = jax.vmap(pdf_one)(half_n, wi, p, t_seg, pss_next,
                                 med_state.info_t, med_state.coeff1)
        albedo = scene.bsdfs.albedo[medium.phase_bsdf]
        f = albedo[None, :] * npdf[:, None]

        def grad_one(n_i, w_i, p_i, pss_i, it_i, c1):
            return sc.nee_grad(medium.cfg, medium.gp, c1, w_i, n_i, p_i,
                               pss_i, scene.scene_seed, it_i)

        aniso_shadow = jax.vmap(grad_one)(half_n, wi, p, pss_next,
                                          med_state.info_t, med_state.coeff1)
        # UNI scheme: no light sampling for specular (:354)
        lvalid = lvalid & (scheme != sc.SCHEME_UNI)

    lvalid = lvalid & active & (jnp.max(f, axis=-1) > 0.0)

    shadow_state = replace(med_state, last_aniso=aniso_shadow)
    uj = _u(key, bounce, 43)
    tr = shadow_ray(scene, p, d, ldist, light, jnp.full(R, mi, jnp.int32),
                    shadow_state, pss_next, uj, lvalid)
    e = _light_emission(scene, light) * tr

    if spec:
        ppdf = jnp.sum(f, axis=-1) / jnp.maximum(
            jnp.sum(scene.bsdfs.albedo[medium.phase_bsdf]), 1e-9)
        mis = jnp.where(scheme == sc.SCHEME_NEE, 1.0,
                        _power_heuristic(lpdf, ppdf))
    else:
        ppdf = ph.pdf_phase(medium, scene.bsdfs, wi, d, aniso)
        mis = _power_heuristic(lpdf, ppdf)
    contrib_l = jnp.where(lvalid[:, None],
                          f * e * (mis / jnp.maximum(lpdf, 1e-9))[:, None]
                          * light_weight, 0.0)

    # ---- strategy 2: phase sampling toward the light ----------------------
    u = jnp.stack([_u(key, bounce, 44), _u(key, bounce, 45),
                   _u(key, bounce, 46), _u(key, bounce, 47)], axis=-1)
    ps = ph.sample_phase(medium, scene.bsdfs, wi, aniso, u)
    pvalid = active & ps["valid"]
    if spec:
        # NEE scheme: skip phase sampling (:396-397)
        pvalid = pvalid & (scheme != sc.SCHEME_NEE)
        def pdf_s(n_i, w_i, p_i, t_i, pss_i, it_i, c1):
            return sc.nee_pdf(medium.cfg, medium.gp, c1, w_i, n_i, p_i, t_i,
                              pss_i, scene.scene_seed, it_i)
        half_n2 = safe_normalize(-wi + ps["w"])
        spdf = jax.vmap(pdf_s)(half_n2, wi, p, t_seg, pss_next,
                               med_state.info_t, med_state.coeff1)
    else:
        spdf = ps["pdf"]

    # does this direction hit the chosen light?
    li_isect = jax.vmap(lambda o, w: pr.intersect(scene.prims, o, w, _EPS,
                                                  _INF))(p, ps["w"])
    hit_light = pvalid & li_isect["hit"] & (li_isect["prim"] == light)
    ld_pdf = jax.vmap(lambda l, q, w, t: pr.direct_pdf(scene.prims, l, q, w,
                                                       t))(
        light, p, ps["w"], li_isect["t"])
    uj2 = _u(key, bounce, 48)
    tr2 = shadow_ray(scene, p, ps["w"], li_isect["t"], light,
                     jnp.full(R, mi, jnp.int32), med_state, pss_next, uj2,
                     hit_light)
    e2 = _light_emission(scene, light) * tr2
    use_mis2 = (not spec) or True  # power heuristic unless UNI-specular
    mis2 = _power_heuristic(spdf, ld_pdf)
    if spec:
        mis2 = jnp.where(scheme == sc.SCHEME_UNI, 0.0, mis2)
        # UNI specular phase hits of lights are handled by the main walk
    contrib_p = jnp.where(hit_light[:, None],
                          ps["weight"] * e2 * mis2[:, None] * light_weight,
                          0.0)

    return contrib_l + contrib_p


# ---------------------------------------------------------------------------
# NEE from a surface vertex (lightSample + bsdfSample, TraceBase.cpp:261-344)
# ---------------------------------------------------------------------------

def surface_nee(scene, p, normal, t, b, wi_local, bsdf_idx, med_idx,
                med_state, pss_next, key, bounce, active):
    R = p.shape[0]
    nl = scene.lights.shape[0]
    if nl == 0:
        return jnp.zeros((R, 3))

    pure_spec = jax.vmap(lambda i: bs.is_pure_specular(scene.bsdfs, i)
                         | bs.is_forward(scene.bsdfs, i)
                         | bs.is_null(scene.bsdfs, i))(bsdf_idx)
    active = active & ~pure_spec

    ul = _u(key, bounce, 50)
    li_sel = jnp.minimum((ul * nl).astype(jnp.int32), nl - 1)
    light = scene.lights[li_sel]
    light_weight = jnp.float32(nl)

    # NEE medium state: firstScatter=true (TraceBase.cpp:291-294)
    shadow_state = med_state.reset_where(jnp.ones(R, bool))

    # strategy 1: light sample
    u1, u2 = _u(key, bounce, 51), _u(key, bounce, 52)
    d, ldist, lpdf, lvalid = jax.vmap(
        lambda l, a, b_, q: pr.sample_direct(scene.prims, l, q, a, b_))(
        light, u1, u2, p)
    wo_local = jax.vmap(frame_to_local)(t, b, normal, d)
    f = jax.vmap(lambda i, wi, wo: bs.eval_bsdf(scene.bsdfs, i, wi, wo))(
        bsdf_idx, wi_local, wo_local)
    lvalid = lvalid & active & (jnp.max(f, axis=-1) > 0.0)
    uj = _u(key, bounce, 53)
    tr = shadow_ray(scene, p + normal * jnp.sign(wo_local[:, 2:3]) * _EPS, d,
                    ldist, light, med_idx, shadow_state, pss_next, uj, lvalid)
    e = _light_emission(scene, light) * tr
    bpdf = jax.vmap(lambda i, wi, wo: bs.pdf_bsdf(scene.bsdfs, i, wi, wo))(
        bsdf_idx, wi_local, wo_local)
    mis = _power_heuristic(lpdf, bpdf)
    contrib_l = jnp.where(lvalid[:, None],
                          f * e * (mis / jnp.maximum(lpdf, 1e-9))[:, None]
                          * light_weight, 0.0)

    # strategy 2: bsdf sample toward the light
    u = jnp.stack([_u(key, bounce, 54), _u(key, bounce, 55),
                   _u(key, bounce, 56), _u(key, bounce, 57)], axis=-1)
    s = jax.vmap(lambda i, wi, uu: bs.sample_bsdf(scene.bsdfs, i, wi, uu))(
        bsdf_idx, wi_local, u)
    w_world = jax.vmap(frame_to_world)(t, b, normal, s["wo"])
    svalid = active & s["valid"] & ~s["specular"]
    li_isect = jax.vmap(lambda o, w: pr.intersect(scene.prims, o, w, _EPS,
                                                  _INF))(
        p + normal * jnp.sign(s["wo"][:, 2:3]) * _EPS, w_world)
    hit_light = svalid & li_isect["hit"] & (li_isect["prim"] == light)
    ld_pdf = jax.vmap(lambda l, q, w, th: pr.direct_pdf(scene.prims, l, q, w,
                                                        th))(
        light, p, w_world, li_isect["t"])
    uj2 = _u(key, bounce, 58)
    tr2 = shadow_ray(scene, p + normal * jnp.sign(s["wo"][:, 2:3]) * _EPS,
                     w_world, li_isect["t"], light, med_idx, shadow_state,
                     pss_next, uj2, hit_light)
    e2 = _light_emission(scene, light) * tr2
    mis2 = _power_heuristic(s["pdf"], ld_pdf)
    contrib_b = jnp.where(hit_light[:, None],
                          s["weight"] * e2 * mis2[:, None] * light_weight, 0.0)

    return contrib_l + contrib_b


# ---------------------------------------------------------------------------
# The main walk (PathTracer::traceSample, PathTracer.cpp:17-204)
# ---------------------------------------------------------------------------

def trace(scene: Scene, px, py, spp_idx):
    """Trace one sample for each pixel in the flat batch.

    px, py: int32 [R]; spp_idx: scalar int32.  Returns radiance [R,3].
    """
    R = px.shape[0]
    key = _ray_key(scene, px.astype(jnp.uint32), py.astype(jnp.uint32),
                   jnp.uint32(spp_idx))
    b0 = jnp.zeros(R, jnp.int32)
    uf = jnp.stack([_u(key, b0, 0), _u(key, b0, 1)], axis=-1)
    ul = jnp.stack([_u(key, b0, 2), _u(key, b0, 3)], axis=-1)
    ro, rd = scene.camera.sample_ray(px, py, uf, ul)

    throughput = jnp.ones((R, 3), jnp.float32)
    emission = jnp.zeros((R, 3), jnp.float32)
    active = jnp.ones(R, bool)
    was_specular = jnp.ones(R, bool)
    med_idx = jnp.full(R, scene.cam_medium, jnp.int32)
    med_state = md.MediumState.make(R)
    bounce = jnp.zeros(R, jnp.int32)
    medium_bounces = jnp.zeros(R, jnp.int32)

    pss = jnp.stack([px.astype(jnp.uint32), py.astype(jnp.uint32),
                     jnp.full(R, spp_idx, jnp.uint32),
                     jnp.zeros(R, jnp.uint32)], axis=-1)

    max_iters = scene.max_bounces + 4  # forward hops don't consume bounces

    carry0 = dict(ro=ro, rd=rd, throughput=throughput, emission=emission,
                  active=active, was_specular=was_specular, med_idx=med_idx,
                  med_state=med_state, bounce=bounce,
                  medium_bounces=medium_bounces)

    def bounce_body(_, carry):
        ro = carry["ro"]
        rd = carry["rd"]
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
        did_hit = isect["hit"]
        far = jnp.where(did_hit, isect["t"], _INF)

        # ---- medium distance sampling ------------------------------------
        vol_event = jnp.zeros(R, bool)
        med_t = far
        med_aniso = med_state.last_aniso
        med_weight = jnp.ones((R, 3), jnp.float32)
        scheme = jnp.zeros(R, jnp.int32)
        failed = jnp.zeros(R, bool)
        for mi, medium in enumerate(scene.media):
            in_m = active & (med_idx == mi)
            uj = _u(key, bounce, 4)
            res, med_state_new = md.sample_distance(
                medium, scene.scene_seed, ro, rd, jnp.zeros(R), far,
                med_state, pss, uj, in_m)
            med_state = md._select(in_m, med_state_new, med_state)
            vol_event = vol_event | (in_m & ~res["exited"] & ~res["failed"])
            med_t = jnp.where(in_m & ~res["exited"], res["t"], med_t)
            med_aniso = jnp.where(in_m[:, None], res["aniso"], med_aniso)
            med_weight = jnp.where(in_m[:, None], res["weight"], med_weight)
            scheme = jnp.where(in_m, res["scheme"], scheme)
            failed = failed | (in_m & res["failed"])

        # failed gradient => kill path (GaussianProcessMedium.cpp:283-314)
        active = active & ~failed
        throughput = throughput * jnp.where(vol_event[:, None], med_weight,
                                            1.0)

        # escaped: in medium, exited, no surface behind => path ends
        escaped = active & ~vol_event & ~did_hit
        active = active & ~escaped

        surf_event = active & ~vol_event & did_hit

        # low-order-scattering gate (PathTracer.cpp:86-87)
        if not scene.low_order_scattering:
            kill = surf_event & (medium_bounces == 1)
            active = active & ~kill
            surf_event = surf_event & ~kill

        pss_next = pss.at[:, 3].add(1)

        # ---- volume event (handleVolume, TraceBase.cpp:539-563) ----------
        if any(m is not None for m in scene.media):
            vol_p = ro + med_t[:, None] * rd
            # per-medium NEE + phase sampling
            new_rd = rd
            phase_ok = jnp.ones(R, bool)
            for mi, medium in enumerate(scene.media):
                in_m = vol_event & (med_idx == mi)
                nee_gate = scene.enable_volume_light_sampling and True
                if nee_gate:
                    gate = in_m & ((medium_bounces > 0)
                                   | scene.low_order_scattering) \
                        & (bounce < scene.max_bounces - 1)
                    c = volume_nee(scene, medium, mi, vol_p, rd, med_aniso,
                                   scheme, med_t, med_state, pss_next, key,
                                   bounce, gate)
                    emission = emission + jnp.where(gate[:, None],
                                                    throughput * c, 0.0)
                u = jnp.stack([_u(key, bounce, 8), _u(key, bounce, 9),
                               _u(key, bounce, 10), _u(key, bounce, 11)],
                              axis=-1)
                psamp = ph.sample_phase(medium, scene.bsdfs, rd, med_aniso, u)
                new_rd = jnp.where(in_m[:, None], psamp["w"], new_rd)
                throughput = throughput * jnp.where(in_m[:, None],
                                                    psamp["weight"], 1.0)
                phase_ok = phase_ok & jnp.where(in_m, psamp["valid"], True)
                was_specular = jnp.where(
                    in_m, ~(scene.enable_volume_light_sampling
                            & ((medium_bounces > 0)
                               | scene.low_order_scattering)), was_specular)
            active = active & (phase_ok | ~vol_event)
            ro = jnp.where(vol_event[:, None], vol_p, ro)
            rd = jnp.where(vol_event[:, None], new_rd, rd)
            medium_bounces = medium_bounces + vol_event.astype(jnp.int32)

        # ---- surface event (handleSurface, TraceBase.cpp:565-627) --------
        hit_prim = isect["prim"]
        hit_p = ro + isect["t"][:, None] * rd
        g_normal = isect["normal"]
        # two-sided shading frame (makeLocalScatterEvent, TraceBase.cpp:24-51)
        backside = dot(g_normal, rd) > 0.0
        sh_normal = jnp.where(backside[:, None], -g_normal, g_normal)
        bsdf_idx = scene.prims.bsdf[hit_prim]

        include_gate = True
        if not scene.include_surfaces:
            pure_dirac = jax.vmap(
                lambda i: bs.is_pure_specular(scene.bsdfs, i)
                | bs.is_forward(scene.bsdfs, i))(bsdf_idx)
            kill = surf_event & ~pure_dirac & (medium_bounces == 0)
            # still count emissive hit below before killing? reference kills
            # after handleSurface; keep simple: kill before scattering
            active = active & ~kill
            surf_event = surf_event & ~kill

        tannt, tanb = jax.vmap(tangent_frame)(sh_normal)
        wi_local = jax.vmap(frame_to_local)(tannt, tanb, sh_normal, -rd)

        # emissive surface hit (handleSurface:592-595)
        prim_em = scene.prims.emission[hit_prim]
        em_gate = surf_event & (jnp.max(prim_em, axis=-1) > 0.0) \
            & (bounce >= scene.min_bounces) \
            & (was_specular | (not scene.enable_light_sampling))
        emission = emission + jnp.where(em_gate[:, None],
                                        prim_em * throughput, 0.0)

        # surface NEE
        if scene.enable_light_sampling:
            gate = surf_event & (bounce < scene.max_bounces - 1)
            if not scene.include_surfaces:
                gate = gate & (medium_bounces > 0)
            c = surface_nee(scene, hit_p, sh_normal, tannt, tanb, wi_local,
                            bsdf_idx, med_idx, med_state, pss_next, key,
                            bounce, gate)
            emission = emission + jnp.where(gate[:, None], throughput * c,
                                            0.0)

        # bsdf sampling
        u = jnp.stack([_u(key, bounce, 16), _u(key, bounce, 17),
                       _u(key, bounce, 18), _u(key, bounce, 19)], axis=-1)
        s = jax.vmap(lambda i, wi, uu: bs.sample_bsdf(scene.bsdfs, i, wi, uu))(
            bsdf_idx, wi_local, u)
        bsdf_dead = surf_event & ~s["valid"]
        active = active & ~bsdf_dead
        surf_scatter = surf_event & s["valid"]

        wo_world = jax.vmap(frame_to_world)(tannt, tanb, sh_normal, s["wo"])
        is_fwd = jax.vmap(lambda i: bs.is_forward(scene.bsdfs, i))(bsdf_idx)
        wo_world = jnp.where((surf_scatter & is_fwd)[:, None], rd, wo_world)

        throughput = throughput * jnp.where(surf_scatter[:, None],
                                            s["weight"], 1.0)
        was_specular = jnp.where(surf_scatter, s["specular"], was_specular)

        # medium transition (handleSurface:616-620)
        geom_back = dot(wo_world, g_normal) < 0.0
        int_m = scene.prims.int_medium[hit_prim]
        ext_m = scene.prims.ext_medium[hit_prim]
        override = (int_m >= 0) | (ext_m >= 0)
        new_med = jnp.where(geom_back, int_m, ext_m)
        crossed = geom_back != (dot(-rd, g_normal) < 0.0)
        med_idx = jnp.where(surf_scatter & override, new_med, med_idx)
        med_state = med_state.reset_where(surf_scatter & crossed)

        ro = jnp.where(surf_scatter[:, None], hit_p + wo_world * _EPS, ro)
        rd = jnp.where(surf_scatter[:, None], wo_world, rd)

        # ---- bookkeeping --------------------------------------------------
        thr_max = jnp.max(jnp.abs(throughput), axis=-1)
        active = active & (thr_max > 0.0)

        # russian roulette (PathTracer.cpp:146-152)
        rr_u = _u(key, bounce, 30)
        rr = active & (bounce > 2) & (thr_max < 0.1)
        survive = rr_u < thr_max
        throughput = jnp.where((rr & survive)[:, None],
                               throughput / jnp.maximum(thr_max, 1e-9)[:, None],
                               throughput)
        active = active & (~rr | survive)

        # forward-lobe surfaces don't consume a bounce (PathTracer.cpp:159-161)
        consumed = vol_event | (surf_scatter & ~is_fwd)
        bounce = bounce + jnp.where(active & consumed, 1, 0)
        active = active & (bounce < scene.max_bounces)

        nan_bad = ~jnp.isfinite(jnp.sum(throughput, axis=-1) + jnp.sum(rd, axis=-1))
        active = active & ~nan_bad

        return dict(ro=ro, rd=rd, throughput=throughput, emission=emission,
                    active=active, was_specular=was_specular, med_idx=med_idx,
                    med_state=med_state, bounce=bounce,
                    medium_bounces=medium_bounces)

    out = jax.lax.fori_loop(0, max_iters, bounce_body, carry0)
    emission = jnp.where(jnp.isfinite(out["emission"]), out["emission"], 0.0)
    return emission


def render_pass(scene: Scene, spp_idx):
    """One sample for every pixel; returns [H, W, 3]."""
    W, H = scene.camera.res_x, scene.camera.res_y
    px, py = jnp.meshgrid(jnp.arange(W, dtype=jnp.int32),
                          jnp.arange(H, dtype=jnp.int32))
    c = trace(scene, px.reshape(-1), py.reshape(-1), spp_idx)
    return c.reshape(H, W, 3)

"""Light tracer: particle tracing from the lights with per-vertex camera
connections (adjoint of the path tracer).

TPU-native re-design of src/core/integrators/light_tracer/ (LightTracer.cpp:
traceSample samples a light-emission ray, walks BSDF bounces, and splats a
camera connection at every vertex through Camera::sampleDirect + the
generalized shadow walk).  Here a full wavefront of light paths advances in
lockstep under one jit; splats land in a scatter-add film carried through
the bounce loop (the functional analog of the reference's CAS
AtomicFramebuffer, cameras/AtomicFramebuffer.hpp:26-31).

Media: camera connections attenuate through GPIS/classic media with the same
shadow_walk as the path tracer's NEE, and volume scattering events inside
media are traced with md.sample_distance and connected via phase-function
eval — so GPIS surfaces are visible to light tracing too.

Known asymmetry caveat: refractive radiance scaling (eta^2) on transmission
is not adjoint-corrected (matches the reference LightTracer, which also
skips non-symmetric-scattering correction).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import rng as trng
from . import bsdfs as bs
from . import media as md
from . import phase as ph
from . import primitives as pr
from .integrator import (Scene, _EPS, _make_draw, shadow_walk)
from ..utils.vecmath import (dot, frame_to_local, frame_to_world,
                             safe_normalize, oriented_frame, tangent_frame, tlookup)

_INF = np.float32(3.0e38)


def _light_key(scene, lane, spp):
    return trng.xxhash32_4(lane.astype(jnp.uint32), jnp.uint32(0x11647E12),
                           jnp.uint32(spp),
                           scene.scene_seed ^ jnp.uint32(0xA13C5B07))


def _splat(film, cam, p, beta_f, med_idx, med_state, pss, uj, scene, gate):
    """Connect vertices p to the camera; beta_f [N,3] is throughput x f
    (f includes the vertex cosine for surfaces).  Returns updated film."""
    c = cam.connect(p)
    valid = gate & c["valid"]
    tr = shadow_walk(scene, p + c["dir"] * _EPS, c["dir"],
                     c["dist"] * (1.0 - 1e-3),
                     jnp.full(p.shape[0], -2, jnp.int32), med_idx,
                     med_state, pss, uj, valid)
    contrib = beta_f * tr * (c["we"]
                             / jnp.maximum(c["dist"] ** 2, 1e-8))[:, None]
    contrib = jnp.where((valid & (jnp.max(tr, axis=-1) > 0.0))[:, None],
                        contrib, 0.0)
    contrib = jnp.where(jnp.isfinite(contrib), contrib, 0.0)
    flat = c["py"] * cam.res_x + c["px"]
    return film.at[flat].add(contrib)


def trace_light(scene: Scene, n_paths, spp_idx):
    """Trace `n_paths` light paths; returns the per-pass film [H*W, 3]
    (already divided by n_paths — accumulate across passes and divide by
    the pass count, exactly like render_pass)."""
    R = n_paths
    cam = scene.camera
    nl = scene.lights.shape[0]
    if nl == 0:
        return jnp.zeros((cam.res_y * cam.res_x, 3), jnp.float32)

    lane = jnp.arange(R, dtype=jnp.int32)
    key = _light_key(scene, lane, spp_idx)
    draw = _make_draw(key, key, None)
    b0 = jnp.zeros(R, jnp.int32)

    # ---- emission sampling (LightTracer.cpp traceSample head) -------------
    ul = draw(b0, 0)
    li_sel = jnp.minimum((ul * nl).astype(jnp.int32), nl - 1)
    light = tlookup(scene.lights, li_sel)
    le = tlookup(scene.prims.emission, light)
    p0, n0, pdf_a = jax.vmap(
        lambda l, a, b_: pr.sample_position(scene.prims, l, a, b_))(
        light, draw(b0, 1), draw(b0, 2))
    # cosine-weighted emission direction (area lights are Lambertian
    # emitters): Le * cos / (pdf_A * pdf_w * p_light) with
    # pdf_w = cos/pi  =>  beta = Le * pi * area * nl
    u1, u2 = draw(b0, 3), draw(b0, 4)
    r_ = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    local_d = jnp.stack([r_ * jnp.cos(phi), r_ * jnp.sin(phi),
                         jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))], -1)
    tg, bt = jax.vmap(tangent_frame)(n0)
    rd0 = jax.vmap(frame_to_world)(tg, bt, n0, local_d)
    # point lights emit uniformly over the sphere (Point::sampleDirection,
    # pdf 1/4pi) — NOT cosine about the dummy normal; power factor is 4pi
    is_pt = tlookup(scene.prims.kind, light) == pr.PRIM_POINT
    z_sph = 1.0 - 2.0 * u1
    r_sph = jnp.sqrt(jnp.maximum(1.0 - z_sph * z_sph, 0.0))
    d_sph = jnp.stack([r_sph * jnp.cos(phi), r_sph * jnp.sin(phi),
                       z_sph], -1)
    rd0 = jnp.where(is_pt[:, None], d_sph, rd0)
    beta0 = le * (jnp.where(is_pt, 4.0 * jnp.pi, jnp.pi) * nl
                  / jnp.maximum(pdf_a, 1e-12))[:, None]

    film = jnp.zeros((cam.res_y * cam.res_x, 3), jnp.float32)
    med0 = jnp.full(R, scene.cam_medium, jnp.int32)
    state0 = md.MediumState.make(R)
    pss0 = jnp.stack([lane.astype(jnp.uint32),
                      jnp.full(R, 0x117E, jnp.uint32),
                      jnp.full(R, spp_idx, jnp.uint32),
                      jnp.zeros(R, jnp.uint32)], axis=-1)

    # ---- splat the light vertex itself (the "s=1" direct image) -----------
    # f for an emitter vertex is Le * cos(n, to_cam); beta here carries
    # only the position pdf (Le * area * nl).
    cme = cam.connect(p0)
    cos_e = jnp.maximum(jax.vmap(dot)(n0, cme["dir"]), 0.0)
    cos_e = jnp.where(is_pt, 1.0, cos_e)  # isotropic point emitter
    film = _splat(film, cam, p0 + n0 * _EPS,
                  le * (nl / jnp.maximum(pdf_a, 1e-12) * cos_e)[:, None],
                  med0, state0, pss0, draw(b0, 5), scene,
                  jnp.ones(R, bool))

    carry0 = dict(ro=p0 + rd0 * _EPS, rd=rd0, beta=beta0,
                  active=jnp.ones(R, bool), med_idx=med0, med_state=state0,
                  bounce=jnp.zeros(R, jnp.int32), film=film)

    def bounce_body(_, carry):
        ro, rd = carry["ro"], carry["rd"]
        beta, active = carry["beta"], carry["active"]
        med_idx, med_state = carry["med_idx"], carry["med_state"]
        bounce, film = carry["bounce"], carry["film"]
        pss = pss0.at[:, 3].set(bounce.astype(jnp.uint32))

        isect = jax.vmap(lambda o, d: pr.intersect(scene.prims, o, d, _EPS,
                                                   _INF))(ro, rd)
        did_hit = isect["hit"]
        far = jnp.where(did_hit, isect["t"], _INF)

        # medium distance sampling (volume vertices)
        vol_event = jnp.zeros(R, bool)
        med_t = far
        med_aniso = med_state.last_aniso
        med_weight = jnp.ones((R, 3), jnp.float32)
        failed = jnp.zeros(R, bool)
        for mi, medium in enumerate(scene.media):
            in_m = active & (med_idx == mi)
            res, med_state_new = md.sample_distance(
                medium, scene.scene_seed, ro, rd, jnp.zeros(R), far,
                med_state, pss, draw(bounce, 36), in_m)
            med_state = md._select(in_m, med_state_new, med_state)
            vol_event = vol_event | (in_m & ~res["exited"] & ~res["failed"])
            med_t = jnp.where(in_m & ~res["exited"], res["t"], med_t)
            med_aniso = jnp.where(in_m[:, None], res["aniso"], med_aniso)
            med_weight = jnp.where(in_m[:, None], res["weight"], med_weight)
            failed = failed | (in_m & res["failed"])
        active = active & ~failed
        beta = beta * jnp.where(vol_event[:, None], med_weight, 1.0)
        active = active & (vol_event | did_hit)
        surf_event = active & ~vol_event & did_hit

        med_t_safe = jnp.where(vol_event, med_t, 0.0)
        vol_p = ro + med_t_safe[:, None] * rd
        hit_p = ro + jnp.where(did_hit, isect["t"], 0.0)[:, None] * rd
        g_normal = isect["normal"]
        backside = jax.vmap(dot)(g_normal, rd) > 0.0
        sh_normal = jnp.where(backside[:, None], -g_normal, g_normal)
        hit_prim = isect["prim"]
        bsdf_idx = tlookup(scene.prims.bsdf, hit_prim)
        tfr, bfr = jax.vmap(oriented_frame)(sh_normal, isect["tangent"])
        wi_local = jax.vmap(frame_to_local)(tfr, bfr, sh_normal, -rd)
        p_vtx = jnp.where(vol_event[:, None], vol_p, hit_p)

        # ---- camera connection at this vertex -----------------------------
        c = cam.connect(p_vtx)
        wo_local = jax.vmap(frame_to_local)(tfr, bfr, sh_normal, c["dir"])
        f_surf = jax.vmap(
            lambda i, wi, wo: bs.eval_bsdf(scene.bsdfs, i, wi, wo))(
            bsdf_idx, wi_local, wo_local)
        pure_spec = jax.vmap(lambda i: bs.is_pure_specular(scene.bsdfs, i)
                             | bs.is_forward(scene.bsdfs, i)
                             | bs.is_null(scene.bsdfs, i))(bsdf_idx)
        f_vol = jnp.zeros((R, 3))
        for mi, medium in enumerate(scene.media):
            in_m = vol_event & (med_idx == mi)
            spec = ph.phase_is_specular(medium, scene.bsdfs)
            f_m = (jnp.zeros((R, 3)) if spec
                   else ph.eval_phase(medium, scene.bsdfs, rd, c["dir"],
                                      med_aniso))
            f_vol = jnp.where(in_m[:, None], f_m, f_vol)
        f = jnp.where(vol_event[:, None], f_vol, f_surf)
        gate = (surf_event & ~pure_spec) | vol_event
        off = jnp.where(vol_event[:, None], 0.0,
                        sh_normal * jnp.sign(wo_local[:, 2:3]) * _EPS)
        film = _splat(film, cam, p_vtx + off, beta * f, med_idx, med_state,
                      pss.at[:, 3].add(1), draw(bounce, 38), scene, gate)

        # ---- continue the walk ---------------------------------------------
        new_rd = rd
        phase_ok = jnp.ones(R, bool)
        for mi, medium in enumerate(scene.media):
            in_m = vol_event & (med_idx == mi)
            u = jnp.stack([draw(bounce, 40), draw(bounce, 41),
                           draw(bounce, 42), draw(bounce, 43),
                           draw(bounce, 44)], axis=-1)
            psamp = ph.sample_phase(medium, scene.bsdfs, rd, med_aniso, u)
            new_rd = jnp.where(in_m[:, None], psamp["w"], new_rd)
            beta = beta * jnp.where(in_m[:, None], psamp["weight"], 1.0)
            phase_ok = phase_ok & jnp.where(in_m, psamp["valid"], True)
        active = active & (phase_ok | ~vol_event)

        u = jnp.stack([draw(bounce, 48), draw(bounce, 49),
                       draw(bounce, 50), draw(bounce, 51),
                       draw(bounce, 52)], axis=-1)
        s = jax.vmap(lambda i, wi, uu: bs.sample_bsdf(scene.bsdfs, i, wi,
                                                      uu))(
            bsdf_idx, wi_local, u)
        active = active & (~surf_event | s["valid"])
        surf_scatter = surf_event & s["valid"]
        wo_world = jax.vmap(frame_to_world)(tfr, bfr, sh_normal, s["wo"])
        is_fwd = jax.vmap(lambda i: bs.is_forward(scene.bsdfs, i))(bsdf_idx)
        wo_world = jnp.where((surf_scatter & is_fwd)[:, None], rd, wo_world)
        beta = beta * jnp.where(surf_scatter[:, None], s["weight"], 1.0)

        geom_back = jax.vmap(dot)(wo_world, g_normal) < 0.0
        int_m = tlookup(scene.prims.int_medium, hit_prim)
        ext_m = tlookup(scene.prims.ext_medium, hit_prim)
        override = (int_m >= 0) | (ext_m >= 0)
        new_med = jnp.where(geom_back, int_m, ext_m)
        crossed = geom_back != (jax.vmap(dot)(-rd, g_normal) < 0.0)
        med_idx = jnp.where(surf_scatter & override, new_med, med_idx)
        med_state = med_state.reset_where(surf_scatter & crossed)

        ro = jnp.where(vol_event[:, None], vol_p, ro)
        ro = jnp.where(surf_scatter[:, None], hit_p + wo_world * _EPS, ro)
        rd = jnp.where(vol_event[:, None], new_rd, rd)
        rd = jnp.where(surf_scatter[:, None], wo_world, rd)

        thr_max = jnp.max(jnp.abs(beta), axis=-1)
        active = active & (thr_max > 0.0) & jnp.isfinite(thr_max)
        rr_u = draw(bounce, 54)
        q = jnp.minimum(thr_max, 1.0)
        rr = active & (bounce > 2)
        survive = rr_u < q
        beta = jnp.where((rr & survive)[:, None],
                         beta / jnp.maximum(q, 1e-9)[:, None], beta)
        active = active & (~rr | survive)
        bounce = bounce + jnp.where(active, 1, 0)
        active = active & (bounce < scene.max_bounces)

        return dict(ro=ro, rd=rd, beta=beta, active=active, med_idx=med_idx,
                    med_state=med_state, bounce=bounce, film=film)

    out = jax.lax.fori_loop(0, scene.max_bounces + 2, bounce_body, carry0)
    return out["film"] / jnp.float32(R)


def render_pass_lt(scene: Scene, spp_idx):
    """One light-tracing pass with H*W light paths; returns [H, W, 3]."""
    H, W = scene.camera.res_y, scene.camera.res_x
    film = trace_light(scene, H * W, spp_idx)
    return film.reshape(H, W, 3)

"""Photon mapping + progressive photon mapping (PPM), TPU-native.

Re-design of src/core/integrators/photon_map/ (PhotonTracer.cpp,
PhotonMapIntegrator.cpp).  The reference traces photon paths per thread,
stores surface/volume photons in a KdTree (KdTree.hpp), and estimates
radiance at the first non-specular eye vertex with a k-NN gather:
`surfaceEstimate += power * bsdf.eval(event)/|wo.z|` then
`* INV_PI/radiusSq` (PhotonTracer.cpp:398-417); volume point photons use a
phase-function gather (PhotonTracer.cpp:286-295).

TPU design: there is no tree.  Photon deposition reuses the light-tracer
wavefront walk (light_tracer.py), writing one fixed photon slot per
(path, bounce) — dead slots are masked, shapes stay static.  The gather is
a *blocked pairwise density estimate*: |q-p|^2 over a [Q, C] tile is a rank-3
matmul (MXU work), scanned over photon chunks with `lax.scan`.  Brute force
O(Q*P) beats tree traversal on this hardware — uniform control flow, all
FLOPs on the systolic array, no pointer chasing.

PPM follows Hachisuka et al.'s per-pixel statistics update
(r'^2 = r^2 (N + a*M)/(N + M), tau' = (tau + phi) r'^2/r^2) with fresh
photons each pass — the functional analog of the reference's iterated
`tracePhotons` rounds.
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
from .integrator import Scene, _EPS, _make_draw, _ray_key
from .light_tracer import _light_key
from ..utils.vecmath import (dot, frame_to_local, frame_to_world,
                             oriented_frame, tangent_frame, tlookup)

_INF = np.float32(3.0e38)


# ---------------------------------------------------------------------------
# photon tracing (deposit pass)
# ---------------------------------------------------------------------------

def trace_photons(scene: Scene, n_paths: int, spp_idx):
    """Trace `n_paths` light paths, depositing photons at every non-specular
    surface vertex and every volume-scatter vertex (PhotonTracer's
    tracePhotonPath).  Returns a dict of fixed-shape arrays with
    P = n_paths * (max_bounces + 2) slots:
      pos [P,3], dir [P,3] (photon travel direction), power [P,3],
      normal [P,3] (surface photons), is_vol [P], valid [P].
    Power convention: beta at arrival (emission pdf folded in), NOT divided
    by n_paths — gathers divide by the emitted-path count themselves.
    """
    R = n_paths
    nl = scene.lights.shape[0]
    T = scene.max_bounces + 2
    zeros3 = jnp.zeros((T, R, 3), jnp.float32)
    out0 = dict(pos=zeros3, dir=zeros3, power=zeros3, normal=zeros3,
                is_vol=jnp.zeros((T, R), bool),
                valid=jnp.zeros((T, R), bool))
    if nl == 0:
        return {k: v.reshape((T * R,) + v.shape[2:]) for k, v in out0.items()}

    lane = jnp.arange(R, dtype=jnp.int32)
    key = _light_key(scene, lane, spp_idx)
    key = trng.xxhash32_4(key, jnp.uint32(0x9007),
                          jnp.uint32(0x7A0707), jnp.uint32(0x50F7))
    draw = _make_draw(key, key, None)
    b0 = jnp.zeros(R, jnp.int32)

    # emission sampling — identical head to trace_light
    ul = draw(b0, 0)
    li_sel = jnp.minimum((ul * nl).astype(jnp.int32), nl - 1)
    light = tlookup(scene.lights, li_sel)
    le = tlookup(scene.prims.emission, light)
    p0, n0, pdf_a = jax.vmap(
        lambda l, a, b_: pr.sample_position(scene.prims, l, a, b_))(
        light, draw(b0, 1), draw(b0, 2))
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

    med0 = jnp.full(R, scene.cam_medium, jnp.int32)
    state0 = md.MediumState.make(R)
    pss0 = jnp.stack([lane.astype(jnp.uint32),
                      jnp.full(R, 0x9807, jnp.uint32),
                      jnp.full(R, spp_idx, jnp.uint32),
                      jnp.zeros(R, jnp.uint32)], axis=-1)

    carry0 = dict(ro=p0 + rd0 * _EPS, rd=rd0, beta=beta0,
                  active=jnp.ones(R, bool), med_idx=med0, med_state=state0,
                  bounce=jnp.zeros(R, jnp.int32), out=out0)

    def bounce_body(it, carry):
        ro, rd = carry["ro"], carry["rd"]
        beta, active = carry["beta"], carry["active"]
        med_idx, med_state = carry["med_idx"], carry["med_state"]
        bounce, out = carry["bounce"], carry["out"]
        pss = pss0.at[:, 3].set(bounce.astype(jnp.uint32))

        isect = jax.vmap(lambda o, d: pr.intersect(scene.prims, o, d, _EPS,
                                                   _INF))(ro, rd)
        did_hit = isect["hit"]
        far = jnp.where(did_hit, isect["t"], _INF)

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

        # ---- deposit -----------------------------------------------------
        pure_spec = jax.vmap(lambda i: bs.is_pure_specular(scene.bsdfs, i)
                             | bs.is_forward(scene.bsdfs, i)
                             | bs.is_null(scene.bsdfs, i))(bsdf_idx)
        dep = (surf_event & ~pure_spec) | vol_event
        out = dict(
            pos=out["pos"].at[it].set(p_vtx),
            dir=out["dir"].at[it].set(rd),
            power=out["power"].at[it].set(
                jnp.where(jnp.isfinite(beta), beta, 0.0)),
            normal=out["normal"].at[it].set(sh_normal),
            is_vol=out["is_vol"].at[it].set(vol_event),
            valid=out["valid"].at[it].set(dep),
        )

        # ---- continue the walk (same as light tracer) --------------------
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
                    med_state=med_state, bounce=bounce, out=out)

    out = jax.lax.fori_loop(0, T, bounce_body, carry0)["out"]
    return {k: v.reshape((T * R,) + v.shape[2:]) for k, v in out.items()}


# ---------------------------------------------------------------------------
# gathers (blocked pairwise density estimation)
# ---------------------------------------------------------------------------

_CHUNK = 512


def _pad_photons(ph_dict):
    P = ph_dict["pos"].shape[0]
    pad = (-P) % _CHUNK
    if pad:
        ph_dict = {k: jnp.concatenate(
            [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)], 0)
            for k, v in ph_dict.items()}
    return ph_dict


def gather_surface(scene: Scene, photons, q_pos, q_nrm, q_wi_local, q_tg,
                   q_bt, q_bsdf, r2, active):
    """Blocked surface photon gather.  For each query vertex, sum
    power * f(wi, wo)/|wo.z| over photons within sqrt(r2) whose surface
    normal agrees (PhotonTracer.cpp:398-415).  Returns (flux [Q,3],
    m_count [Q]) — *not* yet scaled by INV_PI/r2 or path count (PPM needs
    the raw flux)."""
    photons = _pad_photons(photons)
    P = photons["pos"].shape[0]
    nch = P // _CHUNK
    Q = q_pos.shape[0]
    q_sq = (q_pos * q_pos).sum(-1)

    def chunk(carry, ci):
        flux, m = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * _CHUNK, _CHUNK)
        ppos, pdir = sl(photons["pos"]), sl(photons["dir"])
        ppow, pnrm = sl(photons["power"]), sl(photons["normal"])
        pval = sl(photons["valid"]) & ~sl(photons["is_vol"])
        d2 = (q_sq[:, None] + (ppos * ppos).sum(-1)[None, :]
              - 2.0 * q_pos @ ppos.T)
        ok = (d2 < r2[:, None]) & pval[None, :] & active[:, None]
        ok = ok & ((q_nrm @ pnrm.T) > 0.5)
        wo = -pdir                                    # [C,3] toward photon
        wol = jnp.stack([q_tg @ wo.T, q_bt @ wo.T, q_nrm @ wo.T], -1)
        f = jax.vmap(lambda bi, wi, wos: jax.vmap(
            lambda w: bs.eval_bsdf(scene.bsdfs, bi, wi, w))(wos))(
            q_bsdf, q_wi_local, wol)                  # [Q,C,3]
        f = f / jnp.maximum(jnp.abs(wol[..., 2:3]), 1e-3)
        w = jnp.where(ok[..., None], f, 0.0)
        flux = flux + jnp.einsum("qcs,cs->qs", w, ppow)
        return (flux, m + ok.sum(-1)), None

    (flux, m), _ = jax.lax.scan(
        chunk, (jnp.zeros((Q, 3), jnp.float32), jnp.zeros(Q, jnp.int32)),
        jnp.arange(nch))
    return flux, m


def gather_volume(scene: Scene, photons, q_pos, q_rd, q_aniso, q_med, r2,
                  active):
    """Volume photon gather at a sampled in-medium vertex: sphere kernel
    1/(4/3 pi r^3), phase-function weight eval(p.dir, -eye_dir)
    (PhotonTracer.cpp:286-295 uses the same phase eval with an
    Epanechnikov beam kernel; we gather at a distance-sampled vertex with
    the uniform sphere kernel instead — unbiased in the r->0 limit)."""
    photons = _pad_photons(photons)
    P = photons["pos"].shape[0]
    nch = P // _CHUNK
    Q = q_pos.shape[0]
    q_sq = (q_pos * q_pos).sum(-1)

    def chunk(carry, ci):
        flux, m = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * _CHUNK, _CHUNK)
        ppos, pdir = sl(photons["pos"]), sl(photons["dir"])
        ppow = sl(photons["power"])
        pval = sl(photons["valid"]) & sl(photons["is_vol"])
        d2 = (q_sq[:, None] + (ppos * ppos).sum(-1)[None, :]
              - 2.0 * q_pos @ ppos.T)
        ok = (d2 < r2[:, None]) & pval[None, :] & active[:, None]
        fsum = jnp.zeros((Q, 3), jnp.float32)
        for mi, medium in enumerate(scene.media):
            in_m = q_med == mi
            pf = jax.vmap(lambda rd_q, an_q: jax.vmap(
                lambda pd: ph.eval_phase(medium, scene.bsdfs,
                                         pd, -rd_q, an_q))(pdir))(
                q_rd, q_aniso)                        # [Q,C,3]
            fsum = jnp.where(in_m[:, None], fsum
                             + jnp.einsum("qcs,cs->qs",
                                          jnp.where(ok[..., None], pf, 0.0),
                                          ppow), fsum)
        return (flux + fsum, m + ok.sum(-1)), None

    (flux, m), _ = jax.lax.scan(
        chunk, (jnp.zeros((Q, 3), jnp.float32), jnp.zeros(Q, jnp.int32)),
        jnp.arange(nch))
    return flux, m


# ---------------------------------------------------------------------------
# eye pass
# ---------------------------------------------------------------------------

def _eye_vertices(scene: Scene, spp_idx, max_spec=4):
    """Walk camera rays through the specular/forward chain to the first
    gatherable vertex (traceSensorPath's specular loop).  Returns per-pixel
    query records + `emission` picked up from directly-visible emitters."""
    cam = scene.camera
    yy, xx = jnp.meshgrid(jnp.arange(cam.res_y), jnp.arange(cam.res_x),
                          indexing="ij")
    px = xx.reshape(-1).astype(jnp.int32)
    py = yy.reshape(-1).astype(jnp.int32)
    R = px.shape[0]
    key = _ray_key(scene, px.astype(jnp.uint32), py.astype(jnp.uint32),
                   jnp.uint32(spp_idx))
    draw = _make_draw(key, key, None)
    b0 = jnp.zeros(R, jnp.int32)
    uf = jnp.stack([draw(b0, 0), draw(b0, 1)], axis=-1)
    ulens = jnp.stack([draw(b0, 2), draw(b0, 3)], axis=-1)
    ro, rd = cam.sample_ray(px, py, uf, ulens)

    q = dict(pos=jnp.zeros((R, 3)), nrm=jnp.zeros((R, 3)),
             wi_local=jnp.zeros((R, 3)), tg=jnp.zeros((R, 3)),
             bt=jnp.zeros((R, 3)), bsdf=jnp.zeros(R, jnp.int32),
             rd=jnp.zeros((R, 3)), aniso=jnp.zeros((R, 3)),
             med=jnp.full(R, -1, jnp.int32),
             is_vol=jnp.zeros(R, bool), is_surf=jnp.zeros(R, bool),
             beta=jnp.ones((R, 3), jnp.float32))
    carry0 = dict(ro=ro, rd=rd, beta=jnp.ones((R, 3), jnp.float32),
                  active=jnp.ones(R, bool),
                  med_idx=jnp.full(R, scene.cam_medium, jnp.int32),
                  med_state=md.MediumState.make(R),
                  emission=jnp.zeros((R, 3), jnp.float32), q=q)

    def body(it, carry):
        ro, rd = carry["ro"], carry["rd"]
        beta, active = carry["beta"], carry["active"]
        med_idx, med_state = carry["med_idx"], carry["med_state"]
        emission, q = carry["emission"], carry["q"]
        bounce = jnp.full(R, it, jnp.int32)
        pss = jnp.stack([px.astype(jnp.uint32), py.astype(jnp.uint32),
                         jnp.full(R, spp_idx, jnp.uint32),
                         bounce.astype(jnp.uint32)], axis=-1)

        isect = jax.vmap(lambda o, d: pr.intersect(scene.prims, o, d, _EPS,
                                                   _INF))(ro, rd)
        did_hit = isect["hit"]
        far = jnp.where(did_hit, isect["t"], _INF)

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
        surf_event = active & ~vol_event & did_hit

        hit_p = ro + jnp.where(did_hit, isect["t"], 0.0)[:, None] * rd
        vol_p = ro + jnp.where(vol_event, med_t, 0.0)[:, None] * rd
        g_normal = isect["normal"]
        backside = jax.vmap(dot)(g_normal, rd) > 0.0
        sh_normal = jnp.where(backside[:, None], -g_normal, g_normal)
        hit_prim = isect["prim"]
        bsdf_idx = tlookup(scene.prims.bsdf, hit_prim)

        # directly-visible emission (through the specular chain only —
        # diffuse vertices terminate into the gather, so no double count)
        le = tlookup(scene.prims.emission, hit_prim)
        emission = emission + jnp.where(
            (surf_event & ~backside)[:, None], beta * le, 0.0)

        pure_spec = jax.vmap(lambda i: bs.is_pure_specular(scene.bsdfs, i))(
            bsdf_idx)
        fwd = jax.vmap(lambda i: bs.is_forward(scene.bsdfs, i)
                       | bs.is_null(scene.bsdfs, i))(bsdf_idx)
        diffuse_hit = surf_event & ~pure_spec & ~fwd

        tfr, bfr = jax.vmap(oriented_frame)(sh_normal, isect["tangent"])
        wi_local = jax.vmap(frame_to_local)(tfr, bfr, sh_normal, -rd)

        newly = (diffuse_hit | vol_event) & ~(q["is_surf"] | q["is_vol"])
        sel = lambda new, old: jnp.where(
            newly[:, None] if new.ndim == 2 else newly, new, old)
        q = dict(pos=sel(jnp.where(vol_event[:, None], vol_p, hit_p),
                         q["pos"]),
                 nrm=sel(sh_normal, q["nrm"]),
                 wi_local=sel(wi_local, q["wi_local"]),
                 tg=sel(tfr, q["tg"]), bt=sel(bfr, q["bt"]),
                 bsdf=sel(bsdf_idx, q["bsdf"]),
                 rd=sel(rd, q["rd"]), aniso=sel(med_aniso, q["aniso"]),
                 med=sel(med_idx, q["med"]),
                 is_vol=sel(vol_event, q["is_vol"]),
                 is_surf=sel(diffuse_hit, q["is_surf"]),
                 beta=sel(beta, q["beta"]))
        active = active & ~newly & surf_event      # continue only spec/fwd

        # specular / forward continuation
        u = jnp.stack([draw(bounce, 48), draw(bounce, 49),
                       draw(bounce, 50), draw(bounce, 51),
                       draw(bounce, 52)], axis=-1)
        s = jax.vmap(lambda i, wi, uu: bs.sample_bsdf(scene.bsdfs, i, wi,
                                                      uu))(
            bsdf_idx, wi_local, u)
        cont = active & s["valid"]
        wo_world = jax.vmap(frame_to_world)(tfr, bfr, sh_normal, s["wo"])
        wo_world = jnp.where((cont & fwd)[:, None], rd, wo_world)
        beta = beta * jnp.where(cont[:, None], s["weight"], 1.0)

        geom_back = jax.vmap(dot)(wo_world, g_normal) < 0.0
        int_m = tlookup(scene.prims.int_medium, hit_prim)
        ext_m = tlookup(scene.prims.ext_medium, hit_prim)
        override = (int_m >= 0) | (ext_m >= 0)
        med_idx = jnp.where(cont & override,
                            jnp.where(geom_back, int_m, ext_m), med_idx)
        crossed = geom_back != (jax.vmap(dot)(-rd, g_normal) < 0.0)
        med_state = med_state.reset_where(cont & crossed)

        ro = jnp.where(cont[:, None], hit_p + wo_world * _EPS, ro)
        rd = jnp.where(cont[:, None], wo_world, rd)
        active = cont
        return dict(ro=ro, rd=rd, beta=beta, active=active, med_idx=med_idx,
                    med_state=med_state, emission=emission, q=q)

    out = jax.lax.fori_loop(0, max_spec, body, carry0)
    return out["emission"], out["q"]


def render_pass_pm(scene: Scene, spp_idx, n_photon_paths=16384,
                   r_surf=0.15, r_vol=0.2):
    """One photon-map pass: fresh photons + eye gather.  Returns the film
    [H*W, 3]; accumulate over passes and divide by the pass count, exactly
    like render_pass (PhotonMapIntegrator.cpp's per-iteration photon
    tracing)."""
    photons = trace_photons(scene, n_photon_paths, spp_idx)
    emission, q = _eye_vertices(scene, spp_idx)
    R = q["pos"].shape[0]
    r2s = jnp.full(R, np.float32(r_surf * r_surf))
    r2v = jnp.full(R, np.float32(r_vol * r_vol))
    flux_s, _ = gather_surface(scene, photons, q["pos"], q["nrm"],
                               q["wi_local"], q["tg"], q["bt"], q["bsdf"],
                               r2s, q["is_surf"])
    flux_v, _ = gather_volume(scene, photons, q["pos"], q["rd"], q["aniso"],
                              q["med"], r2v, q["is_vol"])
    inv_n = 1.0 / np.float32(n_photon_paths)
    ls = flux_s * (inv_n / (np.pi * r_surf * r_surf))
    lv = flux_v * (inv_n / (4.0 / 3.0 * np.pi * r_vol ** 3))
    l = jnp.where(q["is_surf"][:, None], ls,
                  jnp.where(q["is_vol"][:, None], lv, 0.0))
    img = emission + q["beta"] * l
    return jnp.where(jnp.isfinite(img), img, 0.0)


# ---------------------------------------------------------------------------
# progressive photon mapping
# ---------------------------------------------------------------------------

def render_ppm(scene: Scene, n_passes=8, n_photon_paths=4096, r0=0.12,
               r_vol=0.15, alpha=0.7):
    """Hachisuka-style PPM: per-pixel (r^2, N, tau) statistics, fresh eye +
    photon paths every pass (the reference's ProgressivePhotonMapIntegrator
    re-traces photons per iteration with a global radius schedule; we keep
    the classic per-pixel shrink).  Returns the final image [H*W, 3]."""
    cam = scene.camera
    R = cam.res_x * cam.res_y
    r2 = jnp.full(R, np.float32(r0 * r0))
    n_acc = jnp.zeros(R, jnp.float32)
    tau = jnp.zeros((R, 3), jnp.float32)
    emis_acc = jnp.zeros((R, 3), jnp.float32)
    vol_acc = jnp.zeros((R, 3), jnp.float32)

    @jax.jit
    def one_pass(spp_idx, r2, n_acc, tau):
        photons = trace_photons(scene, n_photon_paths, spp_idx)
        emission, q = _eye_vertices(scene, spp_idx)
        flux, m = gather_surface(scene, photons, q["pos"], q["nrm"],
                                 q["wi_local"], q["tg"], q["bt"], q["bsdf"],
                                 r2, q["is_surf"])
        flux_v, _ = gather_volume(scene, photons, q["pos"], q["rd"],
                                  q["aniso"], q["med"],
                                  jnp.full(R, np.float32(r_vol * r_vol)),
                                  q["is_vol"])
        mf = m.astype(jnp.float32)
        n_new = n_acc + alpha * mf
        shrink = jnp.where(mf > 0, (n_acc + alpha * mf)
                           / jnp.maximum(n_acc + mf, 1e-9), 1.0)
        r2_new = r2 * shrink
        tau_new = (tau + q["beta"] * flux) * shrink[:, None]
        lv = (q["beta"] * flux_v
              * (1.0 / (n_photon_paths * 4.0 / 3.0 * np.pi * r_vol ** 3)))
        return r2_new, n_new, tau_new, emission, jnp.where(
            q["is_vol"][:, None], lv, 0.0)

    for it in range(n_passes):
        r2, n_acc, tau, emis, lv = one_pass(jnp.int32(it), r2, n_acc, tau)
        emis_acc = emis_acc + emis
        vol_acc = vol_acc + lv
    total_emitted = np.float32(n_passes * n_photon_paths)
    img = (emis_acc + vol_acc) / n_passes \
        + tau / (total_emitted * np.pi * jnp.maximum(r2, 1e-12))[:, None]
    return jnp.where(jnp.isfinite(img), img, 0.0)

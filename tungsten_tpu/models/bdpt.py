"""Bidirectional path tracer — wavefront, fixed-shape subpaths.

Re-design of the reference's BDPT (src/core/integrators/
bidirectional_path_tracer/: LightPath.cpp:1-460 strategy loop + MIS,
PathVertex.cpp pdf bookkeeping) as fixed-shape vertex arrays: every ray
carries a camera subpath [S] and a light subpath [T] of surface vertices
(position, shading frame, throughput, area pdfs forward/reverse, delta
flags), then all (s,t) connection strategies are evaluated as batched
tensor ops with one shadow-ray batch.  MIS follows the standard iterative
ri-product balance over area-measure pdfs (Veach 10.2; LightPath.cpp:
misWeight), with delta vertices remapped to 1.

Scope (v1): surface transport — lambert/specular/microfacet surfaces and
area (quad) lights; participating media are not inserted as subpath
vertices (the reference BDPT predates the GPIS media and is used for
classic scenes; media-aware strategies remain with the path tracer).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import rng as trng
from ..utils.vecmath import (dot, frame_to_local, frame_to_world, normalize,
                             safe_normalize, tangent_frame)
from . import bsdfs as bs
from . import primitives as pr
from .integrator import Scene, _EPS, _make_draw, _power_heuristic

_INF = np.float32(3.0e38)


def _remap0(x):
    """pdf 0 (delta / start sentinel) contributes factor 1 (PathVertex.cpp
    remaps zero pdfs so delta vertices cancel in the ri products)."""
    return jnp.where(x > 0.0, x, 1.0)


def _dir_pdf_to_area(pdf_dir, p_from, p_to, n_to):
    """Solid-angle pdf at p_from -> area pdf at p_to."""
    d = p_to - p_from
    d2 = jnp.maximum(dot(d, d), 1e-12)
    w = d / jnp.sqrt(d2)[..., None]
    return pdf_dir * jnp.abs(dot(n_to, w)) / d2


def _walk_subpath(scene, ro, rd, beta0, pdf_dir0, draw, base_slot, S,
                  from_light):
    """Trace up to S surface vertices.  Returns dict of [R,S,...] arrays:
    p, n, wi (unit, toward the previous vertex), beta (throughput INTO the
    vertex), bsdf (index), delta (bool), pdf_fwd / pdf_rev (area measure),
    emission [R,S,3], valid [R,S]."""
    R = ro.shape[0]
    z3 = jnp.zeros((R, 3))
    out = {k: [] for k in ("p", "n", "wi", "beta", "bsdf", "delta",
                           "pdf_fwd", "pdf_rev", "emission", "valid",
                           "prim")}

    beta = beta0
    active = jnp.ones(R, bool)
    pdf_dir = pdf_dir0  # solid-angle pdf of the current ray direction
    prev_p = ro
    specular = jnp.zeros(R, bool)
    pdf_rev_slots = []  # to be filled one step later

    for k in range(S):
        bounce = jnp.full(R, k, jnp.int32)
        isect = jax.vmap(lambda o, d: pr.intersect(scene.prims, o, d, _EPS,
                                                   _INF))(ro, rd)
        hit = active & isect["hit"]
        t = jnp.where(isect["hit"], isect["t"], 1.0)
        p = ro + t[:, None] * rd
        g_n = isect["normal"]
        backside = dot(g_n, rd) > 0.0
        n = jnp.where(backside[:, None], -g_n, g_n)
        bsdf_idx = scene.prims.bsdf[isect["prim"]]
        em = scene.prims.emission[isect["prim"]]
        # only front-side emission counts (Quad::evalDirect)
        em = jnp.where((dot(g_n, rd) < 0.0)[:, None], em, 0.0)

        pdf_fwd = _dir_pdf_to_area(pdf_dir, prev_p, p, n)

        out["p"].append(p)
        out["n"].append(n)
        out["wi"].append(-rd)
        out["beta"].append(beta)
        out["bsdf"].append(bsdf_idx)
        out["delta"].append(specular)
        out["pdf_fwd"].append(jnp.where(hit, pdf_fwd, 0.0))
        out["emission"].append(jnp.where(hit[:, None], em, 0.0))
        out["valid"].append(hit)
        out["prim"].append(isect["prim"])

        # scatter
        tfr, bfr = jax.vmap(tangent_frame)(n)
        wi_l = jax.vmap(frame_to_local)(tfr, bfr, n, -rd)
        u = jnp.stack([draw(bounce, base_slot + 0),
                       draw(bounce, base_slot + 1),
                       draw(bounce, base_slot + 2),
                       draw(bounce, base_slot + 3),
                       draw(bounce, base_slot + 4)], axis=-1)
        s = jax.vmap(lambda i, wi, uu: bs.sample_bsdf(scene.bsdfs, i, wi,
                                                      uu))(bsdf_idx, wi_l, u)
        wo = jax.vmap(frame_to_world)(tfr, bfr, n, s["wo"])
        is_fwd = jax.vmap(lambda i: bs.is_forward(scene.bsdfs, i))(bsdf_idx)
        wo = jnp.where(is_fwd[:, None], rd, wo)

        # reverse pdf of THIS vertex as seen from the NEXT one is filled in
        # the next iteration; reverse pdf of the PREVIOUS vertex: the pdf of
        # sampling backward (wo -> wi) converted to area at prev_p
        wo_l = jax.vmap(frame_to_local)(tfr, bfr, n, wo)
        pdf_back_dir = jax.vmap(lambda i, a, b_: bs.pdf_bsdf(scene.bsdfs, i,
                                                             a, b_))(
            bsdf_idx, wo_l, wi_l)
        n_prev = out["n"][k - 1] if k > 0 else jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0]), (R, 3))
        pdf_rev_prev = _dir_pdf_to_area(pdf_back_dir, p, prev_p, n_prev)
        pdf_rev_slots.append(jnp.where(hit & (s["specular"] | is_fwd), 0.0,
                                       pdf_rev_prev))

        beta = beta * jnp.where(hit[:, None], s["weight"], 1.0)
        active = hit & s["valid"] & (jnp.max(jnp.abs(beta), axis=-1) > 0.0)
        specular = s["specular"] | is_fwd
        pdf_dir = jnp.where(specular, 0.0, s["pdf"])
        prev_p = p
        ro = p + wo * _EPS
        rd = wo

    out.pop(None, None)
    # pdf_rev[k] = pdf of sampling vertex k from vertex k+1
    for k in range(S):
        if k + 1 < S:
            out["pdf_rev"].append(pdf_rev_slots[k + 1] if k + 1 < len(
                pdf_rev_slots) else jnp.zeros(R))
        else:
            out["pdf_rev"].append(jnp.zeros(R))

    return {k: jnp.stack(v, axis=1) for k, v in out.items()}


def _eval_at(scene, bsdf_idx, n, wi, wo):
    """f(wi->wo)*|cos wo| and directional pdf at a stored vertex."""
    tfr, bfr = jax.vmap(tangent_frame)(n)
    wi_l = jax.vmap(frame_to_local)(tfr, bfr, n, wi)
    wo_l = jax.vmap(frame_to_local)(tfr, bfr, n, wo)
    f = jax.vmap(lambda i, a, b_: bs.eval_bsdf(scene.bsdfs, i, a, b_))(
        bsdf_idx, wi_l, wo_l)
    pdf = jax.vmap(lambda i, a, b_: bs.pdf_bsdf(scene.bsdfs, i, a, b_))(
        bsdf_idx, wi_l, wo_l)
    return f, pdf


def _mis_weight(cam, lt, s, t, pd_cam_end_rev, pd_cam_prev_rev,
                pd_lt_end_rev, pd_lt_prev_rev, R):
    """Balance-heuristic MIS over all strategies for the (s,t) connection
    (LightPath.cpp misWeight; PBRT v3 16.3 'MISWeight').

    s/t are 1-based counts of camera/light subpath vertices used.  The
    pd_*_rev args are the area pdfs of re-sampling the endpoint (and its
    predecessor) from the other subpath, computed at connection time."""
    sum_ri = jnp.zeros(R)

    # camera side: walk back from the camera endpoint
    ri = jnp.ones(R)
    for i in range(s - 1, 0, -1):
        pf = cam["pdf_fwd"][:, i]
        prv = pd_cam_end_rev if i == s - 1 else (
            pd_cam_prev_rev if i == s - 2 else cam["pdf_rev"][:, i])
        ri = ri * _remap0(prv) / _remap0(pf)
        d0 = cam["delta"][:, i]
        d1 = cam["delta"][:, i - 1] if i - 1 >= 0 else jnp.zeros(R, bool)
        sum_ri = sum_ri + jnp.where(d0 | d1, 0.0, ri)

    # light side
    ri = jnp.ones(R)
    for i in range(t - 1, -1, -1):
        pf = lt["pdf_fwd"][:, i]
        prv = pd_lt_end_rev if i == t - 1 else (
            pd_lt_prev_rev if i == t - 2 else lt["pdf_rev"][:, i])
        ri = ri * _remap0(prv) / _remap0(pf)
        d0 = lt["delta"][:, i]
        d1 = lt["delta"][:, i - 1] if i - 1 >= 0 else jnp.zeros(R, bool)
        sum_ri = sum_ri + jnp.where(d0 | d1, 0.0, ri)

    return 1.0 / (1.0 + sum_ri)


def trace_bdpt(scene: Scene, px, py, spp_idx, max_cam=4, max_light=3):
    """One BDPT sample per pixel; returns radiance [R,3] (eye-strategy
    contributions only; the t=1 camera-splat strategies ride with the light
    tracer and are excluded from MIS here by construction: the pinhole
    camera is a delta, so splat strategies never share a (s,t) with the
    connection strategies evaluated here... they do — the s=1 row — which
    is accounted for via the light-side ri walk ending at the camera)."""
    R = px.shape[0]
    key = trng.xxhash32_4(px.astype(jnp.uint32), py.astype(jnp.uint32),
                          jnp.uint32(spp_idx),
                          scene.scene_seed ^ jnp.uint32(0xBD9137A5))
    draw = _make_draw(key, key, None)
    b0 = jnp.zeros(R, jnp.int32)

    # ---- camera subpath ---------------------------------------------------
    uf = jnp.stack([draw(b0, 0), draw(b0, 1)], axis=-1)
    ul = jnp.stack([draw(b0, 2), draw(b0, 3)], axis=-1)
    ro, rd = scene.camera.sample_ray(px, py, uf, ul)
    cam = _walk_subpath(scene, ro, rd, jnp.ones((R, 3)), jnp.full(R, 1.0),
                        draw, 8, max_cam, False)
    # the camera is a delta endpoint: pdf_fwd of the first vertex is the
    # (importance) directional density; keep 1 (cancels in ratios for the
    # strategies compared here)

    # ---- light subpath ----------------------------------------------------
    nl = scene.lights.shape[0]
    if nl == 0:
        return _gather_t0(scene, cam, max_cam, R)
    ulight = draw(b0, 30)
    li = scene.lights[jnp.minimum((ulight * nl).astype(jnp.int32), nl - 1)]
    u1, u2 = draw(b0, 31), draw(b0, 32)
    p_l, n_l, pdf_a = jax.vmap(lambda l, a, c: pr.sample_position(
        scene.prims, l, a, c))(li, u1, u2)
    pdf_light_area = pdf_a / nl  # uniform light pick
    le = scene.prims.emission[li]
    # cosine emission direction
    u3, u4 = draw(b0, 33), draw(b0, 34)
    local = bs.cosine_hemisphere(u3, u4)
    tfr, bfr = jax.vmap(tangent_frame)(n_l)
    d0 = jax.vmap(frame_to_world)(tfr, bfr, n_l, local)
    cos0 = jnp.maximum(dot(n_l, d0), 1e-6)
    pdf_dir0 = cos0 / jnp.pi
    beta_l0 = le * (cos0 / (pdf_light_area * pdf_dir0))[:, None]

    lt = _walk_subpath(scene, p_l + d0 * _EPS, d0, beta_l0, pdf_dir0, draw,
                       16, max_light - 1, True)
    # prepend the light vertex itself (index 0)
    lt0 = {
        "p": p_l[:, None], "n": n_l[:, None], "wi": jnp.zeros((R, 1, 3)),
        "beta": (le / jnp.maximum(pdf_light_area, 1e-12)[:, None])[:, None],
        "bsdf": jnp.zeros((R, 1), jnp.int32),
        "delta": jnp.zeros((R, 1), bool),
        "pdf_fwd": pdf_light_area[:, None],
        "pdf_rev": jnp.zeros((R, 1)),
        "emission": le[:, None],
        "valid": jnp.ones((R, 1), bool),
        "prim": li[:, None],
    }
    lt = {k: jnp.concatenate([lt0[k], lt[k]], axis=1) for k in lt0}

    radiance = _gather_t0(scene, cam, max_cam, R)

    # ---- connection strategies (s >= 2 camera verts incl. implicit lens
    # vertex; here s indexes stored surface vertices 1..max_cam) -----------
    from .integrator import shadow_walk
    from . import media as md
    for s in range(1, max_cam + 1):
        vc = {k: v[:, s - 1] for k, v in cam.items()}
        for t in range(1, max_light + 1):
            vl = {k: v[:, t - 1] for k, v in lt.items()}
            ok = vc["valid"] & vl["valid"] & ~vc["delta"] & ~vl["delta"]

            d = vl["p"] - vc["p"]
            d2 = jnp.maximum(dot(d, d), 1e-12)
            w = d / jnp.sqrt(d2)[:, None]
            # camera-side f
            f_c, pdf_c_dir = _eval_at(scene, vc["bsdf"], vc["n"], vc["wi"],
                                      w)
            if t == 1:
                # light endpoint: emitted radiance x cos
                cos_l = jnp.maximum(dot(vl["n"], -w), 0.0)
                f_l = jnp.ones((R, 3))
                ok = ok & (cos_l > 0.0)
                g_l = cos_l
                pdf_l_dir = cos_l / jnp.pi  # emission dir pdf toward camera
            else:
                f_l, pdf_l_dir = _eval_at(scene, vl["bsdf"], vl["n"],
                                          vl["wi"], -w)
                g_l = jnp.ones(R)  # cosine already inside f_l

            # f_c already includes |cos| at the camera vertex; the
            # light-side cosine is g_l (t==1) or inside f_l (t>=2)
            contrib = (vc["beta"] * f_c * vl["beta"] * f_l
                       * (g_l / d2)[:, None])
            ok = ok & (jnp.max(contrib, axis=-1) > 0.0)

            # endpoint reverse pdfs for MIS (area measure)
            pd_cam_end_rev = _dir_pdf_to_area(pdf_l_dir, vl["p"], vc["p"],
                                              vc["n"])
            # camera endpoint's predecessor re-sampled through the new dir
            tfrc, bfrc = jax.vmap(tangent_frame)(vc["n"])
            w_l = jax.vmap(frame_to_local)(tfrc, bfrc, vc["n"], w)
            wi_lc = jax.vmap(frame_to_local)(tfrc, bfrc, vc["n"], vc["wi"])
            pdf_back = jax.vmap(lambda i, a, b_: bs.pdf_bsdf(
                scene.bsdfs, i, a, b_))(vc["bsdf"], w_l, wi_lc)
            if s >= 2:
                prev = {k: v[:, s - 2] for k, v in cam.items()}
                pd_cam_prev_rev = _dir_pdf_to_area(pdf_back, vc["p"],
                                                   prev["p"], prev["n"])
            else:
                pd_cam_prev_rev = jnp.zeros(R)
            pd_lt_end_rev = _dir_pdf_to_area(pdf_c_dir, vc["p"], vl["p"],
                                             vl["n"])
            if t >= 2:
                tfrl, bfrl = jax.vmap(tangent_frame)(vl["n"])
                wl_l = jax.vmap(frame_to_local)(tfrl, bfrl, vl["n"], -w)
                wi_ll = jax.vmap(frame_to_local)(tfrl, bfrl, vl["n"],
                                                 vl["wi"])
                pdf_back_l = jax.vmap(lambda i, a, b_: bs.pdf_bsdf(
                    scene.bsdfs, i, a, b_))(vl["bsdf"], wl_l, wi_ll)
                prevl = {k: v[:, t - 2] for k, v in lt.items()}
                pd_lt_prev_rev = _dir_pdf_to_area(pdf_back_l, vl["p"],
                                                  prevl["p"], prevl["n"])
            else:
                pd_lt_prev_rev = jnp.zeros(R)

            mis = _mis_weight(cam, lt, s, t, pd_cam_end_rev,
                              pd_cam_prev_rev, pd_lt_end_rev,
                              pd_lt_prev_rev, R)

            # visibility
            dist = jnp.sqrt(d2)
            state = md.MediumState.make(R)
            pss = jnp.stack([px.astype(jnp.uint32), py.astype(jnp.uint32),
                             jnp.full(R, spp_idx, jnp.uint32),
                             jnp.full(R, s * 8 + t, jnp.uint32)], axis=-1)
            tr = shadow_walk(scene, vc["p"] + w * _EPS, w,
                             dist * (1.0 - 1e-3),
                             jnp.full(R, -2, jnp.int32),
                             jnp.full(R, -1, jnp.int32), state, pss,
                             draw(b0, 50), ok)
            vis_ok = jnp.max(tr, axis=-1) > 0.0
            radiance = radiance + jnp.where(
                (ok & vis_ok)[:, None], contrib * tr * mis[:, None], 0.0)

    return jnp.where(jnp.isfinite(radiance), radiance, 0.0)


def _gather_t0(scene, cam, max_cam, R):
    """(s, t=0) strategies: the camera subpath hits an emitter directly
    (LightPath.cpp: the unidirectional term) with MIS vs the connection
    strategies of the same length."""
    radiance = jnp.zeros((R, 3))
    nl = max(int(scene.lights.shape[0]), 1)
    for s in range(1, cam["p"].shape[1] + 1):
        vc = {k: v[:, s - 1] for k, v in cam.items()}
        em = vc["emission"]
        has_e = jnp.max(em, axis=-1) > 0.0
        ok = vc["valid"] & has_e
        # light-start area pdf at this vertex: 1/(A_hit * n_lights)
        prim_area = scene.prims.area[vc["prim"]]
        pd_light_start = 1.0 / jnp.maximum(prim_area * nl, 1e-12)
        # emission-direction pdf (cosine) re-sampling the predecessor
        if s >= 2:
            prev = {k: v[:, s - 2] for k, v in cam.items()}
            dv = prev["p"] - vc["p"]
            dvn = dv / jnp.sqrt(jnp.maximum(dot(dv, dv), 1e-12))[:, None]
            pdf_em_dir = jnp.maximum(dot(vc["n"], dvn), 0.0) / jnp.pi
            pd_prev_rev = _dir_pdf_to_area(pdf_em_dir, vc["p"], prev["p"],
                                           prev["n"])
        else:
            pd_prev_rev = jnp.zeros(R)
        sum_ri = jnp.zeros(R)
        ri = jnp.ones(R)
        for i in range(s - 1, 0, -1):
            prv = (pd_light_start if i == s - 1 else
                   (pd_prev_rev if i == s - 2 else cam["pdf_rev"][:, i]))
            ri = ri * _remap0(prv) / _remap0(cam["pdf_fwd"][:, i])
            d0 = cam["delta"][:, i]
            d1 = cam["delta"][:, i - 1]
            sum_ri = sum_ri + jnp.where(d0 | d1, 0.0, ri)
        mis = 1.0 / (1.0 + sum_ri)
        radiance = radiance + jnp.where(ok[:, None],
                                        vc["beta"] * em * mis[:, None], 0.0)
    return radiance


def render_pass_bdpt(scene: Scene, spp_idx):
    """One BDPT sample per pixel; returns [H,W,3]."""
    W, H = scene.camera.res_x, scene.camera.res_y
    px, py = jnp.meshgrid(jnp.arange(W, dtype=jnp.int32),
                          jnp.arange(H, dtype=jnp.int32))
    c = trace_bdpt(scene, px.reshape(-1), py.reshape(-1), spp_idx)
    return c.reshape(H, W, 3)

"""Reversible-Jump Metropolis Light Transport — chain-parallel, TPU-wavefront.

Re-design of src/core/integrators/reversible_jump_mlt/ (1151 LoC:
ReversibleJumpMltTracer.cpp runSampleChain's three mutations — large step,
Kelemen small step, and the strategy perturbation that picks a new BDPT
strategy proportional to the current path's MIS ratios and maps the SAME
physical path into the new strategy's primary sample space via exact
inversion (LightPath::invert, LightPath.cpp:408-460; per-Bsdf invert()
family) — so the Markov chain jumps between BDPT techniques without
re-growing the path (Bitterli et al., "Reversible Jump MLT using Inverse
Mappings").

TPU-native shape: chains are pinned to a total-vertex-count V (the
reference's per-pathLength MarkovChain array, ReversibleJumpMltTracer.hpp);
for each V a [C]-wide wavefront advances in lockstep.  Every mutation
evaluates ALL V+1 strategies of that length from the proposal's PSS vector
(one camera walk + one light walk, batched) and each chain one-hot-selects
its own strategy — uniform control flow.  The strategy jump inverts the
chain's current path (positions/frames carried in the chain state) into the
proposed strategy's PSS slots with invert_bsdf / invert_position /
Camera.invert_ray; failed inversions (rough/fiber/nested BSDFs, medium
vertices, off-emitter roots) reject the proposal — both jump directions
fail symmetrically, so detailed balance is preserved (the reference's
proposalWeight=0 path, ReversibleJumpMltTracer.cpp:199-205).

Estimator contract matches models/{mlt,mmlt}.py: render_pass_rjmlt returns
a per-pass film normalized so that averaging passes converges to the
render_pass image (expected-value splats; per-length b normalization from
the bootstrap, LargeStepTracker semantics).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import rng as trng
from ..utils.vecmath import (dot, frame_to_local, normalize, oriented_frame,
                             safe_normalize, tangent_frame, tlookup)
from . import bsdfs as bs
from . import envlight as ev
from . import media as md
from . import phase as ph
from . import primitives as pr
from .bdpt import (_dir_pdf_to_meas, _eval_at, _light_head, _remap0,
                   _vertex_frame, _walk_subpath)
from .integrator import Scene, _EPS, _make_pss_draw, shadow_walk
from .mlt import _lum, _mutate

_SLOTS = 64


# ---------------------------------------------------------------------------
# Per-length strategy evaluation with MIS ratios
# ---------------------------------------------------------------------------

def _ri_walks(cam, lt, s, t, pd_cam_end_rev, pd_cam_prev_rev,
              pd_lt_end_rev, pd_lt_prev_rev, R, V):
    """Balance-heuristic ri products for strategy (cam=s, light=t) of total
    V vertices, returned BOTH as the MIS weight and as the per-strategy
    ratio vector ratios[l] (l = light-vertex count 0..V, ratios[t] = 1)
    that the reversible jump samples its technique proposal from
    (LightPath::misWeight's `ratios` output, LightPath.cpp:96-165)."""
    ratios = [jnp.zeros(R) for _ in range(V + 1)]
    ratios[t] = jnp.ones(R)
    sum_ri = jnp.zeros(R)

    ri = jnp.ones(R)
    for i in range(s - 1, -1, -1):
        pf = cam["pdf_fwd"][:, i]
        prv = pd_cam_end_rev if i == s - 1 else (
            pd_cam_prev_rev if i == s - 2 else cam["pdf_rev"][:, i])
        ri = ri * _remap0(prv) / _remap0(pf)
        d0 = cam["delta"][:, i]
        d1 = cam["delta"][:, i - 1] if i - 1 >= 0 else jnp.zeros(R, bool)
        term = jnp.where(d0 | d1, 0.0, ri)
        sum_ri = sum_ri + term
        # moving the connection below camera vertex i -> light count V - i
        ratios[V - i] = term

    if lt is not None:
        ri = jnp.ones(R)
        for i in range(t - 1, -1, -1):
            pf = lt["pdf_fwd"][:, i]
            prv = pd_lt_end_rev if i == t - 1 else (
                pd_lt_prev_rev if i == t - 2 else lt["pdf_rev"][:, i])
            ri = ri * _remap0(prv) / _remap0(pf)
            d0 = lt["delta"][:, i]
            d1 = lt["delta"][:, i - 1] if i - 1 >= 0 else jnp.zeros(R, bool)
            term = jnp.where(d0 | d1, 0.0, ri)
            sum_ri = sum_ri + term
            ratios[i] = term

    mis = 1.0 / (1.0 + sum_ri)
    return mis, jnp.stack(ratios, axis=1)  # [R, V+1]


def eval_strategies_V(scene: Scene, u, spp_idx, V):
    """All V+1 strategies (light count sl = 0..V) of total vertex count V
    from PSS vectors u [C, D+2] (trailing 2 dims = image plane).

    Returns dict:
      rgb [C, V+1, 3], px/py [C, V+1], ratios [C, V+1, V+1],
      path records for inversion: cam, lt (subpath dicts), light-head info.
    """
    cam_dev = scene.camera
    C = u.shape[0]
    ux, uy = u[:, -2], u[:, -1]
    px = jnp.minimum((ux * cam_dev.res_x).astype(jnp.int32),
                     cam_dev.res_x - 1)
    py = jnp.minimum((uy * cam_dev.res_y).astype(jnp.int32),
                     cam_dev.res_y - 1)
    key = trng.xxhash32_4(px.astype(jnp.uint32), py.astype(jnp.uint32),
                          jnp.uint32(spp_idx),
                          scene.scene_seed ^ jnp.uint32(0x93B1A7))
    draw = _make_pss_draw(u[:, :-2], key)
    b0 = jnp.zeros(C, jnp.int32)
    pss = jnp.stack([px.astype(jnp.uint32), py.astype(jnp.uint32),
                     jnp.full(C, spp_idx, jnp.uint32),
                     jnp.zeros(C, jnp.uint32)], axis=-1)

    uf = jnp.stack([draw(b0, 0), draw(b0, 1)], axis=-1)
    ul = jnp.stack([draw(b0, 2), draw(b0, 3)], axis=-1)
    ro, rd = cam_dev.sample_ray(px, py, uf, ul)
    med0 = jnp.full(C, scene.cam_medium, jnp.int32)
    cam = _walk_subpath(scene, ro, rd, jnp.ones((C, 3)),
                        cam_dev.dir_pdf(rd), draw, 8, V, med0, pss)

    nl = int(scene.lights.shape[0])
    out_rgb, out_px, out_py, out_ratios = [], [], [], []

    # ---- sl = 0: pure camera path, emitter hit at vertex V-1 --------------
    vc = {k: v[:, V - 1] for k, v in cam.items()}
    em = vc["emission"]
    has_e = jnp.max(em, axis=-1) > 0.0
    ok0 = vc["valid"] & has_e
    prim_area = tlookup(scene.prims.area, vc["prim"])
    pd_light_start = 1.0 / jnp.maximum(prim_area * max(nl, 1), 1e-12)
    if V >= 2:
        prev = {k: v[:, V - 2] for k, v in cam.items()}
        dv = prev["p"] - vc["p"]
        dvn = dv / jnp.sqrt(jnp.maximum(dot(dv, dv), 1e-12))[:, None]
        pdf_em_dir = jnp.maximum(dot(vc["n"], dvn), 0.0) / jnp.pi
        pd_prev_rev = _dir_pdf_to_meas(pdf_em_dir, vc["p"], prev["p"],
                                       prev["n"], prev["is_med"])
    else:
        pd_prev_rev = jnp.zeros(C)
    mis0, ratios0 = _ri_walks(cam, None, V, 0, pd_light_start, pd_prev_rev,
                              jnp.zeros(C), jnp.zeros(C), C, V)
    rgb0 = jnp.where(ok0[:, None], vc["beta"] * em * mis0[:, None], 0.0)
    out_rgb.append(jnp.where(jnp.isfinite(rgb0), rgb0, 0.0))
    out_px.append(px)
    out_py.append(py)
    out_ratios.append(jnp.where(ok0[:, None], ratios0, 0.0))

    if nl == 0:
        lt = None
        li_arr = jnp.zeros(C, jnp.int32)
        is_pt = jnp.zeros(C, bool)
        # pad remaining strategies with zeros
        for sl in range(1, V + 1):
            out_rgb.append(jnp.zeros((C, 3)))
            out_px.append(px)
            out_py.append(py)
            out_ratios.append(jnp.zeros((C, V + 1)))
        return {
            "rgb": jnp.stack(out_rgb, 1), "px": jnp.stack(out_px, 1),
            "py": jnp.stack(out_py, 1),
            "ratios": jnp.stack(out_ratios, 1),
            "cam": cam, "lt": lt, "li": li_arr, "is_pt": is_pt,
            "cam_px": px, "cam_py": py,
        }

    # ---- light subpath ----------------------------------------------------
    (li, p_l, n_l, le, pdf_light_area, d0, pdf_dir0, beta_l0,
     is_pt) = _light_head(scene, draw, b0, C)
    lt_tail = _walk_subpath(scene, p_l + d0 * _EPS, d0, beta_l0, pdf_dir0,
                            draw, 16, max(V - 1, 1), med0, pss)
    lt0 = {
        "p": p_l[:, None], "n": n_l[:, None], "wi": jnp.zeros((C, 1, 3)),
        "beta": (le / jnp.maximum(pdf_light_area, 1e-12)[:, None])[:, None],
        "bsdf": jnp.zeros((C, 1), jnp.int32),
        "delta": is_pt[:, None],
        "is_med": jnp.zeros((C, 1), bool),
        "med": jnp.full((C, 1), -1, jnp.int32),
        "pdf_fwd": pdf_light_area[:, None],
        "pdf_rev": jnp.zeros((C, 1)),
        "emission": le[:, None],
        "valid": jnp.ones((C, 1), bool),
        "prim": li[:, None],
        "tg": jnp.zeros((C, 1, 3)),
        "esc": jnp.zeros((C, 1), bool),
        "esc_dir": jnp.zeros((C, 1, 3)),
        "esc_beta": jnp.zeros((C, 1, 3)),
    }
    lt = {k: jnp.concatenate([lt0[k], lt_tail[k]], axis=1) for k in lt0}

    # ---- sl = 1..V-1: connections ----------------------------------------
    for sl in range(1, V):
        s = V - sl  # camera vertex count
        vc = {k: v[:, s - 1] for k, v in cam.items()}
        vl = {k: v[:, sl - 1] for k, v in lt.items()}
        ok = vc["valid"] & vl["valid"] & ~vc["delta"] & ~vl["delta"]

        d = vl["p"] - vc["p"]
        d2 = jnp.maximum(dot(d, d), 1e-12)
        w = d / jnp.sqrt(d2)[:, None]
        f_c, pdf_c_dir = _eval_at(scene, vc, w, C)
        if sl == 1:
            cos_l = jnp.where(vl["delta"], 1.0,
                              jnp.maximum(dot(vl["n"], -w), 0.0))
            f_l = jnp.ones((C, 3))
            ok = vc["valid"] & vl["valid"] & ~vc["delta"] & (cos_l > 0.0)
            g_l = cos_l
            pdf_l_dir = jnp.where(is_pt, 1.0 / (4.0 * jnp.pi),
                                  cos_l / jnp.pi)
        else:
            f_l, pdf_l_dir = _eval_at(scene, vl, -w, C)
            g_l = jnp.ones(C)

        contrib = (vc["beta"] * f_c * vl["beta"] * f_l
                   * (g_l / d2)[:, None])
        ok = ok & (jnp.max(contrib, axis=-1) > 0.0)

        pd_cam_end_rev = _dir_pdf_to_meas(pdf_l_dir, vl["p"], vc["p"],
                                          vc["n"], vc["is_med"])
        tfrc, bfrc = _vertex_frame(vc)
        w_l = jax.vmap(frame_to_local)(tfrc, bfrc, vc["n"], w)
        wi_lc = jax.vmap(frame_to_local)(tfrc, bfrc, vc["n"], vc["wi"])
        pdf_back = jax.vmap(lambda i, a, b_: bs.pdf_bsdf(
            scene.bsdfs, jnp.maximum(i, 0), a, b_))(vc["bsdf"], w_l, wi_lc)
        for mi, medium in enumerate(scene.media):
            in_m = vc["is_med"] & (vc["med"] == mi)
            pb = ph.pdf_phase(medium, scene.bsdfs, -w, -vc["wi"], vc["n"])
            pdf_back = jnp.where(in_m, pb, pdf_back)
        if s >= 2:
            prev = {k: v[:, s - 2] for k, v in cam.items()}
            pd_cam_prev_rev = _dir_pdf_to_meas(
                pdf_back, vc["p"], prev["p"], prev["n"], prev["is_med"])
        else:
            pd_cam_prev_rev = jnp.zeros(C)
        pd_lt_end_rev = _dir_pdf_to_meas(pdf_c_dir, vc["p"], vl["p"],
                                         vl["n"], vl["is_med"])
        if sl >= 2:
            tfrl, bfrl = _vertex_frame(vl)
            wl_l = jax.vmap(frame_to_local)(tfrl, bfrl, vl["n"], -w)
            wi_ll = jax.vmap(frame_to_local)(tfrl, bfrl, vl["n"], vl["wi"])
            pdf_back_l = jax.vmap(lambda i, a, b_: bs.pdf_bsdf(
                scene.bsdfs, jnp.maximum(i, 0), a, b_))(
                vl["bsdf"], wl_l, wi_ll)
            for mi, medium in enumerate(scene.media):
                in_m = vl["is_med"] & (vl["med"] == mi)
                pb = ph.pdf_phase(medium, scene.bsdfs, w, -vl["wi"],
                                  vl["n"])
                pdf_back_l = jnp.where(in_m, pb, pdf_back_l)
            prevl = {k: v[:, sl - 2] for k, v in lt.items()}
            pd_lt_prev_rev = _dir_pdf_to_meas(
                pdf_back_l, vl["p"], prevl["p"], prevl["n"],
                prevl["is_med"])
        else:
            pd_lt_prev_rev = jnp.zeros(C)

        mis, ratios = _ri_walks(cam, lt, s, sl, pd_cam_end_rev,
                                pd_cam_prev_rev, pd_lt_end_rev,
                                pd_lt_prev_rev, C, V)

        dist = jnp.sqrt(d2)
        state = md.MediumState.make(C)
        tr = shadow_walk(scene, vc["p"] + w * _EPS, w, dist * (1.0 - 1e-3),
                         jnp.full(C, -2, jnp.int32), vc["med"], state, pss,
                         draw(b0, 50), ok)
        vis_ok = jnp.max(tr, axis=-1) > 0.0
        r_st = jnp.where((ok & vis_ok)[:, None],
                         contrib * tr * mis[:, None], 0.0)
        out_rgb.append(jnp.where(jnp.isfinite(r_st), r_st, 0.0))
        out_px.append(px)
        out_py.append(py)
        out_ratios.append(jnp.where((ok & vis_ok)[:, None], ratios, 0.0))

    # ---- sl = V: lens splat ----------------------------------------------
    vl = {k: v[:, V - 1] for k, v in lt.items()}
    c = cam_dev.connect(vl["p"])
    to_cam = c["dir"]
    if V == 1:
        cos_l = jnp.where(vl["delta"], 1.0,
                          jnp.maximum(dot(vl["n"], to_cam), 0.0))
        f = vl["beta"] * cos_l[:, None]
    else:
        f_l, _ = _eval_at(scene, vl, to_cam, C)
        f = vl["beta"] * f_l
    ok = vl["valid"] & c["valid"] & (jnp.max(f, axis=-1) > 0.0)
    pdf_cam_dir = cam_dev.dir_pdf(-to_cam)
    pd_lt_end_rev = _dir_pdf_to_meas(pdf_cam_dir, cam_dev.pos, vl["p"],
                                     vl["n"], vl["is_med"])
    if V >= 2:
        tfrl, bfrl = _vertex_frame(vl)
        wl_l = jax.vmap(frame_to_local)(tfrl, bfrl, vl["n"], to_cam)
        wi_ll = jax.vmap(frame_to_local)(tfrl, bfrl, vl["n"], vl["wi"])
        pdf_back_l = jax.vmap(lambda i, a, b_: bs.pdf_bsdf(
            scene.bsdfs, jnp.maximum(i, 0), a, b_))(vl["bsdf"], wl_l, wi_ll)
        prevl = {k: v[:, V - 2] for k, v in lt.items()}
        pd_lt_prev_rev = _dir_pdf_to_meas(
            pdf_back_l, vl["p"], prevl["p"], prevl["n"], prevl["is_med"])
    else:
        pd_lt_prev_rev = jnp.zeros(C)
    cam_stub = {"pdf_fwd": jnp.zeros((C, 1)), "pdf_rev": jnp.zeros((C, 1)),
                "delta": jnp.ones((C, 1), bool)}
    mis, ratios = _ri_walks(cam_stub, lt, 0, V, jnp.zeros(C), jnp.zeros(C),
                            pd_lt_end_rev, pd_lt_prev_rev, C, V)
    state = md.MediumState.make(C)
    tr = shadow_walk(scene, vl["p"] + to_cam * _EPS, to_cam,
                     c["dist"] * (1.0 - 1e-3), jnp.full(C, -2, jnp.int32),
                     vl["med"], state, pss, draw(b0, 60), ok)
    vis_ok = jnp.max(tr, axis=-1) > 0.0
    n_pix = jnp.float32(cam_dev.res_y * cam_dev.res_x)
    contrib = f * tr * (mis * c["we"]
                        / jnp.maximum(c["dist"] ** 2, 1e-8))[:, None] / n_pix
    contrib = jnp.where((ok & vis_ok)[:, None], contrib, 0.0)
    out_rgb.append(jnp.where(jnp.isfinite(contrib), contrib, 0.0))
    out_px.append(c["px"])
    out_py.append(c["py"])
    out_ratios.append(jnp.where((ok & vis_ok)[:, None], ratios, 0.0))

    return {
        "rgb": jnp.stack(out_rgb, 1),        # [C, V+1, 3]
        "px": jnp.stack(out_px, 1),
        "py": jnp.stack(out_py, 1),
        "ratios": jnp.stack(out_ratios, 1),  # [C, V+1, V+1]
        "cam": cam, "lt": lt, "li": li, "is_pt": is_pt,
        "cam_px": px, "cam_py": py,
    }


# ---------------------------------------------------------------------------
# Path assembly + inversion
# ---------------------------------------------------------------------------

def build_path(res, sl, V):
    """Unified vertex chain y_0 (light end) .. y_{V-1} (camera end) of each
    chain's CURRENT strategy sl: y_j = lt[j] for j < sl else cam[V-1-j]."""
    cam, lt = res["cam"], res["lt"]
    keys = ("p", "n", "tg", "bsdf", "is_med", "valid", "prim")
    path = {}
    for k in keys:
        cols = []
        for j in range(V):
            cj = cam[k][:, V - 1 - j]
            if lt is None:
                cols.append(cj)
                continue
            lj = lt[k][:, j]
            sel = (j < sl)
            cols.append(jnp.where(
                sel.reshape(sel.shape + (1,) * (cj.ndim - 1)), lj, cj))
        path[k] = jnp.stack(cols, axis=1)
    return path


def _light_index(scene, prim):
    """Index of `prim` in scene.lights (one-hot contraction; -1 if absent)."""
    nl = int(scene.lights.shape[0])
    eq = prim[:, None] == scene.lights[None, :]
    found = jnp.any(eq, axis=1)
    idx = jnp.argmax(eq, axis=1).astype(jnp.int32)
    return jnp.where(found, idx, -1), found


def invert_to_strategy(scene: Scene, path, sl_new, u, V, key, it):
    """Write the PSS slots of strategy sl_new reproducing `path` into a copy
    of u [C, D+2].  Returns (u_new, ok [C]).  LightPath::invert analog."""
    C = u.shape[0]
    D = u.shape[1]
    cam_dev = scene.camera

    def ur(tag, n):
        dims = jnp.arange(n, dtype=jnp.uint32)[None, :]
        k2 = (key * jnp.uint32(2654435761)
              + jnp.uint32(0xA11CE) + jnp.uint32(it))
        return jax.vmap(lambda kk: trng.uniform(
            kk, jnp.uint32(tag) * jnp.uint32(64) + dims[0]))(k2)

    ok = jnp.all(path["valid"], axis=1)
    # medium vertices: inversion unsupported -> reject (symmetric)
    ok = ok & ~jnp.any(path["is_med"], axis=1)

    unew = u

    # ---- camera side: root + scatters, for cam_n = V - sl_new >= 1 -------
    if sl_new < V:
        d_cam = jax.vmap(normalize)(path["p"][:, V - 1]
                                    - cam_dev.pos[None, :])
        pxn, pyn, uf, ok_c = cam_dev.invert_ray(d_cam)
        ok = ok & ok_c
        unew = unew.at[:, -2].set((pxn.astype(jnp.float32) + 0.5)
                                  / cam_dev.res_x)
        unew = unew.at[:, -1].set((pyn.astype(jnp.float32) + 0.5)
                                  / cam_dev.res_y)
        unew = unew.at[:, 0].set(uf[:, 0])
        unew = unew.at[:, 1].set(uf[:, 1])

        for j in range(V - 1, sl_new, -1):
            # scatter at y_j: wi toward camera side (y_{j+1} or the lens),
            # wo toward y_{j-1}; slots of camera-walk bounce c = V-1-j
            c_idx = V - 1 - j
            p_j = path["p"][:, j]
            p_next = (path["p"][:, j + 1] if j + 1 < V
                      else jnp.broadcast_to(cam_dev.pos, (C, 3)))
            wi_w = jax.vmap(normalize)(p_next - p_j)
            wo_w = jax.vmap(normalize)(path["p"][:, j - 1] - p_j)
            n_st = path["n"][:, j]
            n_use = n_st * jnp.sign(dot(n_st, wi_w))[:, None]
            tfr, bfr = jax.vmap(oriented_frame)(n_use, path["tg"][:, j])
            wi_l = jax.vmap(frame_to_local)(tfr, bfr, n_use, wi_w)
            wo_l = jax.vmap(frame_to_local)(tfr, bfr, n_use, wo_w)
            u5, ok_b = jax.vmap(lambda b, a, o, r: bs.invert_bsdf(
                scene.bsdfs, jnp.maximum(b, 0), a, o, r))(
                path["bsdf"][:, j], wi_l, wo_l, ur(8 + j, 5))
            ok = ok & ok_b & (path["bsdf"][:, j] >= 0)
            base = c_idx * _SLOTS + 8
            for q in range(5):
                unew = unew.at[:, base + q].set(u5[:, q])

    # ---- light side: root + scatters, for sl_new >= 1 ---------------------
    nl = int(scene.lights.shape[0])
    if sl_new >= 1 and nl > 0:
        li_idx, found = _light_index(scene, path["prim"][:, 0])
        ok = ok & found
        u30 = (li_idx.astype(jnp.float32) + ur(3, 1)[:, 0]) / nl
        unew = unew.at[:, 30].set(jnp.clip(u30, 0.0, 1.0 - 1e-6))
        rr = ur(4, 2)
        u31, u32, ok_p = jax.vmap(lambda l, p, a, b_: pr.invert_position(
            scene.prims, l, p, a, b_))(
            path["prim"][:, 0], path["p"][:, 0], rr[:, 0], rr[:, 1])
        ok = ok & ok_p
        unew = unew.at[:, 31].set(u31)
        unew = unew.at[:, 32].set(u32)

        if V >= 2:
            # emission direction d0 = y_0 -> y_1
            d0 = jax.vmap(normalize)(path["p"][:, 1] - path["p"][:, 0])
            kind0 = tlookup(scene.prims.kind, path["prim"][:, 0])
            is_pt = kind0 == pr.PRIM_POINT
            n_l = path["n"][:, 0]
            tfr, bfr = jax.vmap(tangent_frame)(n_l)
            d0_l = jax.vmap(frame_to_local)(tfr, bfr, n_l, d0)
            phi = jnp.mod(jnp.arctan2(d0_l[:, 1], d0_l[:, 0]),
                          2.0 * jnp.pi)
            u33_cos = phi / (2.0 * jnp.pi)
            u34_cos = jnp.clip(d0_l[:, 0] ** 2 + d0_l[:, 1] ** 2,
                               0.0, 1.0 - 1e-7)
            ok_dir = d0_l[:, 2] > 1e-6
            # point light: uniform sphere (z = 1 - 2 u3, phi = 2 pi u4)
            u33_sph = jnp.clip((1.0 - d0[:, 2]) * 0.5, 0.0, 1.0 - 1e-7)
            phi_s = jnp.mod(jnp.arctan2(d0[:, 1], d0[:, 0]), 2.0 * jnp.pi)
            u34_sph = phi_s / (2.0 * jnp.pi)
            u33 = jnp.where(is_pt, u33_sph, u33_cos)
            u34 = jnp.where(is_pt, u34_sph, u34_cos)
            ok = ok & (is_pt | ok_dir)
            unew = unew.at[:, 33].set(u33)
            unew = unew.at[:, 34].set(u34)

        # scatters at y_1 .. y_{sl_new-2}: each gives edge d_j (to y_{j+1});
        # y_{sl_new-1}'s outgoing is the connection, not sampled
        # (LightPath::invert: `for (i = 0; i < newS - 1; ++i) invertVertex`)
        for j in range(1, sl_new - 1):
            p_j = path["p"][:, j]
            wi_w = jax.vmap(normalize)(path["p"][:, j - 1] - p_j)
            wo_w = jax.vmap(normalize)(path["p"][:, j + 1] - p_j)
            n_st = path["n"][:, j]
            n_use = n_st * jnp.sign(dot(n_st, wi_w))[:, None]
            tfr, bfr = jax.vmap(oriented_frame)(n_use, path["tg"][:, j])
            wi_l = jax.vmap(frame_to_local)(tfr, bfr, n_use, wi_w)
            wo_l = jax.vmap(frame_to_local)(tfr, bfr, n_use, wo_w)
            u5, ok_b = jax.vmap(lambda b, a, o, r: bs.invert_bsdf(
                scene.bsdfs, jnp.maximum(b, 0), a, o, r))(
                path["bsdf"][:, j], wi_l, wo_l, ur(32 + j, 5))
            ok = ok & ok_b & (path["bsdf"][:, j] >= 0)
            base = (j - 1) * _SLOTS + 16
            for q in range(5):
                unew = unew.at[:, base + q].set(u5[:, q])

    return unew, ok


# ---------------------------------------------------------------------------
# The chain driver
# ---------------------------------------------------------------------------

def render_pass_rjmlt(scene: Scene, spp_idx, n_chains=1024, n_mutations=24,
                      p_large=0.3, p_jump=0.3, n_bootstrap=2, max_len=4):
    """One RJMLT pass.  Returns the per-pass film [H*W, 3]."""
    cam = scene.camera
    film = jnp.zeros((cam.res_y * cam.res_x, 3), jnp.float32)
    n_pix = cam.res_y * cam.res_x

    for V in range(1, max_len + 1):
        film = film + _run_length(scene, spp_idx, V, n_chains, n_mutations,
                                  p_large, p_jump, n_bootstrap)
    return film


def _run_length(scene, spp_idx, V, C, M, p_large, p_jump, n_bootstrap):
    cam = scene.camera
    n_pix = cam.res_y * cam.res_x
    NS = V + 1
    D = (V + 2) * _SLOTS + 2
    chain = jnp.arange(C, dtype=jnp.uint32)
    key = trng.xxhash32_4(chain, jnp.uint32(0x8D51E + V),
                          jnp.uint32(spp_idx),
                          scene.scene_seed ^ jnp.uint32(0x5EEDAA))

    def fresh(ctr):
        dims = jnp.arange(D, dtype=jnp.uint32)
        return jax.vmap(lambda k: trng.uniform(
            k, ctr * jnp.uint32(D) + dims))(key)

    def select(res, si):
        oh = jnp.arange(NS)[None, :] == si[:, None]
        c = jnp.sum(jnp.where(oh[:, :, None], res["rgb"], 0.0), axis=1)
        px = jnp.sum(jnp.where(oh, res["px"], 0), axis=1)
        py = jnp.sum(jnp.where(oh, res["py"], 0), axis=1)
        ratios = jnp.sum(jnp.where(oh[:, :, None], res["ratios"], 0.0),
                         axis=1)
        return c, px, py, ratios

    # ---- bootstrap: b_V + joint (u, sl) seeding ---------------------------
    totals, us = [], []
    for i in range(n_bootstrap):
        u_i = fresh(jnp.uint32(1 + i))
        r_i = eval_strategies_V(scene, u_i, spp_idx, V)
        totals.append(jnp.sum(_lum(r_i["rgb"]), axis=-1))
        us.append(u_i)
    b = jnp.mean(jnp.stack(totals))
    ls = jnp.stack(totals, -1)
    cum = jnp.cumsum(ls, -1)
    rpick = trng.uniform(key, jnp.uint32(0xB007)) * cum[:, -1]
    pick = jnp.minimum(jnp.sum((cum <= rpick[:, None]).astype(jnp.int32),
                               -1), n_bootstrap - 1)
    cur_u = jnp.take_along_axis(jnp.stack(us, 1), pick[:, None, None],
                                1)[:, 0]

    res0 = eval_strategies_V(scene, cur_u, spp_idx, V)
    lum_s = _lum(res0["rgb"])                       # [C, NS]
    tot0 = jnp.sum(lum_s, -1)
    csum = jnp.cumsum(lum_s, -1)
    rs = trng.uniform(key, jnp.uint32(0x51C7)) * jnp.maximum(tot0, 1e-30)
    cur_s = jnp.minimum(jnp.sum((csum < rs[:, None]).astype(jnp.int32), -1),
                        NS - 1)
    cur_c, cur_px, cur_py, cur_ratios = select(res0, cur_s)
    cur_l = _lum(cur_c)
    cur_path = build_path(res0, cur_s, V)

    film = jnp.zeros((n_pix, 3), jnp.float32)

    def splat(film, pxs, pys, w_rgb):
        flat = pys * cam.res_x + pxs
        return film.at[flat].add(w_rgb)

    # Python-level mutation loop (M small): each iteration is one fused
    # wavefront; the path records carried between iterations are [C,V,*]
    state = (film, cur_u, cur_s, cur_c, cur_l, cur_px, cur_py, cur_ratios,
             cur_path)
    for it in range(M):
        (film, cur_u, cur_s, cur_c, cur_l, cur_px, cur_py, cur_ratios,
         cur_path) = state
        itu = jnp.uint32(0x100 + it)
        sel = trng.uniform(key, itu * jnp.uint32(3) + jnp.uint32(0))
        big = sel < p_large
        jump = (sel >= p_large) & (sel < p_large + p_jump)

        # large step: fresh u + uniform strategy
        u_fresh = fresh(jnp.uint32(0x300 + it))
        s_fresh = jnp.minimum(
            (trng.uniform(key, itu * jnp.uint32(3) + jnp.uint32(1))
             * NS).astype(jnp.int32), NS - 1)
        # small step: Kelemen perturbation, strategy kept
        u_small, _ = _mutate(cur_u, key, itu, 0.0)
        # jump: freeze u, new strategy ~ ratios, exact inversion
        rat = jnp.maximum(cur_ratios, 0.0)
        rat_tot = jnp.sum(rat, -1)
        rcum = jnp.cumsum(rat, -1)
        rj = trng.uniform(key, itu * jnp.uint32(3) + jnp.uint32(2)) \
            * jnp.maximum(rat_tot, 1e-30)
        s_jump = jnp.minimum(jnp.sum((rcum < rj[:, None]).astype(jnp.int32),
                                     -1), NS - 1)
        # invert_to_strategy is specialized per sl_new (static loops):
        # evaluate for every target sl and one-hot select
        u_jumps, ok_jumps = [], []
        for sln in range(NS):
            uj, okj = invert_to_strategy(scene, cur_path, sln, cur_u, V,
                                         key, it)
            u_jumps.append(uj)
            ok_jumps.append(okj)
        u_jump = jnp.zeros_like(cur_u)
        ok_jump = jnp.zeros(C, bool)
        for sln in range(NS):
            m = (s_jump == sln)
            u_jump = jnp.where(m[:, None], u_jumps[sln], u_jump)
            ok_jump = jnp.where(m, ok_jumps[sln], ok_jump)
        # a jump to the SAME strategy is the identity (always invertible in
        # principle); treat as ordinary frozen-u proposal
        same = s_jump == cur_s
        u_jump = jnp.where(same[:, None], cur_u, u_jump)
        ok_jump = ok_jump | same

        prop_u = jnp.where(big[:, None], u_fresh,
                           jnp.where(jump[:, None], u_jump, u_small))
        prop_s = jnp.where(big, s_fresh, jnp.where(jump, s_jump, cur_s))
        pweight = jnp.where(jump, jnp.where(ok_jump, 1.0, 0.0), 1.0)

        res_p = eval_strategies_V(scene, prop_u, spp_idx, V)
        prop_c, prop_px, prop_py, prop_ratios = select(res_p, prop_s)
        prop_l = _lum(prop_c)
        prop_path = build_path(res_p, prop_s, V)

        a = jnp.where(cur_l > 0.0,
                      jnp.minimum(pweight * prop_l
                                  / jnp.maximum(cur_l, 1e-30), 1.0),
                      jnp.where(pweight > 0.0, 1.0, 0.0))
        w_cur = (1.0 - a) / jnp.maximum(cur_l, 1e-30)
        w_prop = a / jnp.maximum(prop_l, 1e-30)
        film = splat(film, cur_px, cur_py,
                     jnp.where((cur_l > 0)[:, None], cur_c * w_cur[:, None],
                               0.0))
        film = splat(film, prop_px, prop_py,
                     jnp.where((prop_l > 0)[:, None],
                               prop_c * w_prop[:, None], 0.0))
        acc = trng.uniform(key, (jnp.uint32(0x200 + it))
                           * jnp.uint32(D)) < a
        cur_u = jnp.where(acc[:, None], prop_u, cur_u)
        cur_s = jnp.where(acc, prop_s, cur_s)
        cur_c = jnp.where(acc[:, None], prop_c, cur_c)
        cur_l = jnp.where(acc, prop_l, cur_l)
        cur_px = jnp.where(acc, prop_px, cur_px)
        cur_py = jnp.where(acc, prop_py, cur_py)
        cur_ratios = jnp.where(acc[:, None], prop_ratios, cur_ratios)
        cur_path = jax.tree_util.tree_map(
            lambda pn, po: jnp.where(
                acc.reshape((C,) + (1,) * (pn.ndim - 1)), pn, po),
            prop_path, cur_path)
        state = (film, cur_u, cur_s, cur_c, cur_l, cur_px, cur_py,
                 cur_ratios, cur_path)

    film = state[0]
    return film * (b * n_pix / (C * M))

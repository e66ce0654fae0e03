"""Multiplexed Metropolis Light Transport — chain-parallel, TPU-wavefront.

Re-design of src/core/integrators/multiplexed_mlt/ (988 LoC:
MultiplexedMltTracer.cpp startSampleChain/runSampleChain,
LargeStepTracker.hpp normalization): Hachisuka et al. 2014's MMLT samples
BDPT strategies through primary sample space — the technique index is
itself a PSS dimension (emitterSampler dim 0, seeded at the strategy's
interval midpoint by startSampleChain, MultiplexedMltTracer.cpp:117-143),
so Kelemen small steps occasionally jump strategies (the reference's
techniqueChange statistic, :194-209) and large steps redraw the technique
uniformly; acceptance is by the luminance ratio of the SELECTED strategy's
MIS-weighted contribution.

TPU-native shape: thousands of chains advance in lockstep; every mutation
evaluates ALL BDPT strategies of the proposal in one wavefront
(trace_bdpt(collect=...)) and each chain selects its own strategy by a
one-hot contraction — uniform control flow, no divergence, and the b
normalization (mean TOTAL strategy luminance over fresh large steps,
LargeStepTracker::getSampleCount/addSample) falls out of the same
evaluations.  Chains are seeded by importance resampling over bootstrap
(path, strategy) candidates proportional to luminance.

Estimator contract matches models/mlt.py: render_pass_mmlt returns a
per-pass film normalized so that averaging passes converges to the same
image as render_pass (expected-value splats: both accepted and rejected
states splat with their acceptance weights, Veach-style)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import rng as trng
from .bdpt import trace_bdpt
from .integrator import Scene
from .mlt import _mutate

_SLOTS = 64


def _strategies(scene, u, spp_idx, max_cam, max_light):
    """Evaluate every BDPT strategy from PSS vectors u [C, D+2] (last two
    dims = image plane).  Returns (rgb [C, NS, 3], px [C, NS], py [C, NS])
    — per-strategy MIS-weighted contributions with their target pixels."""
    cam = scene.camera
    ux, uy = u[:, -2], u[:, -1]
    px = jnp.minimum((ux * cam.res_x).astype(jnp.int32), cam.res_x - 1)
    py = jnp.minimum((uy * cam.res_y).astype(jnp.int32), cam.res_y - 1)
    C = u.shape[0]
    coll = []
    film = jnp.zeros((cam.res_y * cam.res_x, 3), jnp.float32)
    trace_bdpt(scene, px, py, spp_idx, max_cam=max_cam,
               max_light=max_light, with_splats=True, film=film,
               pss_u=u[:, :-2], collect=coll)
    # the trailing max_light entries are the t=1 lens-splat family, whose
    # camera importance We integrates to n_pix over the film: divide by
    # n_pix so every strategy is in the same per-pixel-average units
    # (trace_bdpt's own film applies the same 1/(H*W) light-path norm)
    n_pix = jnp.float32(cam.res_y * cam.res_x)
    # light-less scenes: trace_bdpt returns after the single t0/env entry —
    # no connection or splat strategies exist (ADVICE r3: ns mismatch
    # shape-errored instead of rendering the env-only image)
    ns_splat = len(coll) - (max_light if int(scene.lights.shape[0]) > 0
                            else 0)
    rgb = jnp.stack(
        [jnp.where(jnp.isfinite(c[0]), c[0], 0.0)
         / (n_pix if i >= ns_splat else 1.0)
         for i, c in enumerate(coll)], axis=1)        # [C, NS, 3]
    pxs = jnp.stack([jnp.broadcast_to(c[1], (C,)) for c in coll], axis=1)
    pys = jnp.stack([jnp.broadcast_to(c[2], (C,)) for c in coll], axis=1)
    return rgb, pxs, pys


def _lum(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def render_pass_mmlt(scene: Scene, spp_idx, n_chains=2048, n_mutations=24,
                     p_large=0.3, n_bootstrap=3, max_cam=3, max_light=3):
    """One MMLT pass.  Returns the per-pass film [H*W, 3]."""
    cam = scene.camera
    C = n_chains
    D = (max_cam + max_light + 4) * _SLOTS + 2
    chain = jnp.arange(C, dtype=jnp.uint32)
    key = trng.xxhash32_4(chain, jnp.uint32(0x8817A3E1),
                          jnp.uint32(spp_idx),
                          scene.scene_seed ^ jnp.uint32(0x5EED77))

    def fresh(ctr):
        dims = jnp.arange(D, dtype=jnp.uint32)
        return jax.vmap(lambda k: trng.uniform(
            k, ctr * jnp.uint32(D) + dims))(key)

    # ---- bootstrap: b normalization + joint (u, strategy) resampling -----
    # P(round i, strategy j) propto lum_ij factorizes as
    # P(i) propto total_i  x  P(j | i) propto lum_ij / total_i — pick the
    # round by total luminance, then the strategy within the winning path
    # (the exact joint target MultiplexedMltTracer's per-(s,t) chains seed
    # from, LargeStepTracker + startSampleChain)
    # t0/env + connections + splats; light-less scenes only ever produce
    # the single t0/env strategy (trace_bdpt early-returns)
    ns = (1 + max_cam * max_light + max_light
          if int(scene.lights.shape[0]) > 0 else 1)

    def boot(_, i):
        u_i = fresh(jnp.uint32(1) + i.astype(jnp.uint32))
        rgb, _, _ = _strategies(scene, u_i, spp_idx, max_cam, max_light)
        total = jnp.sum(_lum(rgb), axis=-1)
        return None, (u_i, total)

    _, (us_scan, totals_scan) = jax.lax.scan(
        boot, None, jnp.arange(n_bootstrap))
    cand_u = [us_scan[i] for i in range(n_bootstrap)]
    cand_total = [totals_scan[i] for i in range(n_bootstrap)]
    b = jnp.mean(totals_scan)  # mean TOTAL path luminance (all strategies)

    ls = jnp.stack(cand_total, -1)                  # [C, K]
    cum = jnp.cumsum(ls, -1)
    r = trng.uniform(key, jnp.uint32(0xB007)) * cum[:, -1]
    pick = jnp.sum((cum <= r[:, None]).astype(jnp.int32), -1)
    pick = jnp.minimum(pick, n_bootstrap - 1)
    us = jnp.stack(cand_u, 1)                       # [C, K, D]
    cur_u = jnp.take_along_axis(us, pick[:, None, None], 1)[:, 0]

    film = jnp.zeros((cam.res_y * cam.res_x, 3), jnp.float32)

    def select(rgb, pxs, pys, si):
        oh = jnp.arange(ns)[None, :] == si[:, None]
        c = jnp.sum(jnp.where(oh[:, :, None], rgb, 0.0), axis=1)
        px = jnp.sum(jnp.where(oh, pxs, 0), axis=1)
        py = jnp.sum(jnp.where(oh, pys, 0), axis=1)
        return c, px, py

    # the technique index is a PSS DIMENSION (slot 6 of the bounce-0 block,
    # unused by the walks): si = floor(u_tech * ns).  Small steps perturb
    # it (occasionally crossing a strategy boundary = the reference's
    # techniqueChange move) and large steps redraw it uniformly — exactly
    # MultiplexedMltTracer's emitterSampler dim 0
    # (MultiplexedMltTracer.cpp:131 setRandomElement, :194-209 stats).
    _TECH = 6

    def tech(u):
        return jnp.minimum((u[:, _TECH] * ns).astype(jnp.int32), ns - 1)

    rgb0, pxs0, pys0 = _strategies(scene, cur_u, spp_idx, max_cam,
                                   max_light)
    lum0 = _lum(rgb0)
    tot0 = jnp.sum(lum0, axis=-1)
    csum = jnp.cumsum(lum0, axis=-1)
    rs = trng.uniform(key, jnp.uint32(0x51C7)) * jnp.maximum(tot0, 1e-30)
    si0 = jnp.minimum(jnp.sum((csum < rs[:, None]).astype(jnp.int32), -1),
                      ns - 1)
    # seed the technique dim at the strategy's interval midpoint
    # (startSampleChain's (s + 0.5)/(length + 1))
    cur_u = cur_u.at[:, _TECH].set((si0.astype(jnp.float32) + 0.5) / ns)
    cur_c, cur_px, cur_py = select(rgb0, pxs0, pys0, si0)
    cur_l = _lum(cur_c)

    def splat(film, pxs, pys, w_rgb):
        flat = pys * cam.res_x + pxs
        return film.at[flat].add(w_rgb)

    def step(it, carry):
        film, cur_u, cur_c, cur_l, cur_px, cur_py = carry
        itu = jnp.uint32(0x100) + jnp.uint32(it)
        prop_u, _big = _mutate(cur_u, key, itu, p_large)
        rgb_p, pxs_p, pys_p = _strategies(scene, prop_u, spp_idx,
                                          max_cam, max_light)
        prop_c, prop_px, prop_py = select(rgb_p, pxs_p, pys_p, tech(prop_u))
        prop_l = _lum(prop_c)
        a = jnp.where(cur_l > 0.0,
                      jnp.minimum(prop_l / jnp.maximum(cur_l, 1e-30), 1.0),
                      1.0)
        # expected-value splats (Kelemen 5.1): both states weighted
        w_cur = (1.0 - a) / jnp.maximum(cur_l, 1e-30)
        w_prop = a / jnp.maximum(prop_l, 1e-30)
        film = splat(film, cur_px, cur_py,
                     jnp.where((cur_l > 0)[:, None],
                               cur_c * w_cur[:, None], 0.0))
        film = splat(film, prop_px, prop_py,
                     jnp.where((prop_l > 0)[:, None],
                               prop_c * w_prop[:, None], 0.0))
        acc = trng.uniform(
            key, (jnp.uint32(0x200) + jnp.uint32(it)) * jnp.uint32(D)) < a
        cur_u = jnp.where(acc[:, None], prop_u, cur_u)
        cur_c = jnp.where(acc[:, None], prop_c, cur_c)
        cur_l = jnp.where(acc, prop_l, cur_l)
        cur_px = jnp.where(acc, prop_px, cur_px)
        cur_py = jnp.where(acc, prop_py, cur_py)
        return (film, cur_u, cur_c, cur_l, cur_px, cur_py)

    carry = jax.lax.fori_loop(
        0, n_mutations, step,
        (film, cur_u, cur_c, cur_l, cur_px, cur_py))
    film = carry[0]
    # normalization: E[splat density] integrates to 1 per chain-mutation;
    # scale by b / (C * n_mutations) * n_pixels to express the film in the
    # same per-pixel-average units as render_pass
    n_pix = cam.res_y * cam.res_x
    return film * (b * n_pix / (C * n_mutations))

"""Kelemen-style primary-sample-space Metropolis light transport.

Re-design of src/core/integrators/kelemen_mlt/ (KelemenMltTracer.cpp: one
Markov chain per thread over the primary sample space, large steps w.p.
_largeStepProbability, exponential small-step perturbations, expected-value
splatting weighted by acceptance; luminance normalization b from a bootstrap
pass).

TPU design: thousands of INDEPENDENT chains advance in lockstep — one
`lax.fori_loop` whose body traces the whole proposal wavefront through the
standard path tracer (`trace` with `pss_u`), computes the Metropolis accepts
elementwise, and scatter-adds both current and proposal contributions into
the film.  Chain-parallel MLT is the natural fit for SPMD hardware: the
reference's per-thread sequential chains become a [C]-wide vector of chains,
and each Metropolis step costs one fused wavefront trace.

The path is a deterministic function of the PSS vector u:
u[0:2] -> image plane, u[4*64:] -> per-bounce slots (64 per bounce,
matching the hash-sampler slot layout so mutation granularity == one
decision).  The estimator is the standard Kelemen histogram:
  I(px) = b * E[splat(px)] / n_mutations,  b = E_uniform[luminance].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import rng as trng
from .integrator import Scene, trace

_SLOTS = 64


def _lum(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def _trace_u(scene, u, spp_idx):
    """Path contribution of PSS vectors u [C, D+2] (last 2 dims = image
    plane).  Returns (radiance [C,3], px, py)."""
    cam = scene.camera
    ux = u[:, -2]
    uy = u[:, -1]
    px = jnp.minimum((ux * cam.res_x).astype(jnp.int32), cam.res_x - 1)
    py = jnp.minimum((uy * cam.res_y).astype(jnp.int32), cam.res_y - 1)
    c = trace(scene, px, py, spp_idx, pss_u=u[:, :-2])
    c = jnp.where(jnp.isfinite(c), c, 0.0)
    return c, px, py


def _mutate(u, key, ctr, p_large, s1=1.0 / 1024.0, s2=1.0 / 64.0):
    """Kelemen mutation: large step w.p. p_large (fresh uniforms), else
    exponential-scale perturbation of every dim with wrap-around
    (KelemenMltTracer.cpp mutateSample)."""
    C, D = u.shape
    dims = jnp.arange(D, dtype=jnp.uint32)

    # counter layout: purpose in the top nibble, (iteration, dim) below —
    # disjoint streams per purpose, so no aliasing between the perturbation
    # / sign / fresh / large-step decisions of different Metropolis steps
    # (purpose 0 is reserved for the bootstrap's fresh stream)
    def _ctr(purpose, sub):
        return (jnp.uint32(purpose) << jnp.uint32(28)) | sub

    def per_chain(k, uc, cc):
        base = cc * jnp.uint32(D) + dims
        r = trng.uniform(k, _ctr(1, base))
        sgn = trng.uniform(k, _ctr(2, base)) < 0.5
        du = s2 * jnp.exp(-np.log(s2 / s1) * r)
        prop = uc + jnp.where(sgn, du, -du)
        prop = prop - jnp.floor(prop)
        fresh = trng.uniform(k, _ctr(3, base))
        big = trng.uniform(k, _ctr(4, cc)) < p_large
        return jnp.where(big, fresh, prop), big

    return jax.vmap(per_chain)(key, u, jnp.broadcast_to(ctr, (C,)))


def render_pass_mlt(scene: Scene, spp_idx, n_chains=4096, n_mutations=32,
                    p_large=0.3, n_bootstrap=4):
    """One MLT pass.  Returns the per-pass film [H*W, 3] normalized so that
    accumulating over passes and dividing by the pass count converges to
    the same image as render_pass (same contract as the other secondary
    integrators)."""
    cam = scene.camera
    C = n_chains
    D = (scene.max_bounces + 4) * _SLOTS + 2
    chain = jnp.arange(C, dtype=jnp.uint32)
    key = trng.xxhash32_4(chain, jnp.uint32(0x317A11E7),
                          jnp.uint32(spp_idx),
                          scene.scene_seed ^ jnp.uint32(0x5EED11))

    def fresh(ctr):
        # purpose-0 stream (see _mutate's counter layout)
        dims = jnp.arange(D, dtype=jnp.uint32)
        return jax.vmap(lambda k: trng.uniform(
            k, ctr * jnp.uint32(D) + dims))(key)

    # ---- bootstrap: luminance normalization b + chain seeding -------------
    # per-chain importance resampling proportional to luminance (the
    # reference's global bootstrap-resample, KelemenMltTracer startup)
    cand_u, cand_l = [], []
    b_sum = jnp.zeros(())
    for i in range(n_bootstrap):
        u_i = fresh(jnp.uint32(1 + i))
        c_i, _, _ = _trace_u(scene, u_i, spp_idx)
        l_i = _lum(c_i)
        b_sum = b_sum + jnp.mean(l_i)
        cand_u.append(u_i)
        cand_l.append(l_i)
    b = b_sum / n_bootstrap
    # GLOBAL importance resampling over the full C*K candidate pool
    # (the reference's bootstrap resample is global too): per-chain
    # 1-of-K picks approximate the stationary distribution pi ~ luminance
    # poorly when a few paths carry most luminance (direct light hits),
    # and the resulting startup transient biases short chains
    ls = jnp.stack(cand_l, -1).reshape(-1)           # [C*K]
    cum = jnp.cumsum(ls)
    r = trng.uniform(key, jnp.uint32(0xB007)) * cum[-1]
    pick = jnp.minimum(jnp.searchsorted(cum, r, side="right"),
                       C * n_bootstrap - 1)
    us = jnp.stack(cand_u, 1).reshape(C * n_bootstrap, D)  # [C*K, D]
    cur_u = us[pick]
    cur_c, cur_px, cur_py = _trace_u(scene, cur_u, spp_idx)
    cur_l = _lum(cur_c)

    film0 = jnp.zeros((cam.res_y * cam.res_x, 3), jnp.float32)

    b_safe = jnp.maximum(b, 1e-12)
    pL = jnp.float32(p_large)

    def step(it, carry):
        u, c, l, pxc, pyc, film = carry
        prop_u, big = _mutate(u, key, jnp.uint32(100 + it), p_large)
        prop_c, ppx, ppy = _trace_u(scene, prop_u, spp_idx)
        prop_l = _lum(prop_c)
        a = jnp.where(l > 0.0, jnp.minimum(prop_l / jnp.maximum(l, 1e-12),
                                           1.0),
                      jnp.where(prop_l > 0.0, 1.0, 0.0))
        # Kelemen COMBINED estimator (KelemenMltTracer.cpp:118-119): the
        # large-step proposals are simultaneously plain-MC samples, and the
        # balance heuristic between {MLT chain density l/b, large-step
        # density p_large} gives
        #   w_cur  = (1 - a)          / (l/b      + p_large)
        #   w_prop = (a + isLargeStep) / (prop_l/b + p_large)
        # This removes the chain-initialization bias of pure-MLT weights
        # (visible as bright-pixel deficit at small mutation counts) and is
        # exactly the reference's weighting.
        den_c = l / b_safe + pL
        den_p = prop_l / b_safe + pL
        w_cur = jnp.where(den_c > 0.0, (1.0 - a) / jnp.maximum(den_c, 1e-12),
                          0.0)
        w_prop = jnp.where(den_p > 0.0,
                           (a + big.astype(jnp.float32))
                           / jnp.maximum(den_p, 1e-12), 0.0)
        film = film.at[pyc * cam.res_x + pxc].add(c * w_cur[:, None])
        film = film.at[ppy * cam.res_x + ppx].add(prop_c * w_prop[:, None])
        ukey = trng.uniform(key, jnp.uint32(0xACC001) + jnp.uint32(it))
        acc = ukey < a
        u = jnp.where(acc[:, None], prop_u, u)
        c = jnp.where(acc[:, None], prop_c, c)
        l = jnp.where(acc, prop_l, l)
        pxc = jnp.where(acc, ppx, pxc)
        pyc = jnp.where(acc, ppy, pyc)
        return u, c, l, pxc, pyc, film

    out = jax.lax.fori_loop(
        0, n_mutations, step,
        (cur_u, cur_c, cur_l, cur_px, cur_py, film0))
    film = out[-1]
    # per-pixel estimate: the combined weights already carry the b factor
    # through l/b; each chain-mutation deposits expected total luminance
    # b per step, so the film is comparable to one render_pass sample
    # after n_pix/(C*M)
    n_pix = cam.res_y * cam.res_x
    scale = n_pix / jnp.float32(C * n_mutations)
    return film * scale

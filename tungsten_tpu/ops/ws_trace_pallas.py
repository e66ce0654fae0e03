"""VMEM-resident range-bounded sphere trace for weight-space GPIS.

The r4 trace ran `sphere_trace_segment` as a vmapped XLA while_loop: every
adaptive iteration re-read the per-ray RFF basis projections ([R, n] f32,
~64 MB at R=16k, n=1024) from HBM twice — the trace was HBM-bandwidth-bound
at ~0.5 ms/iteration and all rays paid the straggler's iteration count.

Here the basis stays resident in VMEM: a Mosaic kernel advances every ray in
a 64-ray block through CHUNK_ITERS adaptive range-bound steps per dispatch
(rays on sublanes, basis functions on lanes; the exact-cos-interval bound of
ops/weight_space.py:116-166 evaluated as (64, n) VPU arithmetic with lane
reductions).  An outer XLA while_loop re-dispatches until every ray is done,
so HBM reads of the basis drop by ~2*CHUNK_ITERS.

Math is IDENTICAL to sphere_trace_segment / range_bound_segment
(WeightSpaceGaussianProcessMedium.cpp:186-235, WeightSpaceGaussianProcess.
cpp:91-118): same growth/shrink factors, same exact trigonometric interval,
same mean midpoint +/- Lipschitz half-length bound.  Scope: stationary
covariances (constant amplitude) with homogeneous or spherical means and no
additional mean — the paper's weight-space configs; everything else falls
back to the vmapped path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAYS_BLK = 64
CHUNK_ITERS = 16

_TWO_PI = np.float32(2.0 * np.pi)
_PI = np.float32(np.pi)

# state columns: [t, step, done, hit, sign0, it, -, -]
_C_T, _C_STEP, _C_DONE, _C_HIT, _C_SIGN, _C_IT = 0, 1, 2, 3, 4, 5
# aux columns: [A (=|ro-c|^2), B (=(ro-c).rd), far, -, -, -, -, -]
_A_A, _A_B, _A_FAR = 0, 1, 2


def _trace_kernel(chunk_iters, mean_is_spherical, params_ref, a_ref,
                  slope_ref, amp_ref, aux_ref, state_ref, out_ref):
    """params (SMEM, (1, 8)): [scale, min_step, lip_mean, radius,
    mean_offset, -, -, -]."""
    a = a_ref[:]          # (B, n) basis phase offsets at t=0
    sl = slope_ref[:]     # (B, n) phase slopes
    amp = amp_ref[:]      # (B, n) weights * sqrt(2/n)
    aux = aux_ref[:]      # (B, 8)
    scale = params_ref[0, 0]
    min_step = params_ref[0, 1]
    lip_m = params_ref[0, 2]
    radius = params_ref[0, 3]
    m_off = params_ref[0, 4]
    far = aux[:, _A_FAR:_A_FAR + 1]

    def body(_, S):
        t = S[:, _C_T:_C_T + 1]
        step = S[:, _C_STEP:_C_STEP + 1]
        done = S[:, _C_DONE:_C_DONE + 1] > 0.5
        sign0 = S[:, _C_SIGN:_C_SIGN + 1]

        th0 = a + sl * t
        th1 = a + sl * (t + step)
        lo_th = jnp.minimum(th0, th1)
        hi_th = jnp.maximum(th0, th1)
        c_lo = jnp.cos(lo_th)
        c_hi = jnp.cos(hi_th)
        cmin = jnp.minimum(c_lo, c_hi)
        cmax = jnp.maximum(c_lo, c_hi)
        k_even = (jnp.floor(hi_th / _TWO_PI)
                  - jnp.floor(lo_th / _TWO_PI)) >= 1.0
        k_odd = (jnp.floor((hi_th - _PI) / _TWO_PI)
                 - jnp.floor((lo_th - _PI) / _TWO_PI)) >= 1.0
        wide = (hi_th - lo_th) >= _TWO_PI
        cmax = jnp.where(k_even | wide, 1.0, cmax)
        cmin = jnp.where(k_odd | wide, -1.0, cmin)
        term_lo = jnp.minimum(amp * cmin, amp * cmax)
        term_hi = jnp.maximum(amp * cmin, amp * cmax)
        n_lo = scale * jnp.sum(term_lo, axis=1, keepdims=True)
        n_hi = scale * jnp.sum(term_hi, axis=1, keepdims=True)

        tm = t + 0.5 * step
        if mean_is_spherical:
            d2 = aux[:, _A_A:_A_A + 1] + tm * (2.0 * aux[:, _A_B:_A_B + 1]
                                               + tm)
            m_mid = jnp.sqrt(jnp.maximum(d2, 0.0)) - radius
        else:
            m_mid = jnp.zeros_like(tm) + m_off
        half = 0.5 * step * lip_m
        lo_b = n_lo + m_mid - half
        hi_b = n_hi + m_mid + half

        no_cross = jnp.where(sign0 > 0, lo_b > 0.0, hi_b < 0.0)
        converged = (~no_cross) & (step <= min_step)
        t_new = jnp.where(no_cross, t + step, t)
        step_new = jnp.where(no_cross, step * 1.6, step * 0.5)
        step_new = jnp.maximum(step_new, min_step * 0.5)
        exited = t_new >= far
        step_new = jnp.minimum(step_new, far - t_new + 1e-6)

        upd = ~done
        t2 = jnp.where(upd, t_new, t)
        step2 = jnp.where(upd, step_new, step)
        hit_new = upd & converged
        done_new = upd & (converged | exited)
        it2 = S[:, _C_IT:_C_IT + 1] + jnp.where(upd, 1.0, 0.0)

        col = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
        S = jnp.where(col == _C_T, t2, S)
        S = jnp.where(col == _C_STEP, step2, S)
        S = jnp.where((col == _C_DONE) & done_new, 1.0, S)
        S = jnp.where((col == _C_HIT) & hit_new, 1.0, S)
        S = jnp.where(col == _C_IT, it2, S)
        return S

    out_ref[:] = jax.lax.fori_loop(0, chunk_iters, body, state_ref[:])


@functools.partial(jax.jit,
                   static_argnames=("mean_is_spherical", "interpret"))
def _trace_chunk(a, slope, amp, aux, state, params, mean_is_spherical,
                 interpret):
    R, n = a.shape
    grid = (R // RAYS_BLK,)
    bspec = pl.BlockSpec((RAYS_BLK, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((RAYS_BLK, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_trace_kernel, CHUNK_ITERS, mean_is_spherical),
        out_shape=jax.ShapeDtypeStruct((R, 8), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            bspec, bspec, bspec, sspec, sspec,
        ],
        out_specs=sspec,
        interpret=interpret,
    )(params, a, slope, amp, aux, state)


def supports(gp):
    """Kernel scope gate (see module docstring)."""
    from . import means as mn
    if not gp.cov.is_stationary:
        return False
    if gp.mean_additional is not None:
        return False
    return isinstance(gp.mean, (mn.SphericalMean, mn.HomogeneousMean))


# ---------------------------------------------------------------------------
# Fixed-step march (step_size > 0 weight-space configs, BASELINE 4a):
# the same per-step sign scan as models/media.march, VMEM-resident.
# ---------------------------------------------------------------------------

MARCH_CHUNK = 32

# march state columns: [k, done, crossed, t_hi, f_lo, f_hi, sign0, f_prev]
_M_K, _M_DONE, _M_CROSS, _M_THI, _M_FLO, _M_FHI, _M_SIGN, _M_FPREV = range(8)
# march aux columns: [A, B, far, t1, step, absorb, -, -]
_MA_A, _MA_B, _MA_FAR, _MA_T1, _MA_STEP, _MA_ABS = range(6)


def _march_kernel(chunk_steps, mean_is_spherical, params_ref, a_ref,
                  slope_ref, amp_ref, aux_ref, state_ref, out_ref):
    """params (SMEM, (1, 8)): [scale, radius, mean_offset, -...]."""
    a = a_ref[:]
    sl = slope_ref[:]
    amp = amp_ref[:]
    aux = aux_ref[:]
    scale = params_ref[0, 0]
    radius = params_ref[0, 1]
    m_off = params_ref[0, 2]
    far = aux[:, _MA_FAR:_MA_FAR + 1]
    t1 = aux[:, _MA_T1:_MA_T1 + 1]
    step = aux[:, _MA_STEP:_MA_STEP + 1]
    absorb = aux[:, _MA_ABS:_MA_ABS + 1] > 0.5

    def body(_, S):
        k = S[:, _M_K:_M_K + 1]
        done = S[:, _M_DONE:_M_DONE + 1] > 0.5
        sign0 = S[:, _M_SIGN:_M_SIGN + 1]
        f_prev = S[:, _M_FPREV:_M_FPREV + 1]

        tc = t1 + step * k
        phase = a + sl * tc
        nsum = jnp.sum(amp * jnp.cos(phase), axis=1, keepdims=True)
        if mean_is_spherical:
            d2 = aux[:, _MA_A:_MA_A + 1] + tc * (2.0 * aux[:, _MA_B:_MA_B + 1]
                                                 + tc)
            m = jnp.sqrt(jnp.maximum(d2, 0.0)) - radius
        else:
            m = m_off
        f = scale * nsum + m
        sgn = jnp.where(f < 0.0, -1.0, 1.0)

        first = k < 0.5
        sign0n = jnp.where(absorb & first, sgn, sign0)
        in_range = tc < far
        flip = (sgn != sign0n) & in_range & ~(absorb & first)
        newly = (~done) & flip
        exited = tc >= far

        col = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
        S = jnp.where(col == _M_SIGN, sign0n, S)
        S = jnp.where((col == _M_CROSS) & newly, 1.0, S)
        S = jnp.where((col == _M_THI) & newly, tc, S)
        S = jnp.where((col == _M_FHI) & newly, f, S)
        S = jnp.where((col == _M_FLO) & newly, f_prev, S)
        S = jnp.where((col == _M_DONE) & ((~done) & (flip | exited)), 1.0, S)
        adv = (~done) & ~flip & ~exited
        S = jnp.where(col == _M_K, k + jnp.where(adv, 1.0, 0.0), S)
        S = jnp.where(col == _M_FPREV, jnp.where(adv, f, f_prev), S)
        return S

    out_ref[:] = jax.lax.fori_loop(0, chunk_steps, body, state_ref[:])


@functools.partial(jax.jit,
                   static_argnames=("mean_is_spherical", "interpret"))
def _march_chunk(a, slope, amp, aux, state, params, mean_is_spherical,
                 interpret):
    R, n = a.shape
    grid = (R // RAYS_BLK,)
    bspec = pl.BlockSpec((RAYS_BLK, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((RAYS_BLK, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_march_kernel, MARCH_CHUNK, mean_is_spherical),
        out_shape=jax.ShapeDtypeStruct((R, 8), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            bspec, bspec, bspec, sspec, sspec,
        ],
        out_specs=sspec,
        interpret=interpret,
    )(params, a, slope, amp, aux, state)


def _hoisted_params(real, gp, ro, rd):
    """Per-ray affine phase parametrization + mean constants."""
    from . import means as mn
    b = real.basis
    n = b.freqs.shape[-1]
    proj_o = jnp.einsum("rnd,rd->rn", b.dirs, ro, precision="highest")
    proj_d = jnp.einsum("rnd,rd->rn", b.dirs, rd, precision="highest")
    a = b.freqs * proj_o + b.offsets
    slope = b.freqs * proj_d
    amp = real.weights * jnp.sqrt(2.0 / n)
    zero = jnp.zeros(3)
    scale = jnp.sqrt(gp.cov.cov(zero, zero))
    mean_is_spherical = isinstance(gp.mean, mn.SphericalMean)
    if mean_is_spherical:
        oc = ro - gp.mean.center[None, :]
        A = jnp.sum(oc * oc, axis=-1)
        B = jnp.sum(oc * rd, axis=-1)
        radius = jnp.asarray(gp.mean.radius, jnp.float32)
        m_off = jnp.float32(0.0)
    else:
        A = jnp.zeros(ro.shape[0])
        B = jnp.zeros(ro.shape[0])
        radius = jnp.float32(0.0)
        m_off = gp.mean.offset

    def value_of(t):
        nsum = jnp.sum(amp * jnp.cos(a + slope * t[:, None]), axis=1)
        if mean_is_spherical:
            d2 = A + t * (2.0 * B + t)
            m = jnp.sqrt(jnp.maximum(d2, 0.0)) - radius
        else:
            m = m_off
        return scale * nsum + m

    return (a, slope, amp, A, B, scale, radius, m_off, mean_is_spherical,
            value_of)


def fixed_march_batch(real, gp, ro, rd, near, far, step, u_jitter, absorb,
                      active=None, max_steps=2048, refine=True,
                      interpret=False):
    """Fixed-step sign-change march + Illinois refinement for weight-space
    media with step_size > 0 — the models/media.march contract
    ({hit, t, sign0}) with the per-step basis evaluation VMEM-resident.

    Scan semantics match media.march exactly: f0 at `near` fixes sign0, the
    first evaluated step sits at near + step * u_jitter, the first step
    after an interior scatter absorbs the sign (can't flip), flips count
    only inside [_, far), and the crossing is refined by 6 value-driven
    false-position steps inside [t_hi - step, t_hi]
    (SparseConvolutionNoiseMedium.cpp:132-174's step loop / :143-160's
    secant shrink for the reference semantics)."""
    R = ro.shape[0]
    (a, slope, amp, A, B, scale, radius, m_off, mean_is_spherical,
     value_of) = _hoisted_params(real, gp, ro, rd)

    f0 = value_of(near)
    sign0 = jnp.where(f0 < 0.0, -1.0, 1.0)
    t1 = near + step * u_jitter

    params = jnp.stack([scale, radius, m_off] + [jnp.float32(0.0)] * 5) \
        .reshape(1, 8).astype(jnp.float32)

    R_pad = -(-R // RAYS_BLK) * RAYS_BLK
    pad = R_pad - R

    def prep(x):
        return jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0)))

    a_p, slope_p = prep(a), prep(slope)
    amp_p = prep(amp)
    aux = jnp.stack([A, B, far, t1, step,
                     absorb.astype(jnp.float32)], axis=-1)
    aux_p = prep(jnp.concatenate([aux, jnp.zeros((R, 2))], axis=-1))

    done0 = jnp.zeros(R) if active is None \
        else (~active).astype(jnp.float32)
    state = jnp.stack([jnp.zeros(R), done0, jnp.zeros(R), far,
                       f0, jnp.zeros(R), sign0, f0], axis=-1)
    state_p = jnp.pad(state.astype(jnp.float32), ((0, pad), (0, 0)))
    if pad:
        state_p = state_p.at[R:, _M_DONE].set(1.0)

    n_outer = -(-max_steps // MARCH_CHUNK)

    def cond(c):
        i, S = c
        return (i < n_outer) & jnp.any(S[:, _M_DONE] < 0.5)

    def body(c):
        i, S = c
        S = _march_chunk(a_p, slope_p, amp_p, aux_p, S, params,
                         mean_is_spherical, interpret)
        return (i + 1, S)

    _, S = jax.lax.while_loop(cond, body, (jnp.int32(0), state_p))
    S = S[:R]
    crossed = S[:, _M_CROSS] > 0.5
    t_hi = S[:, _M_THI]
    sign0 = S[:, _M_SIGN]

    if not refine:
        return {"hit": crossed, "t": jnp.where(crossed, t_hi, far),
                "sign0": sign0}

    # Illinois false position (mirrors models/media.march refinement)
    def falsi(_, c):
        lo, hi, flo, fhi = c
        denom = flo - fhi
        mid_s = lo + flo * (hi - lo) / jnp.where(jnp.abs(denom) < 1e-30,
                                                 1.0, denom)
        mid = jnp.where((jnp.abs(denom) < 1e-30) | (mid_s <= lo)
                        | (mid_s >= hi), 0.5 * (lo + hi), mid_s)
        fm = value_of(jnp.where(crossed, mid, near))
        on_start_side = jnp.where(fm < 0, -1, 1) == sign0
        return (jnp.where(crossed & on_start_side, mid, lo),
                jnp.where(crossed & ~on_start_side, mid, hi),
                jnp.where(on_start_side, fm, flo * 0.5),
                jnp.where(on_start_side, fhi * 0.5, fm))

    lo0 = jnp.maximum(t_hi - step, near)
    lo, hi, _, _ = jax.lax.fori_loop(
        0, 6, falsi, (lo0, t_hi, S[:, _M_FLO], S[:, _M_FHI]))
    return {"hit": crossed, "t": jnp.where(crossed, hi, far),
            "sign0": sign0}


def sphere_trace_batch(real, gp, ro, rd, near, far, min_step=1e-3,
                       max_iters=256, interpret=False):
    """Batched adaptive sphere trace over [R] rays with per-ray RFF
    realizations (basis arrays [R, n]).  Same contract as
    vmap(sphere_trace_segment): returns (hit[R], t_hit[R])."""
    from . import means as mn
    from . import weight_space as ws

    b = real.basis
    R = ro.shape[0]
    n = b.freqs.shape[-1]

    # hoisted per-ray phase parametrization (affine in t)
    proj_o = jnp.einsum("rnd,rd->rn", b.dirs, ro, precision="highest")
    proj_d = jnp.einsum("rnd,rd->rn", b.dirs, rd, precision="highest")
    a = b.freqs * proj_o + b.offsets
    slope = b.freqs * proj_d
    amp = real.weights * jnp.sqrt(2.0 / n)

    zero = jnp.zeros(3)
    scale = jnp.sqrt(gp.cov.cov(zero, zero))
    f0, _ = jax.vmap(lambda rr, o, d, t: ws.evaluate(rr, gp, o + t * d))(
        real, ro, rd, near)
    sign0 = jnp.where(f0 < 0.0, -1.0, 1.0)

    mean_is_spherical = isinstance(gp.mean, mn.SphericalMean)
    if mean_is_spherical:
        oc = ro - gp.mean.center[None, :]
        A = jnp.sum(oc * oc, axis=-1)
        B = jnp.sum(oc * rd, axis=-1)
        radius = gp.mean.radius
        m_off = jnp.float32(0.0)
    else:
        A = jnp.zeros(R)
        B = jnp.zeros(R)
        radius = jnp.float32(0.0)
        m_off = gp.mean.offset
    lip_m = jnp.asarray(gp.mean.lipschitz(), jnp.float32)

    params = jnp.stack([scale, jnp.float32(min_step), lip_m,
                        jnp.asarray(radius, jnp.float32), m_off,
                        jnp.float32(0.0), jnp.float32(0.0),
                        jnp.float32(0.0)]).reshape(1, 8).astype(jnp.float32)

    R_pad = -(-R // RAYS_BLK) * RAYS_BLK
    pad = R_pad - R

    def prep(x):
        return jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0)))

    a_p, slope_p, amp_p = prep(a), prep(slope), prep(amp)
    aux = jnp.stack([A, B, far], axis=-1)
    aux = jnp.concatenate([aux, jnp.zeros((R, 5))], axis=-1)
    aux_p = prep(aux)

    step0 = jnp.maximum((far - near) * 0.05, min_step)
    state = jnp.stack([near, step0, jnp.zeros(R), jnp.zeros(R), sign0,
                       jnp.zeros(R)], axis=-1)
    state = jnp.concatenate([state, jnp.zeros((R, 2))], axis=-1)
    # padded rays start done
    state_p = jnp.pad(state.astype(jnp.float32), ((0, pad), (0, 0)))
    if pad:
        state_p = state_p.at[R:, _C_DONE].set(1.0)

    n_outer = -(-max_iters // CHUNK_ITERS)

    def cond(c):
        i, S = c
        return (i < n_outer) & jnp.any(S[:, _C_DONE] < 0.5)

    def body(c):
        i, S = c
        S = _trace_chunk(a_p, slope_p, amp_p, aux_p, S, params,
                         mean_is_spherical, interpret)
        return (i + 1, S)

    _, S = jax.lax.while_loop(cond, body, (jnp.int32(0), state_p))
    S = S[:R]
    hit = S[:, _C_HIT] > 0.5
    return hit, jnp.where(hit, S[:, _C_T], far)

"""Weight-space GP: random Fourier feature realizations.

TPU-native re-design of WeightSpaceGaussianProcess
(src/core/math/WeightSpaceGaussianProcess.{hpp,cpp}).  A realization is
f(p) = sqrt(cov(p,p)) * sqrt(2/n) * sum_i w_i cos(d_i . p f_i + phi_i) + mean(p)
with (d_i, f_i) drawn from the kernel's spectral density and w_i ~ N(0,1)
(WeightSpaceGaussianProcess.cpp:120-137, 160-216).  The basis is a pure
function of (pixel, sample, bounce) via the counter RNG, so no basis storage
is needed per ray — it is re-synthesized on the fly, which on TPU is cheaper
than gathering per-ray state.

The cosine sum over n basis functions vectorizes to a [n]-reduction per query;
`evaluate_many` turns a whole march into one [S, n] matmul-shaped contraction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import rng as trng
from ..utils.pytree import struct
from ..utils.vecmath import dot


@struct
class WeightSpaceBasis:
    """dirs [n,3] unit, freqs [n], offsets [n] (WeightSpaceGaussianProcess.hpp:11-40)."""
    dirs: jnp.ndarray
    freqs: jnp.ndarray
    offsets: jnp.ndarray

    @property
    def n(self):
        return self.dirs.shape[0]


@struct
class WeightSpaceRealization:
    basis: WeightSpaceBasis
    weights: jnp.ndarray  # [n] ~ N(0,1)


def sample_basis(cov, n, key, spectral_loc=None):
    """Draw n spectral samples (WeightSpaceBasis::sample, d==3 branch,
    WeightSpaceGaussianProcess.cpp:160-216)."""
    ctr = jnp.arange(n, dtype=jnp.uint32)
    offsets = trng.uniform(key, 1_000_000 + ctr) * (2.0 * jnp.pi)
    omega = jax.vmap(lambda c: cov.sample_spectral_3d(key, c, spectral_loc))(ctr)
    freqs = jnp.sqrt(jnp.maximum(dot(omega, omega), 1e-20))
    dirs = omega / freqs[:, None]
    return WeightSpaceBasis(dirs=dirs, freqs=freqs, offsets=offsets)


def sample_weights(n, key):
    idx = jnp.arange((n + 1) // 2, dtype=jnp.uint32)
    a, b = trng.normal2(key, 2_000_000 + idx)
    return jnp.stack([a, b], axis=-1).reshape(-1)[:n]


def realization_key(pss, global_seed, is_global_ctxt):
    """Basis/weights stream key from (pixel.x, pixel.y, spp, bounce)
    (WeightSpaceGaussianProcessMedium.cpp:74-78: Global strips the bounce)."""
    pss = pss.astype(jnp.uint32)
    w = jnp.zeros_like(pss[..., 3]) if is_global_ctxt else pss[..., 3]
    return (trng.xxhash32_4(pss[..., 0], pss[..., 1], pss[..., 2], w)
            + jnp.uint32(global_seed))


def sample_realization(cov, n, pss, global_seed, is_global_ctxt):
    key = realization_key(pss, global_seed, is_global_ctxt)
    basis = sample_basis(cov, n, key)
    weights = sample_weights(n, key + jnp.uint32(0x9E3779B9))
    return WeightSpaceRealization(basis=basis, weights=weights)


def evaluate(real, gp, p):
    """f(p) (WeightSpaceRealization::evaluate, :26-33). Returns (val, gp_id)."""
    b = real.basis
    scale = jnp.sqrt(gp.cov.cov(p, p))
    phase = jnp.einsum("nd,d->n", b.dirs, p, precision="highest") * b.freqs + b.offsets
    s = jnp.sum(real.weights * jnp.cos(phase)) * jnp.sqrt(2.0 / b.n)
    m, gp_id = gp.mean_and_id(p)
    return scale * s + m, gp_id


def evaluate_many(real, gp, pts):
    """Batched f over [S,3] points — one [S,n] contraction (MXU-friendly)."""
    b = real.basis
    scale = jnp.sqrt(jax.vmap(lambda p: gp.cov.cov(p, p))(pts))
    phase = pts @ (b.dirs * b.freqs[:, None]).T + b.offsets[None, :]
    s = (jnp.cos(phase) @ real.weights) * jnp.sqrt(2.0 / b.n)
    m, gp_id = gp.mean_and_id(pts)
    return scale * s + m, gp_id


def evaluate_gradient(real, gp, p):
    """Analytic RFF gradient (WeightSpaceRealization::evaluateGradient /
    WeightSpaceBasis::evaluateGradient, :129-137)."""
    b = real.basis
    scale = jnp.sqrt(gp.cov.cov(p, p))
    phase = jnp.einsum("nd,d->n", b.dirs, p, precision="highest") * b.freqs + b.offsets
    coeff = -jnp.sin(phase) * b.freqs * real.weights
    g = jnp.einsum("n,nd->d", coeff, b.dirs, precision="highest") * jnp.sqrt(2.0 / b.n)
    m, gp_id = gp.mean_and_id(p)
    mg = gp.mean_grad_by_id(p, gp_id)
    return scale * g + mg


def lipschitz(real, gp):
    """(WeightSpaceBasis::lipschitz, :150-157)"""
    b = real.basis
    l = jnp.sum(jnp.abs(real.weights * b.freqs)) * jnp.sqrt(2.0 / b.n)
    return jnp.sqrt(gp.cov.cov(jnp.zeros(3), jnp.zeros(3))) * l + gp.mean.lipschitz()


def _cos_interval(lo, hi):
    """Exact range of cos over the phase interval [lo, hi] (elementwise).

    Replaces the reference's affine-arithmetic aff_cos enclosure
    (AffineArithmetic.hpp:27-444) with the tight trigonometric interval:
    max is 1 iff [lo,hi] contains an even multiple of pi, min is -1 iff it
    contains an odd multiple; otherwise the extrema sit at the endpoints."""
    width = hi - lo
    c_lo = jnp.cos(lo)
    c_hi = jnp.cos(hi)
    cmin = jnp.minimum(c_lo, c_hi)
    cmax = jnp.maximum(c_lo, c_hi)
    two_pi = 2.0 * jnp.pi
    # does [lo, hi] contain 2k*pi?  floor comparison on lo/2pi vs hi/2pi
    k_even = jnp.floor(hi / two_pi) - jnp.floor(lo / two_pi) >= 1.0
    k_odd = (jnp.floor((hi - jnp.pi) / two_pi)
             - jnp.floor((lo - jnp.pi) / two_pi)) >= 1.0
    wide = width >= two_pi
    cmax = jnp.where(k_even | wide, 1.0, cmax)
    cmin = jnp.where(k_odd | wide, -1.0, cmin)
    return cmin, cmax


def range_bound_segment(real, gp, ro, rd, t0, t1):
    """Interval bound [lo, hi] of f over the ray segment [t0, t1]
    (WeightSpaceRealization::rangeBound, WeightSpaceGaussianProcess.cpp:
    91-118, used by the adaptive sphere trace at
    WeightSpaceGaussianProcessMedium.cpp:186-235).

    The noise term is exact per basis function (each phase is affine in t);
    the mean term uses midpoint +/- Lipschitz * half-length."""
    b = real.basis
    proj_o = jnp.einsum("nd,d->n", b.dirs, ro, precision="highest")
    proj_d = jnp.einsum("nd,d->n", b.dirs, rd, precision="highest")
    a = b.freqs * proj_o + b.offsets
    slope = b.freqs * proj_d
    th0 = a + slope * t0
    th1 = a + slope * t1
    lo_th = jnp.minimum(th0, th1)
    hi_th = jnp.maximum(th0, th1)
    cmin, cmax = _cos_interval(lo_th, hi_th)
    amp = real.weights * jnp.sqrt(2.0 / b.n)
    term_lo = jnp.minimum(amp * cmin, amp * cmax)
    term_hi = jnp.maximum(amp * cmin, amp * cmax)
    pm = ro + 0.5 * (t0 + t1)[..., None] * rd
    scale = jnp.sqrt(gp.cov.cov(pm, pm))
    n_lo = scale * jnp.sum(term_lo)
    n_hi = scale * jnp.sum(term_hi)
    m_mid, _ = gp.mean_and_id(pm)
    half = 0.5 * (t1 - t0) * gp.mean.lipschitz()
    return n_lo + m_mid - half, n_hi + m_mid + half


def sphere_trace_segment(real, gp, ro, rd, near, far, min_step=1e-3,
                         max_iters=256):
    """Adaptive range-bounded root search along [near, far]
    (WeightSpaceGaussianProcessMedium.cpp:186-235): grow the step while the
    segment bound excludes zero, shrink on a potential crossing; declare a
    hit when the step underflows min_step on a sign-ambiguous segment.

    Returns (hit, t_hit).  Designed for vmap over rays."""
    f0, _ = evaluate(real, gp, ro + near * rd)
    sign0 = jnp.where(f0 < 0.0, -1.0, 1.0)

    def cond(c):
        return (~c["done"]) & (c["it"] < max_iters)

    def body(c):
        t = c["t"]
        step = c["step"]
        lo, hi = range_bound_segment(real, gp, ro, rd, t, t + step)
        # zero cannot occur in segments where sign0 * bound stays positive
        no_cross = jnp.where(sign0 > 0, lo > 0.0, hi < 0.0)
        converged = (~no_cross) & (step <= min_step)
        t_new = jnp.where(no_cross, t + step, t)
        step_new = jnp.where(no_cross, step * 1.6, step * 0.5)
        step_new = jnp.maximum(step_new, min_step * 0.5)
        exited = t_new >= far
        return {
            "t": t_new, "step": jnp.minimum(step_new, far - t_new + 1e-6),
            "it": c["it"] + 1,
            "done": c["done"] | converged | exited,
            "hit": c["hit"] | converged,
        }

    init = {"t": near, "step": jnp.maximum((far - near) * 0.05, min_step),
            "it": jnp.int32(0), "done": jnp.asarray(False),
            "hit": jnp.asarray(False)}
    out = jax.lax.while_loop(cond, body, init)
    return out["hit"], jnp.where(out["hit"], out["t"], far)

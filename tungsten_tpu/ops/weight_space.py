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

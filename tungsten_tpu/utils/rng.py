"""Counter-based, seekable randomness for the GPIS evaluators.

The reference re-seeds a PCG sampler mid-evaluation per lattice cell
(`sampler.set_state(xxhash32(ijk, seed) + 1)`, reference
src/core/math/SparseConvolutionNoise.cpp:376,409) so that every noise query is
a pure function of (cell, seed).  On TPU the natural analog is a stateless
counter-based generator: a cell key is hashed once, then the k-th variate is
``hash(key, k)``.  This keeps the reference's "procedural, seekable
randomness" property with zero sequential state and full vectorization.

xxHash32 is a public-domain hash (Yann Collet); the 1/2/3/4-word specialized
forms below mirror the reference's MathUtil (src/core/math/MathUtil.hpp:179-224)
so seeds derived from (pixel, sample, bounce) stay structurally comparable.
Bit-exact parity with the reference RNG is NOT a goal (the reference draws
sequential PCG variates); distributional parity is what the tests check.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_P2 = np.uint32(2246822519)
_P3 = np.uint32(3266489917)
_P4 = np.uint32(668265263)
_P5 = np.uint32(374761393)


def _rotl17(x):
    return (x << np.uint32(17)) | (x >> np.uint32(15))


def _final(h):
    h = _P2 * (h ^ (h >> np.uint32(15)))
    h = _P3 * (h ^ (h >> np.uint32(13)))
    return h ^ (h >> np.uint32(16))


def _u32(x):
    return jnp.asarray(x).astype(jnp.uint32)


def xxhash32(p):
    """xxhash32 of a single uint32 (MathUtil.hpp:179-187)."""
    h = _u32(p) + _P5
    h = _P4 * _rotl17(h)
    return _final(h)


def xxhash32_2(x, y):
    """xxhash32 of two uint32 words (MathUtil.hpp:190-198; h from (x,y))."""
    h = _u32(y) + _P5 + _u32(x) * _P3
    h = _P4 * _rotl17(h)
    return _final(h)


def xxhash32_3(x, y, z):
    """xxhash32 of three uint32 words (MathUtil.hpp:200-210)."""
    h = _u32(z) + _P5 + _u32(x) * _P3
    h = _P4 * _rotl17(h)
    h = h + _u32(y) * _P3
    h = _P4 * _rotl17(h)
    return _final(h)


def xxhash32_4(x, y, z, w):
    """xxhash32 of four uint32 words (MathUtil.hpp:212-224)."""
    h = _u32(w) + _P5 + _u32(x) * _P3
    h = _P4 * _rotl17(h)
    h = h + _u32(y) * _P3
    h = _P4 * _rotl17(h)
    h = h + _u32(z) * _P3
    h = _P4 * _rotl17(h)
    return _final(h)


def u32_to_uniform(u):
    """uint32 -> float32 in [0, 1).

    Uses the top 24 bits so the result is exactly representable in float32
    (the reference's BitManip::normalizedUint serves the same purpose).
    """
    return (u >> np.uint32(8)).astype(jnp.float32) * np.float32(1.0 / (1 << 24))


def uniform(key, ctr):
    """The ctr-th U[0,1) variate of stream `key` (both uint32, broadcastable)."""
    return u32_to_uniform(xxhash32_2(key, ctr))


def uniform2(key, ctr):
    return uniform(key, 2 * _u32(ctr)), uniform(key, 2 * _u32(ctr) + 1)


def normal2(key, ctr):
    """Box-Muller pair of N(0,1) variates (reference sampling/Gaussian.cpp:21-33)."""
    u1 = uniform(key, 2 * _u32(ctr))
    u2 = uniform(key, 2 * _u32(ctr) + 1)
    r = jnp.sqrt(-2.0 * jnp.log1p(-u1))
    a = 2.0 * jnp.pi * u2
    return r * jnp.cos(a), r * jnp.sin(a)


def bernoulli_pm1(u):
    """±1 with p=1/2 from a uniform (MathUtil::Bernoulli, MathUtil.hpp:226-228)."""
    return jnp.where(u < 0.5, jnp.float32(-1.0), jnp.float32(1.0))

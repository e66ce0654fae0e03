"""Small vector/frame math on trailing-axis-3 jnp arrays.

Replaces the reference's Vec<T,N>/TangentFrame templates
(src/core/math/Vec.hpp, src/core/math/TangentFrame.hpp).  The tangent-frame
construction must match the reference's branchless Duff et al. 2017 basis
exactly — the frame choice decides *which* GP realization a ray samples, so
cross-implementation image comparisons depend on it
(TangentFrame.hpp:74-84).
"""
from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def length(a):
    # the floor keeps backward finite at |a|=0 (0-cotangent x inf = NaN)
    return jnp.sqrt(jnp.maximum(dot(a, a), 1e-24))


def length_sq(a):
    return dot(a, a)


def normalize(a, eps=0.0):
    return a / jnp.maximum(length(a), eps)[..., None] if eps else a / length(a)[..., None]


def safe_normalize(a, fallback=None):
    n = length(a)
    safe = n > 1e-20
    out = a / jnp.where(safe, n, 1.0)[..., None]
    if fallback is None:
        fallback = jnp.zeros_like(a).at[..., 0].set(1.0)
    return jnp.where(safe[..., None], out, fallback)


def cross(a, b):
    return jnp.cross(a, b)


def vec3(x, y, z):
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(z, jnp.float32)), axis=-1)


def reflect(w, n):
    """Mirror w about normal n (both pointing away from surface convention of caller)."""
    return 2.0 * dot(w, n)[..., None] * n - w


def tangent_frame(n):
    """Branchless orthonormal basis of Duff et al. 2017 (public algorithm;
    matches reference TangentFrame.hpp:74-84).  Returns (tangent, bitangent),
    with `n` the frame normal.  `n` must be normalized."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    bt = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return t, bt


def oriented_frame(n, tg):
    """Tangent frame whose BITANGENT follows a preferred direction `tg`
    (e.g. a fiber/strand tangent): b = normalize(tg projected off n),
    t = cross(b, n).  Falls back to the Duff ONB where |tg| ~ 0 or tg is
    (near-)parallel to n.  Matches the reference's curve shading frame
    (Curves.cpp tangentSpace: B = curve tangent) so fiber BCSDFs, whose
    local +y must be the strand direction, are oriented correctly."""
    t0, b0 = tangent_frame(n)
    proj = tg - n * dot(n, tg)[..., None]
    len2 = dot(proj, proj)
    ok = len2 > 1e-12
    b = jnp.where(ok[..., None],
                  proj / jnp.sqrt(jnp.maximum(len2, 1e-12))[..., None], b0)
    t = jnp.where(ok[..., None], jnp.cross(b, n), t0)
    return t, b


def frame_to_local(t, b, n, v):
    """World vector -> (tangent, bitangent, normal) coordinates."""
    return jnp.stack([dot(t, v), dot(b, v), dot(n, v)], axis=-1)


def frame_to_world(t, b, n, v):
    return t * v[..., 0:1] + b * v[..., 1:2] + n * v[..., 2:3]


def mat3_vec(m, v):
    """[...,3,3] @ [...,3] -> [...,3]."""
    return jnp.einsum("...ij,...j->...i", m, v, precision="highest")


def mat3_t_vec(m, v):
    return jnp.einsum("...ji,...j->...i", m, v, precision="highest")


def outer3(a, b):
    return a[..., :, None] * b[..., None, :]


def lerp(a, b, t):
    return a + (b - a) * t


def luminance(rgb):
    return (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1]
            + 0.0722 * rgb[..., 2])


def tlookup(table, idx):
    """Row lookup `table[idx]` for SMALL first-dimension tables via a
    one-hot contraction.  On TPU, per-lane dynamic gathers lower to scalar
    loops (~0.05 GB/s measured); for P <= a few dozen rows the arithmetic
    select fuses into neighbors for free.  Works batched (idx [...]) and
    for any table rank >= 1 / dtype (bool goes through any()).

    On CPU the one-hot expansion is a pessimization: XLA:CPU compiles the
    ~150 expanded contraction sites pathologically slowly (minutes per op
    — the r3 driver multichip dryrun timed out at 506s of pure compile),
    while its native gather is fine.  The scalar-gather pathology is
    TPU-only, so fall back to take() when tracing for CPU."""
    import jax

    if jax.default_backend() == "cpu":
        # preserve the one-hot contract: out-of-range idx (e.g. the -1
        # "no bsdf" sentinel) yields zeros, not a clipped row
        P = table.shape[0]
        idx = jnp.asarray(idx, jnp.int32)
        ok = (idx >= 0) & (idx < P)
        out = jnp.take(table, jnp.clip(idx, 0, P - 1), axis=0)
        okx = ok.reshape(ok.shape + (1,) * (table.ndim - 1))
        if table.dtype == jnp.bool_:
            return out & okx
        return jnp.where(okx, out, 0)
    P = table.shape[0]
    idx = jnp.asarray(idx, jnp.int32)
    oh = idx[..., None] == jnp.arange(P, dtype=jnp.int32)  # [..., P]
    extra = table.ndim - 1
    ohx = oh.reshape(oh.shape + (1,) * extra)
    t = table.reshape((1,) * (oh.ndim - 1) + table.shape)
    if table.dtype == jnp.bool_:
        return jnp.any(ohx & t, axis=-1 - extra)
    return jnp.sum(jnp.where(ohx, t, 0), axis=-1 - extra)

"""Pallas TPU kernel for the sparse-convolution noise sum — the paper's
innermost hot loop as a single fused Mosaic kernel.

This is the Pallas target named in SURVEY.md §3.4: per query point, 27
hash-seeded cells x `impulse_count` Bernoulli impulses x an exp splat,
normalized outside.  Compared to the XLA fast path (ops/sparse_conv_fast.py)
the kernel (a) is compiled once by Mosaic and reused as a custom call at
every march/bisection/IFT instantiation — collapsing the XLA graph that
otherwise repeats a ~3k-op subgraph ~10x per bounce — and (b) keeps every
intermediate in VMEM registers with rays on lanes.

The kernel is generalized over per-lane cell radius `kr` and per-lane
quadratic-form scale `qm`, which lets ONE kernel serve stationary
covariances (kr, qm constant), the Paciorek nonstationary wrapper
(qm = 1/lateralScale(p)^2, GPFunctions.cpp:1219-1332), and each level of
multi-resolution noise (kr, qm per-point level scales,
SparseConvolutionNoise.cpp:60-123).

Scope: the raw noise lattice sum only.  Mean, amplitude, variance
normalization and conditioning splats stay in XLA where they are cheap and
differentiable.

Differentiability: `noise3d_sum` carries a custom VJP.  The forward pass is
the Mosaic kernel; the backward pass evaluates the analytic derivatives of
the same lattice sum (w.r.t. the query points, the splat quadratic form m6,
the cell radius and qm) through an XLA re-trace of the identical math — the
manual splat derivatives the reference keeps at GPFunctions.cpp:804-865.
The bulk of the march is detached (models/media.py), so the backward runs
only for the few differentiable evaluations (IFT reattachment, conditioning).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_P2 = np.uint32(2246822519)
_P3 = np.uint32(3266489917)
_P4 = np.uint32(668265263)
_P5 = np.uint32(374761393)

LANES = 128
SUBLANES = 8
BLK = SUBLANES * LANES  # rays per grid step


def _rotl17(x):
    return (x << np.uint32(17)) | (x >> np.uint32(15))


def _final(h):
    h = _P2 * (h ^ (h >> np.uint32(15)))
    h = _P3 * (h ^ (h >> np.uint32(13)))
    return h ^ (h >> np.uint32(16))


def _xxhash32_2(x, y):
    h = y + _P5 + x * _P3
    h = _P4 * _rotl17(h)
    return _final(h)


def _xxhash32_4(x, y, z, w):
    h = w + _P5 + x * _P3
    h = _P4 * _rotl17(h)
    h = h + y * _P3
    h = _P4 * _rotl17(h)
    h = h + z * _P3
    h = _P4 * _rotl17(h)
    return _final(h)


def _u01(u):
    # Mosaic lacks a direct u32->f32 cast; the top-24-bit value fits i32
    return ((u >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32)
            * np.float32(1.0 / (1 << 24)))


def _lattice_sum(px, py, pz, seed, kr, qm, m6_tuple, impulse_count):
    """The 27-cell x K impulse sum, shared verbatim by the Mosaic kernel and
    the XLA backward re-trace (cell3D, SparseConvolutionNoise.cpp:362-395).

    All of px/py/pz/seed/kr/qm are same-shaped arrays; m6_tuple holds the 6
    unique entries of the unit-scale splat quadratic form."""
    m00, m11, m22, m01, m02, m12 = m6_tuple
    inv_r = 1.0 / kr
    gx = px * inv_r
    gy = py * inv_r
    gz = pz * inv_r
    bx = jnp.floor(gx)
    by = jnp.floor(gy)
    bz = jnp.floor(gz)
    fx, fy, fz = gx - bx, gy - by, gz - bz
    ix = bx.astype(jnp.int32).astype(jnp.uint32)
    iy = by.astype(jnp.int32).astype(jnp.uint32)
    iz = bz.astype(jnp.int32).astype(jnp.uint32)

    total = jnp.zeros_like(px)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                cx = ix + np.uint32(dx & 0xFFFFFFFF)
                cy = iy + np.uint32(dy & 0xFFFFFFFF)
                cz = iz + np.uint32(dz & 0xFFFFFFFF)
                h = _xxhash32_4(cz, cy, cx, seed) + np.uint32(1)
                qx = fx - np.float32(dx)
                qy = fy - np.float32(dy)
                qz = fz - np.float32(dz)
                for k in range(impulse_count):
                    ux = _u01(_xxhash32_2(h, np.uint32(4 * k)))
                    uy = _u01(_xxhash32_2(h, np.uint32(4 * k + 1)))
                    uz = _u01(_xxhash32_2(h, np.uint32(4 * k + 2)))
                    uw = _u01(_xxhash32_2(h, np.uint32(4 * k + 3)))
                    ddx = qx - ux
                    ddy = qy - uy
                    ddz = qz - uz
                    r2 = ddx * ddx + ddy * ddy + ddz * ddz
                    abx = kr * ddx
                    aby = kr * ddy
                    abz = kr * ddz
                    q = (m00 * abx * abx + m11 * aby * aby
                         + m22 * abz * abz
                         + 2.0 * (m01 * abx * aby + m02 * abx * abz
                                  + m12 * aby * abz))
                    if qm is not None:
                        q = qm * q
                    w = jnp.where(uw < 0.5, -1.0, 1.0)
                    total = total + jnp.where(r2 < 1.0, w * jnp.exp(-q), 0.0)
    return total


def _noise_kernel(impulse_count, params_ref, px_ref, py_ref, pz_ref,
                  seed_ref, kr_ref, qm_ref, out_ref):
    """params (SMEM, (1, 8)): [m00, m11, m22, m01, m02, m12, _, _]."""
    m6 = tuple(params_ref[0, i] for i in range(6))
    out_ref[:] = _lattice_sum(px_ref[:], py_ref[:], pz_ref[:], seed_ref[:],
                              kr_ref[:], qm_ref[:], m6, impulse_count)


def _noise_kernel_scalar(impulse_count, params_ref, px_ref, py_ref, pz_ref,
                         seed_ref, out_ref):
    """Scalar-kr variant (stationary hot path): params (SMEM, (1, 8)) =
    [m00, m11, m22, m01, m02, m12, kr, _] with the scalar qm pre-folded
    into m6 by the caller — the per-impulse inner loop stays free of both
    per-lane radius reciprocals and the extra qm multiply (a dependent
    multiply per impulse costs ~25% kernel time on the VPU)."""
    m6 = tuple(params_ref[0, i] for i in range(6))
    kr = params_ref[0, 6]
    out_ref[:] = _lattice_sum(px_ref[:], py_ref[:], pz_ref[:], seed_ref[:],
                              kr, None, m6, impulse_count)


def _ref_sum(p_space, seed, kernel_r, qm, m6, impulse_count):
    """XLA re-trace of the kernel's lattice sum — identical math/hashes; used
    only for the backward pass (jax.vjp) of the custom VJP below."""
    m6_tuple = (m6[0], m6[1], m6[2], m6[3], m6[4], m6[5])
    return _lattice_sum(p_space[:, 0], p_space[:, 1], p_space[:, 2], seed,
                        kernel_r, qm, m6_tuple, impulse_count)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _noise3d_sum(p_space, seed, kernel_r, qm, m6, impulse_count, interpret):
    return _noise3d_sum_fwd(p_space, seed, kernel_r, qm, m6, impulse_count,
                            interpret)[0]


def _noise3d_sum_fwd(p_space, seed, kernel_r, qm, m6, impulse_count,
                     interpret):
    out = _noise3d_sum_pallas(p_space, seed, kernel_r, qm, m6,
                              impulse_count=impulse_count,
                              interpret=interpret)
    return out, (p_space, seed, kernel_r, qm, m6)


def _noise3d_sum_bwd(impulse_count, interpret, res, g):
    p_space, seed, kernel_r, qm, m6 = res
    _, vjp = jax.vjp(
        lambda p, kr, q, m: _ref_sum(p, seed, kr, q, m, impulse_count),
        p_space, kernel_r, qm, m6)
    dp, dkr, dqm, dm6 = vjp(g)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dp, dseed, dkr, dqm, dm6


_noise3d_sum.defvjp(_noise3d_sum_fwd, _noise3d_sum_bwd)


def noise3d_sum(p_space, seed, kernel_r, m6, qm=None, impulse_count=3,
                interpret=False):
    """Raw 27-cell impulse sum at p_space [N,3] with per-ray seeds [N].

    kernel_r: cell radius, scalar or per-lane [N]; m6: the 6 unique entries
    of the unit-scale splat quadratic form (xx, yy, zz, xy, xz, yz); qm:
    optional per-lane scale on the quadratic form (nonstationary lateral
    scale / multi-res level).  Returns [N] f32.  Differentiable w.r.t.
    p_space / kernel_r / qm / m6 (custom VJP; XLA backward)."""
    n = p_space.shape[0]
    kr = jnp.asarray(kernel_r, jnp.float32)
    qmv = jnp.ones((), jnp.float32) if qm is None \
        else jnp.asarray(qm, jnp.float32)
    # rank-0 kr AND qm -> scalar-parameter kernel (SMEM constants, leaner
    # inner loop); any per-lane input -> the generalized vector kernel
    if kr.ndim == 0 and qmv.ndim == 0:
        return _noise3d_sum_s(jnp.asarray(p_space, jnp.float32),
                              jnp.asarray(seed, jnp.uint32),
                              kr, qmv, jnp.asarray(m6, jnp.float32),
                              int(impulse_count), bool(interpret))
    kr = jnp.broadcast_to(kr, (n,))
    qmv = jnp.broadcast_to(qmv, (n,))
    return _noise3d_sum(jnp.asarray(p_space, jnp.float32),
                        jnp.asarray(seed, jnp.uint32),
                        kr, qmv, jnp.asarray(m6, jnp.float32),
                        int(impulse_count), bool(interpret))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _noise3d_sum_s(p_space, seed, kernel_r, qm, m6, impulse_count, interpret):
    return _noise3d_sum_s_fwd(p_space, seed, kernel_r, qm, m6, impulse_count,
                              interpret)[0]


def _noise3d_sum_s_fwd(p_space, seed, kernel_r, qm, m6, impulse_count,
                       interpret):
    out = _noise3d_sum_pallas_s(p_space, seed, kernel_r, qm * m6,
                                impulse_count=impulse_count,
                                interpret=interpret)
    return out, (p_space, seed, kernel_r, qm, m6)


def _noise3d_sum_s_bwd(impulse_count, interpret, res, g):
    p_space, seed, kernel_r, qm, m6 = res
    _, vjp = jax.vjp(
        lambda p, kr, q, m: _ref_sum(p, seed, kr, q, m, impulse_count),
        p_space, kernel_r, qm, m6)
    dp, dkr, dqm, dm6 = vjp(g)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dp, dseed, dkr, dqm, dm6


_noise3d_sum_s.defvjp(_noise3d_sum_s_fwd, _noise3d_sum_s_bwd)


@functools.partial(jax.jit, static_argnames=("impulse_count", "interpret"))
def _noise3d_sum_pallas_s(p_space, seed, kernel_r, m6, impulse_count=3,
                          interpret=False):
    """m6 here is the qm-prefolded quadratic form."""
    n = p_space.shape[0]
    n_pad = -(-n // BLK) * BLK
    pad = n_pad - n

    def prep(x, dtype):
        x = jnp.pad(x.astype(dtype), (0, pad))
        return x.reshape(n_pad // LANES, LANES)

    px = prep(p_space[:, 0], jnp.float32)
    py = prep(p_space[:, 1], jnp.float32)
    pz = prep(p_space[:, 2], jnp.float32)
    sd = prep(seed, jnp.uint32)

    params = jnp.stack([m6[0], m6[1], m6[2], m6[3], m6[4], m6[5],
                        kernel_r,
                        jnp.float32(0.0)]).reshape(1, 8).astype(jnp.float32)

    grid = (n_pad // BLK,)
    vspec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_noise_kernel_scalar, impulse_count),
        out_shape=jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            vspec, vspec, vspec, vspec,
        ],
        out_specs=vspec,
        interpret=interpret,
    )(params, px, py, pz, sd)

    return out.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# 1D (along-ray) lattice sum — the mirror-1d hot loop as a Mosaic kernel
# (noise1D/cell1D, SparseConvolutionNoise.cpp:397-428).  3 cells x K
# impulses on the iso-ray z axis; splat exp(-a d^2) with a = qm*kr^2/2
# folded by the caller (SE-family 1D splats, GPFunctions.hpp splat kernels).
# ---------------------------------------------------------------------------


def _lattice_sum_1d(pz, seed, kr, inv_r, impulse_count):
    """3-cell x K impulse 1D sum; pz/seed are same-shaped arrays; kr and
    inv_r are scalars (cell radius and its reciprocal).  The SE-family 1D
    splat exp(-0.5 (kr d)^2) is computed in the same operation order as the
    XLA twin (sparse_conv_fast.make_value_at_1d) for bit-exact parity.
    Shared by the Mosaic kernel and the XLA backward re-trace."""
    tg = pz * inv_r
    b = jnp.floor(tg)
    fr = tg - b
    i0 = b.astype(jnp.int32).astype(jnp.uint32)
    total = jnp.zeros_like(pz)
    for off in (-1, 0, 1):
        cell = i0 + np.uint32(off & 0xFFFFFFFF)
        h = _xxhash32_2(cell, seed) + np.uint32(1)
        q = fr - np.float32(off)
        for k in range(impulse_count):
            ti = _u01(_xxhash32_2(h, np.uint32(2 * k)))
            w = jnp.where(_u01(_xxhash32_2(h, np.uint32(2 * k + 1))) < 0.5,
                          -1.0, 1.0)
            d = q - ti
            dt = kr * d
            total = total + jnp.where(d * d < 1.0,
                                      w * jnp.exp(-0.5 * dt * dt), 0.0)
    return total


def _noise_kernel_1d(impulse_count, params_ref, pz_ref, seed_ref, out_ref):
    """params (SMEM, (1, 2)): [kr, inv_r]."""
    out_ref[:] = _lattice_sum_1d(pz_ref[:], seed_ref[:], params_ref[0, 0],
                                 params_ref[0, 1], impulse_count)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _noise1d_sum(pz, seed, kr, inv_r, impulse_count, interpret):
    return _noise1d_sum_fwd(pz, seed, kr, inv_r, impulse_count,
                            interpret)[0]


def _noise1d_sum_fwd(pz, seed, kr, inv_r, impulse_count, interpret):
    out = _noise1d_sum_pallas(pz, seed, kr, inv_r,
                              impulse_count=impulse_count,
                              interpret=interpret)
    return out, (pz, seed, kr, inv_r)


def _noise1d_sum_bwd(impulse_count, interpret, res, g):
    pz, seed, kr, inv_r = res
    _, vjp = jax.vjp(
        lambda p, a, ir: _lattice_sum_1d(p, seed, a, ir, impulse_count),
        pz, kr, inv_r)
    dp, dkr, dir_ = vjp(g)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dp, dseed, dkr, dir_


_noise1d_sum.defvjp(_noise1d_sum_fwd, _noise1d_sum_bwd)


def noise1d_sum(pz, seed, kernel_r, impulse_count=3, interpret=False):
    """Raw 3-cell 1D impulse sum at iso-ray coordinates pz [N] with per-ray
    seeds [N]; kernel_r: scalar cell radius (SE-family splat
    exp(-0.5 (kernel_r d)^2), d in cell units).  Differentiable w.r.t.
    pz / kernel_r (custom VJP; XLA backward)."""
    kr = jnp.asarray(kernel_r, jnp.float32)
    return _noise1d_sum(jnp.asarray(pz, jnp.float32),
                        jnp.asarray(seed, jnp.uint32),
                        kr, 1.0 / kr,
                        int(impulse_count), bool(interpret))


@functools.partial(jax.jit, static_argnames=("impulse_count", "interpret"))
def _noise1d_sum_pallas(pz, seed, kr, inv_r, impulse_count=3,
                        interpret=False):
    n = pz.shape[0]
    n_pad = -(-n // BLK) * BLK
    pad = n_pad - n

    def prep(x, dtype):
        x = jnp.pad(x.astype(dtype), (0, pad))
        return x.reshape(n_pad // LANES, LANES)

    pzp = prep(pz, jnp.float32)
    sd = prep(seed, jnp.uint32)
    params = jnp.stack([kr, inv_r]).reshape(1, 2).astype(jnp.float32)

    grid = (n_pad // BLK,)
    vspec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_noise_kernel_1d, impulse_count),
        out_shape=jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            vspec, vspec,
        ],
        out_specs=vspec,
        interpret=interpret,
    )(params, pzp, sd)

    return out.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("impulse_count", "interpret"))
def _noise3d_sum_pallas(p_space, seed, kernel_r, qm, m6, impulse_count=3,
                        interpret=False):
    n = p_space.shape[0]
    n_pad = -(-n // BLK) * BLK
    pad = n_pad - n

    def prep(x, dtype):
        x = jnp.pad(x.astype(dtype), (0, pad),
                    constant_values=1 if dtype == jnp.float32 else 0)
        return x.reshape(n_pad // LANES, LANES)

    px = prep(p_space[:, 0], jnp.float32)
    py = prep(p_space[:, 1], jnp.float32)
    pz = prep(p_space[:, 2], jnp.float32)
    sd = prep(seed, jnp.uint32)
    kr = prep(kernel_r, jnp.float32)  # pad with 1 to avoid 1/0 on pad lanes
    qmv = prep(qm, jnp.float32)

    params = jnp.stack([m6[0], m6[1], m6[2], m6[3], m6[4], m6[5],
                        jnp.float32(0.0),
                        jnp.float32(0.0)]).reshape(1, 8).astype(jnp.float32)

    grid = (n_pad // BLK,)
    blk_rows = SUBLANES

    vspec = pl.BlockSpec((blk_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_noise_kernel, impulse_count),
        out_shape=jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            vspec, vspec, vspec, vspec, vspec, vspec,
        ],
        out_specs=vspec,
        interpret=interpret,
    )(params, px, py, pz, sd, kr, qmv)

    return out.reshape(-1)[:n]

"""Lane-efficient batched sparse-conv value evaluator for the march hot loop.

The clean per-ray evaluator in ops/sparse_conv.py, vmapped, produces
[R, 27, K] / [R, 27, K, 3] intermediates whose minor dimensions waste VPU
lanes (TPU tiles are (8, 128); a trailing dim of 3 pads 42x).  This module
evaluates the same math in structure-of-arrays form: every intermediate is a
flat [R] vector (rays on lanes), the 27-cell x impulse loop is Python-unrolled
at trace time, and all per-ray constants (seeds, space transforms, variance
normalization, conditioning-splat coefficients) are hoisted out of the march
step.  Numerically identical to the reference path (tests cross-check).

Covers: 3D sampling in world / isotropic / isotropic-ray space, stationary
covariance, with Renewal/Renewal+ conditioning splats.  1D sampling and
multi-resolution noise fall back to the general evaluator.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import rng
from ..utils.vecmath import dot, frame_to_local, normalize, tangent_frame
from . import sparse_conv as sc

_U1 = np.uint32(1)


def supports(cfg, gp):
    return (not cfg.one_d) and (not cfg.multi_res(gp)) and gp.cov.is_stationary


def _quadform_coeffs(m):
    """Symmetric 3x3 -> 6 scalars (xx, yy, zz, xy, xz, yz)."""
    return (m[0, 0], m[1, 1], m[2, 2], m[0, 1], m[0, 2], m[1, 2])


def _quad(mc, x, y, z):
    xx, yy, zz, xy, xz, yz = mc
    return (xx * x * x + yy * y * y + zz * z * z
            + 2.0 * (xy * x * y + xz * x * z + yz * y * z))


def _use_pallas():
    """Use the Mosaic kernel for the lattice sum (default on accelerators;
    TUNGSTEN_TPU_PALLAS=0/1 overrides; interpret-mode on CPU for tests)."""
    import os
    v = os.environ.get("TUNGSTEN_TPU_PALLAS")
    if v is not None:
        return v not in ("0", "false")
    import jax
    return jax.default_backend() != "cpu"


def make_value_at(cfg, gp, coeff3, ro, rd, pss, scene_seed):
    """Build value_at(t[R]) -> (f[R], gp_id[R]) for rays ro + t*rd.

    Precomputes per-ray sampling-space ray parametrization so each march step
    is pure [R]-vector arithmetic (evaluateValue / evaluateNoise3D*,
    SparseConvolutionNoise.cpp:73-89, 251-320 — same math, SoA layout)."""
    cov = gp.cov
    R = ro.shape[0]
    seed = sc.compute_seed(cfg, pss, scene_seed)  # [R]
    amp = cov.amplitude(ro)  # [R] (stationary: constant)

    if not cfg.isotropic_3d:
        # world space: sampling space == world, anisotropic splat
        kernel_r = cov.splat_radius(False, 1.0)
        ro_s, rd_s = ro, rd
        m_noise = _quadform_coeffs(
            cov._inv_cov_mtx(False, False, 1.0, ro))
        m_cond = _quadform_coeffs(cov._inv_cov_mtx(True, False, 1.0, ro))
        norm = jnp.sqrt(cov.variance3(ro, cfg.impulse_density, kernel_r,
                                      False, 1.0))
    else:
        kernel_r = cov.splat_radius(True, 1.0)
        w2l = cov.world_to_local
        ro_s = ro @ w2l.T
        rd_s = rd @ w2l.T
        if cfg.isotropic_ray_3d:
            rdi = normalize(rd_s)
            tg, bt = tangent_frame(rdi)
            # rotate into the per-ray frame: rows (t, b, n)
            ro_s = jnp.stack([dot(ro_s, tg), dot(ro_s, bt), dot(ro_s, rdi)],
                             axis=-1)
            rd_s = jnp.stack([dot(rd_s, tg), dot(rd_s, bt), dot(rd_s, rdi)],
                             axis=-1)
        m_noise = (0.5, 0.5, 0.5, 0.0, 0.0, 0.0)
        m_cond = (0.25, 0.25, 0.25, 0.0, 0.0, 0.0)
        norm = jnp.sqrt(cov.variance3(ro, cfg.impulse_density, kernel_r,
                                      True, 1.0))

    inv_norm = 1.0 / norm

    # conditioning-splat constants in sampling space
    use_cond = cfg.activate_conditioning
    if use_cond:
        if not cfg.isotropic_3d:
            o_s = coeff3.ray_origin
            g_s = coeff3.gradient_scale
        else:
            o_s = coeff3.ray_origin @ cov.world_to_local.T
            g_s = coeff3.gradient_scale
            if cfg.isotropic_ray_3d:
                o_s = jnp.stack([dot(o_s, tg), dot(o_s, bt), dot(o_s, rdi)],
                                axis=-1)
        vsc = coeff3.value_scale
        osx, osy, osz = o_s[:, 0], o_s[:, 1], o_s[:, 2]
        gsx, gsy, gsz = g_s[:, 0], g_s[:, 1], g_s[:, 2]

    rox, roy, roz = ro_s[:, 0], ro_s[:, 1], ro_s[:, 2]
    rdx, rdy, rdz = rd_s[:, 0], rd_s[:, 1], rd_s[:, 2]
    rwx, rwy, rwz = ro[:, 0], ro[:, 1], ro[:, 2]
    dwx, dwy, dwz = rd[:, 0], rd[:, 1], rd[:, 2]
    inv_r = 1.0 / kernel_r
    K = cfg.impulse_count
    use_pallas = _use_pallas()

    def _lattice_sum_pallas(px, py, pz):
        """Fused Mosaic kernel for the 27xK impulse sum."""
        import jax as _jax
        from . import sparse_conv_pallas as scp
        shape = px.shape
        p_flat = jnp.stack([px.reshape(-1), py.reshape(-1),
                            pz.reshape(-1)], axis=-1)
        seed_flat = jnp.broadcast_to(seed, shape).reshape(-1)
        m6 = jnp.stack([jnp.asarray(m, jnp.float32) for m in m_noise])
        total = scp.noise3d_sum(p_flat, seed_flat,
                                jnp.asarray(kernel_r, jnp.float32), m6,
                                impulse_count=K,
                                interpret=_jax.default_backend() == "cpu")
        return total.reshape(shape)

    def value_at(t):
        # sampling-space position, [R] per component
        px = rox + t * rdx
        py = roy + t * rdy
        pz = roz + t * rdz

        gx, gy, gz = px * inv_r, py * inv_r, pz * inv_r
        bx, by, bz = jnp.floor(gx), jnp.floor(gy), jnp.floor(gz)
        fx, fy, fz = gx - bx, gy - by, gz - bz
        ix = bx.astype(jnp.int32).astype(jnp.uint32)
        iy = by.astype(jnp.int32).astype(jnp.uint32)
        iz = bz.astype(jnp.int32).astype(jnp.uint32)

        if use_pallas:
            total = _lattice_sum_pallas(px, py, pz)
            val = total * inv_norm
            if use_cond:
                ddx = px - osx
                ddy = py - osy
                ddz = pz - osz
                q0 = _quad(m_cond, ddx, ddy, ddz)
                f0 = jnp.exp(-q0)
                xx, yy, zz, xy, xz, yz = m_cond
                d0x = -2.0 * (xx * ddx + xy * ddy + xz * ddz)
                d0y = -2.0 * (xy * ddx + yy * ddy + yz * ddz)
                d0z = -2.0 * (xz * ddx + yz * ddy + zz * ddz)
                val = val + (vsc + d0x * gsx + d0y * gsy + d0z * gsz) * f0
            pw = jnp.stack([rwx + t * dwx, rwy + t * dwy, rwz + t * dwz],
                           axis=-1)
            m, gp_id = gp.mean_and_id(pw)
            return amp * val + m, gp_id

        total = jnp.zeros(R, jnp.float32)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    cx = ix + np.uint32(dx & 0xFFFFFFFF)
                    cy = iy + np.uint32(dy & 0xFFFFFFFF)
                    cz = iz + np.uint32(dz & 0xFFFFFFFF)
                    # cell3D seeding order (SparseConvolutionNoise.cpp:376)
                    h = rng.xxhash32_4(cz, cy, cx, seed) + _U1
                    qx = fx - np.float32(dx)
                    qy = fy - np.float32(dy)
                    qz = fz - np.float32(dz)
                    for k in range(K):
                        ux = rng.uniform(h, np.uint32(4 * k))
                        uy = rng.uniform(h, np.uint32(4 * k + 1))
                        uz = rng.uniform(h, np.uint32(4 * k + 2))
                        uw = rng.uniform(h, np.uint32(4 * k + 3))
                        ddx = qx - ux
                        ddy = qy - uy
                        ddz = qz - uz
                        r2 = ddx * ddx + ddy * ddy + ddz * ddz
                        q = _quad(m_noise, kernel_r * ddx, kernel_r * ddy,
                                  kernel_r * ddz)
                        w = jnp.where(uw < 0.5, -1.0, 1.0)
                        total = total + jnp.where(r2 < 1.0,
                                                  w * jnp.exp(-q), 0.0)
        val = total * inv_norm

        if use_cond:
            ddx = px - osx
            ddy = py - osy
            ddz = pz - osz
            q0 = _quad(m_cond, ddx, ddy, ddz)
            f0 = jnp.exp(-q0)
            # d = -2 Mc dd;  val += (vs + d . gs) * f0
            xx, yy, zz, xy, xz, yz = m_cond
            d0x = -2.0 * (xx * ddx + xy * ddy + xz * ddz)
            d0y = -2.0 * (xy * ddx + yy * ddy + yz * ddz)
            d0z = -2.0 * (xz * ddx + yz * ddy + zz * ddz)
            val = val + (vsc + d0x * gsx + d0y * gsy + d0z * gsz) * f0

        # mean + id (mean_weight_space min, GaussianProcess.cpp:379-393)
        pw = jnp.stack([rwx + t * dwx, rwy + t * dwy, rwz + t * dwz], axis=-1)
        m, gp_id = gp.mean_and_id(pw)
        return amp * val + m, gp_id

    return value_at

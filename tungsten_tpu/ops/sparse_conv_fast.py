"""Lane-efficient batched sparse-conv value evaluator for the march hot loop.

The clean per-ray evaluator in ops/sparse_conv.py, vmapped, produces
[R, 27, K] / [R, 27, K, 3] intermediates whose minor dimensions waste VPU
lanes (TPU tiles are (8, 128); a trailing dim of 3 pads 42x).  This module
evaluates the same math in structure-of-arrays form: every intermediate is a
flat [R] vector (rays on lanes), the 27-cell x impulse loop is Python-unrolled
at trace time, and all per-ray constants (seeds, space transforms, variance
normalization, conditioning-splat coefficients) are hoisted out of the march
step.  Numerically identical to the reference path (tests cross-check).

Covers 3D sampling in world / isotropic / isotropic-ray space with
Renewal/Renewal+/Global conditioning splats, for
  - stationary covariances (SquaredExponential family quadratic-form splats),
  - the Paciorek procedural/grid nonstationary wrapper in both brute-force
    (GPFunctions.cpp:1219-1332 — per-point lateral scale folded into the
    splat quadratic form) and multi-resolution grid mode
    (SparseConvolutionNoise.cpp:60-123 — two per-point levels of the
    lattice sum blended by kernelScaleLevelRatio).
The per-level lattice sums run through one generalized evaluator with
per-lane cell radius `kr`, per-lane quadratic-form scale `qm`, and per-lane
seeds; only 1D sampling and anisotropic (mean-grad) nonstationarity fall
back to the general evaluator.
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
    if cfg.one_d:
        return False
    if gp.cov.is_stationary:
        return True
    from .nonstationary import ProceduralNonstationaryCov
    return isinstance(gp.cov, ProceduralNonstationaryCov)


def supports_1d(cfg, gp):
    """SoA fast path for 1D (along-ray) sampling: stationary covariances
    (the mirror-1d scene family).  Multi-res 1D needs per-point level
    ratios and stays on the general evaluator."""
    return cfg.one_d and gp.cov.is_stationary


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


def _lattice_sum_xla(px, py, pz, seed, kr, qm, m6, K):
    """Unrolled-XLA twin of the Mosaic kernel: 27-cell x K impulse sum with
    per-lane cell radius `kr` and quadratic-form scale `qm` (all [R])."""
    inv_r = 1.0 / kr
    gx, gy, gz = px * inv_r, py * inv_r, pz * inv_r
    bx, by, bz = jnp.floor(gx), jnp.floor(gy), jnp.floor(gz)
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
                    q = qm * _quad(m6, kr * ddx, kr * ddy, kr * ddz)
                    w = jnp.where(uw < 0.5, -1.0, 1.0)
                    total = total + jnp.where(r2 < 1.0,
                                              w * jnp.exp(-q), 0.0)
    return total


def make_value_at(cfg, gp, coeff3, ro, rd, pss, scene_seed):
    """Build value_at(t[R]) -> (f[R], gp_id[R]) for rays ro + t*rd.

    Precomputes per-ray sampling-space ray parametrization so each march step
    is pure [R]-vector arithmetic (evaluateValue / evaluateNoise3D*,
    SparseConvolutionNoise.cpp:73-89, 251-320 — same math, SoA layout).
    Multi-res / nonstationary configs add per-lane level scales
    (SparseConvolutionNoise.cpp:60-123, GPFunctions.cpp:1219-1332)."""
    cov = gp.cov
    R = ro.shape[0]
    seed0 = sc.compute_seed(cfg, pss, scene_seed)  # [R]
    stationary = cov.is_stationary
    multi_res = cfg.multi_res(gp)
    base = cov if stationary else cov.base
    # brute-force nonstationary folds max lateral scale into the transforms
    max_ls = np.float32(1.0 if (stationary or multi_res) else cov.max_ls)

    if not cfg.isotropic_3d:
        # world space: sampling space == world, anisotropic splat quadratic
        # form at unit scale; level/lateral scales enter via kr and qm
        ro_s, rd_s = ro, rd
        m_noise = _quadform_coeffs(base._inv_cov_mtx(False, False, 1.0, ro))
        m_cond = _quadform_coeffs(base._inv_cov_mtx(True, False, 1.0, ro))
        identity = False
    else:
        w2l = cov.world_to_local
        ro_s = ro @ w2l.T / max_ls
        rd_s = rd @ w2l.T / max_ls
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
        identity = True

    # conditioning-splat constants in (unit-scale) sampling space
    use_cond = cfg.activate_conditioning
    if use_cond:
        if not cfg.isotropic_3d:
            o_s = coeff3.ray_origin
            g_s = coeff3.gradient_scale
        else:
            o_s = coeff3.ray_origin @ cov.world_to_local.T / max_ls
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
    K = cfg.impulse_count
    use_pallas = _use_pallas()
    dens = cfg.impulse_density  # traced leaf (differentiable)
    log_base = jnp.log(cfg.base)  # traced leaf

    # rank-0 radius: the stationary path passes it through to the leaner
    # scalar-parameter Mosaic kernel (per-lane kr/qm only when they vary)
    kr_unit = jnp.asarray(base.splat_radius(identity, 1.0), jnp.float32)

    def _lattice(px, py, pz, seed, kr, qm):
        if not use_pallas:
            return _lattice_sum_xla(px, py, pz, seed, kr, qm, m_noise, K)
        import jax as _jax
        from . import sparse_conv_pallas as scp
        shape = px.shape
        p_flat = jnp.stack([px.reshape(-1), py.reshape(-1),
                            pz.reshape(-1)], axis=-1)
        m6 = jnp.stack([jnp.asarray(m, jnp.float32) for m in m_noise])
        def flat(x):
            x = jnp.asarray(x)
            if x.ndim == 0:
                return x
            return jnp.broadcast_to(x, shape).reshape(-1)
        total = scp.noise3d_sum(
            p_flat, jnp.broadcast_to(seed, shape).reshape(-1),
            flat(kr), m6, qm=flat(qm), impulse_count=K,
            interpret=_jax.default_backend() == "cpu")
        return total.reshape(shape)

    def _level_value(px, py, pz, pw, seed_l, pos_scale, kr, qm, gs_var):
        """One level of the normalized lattice sum + conditioning splat.

        pos_scale scales sampling-space positions (iso levels); kr/qm are
        the per-lane radius and quadratic-form scale; gs_var is the
        global_scale argument of variance3."""
        sx, sy, sz = px * pos_scale, py * pos_scale, pz * pos_scale
        total = _lattice(sx, sy, sz, seed_l, kr, qm)
        norm = jnp.sqrt(cov.variance3(pw, dens, kr, identity, gs_var))
        val = total / norm
        if use_cond:
            ddx = sx - osx * pos_scale
            ddy = sy - osy * pos_scale
            ddz = sz - osz * pos_scale
            q0 = qm * _quad(m_cond, ddx, ddy, ddz)
            f0 = jnp.exp(-q0)
            xx, yy, zz, xy, xz, yz = m_cond
            d0x = -2.0 * qm * (xx * ddx + xy * ddy + xz * ddz)
            d0y = -2.0 * qm * (xy * ddx + yy * ddy + yz * ddz)
            d0z = -2.0 * qm * (xz * ddx + yz * ddy + zz * ddz)
            val = val + (vsc + d0x * gsx + d0y * gsy + d0z * gsz) * f0
        return val

    def value_at(t):
        # sampling-space position (unit level scale), [R] per component
        px = rox + t * rdx
        py = roy + t * rdy
        pz = roz + t * rdz
        pw = jnp.stack([rwx + t * dwx, rwy + t * dwy, rwz + t * dwz],
                       axis=-1)

        if stationary:
            val = _level_value(px, py, pz, pw, seed0, 1.0, kr_unit,
                               jnp.float32(1.0), jnp.float32(1.0))
            amp = cov.amplitude(pw)
        elif not multi_res:
            # brute-force nonstationary (GPFunctions.cpp:1219-1332): the
            # per-point lateral scale divides the splat quadratic form.
            # World space folds max_ls into the spatial scale, which offsets
            # the seed by its level (evaluateNoise3DNormalized:252); the iso
            # variants evaluate at unit spatial scale (offset 0)
            if identity:
                lvl = np.uint32(0)
            else:
                lvl = jnp.floor(
                    jnp.log(jnp.float32(max(float(max_ls), 1e-30)))
                    / log_base).astype(jnp.int32).astype(jnp.uint32)
            ls_local = cov.nonstat_splat_kernel_scale(pw)
            inv_ls2 = 1.0 / jnp.maximum(ls_local * ls_local, 1e-12)
            qm = (inv_ls2 / (max_ls * max_ls)) if not identity else inv_ls2
            kr = kr_unit if identity else kr_unit * max_ls
            val = _level_value(px, py, pz, pw, seed0 + lvl, 1.0, kr, qm,
                               jnp.float32(max_ls))
            amp = cov.amplitude(pw)
        else:
            # multi-res blend (SparseConvolutionNoise.cpp:60-123): two
            # per-point levels of the lattice sum, seeds offset by level
            ls = cov.lateral_scale(pw)
            lvl_lo = jnp.floor(jnp.log(ls) / log_base)
            s_lo = cfg.base ** lvl_lo
            s_hi = cfg.base ** (lvl_lo + 1.0)
            frac = (ls - s_lo) / (s_hi - s_lo)
            denom = jnp.sqrt(1.0 - 2.0 * frac + 2.0 * frac * frac)
            r_lo = (1.0 - frac) / denom
            r_hi = frac / denom
            lvl_i = lvl_lo.astype(jnp.int32).astype(jnp.uint32)
            vals = []
            for s, lvl_u in ((s_lo, lvl_i), (s_hi, lvl_i + _U1)):
                if identity:
                    # per-level scale lives in the positions; kr/qm stay
                    # scalar -> scalar-parameter kernel
                    vals.append(_level_value(
                        px, py, pz, pw, seed0 + lvl_u, 1.0 / s, kr_unit,
                        jnp.float32(1.0), jnp.float32(1.0)))
                else:
                    vals.append(_level_value(
                        px, py, pz, pw, seed0 + lvl_u, 1.0, kr_unit * s,
                        1.0 / (s * s), s))
            val = r_lo * vals[0] + r_hi * vals[1]
            amp = cov.amplitude(pw)

        m, gp_id = gp.mean_and_id(pw)
        if cfg.surf_vol_phase_separate:
            # evaluateValue:85-88 — id = variance-thresholded phase switch
            gp_id = jnp.where(
                cov.unscaled_variance(pw) < cfg.surf_vol_phase_amp_thresh,
                0, 1)
        return amp * val + m, gp_id

    return value_at


def make_value_at_1d(cfg, gp, coeff1, ro, rd, pss, scene_seed):
    """SoA value_at(t) for the 1D (along-ray) sampling scheme.

    The 1D noise lives on a 3-cell lattice along the iso-ray z axis
    (noise1D/cell1D, SparseConvolutionNoise.cpp:397-428;
    evaluateNoise1DNormalized :322-360).  The along-ray coordinate is affine
    in t, so the whole march step is flat [R]-vector arithmetic with a
    3 x K impulse unroll — no [R,3,K] padded intermediates.  Numerically
    identical to eval_value with cfg.one_d (tests cross-check)."""
    cov = gp.cov
    seed0 = sc.compute_seed(cfg, pss, scene_seed)  # [R]
    rd_iso = cov.pos_world_to_local(rd, 1.0)
    rdi = normalize(rd_iso)  # [R,3]
    pz0 = dot(cov.pos_world_to_local(ro, 1.0), rdi)  # [R]
    dpz = dot(rd_iso, rdi)  # [R] — d(pz)/dt
    kr = jnp.asarray(cov.splat_radius(True, 1.0), jnp.float32)
    inv_norm = 1.0 / jnp.sqrt(cov.variance1(ro, cfg.impulse_density, kr))
    K = cfg.impulse_count

    use_cond = cfg.activate_conditioning
    if use_cond:
        oz = dot(cov.pos_world_to_local(coeff1.ray_origin, 1.0), rdi)  # [R]
        vsc = coeff1.value_scale  # [R]
        gsz = coeff1.gradient_scale[:, 2]  # [R]
        o_world = coeff1.ray_origin

    rwx, rwy, rwz = ro[:, 0], ro[:, 1], ro[:, 2]
    dwx, dwy, dwz = rd[:, 0], rd[:, 1], rd[:, 2]

    # SE-family 1D splat exp(-0.5 (kr d)^2) -> the scalar Mosaic 1D kernel
    # (noise1D, SparseConvolutionNoise.cpp:397-428); other stationary
    # covariances keep the unrolled-XLA sum with cov.splat1_val_grad
    from .covariance import SquaredExponentialCov
    pallas_1d = _use_pallas() and isinstance(cov, SquaredExponentialCov)

    def _lattice1(pz, seed):
        if pallas_1d:
            import jax as _jax
            from . import sparse_conv_pallas as scp
            shape = pz.shape
            out = scp.noise1d_sum(
                pz.reshape(-1), jnp.broadcast_to(seed, shape).reshape(-1),
                kr, impulse_count=K,
                interpret=_jax.default_backend() == "cpu")
            return out.reshape(shape)
        tg = pz / kr
        b = jnp.floor(tg)
        fr = tg - b
        i0 = b.astype(jnp.int32).astype(jnp.uint32)
        total = jnp.zeros_like(pz)
        pw_dummy = None
        for off in (-1, 0, 1):
            cell = i0 + np.uint32(off & 0xFFFFFFFF)
            h = rng.xxhash32_2(cell, seed) + _U1
            q = fr - np.float32(off)
            for k in range(K):
                ti = rng.uniform(h, np.uint32(2 * k))
                w = jnp.where(rng.uniform(h, np.uint32(2 * k + 1)) < 0.5,
                              -1.0, 1.0)
                d = q - ti
                sval, _ = cov.splat1_val_grad(kr * d, pw_dummy, None)
                total = total + jnp.where(d * d < 1.0, w * sval, 0.0)
        return total

    def value_at(t):
        pw = jnp.stack([rwx + t * dwx, rwy + t * dwy, rwz + t * dwz],
                       axis=-1)
        pz = pz0 + t * dpz
        val = _lattice1(pz, seed0) * inv_norm
        if use_cond:
            dtc = pz - oz
            cv, _ = cov.cov1_val_grad(dtc, pw, o_world, rdi)
            g1, _ = cov.cov1_grad_grad2(dtc, pw, o_world, rdi)
            val = val + vsc * cv + gsz * g1
        amp = cov.amplitude(pw)
        m, gp_id = gp.mean_and_id(pw)
        if cfg.surf_vol_phase_separate:
            gp_id = jnp.where(
                cov.unscaled_variance(pw) < cfg.surf_vol_phase_amp_thresh,
                0, 1)
        return amp * val + m, gp_id

    return value_at

"""Sparse convolution noise: the O(1) stochastic GPIS evaluator.

TPU-native re-design of SparseConvolutionNoiseRealization
(src/core/math/SparseConvolutionNoise.{hpp,cpp}).  A noise value at a point is
a pure function of (point, cell lattice, seed): each of the 3^3 neighbor cells
is hash-keyed, carries `impulse_count` Bernoulli-weighted impulses, and
contributes a splatting-kernel term; the sum is normalized by the analytic
noise variance and augmented with pathwise Renewal/Renewal+ conditioning
splats (SparseConvolutionNoise.cpp:251-360).

All functions here are written per-ray/per-point in scalar style and are
`vmap`-ed by the media layer; everything is elementwise VPU work under jit.
The counter-based RNG (utils/rng.py) replaces the reference's re-seeded PCG.

Sampling spaces (SparseConvolutionNoise.cpp:241-248):
  world / isotropic / isotropic-ray (+ 1D along the ray in iso-ray space).

Conditioning coefficients (8 floats) are the only cross-segment state —
exactly the reference's SparseConvConditioningCoefficients
(SparseConvolutionNoise.hpp:7-21).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import rng
from ..utils.pytree import static_field, struct
from ..utils.vecmath import (dot, frame_to_local, frame_to_world, mat3_vec,
                             normalize, tangent_frame)
from .means import mean_and_id, mean_grad_by_id

# GPCorrelationContext (math/GaussianProcess.hpp:26-31)
CTXT_GLOBAL = "global"
CTXT_RENEWAL_PLUS = "renewal+"
CTXT_RENEWAL = "renewal"
CTXT_NONE = "none"

# SparseConv1DSamplingScheme (media/Medium.hpp:40-44)
SCHEME_UNI = 0
SCHEME_NEE = 1
SCHEME_MIS = 2

_CELL_OFFSETS_3D = np.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=np.int32)  # (27, 3)


@struct
class GP:
    """mean + covariance (+ optional CSG "additional mean" with its id)
    (GaussianProcess.hpp:240-385; additional-mean min at GaussianProcess.cpp:379-393).
    global_cond: precomputed mesh-point-set conditioning
    (setConditioning, GaussianProcess.cpp:243-312)."""
    mean: object
    cov: object
    mean_additional: object = None
    # full right-child GP of a CSG union node.  The sparse-conv / weight-
    # space backends evaluate the additional-mean approximation (exactly the
    # reference: GPSampleNodeCSG::fromJson builds _csg = left GP with
    # right's mean as _mean_additional, and those media call
    # get_gaussian_process() -> _csg); the function-space backend samples
    # BOTH children and takes the min (GPRealNodeCsg, GaussianProcess.hpp:41).
    csg_right: object = None
    global_cond: object = None
    # optional per-point scatter color / volume emission fields attached to
    # the mean (MeanFunction::color/emission, GPFunctions.hpp:849-857)
    color_field: object = None
    emission_field: object = None

    def color(self, p):
        if self.color_field is None:
            return jnp.ones(p.shape, jnp.float32)
        return self.color_field(p)

    def emission(self, p):
        if self.emission_field is None:
            return jnp.zeros(p.shape, jnp.float32)
        return self.emission_field(p)

    def mean_and_id(self, p):
        return mean_and_id(self.mean, self.mean_additional, p)

    def mean_grad_by_id(self, p, gp_id):
        return mean_grad_by_id(self.mean, self.mean_additional, p, gp_id)


@struct
class Coeffs:
    """Pathwise conditioning coefficients (SparseConvolutionNoise.hpp:7-21)."""
    value_scale: jnp.ndarray  # scalar
    gradient_scale: jnp.ndarray  # (3,)
    ray_origin: jnp.ndarray  # (3,)

    @staticmethod
    def zero():
        return Coeffs(value_scale=jnp.float32(0.0),
                      gradient_scale=jnp.zeros(3, jnp.float32),
                      ray_origin=jnp.zeros(3, jnp.float32))


@struct(meta=("ctxt", "use_single_realization", "impulse_count",
              "isotropic_3d", "isotropic_ray_3d", "one_d", "scheme",
              "correlation_xy", "surf_vol_phase_separate"))
class SparseConvConfig:
    """Static sparse-conv sampling configuration
    (media/SparseConvolutionNoiseMedium.cpp:57-91 JSON fields +
    SparseConvolutionNoise.cpp:8-37 ctor derivations)."""
    global_seed: jnp.ndarray  # u32
    impulse_density: jnp.ndarray  # f32 (== impulse_count but differentiable)
    surf_vol_phase_amp_thresh: jnp.ndarray
    base: jnp.ndarray  # multi-res base (2.5, SparseConvolutionNoise.cpp:32)
    ctxt: str = static_field(default=CTXT_RENEWAL_PLUS)
    use_single_realization: bool = static_field(default=False)
    impulse_count: int = static_field(default=3)
    isotropic_3d: bool = static_field(default=False)
    isotropic_ray_3d: bool = static_field(default=True)
    one_d: bool = static_field(default=False)
    scheme: int = static_field(default=SCHEME_UNI)
    correlation_xy: bool = static_field(default=False)
    surf_vol_phase_separate: bool = static_field(default=False)

    @staticmethod
    def create(global_seed=0, impulse_density=3.0, ctxt=CTXT_RENEWAL_PLUS,
               use_single_realization=False, isotropic_3d=False, one_d=False,
               scheme=SCHEME_UNI, correlation_xy=False,
               surf_vol_phase_separate=False, surf_vol_phase_amp_thresh=0.0):
        # NEE/MIS only applies to per-path 1D realizations
        # (SparseConvolutionNoise.cpp:23-26)
        scheme_eff = scheme if (not use_single_realization and one_d) else SCHEME_UNI
        return SparseConvConfig(
            global_seed=jnp.uint32(global_seed),
            impulse_density=jnp.float32(impulse_density),
            surf_vol_phase_amp_thresh=jnp.float32(surf_vol_phase_amp_thresh),
            base=jnp.float32(2.5),
            ctxt=ctxt,
            use_single_realization=use_single_realization,
            impulse_count=int(impulse_density),
            isotropic_3d=isotropic_3d,
            one_d=one_d,
            scheme=scheme_eff,
            correlation_xy=correlation_xy,
            surf_vol_phase_separate=surf_vol_phase_separate,
        )

    @property
    def activate_conditioning(self):
        """(SparseConvolutionNoise.cpp:21)"""
        return (not self.use_single_realization
                and self.ctxt in (CTXT_RENEWAL, CTXT_RENEWAL_PLUS))

    def multi_res(self, gp):
        """(SparseConvolutionNoise.cpp:30)"""
        return (not gp.cov.is_stationary) and gp.cov.use_multi_res_grid


def compute_seed(cfg: SparseConvConfig, pss, scene_seed):
    """Realization seed from (pixel.x, pixel.y, spp, bounce) + scene seed
    (SparseConvolutionNoise.cpp:40-49).  Under Global context the bounce
    component is zeroed so all bounces share one realization."""
    if cfg.use_single_realization:
        return jnp.broadcast_to(cfg.global_seed, jnp.shape(pss)[:-1])
    pss = pss.astype(jnp.uint32)
    w = jnp.zeros_like(pss[..., 3]) if cfg.ctxt == CTXT_GLOBAL else pss[..., 3]
    h = rng.xxhash32_4(pss[..., 0], pss[..., 1], pss[..., 2], w)
    return cfg.global_seed + h + rng.xxhash32(scene_seed)


def sampling_scheme(cfg, gp, p):
    """Disable NEE/MIS where the noise amplitude vanishes
    (SparseConvolutionNoise.cpp:51-58)."""
    amp = gp.cov.amplitude(p)
    return jnp.where(amp < 1e-6, SCHEME_UNI, cfg.scheme).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Raw lattice noise sums (SparseConvolutionNoise.cpp:362-428)
# ---------------------------------------------------------------------------

def _noise3d(cfg, cov, p_world, p_space, seed, kernel_radius, global_scale,
             is_isotropic):
    """27-cell x impulse_count splat sum; returns (val, grad[3]) in the
    sampling space (noise3D/cell3D, SparseConvolutionNoise.cpp:362-395)."""
    K = cfg.impulse_count
    p_grid = p_space / kernel_radius
    base = jnp.floor(p_grid)
    frac = p_grid - base
    ijk = base.astype(jnp.int32)

    offs = jnp.asarray(_CELL_OFFSETS_3D)  # (27,3)
    cells = (ijk[None, :] + offs).astype(jnp.uint32)  # (27,3)
    # Reference hashes Vec4u(ijk.z, ijk.y, ijk.x, seed) (cell3D :376)
    cell_key = rng.xxhash32_4(cells[:, 2], cells[:, 1], cells[:, 0],
                              jnp.uint32(seed)) + jnp.uint32(1)  # (27,)

    ctr = jnp.arange(K, dtype=jnp.uint32)  # (K,)
    key = cell_key[:, None]  # (27,1)
    ux = rng.uniform(key, 4 * ctr + 0)  # (27,K)
    uy = rng.uniform(key, 4 * ctr + 1)
    uz = rng.uniform(key, 4 * ctr + 2)
    w = rng.bernoulli_pm1(rng.uniform(key, 4 * ctr + 3))  # (27,K)

    # query-to-impulse offset in cell units (cell3D :387)
    d = jnp.stack([
        (frac[0] - offs[:, 0].astype(jnp.float32))[:, None] - ux,
        (frac[1] - offs[:, 1].astype(jnp.float32))[:, None] - uy,
        (frac[2] - offs[:, 2].astype(jnp.float32))[:, None] - uz,
    ], axis=-1)  # (27,K,3)
    inside = dot(d, d) < 1.0  # (27,K) — cutoff at one cell radius (:389)

    ab = kernel_radius * d  # sampling-space offset
    val, grad = cov.splat3_val_grad(ab, False, is_isotropic, global_scale,
                                    p_world)
    wm = jnp.where(inside, w, 0.0)
    return jnp.sum(wm * val), jnp.sum(wm[..., None] * grad, axis=(0, 1))


def _noise1d(cfg, cov, p_world, ray_dir_world, t, seed, kernel_radius):
    """3-cell 1D splat sum along the ray; returns (val, dval/dt)
    (noise1D/cell1D, SparseConvolutionNoise.cpp:397-428)."""
    K = cfg.impulse_count
    t_grid = t / kernel_radius
    base = jnp.floor(t_grid)
    frac = t_grid - base
    i0 = base.astype(jnp.int32)

    offs = jnp.asarray([-1, 0, 1], jnp.int32)
    cells = (i0 + offs).astype(jnp.uint32)  # (3,)
    cell_key = rng.xxhash32_2(cells, jnp.uint32(seed)) + jnp.uint32(1)

    ctr = jnp.arange(K, dtype=jnp.uint32)
    key = cell_key[:, None]
    ti = rng.uniform(key, 2 * ctr + 0)  # (3,K)
    w = rng.bernoulli_pm1(rng.uniform(key, 2 * ctr + 1))

    d = (frac - offs.astype(jnp.float32))[:, None] - ti  # (3,K)
    inside = d * d < 1.0

    val, grad = cov.splat1_val_grad(kernel_radius * d, p_world, ray_dir_world)
    wm = jnp.where(inside, w, 0.0)
    return jnp.sum(wm * val), jnp.sum(wm * grad)


# ---------------------------------------------------------------------------
# Normalized noise in each sampling space (SparseConvolutionNoise.cpp:251-360)
# ---------------------------------------------------------------------------

def _additional_seed(cfg, kernel_spatial_scale):
    """Multi-res level offset folded into the seed (:252)."""
    lvl = jnp.floor(jnp.log(kernel_spatial_scale) / jnp.log(cfg.base))
    return lvl.astype(jnp.int32).astype(jnp.uint32)


def eval_noise3d_world(cfg, gp, coeff3, p, seed, kernel_spatial_scale,
                       conditioning, radius_scale=1.0):
    """World-space 3D noise (evaluateNoise3DNormalized, :251-260).

    `radius_scale` is the localScale argument of splattingKernelRadius:
    1.0 in brute-force mode (the nonstationary wrapper folds in max lateral
    scale itself, GPFunctions.cpp:1245-1249), the level scale in multi-res
    (SparseConvolutionNoise.cpp:105, 109-110)."""
    cov = gp.cov
    seed = seed + _additional_seed(cfg, kernel_spatial_scale)
    R = cov.splat_radius(False, radius_scale)
    val, grad = _noise3d(cfg, cov, p, p, seed, R, kernel_spatial_scale, False)
    norm = jnp.sqrt(cov.variance3(p, cfg.impulse_density, R, False,
                                  kernel_spatial_scale))
    val, grad = val / norm, grad / norm
    if cfg.activate_conditioning and conditioning:
        dv, dg = cov.splat3_conditioning_combo(
            p - coeff3.ray_origin, coeff3.gradient_scale, coeff3.value_scale,
            True, False, kernel_spatial_scale, p)
        val, grad = val + dv, grad + dg
    return val, grad


def eval_noise3d_iso_ray(cfg, gp, coeff3, p, ray_dir, seed,
                         kernel_spatial_scale, conditioning):
    """Isotropic-ray-space 3D noise (evaluateNoise3DIsotropicRayNormalized,
    :291-320).  The point is mapped world->iso, rotated into the ray frame,
    and the gradient mapped back."""
    cov = gp.cov
    seed = seed + _additional_seed(cfg, kernel_spatial_scale)
    R = cov.splat_radius(True, 1.0)
    ray_dir_iso = normalize(cov.pos_world_to_local(ray_dir, 1.0))
    tg, bt = tangent_frame(ray_dir_iso)
    p_iso = cov.pos_world_to_local(p, kernel_spatial_scale)
    p_ir = frame_to_local(tg, bt, ray_dir_iso, p_iso)
    val, grad_ir = _noise3d(cfg, cov, p, p_ir, seed, R, 1.0, True)
    grad_iso = frame_to_world(tg, bt, ray_dir_iso, grad_ir)
    grad = cov.grad_local_to_world(grad_iso, kernel_spatial_scale)
    norm = jnp.sqrt(cov.variance3(p, cfg.impulse_density, R, True, 1.0))
    val, grad = val / norm, grad / norm
    if cfg.activate_conditioning and conditioning:
        o_iso = cov.pos_world_to_local(coeff3.ray_origin, kernel_spatial_scale)
        o_ir = frame_to_local(tg, bt, ray_dir_iso, o_iso)
        dv, dg_ir = cov.splat3_conditioning_combo(
            p_ir - o_ir, coeff3.gradient_scale, coeff3.value_scale,
            True, True, 1.0, p)
        dg_iso = frame_to_world(tg, bt, ray_dir_iso, dg_ir)
        dg = cov.grad_local_to_world(dg_iso, kernel_spatial_scale)
        val, grad = val + dv, grad + dg
    return val, grad


def eval_noise3d_iso(cfg, gp, coeff3, p, ray_dir, seed, kernel_spatial_scale,
                     conditioning):
    """Isotropic-space 3D noise (evaluateNoise3DIsotropicNormalized, :269-289)."""
    cov = gp.cov
    seed = seed + _additional_seed(cfg, kernel_spatial_scale)
    R = cov.splat_radius(True, 1.0)
    p_iso = cov.pos_world_to_local(p, kernel_spatial_scale)
    val, grad_iso = _noise3d(cfg, cov, p, p_iso, seed, R, 1.0, True)
    grad = cov.grad_local_to_world(grad_iso, kernel_spatial_scale)
    norm = jnp.sqrt(cov.variance3(p, cfg.impulse_density, R, True, 1.0))
    val, grad = val / norm, grad / norm
    if cfg.activate_conditioning and conditioning:
        o_iso = cov.pos_world_to_local(coeff3.ray_origin, kernel_spatial_scale)
        dv, dg_iso = cov.splat3_conditioning_combo(
            p_iso - o_iso, coeff3.gradient_scale, coeff3.value_scale,
            True, True, 1.0, p)
        dg = cov.grad_local_to_world(dg_iso, kernel_spatial_scale)
        val, grad = val + dv, grad + dg
    return val, grad


def kernel_scale_level_ratio(cfg, gp, p):
    """Multi-res level pair + blend ratios (kernelScaleLevelRatio, :60-70)."""
    ls = gp.cov.lateral_scale(p)
    lvl_lo = jnp.floor(jnp.log(ls) / jnp.log(cfg.base))
    s_lo = cfg.base**lvl_lo
    s_hi = cfg.base ** (lvl_lo + 1)
    frac = (ls - s_lo) / (s_hi - s_lo)
    denom = jnp.sqrt(1.0 - 2.0 * frac + 2.0 * frac * frac)
    return s_lo, s_hi, (1.0 - frac) / denom, frac / denom


def eval_noise3d(cfg, gp, coeff3, p, ray_dir, seed, conditioning):
    """Dispatch over space + multi-res blending (evaluateNoise3D, :101-124).
    Returns (val, grad_world[3])."""
    cov = gp.cov
    multi_res = cfg.multi_res(gp)
    if not cfg.isotropic_3d:
        if not multi_res:
            gs = cov.world_sampling_spatial_scale()
            return eval_noise3d_world(cfg, gp, coeff3, p, seed, gs,
                                      conditioning, radius_scale=1.0)
        s_lo, s_hi, r_lo, r_hi = kernel_scale_level_ratio(cfg, gp, p)
        v_lo, g_lo = eval_noise3d_world(cfg, gp, coeff3, p, seed, s_lo,
                                        conditioning, radius_scale=s_lo)
        v_hi, g_hi = eval_noise3d_world(cfg, gp, coeff3, p, seed, s_hi,
                                        conditioning, radius_scale=s_hi)
        return r_lo * v_lo + r_hi * v_hi, r_lo * g_lo + r_hi * g_hi
    fn = eval_noise3d_iso_ray if cfg.isotropic_ray_3d else eval_noise3d_iso
    if not multi_res:
        return fn(cfg, gp, coeff3, p, ray_dir, seed, 1.0, conditioning)
    s_lo, s_hi, r_lo, r_hi = kernel_scale_level_ratio(cfg, gp, p)
    v_lo, g_lo = fn(cfg, gp, coeff3, p, ray_dir, seed, s_lo, conditioning)
    v_hi, g_hi = fn(cfg, gp, coeff3, p, ray_dir, seed, s_hi, conditioning)
    return r_lo * v_lo + r_hi * v_hi, r_lo * g_lo + r_hi * g_hi


def eval_noise1d_normalized(cfg, gp, coeff1, p, t, ray_dir, seed,
                            kernel_spatial_scale, conditioning,
                            multi_res_low_level=False):
    """1D noise along the ray in iso-ray space (evaluateNoise1DNormalized,
    :322-360).  Returns vec4 (val, gx_cond, gy_cond, gz) where gz is the
    z-derivative of the noise and gx/gy carry only conditioning-splat terms."""
    cov = gp.cov
    ray_dir_iso = normalize(cov.pos_world_to_local(ray_dir, 1.0))
    tg, bt = tangent_frame(ray_dir_iso)
    p_iso = cov.pos_world_to_local(p, kernel_spatial_scale)
    pz = dot(p_iso, ray_dir_iso)
    seed = seed + _additional_seed(cfg, kernel_spatial_scale)
    R = cov.splat_radius(True, 1.0)

    val, gz = _noise1d(cfg, cov, p, ray_dir, pz, seed, R)
    norm = jnp.sqrt(cov.variance1(p, cfg.impulse_density, R))
    val, gz = val / norm, gz / norm

    gx_c = jnp.float32(0.0)
    gy_c = jnp.float32(0.0)
    if cfg.activate_conditioning and conditioning:
        origin_scale = jnp.float32(1.0)
        if cfg.multi_res(gp):
            _, _, r_lo, r_hi = kernel_scale_level_ratio(cfg, gp, coeff1.ray_origin)
            origin_scale = r_lo if multi_res_low_level else r_hi
        o_iso = cov.pos_world_to_local(coeff1.ray_origin, kernel_spatial_scale)
        oz = dot(o_iso, ray_dir_iso)
        dt = pz - oz
        cv, cg = cov.cov1_val_grad(dt, p, coeff1.ray_origin, ray_dir_iso)
        g1, g2 = cov.cov1_grad_grad2(dt, p, coeff1.ray_origin, ray_dir_iso)
        val = val + origin_scale * (coeff1.value_scale * cv
                                    + kernel_spatial_scale * coeff1.gradient_scale[2] * g1)
        gz = gz + origin_scale * (coeff1.value_scale * cg
                                  + kernel_spatial_scale * coeff1.gradient_scale[2] * g2)
        if cfg.correlation_xy:
            hx = cov.cov1_grad2_for_3d_normal(dt, p, coeff1.ray_origin, tg)
            hy = cov.cov1_grad2_for_3d_normal(dt, p, coeff1.ray_origin, bt)
            gx_c = origin_scale * kernel_spatial_scale * coeff1.gradient_scale[0] * hx
            gy_c = origin_scale * kernel_spatial_scale * coeff1.gradient_scale[1] * hy
    return jnp.stack([val, gx_c, gy_c, gz])


def eval_value_noise1d(cfg, gp, coeff1, p, t, ray_dir, seed, conditioning):
    """(evaluateValueNoise1D, :126-135)"""
    if not cfg.multi_res(gp):
        return eval_noise1d_normalized(cfg, gp, coeff1, p, t, ray_dir, seed,
                                       1.0, conditioning)[0]
    s_lo, s_hi, r_lo, r_hi = kernel_scale_level_ratio(cfg, gp, p)
    v_lo = eval_noise1d_normalized(cfg, gp, coeff1, p, t, ray_dir, seed, s_lo,
                                   conditioning, True)[0]
    v_hi = eval_noise1d_normalized(cfg, gp, coeff1, p, t, ray_dir, seed, s_hi,
                                   conditioning, False)[0]
    return r_lo * v_lo + r_hi * v_hi


def _xy_correlation_factor(t_seg):
    """cov(grad_xy(0), grad_xy(t)) factor for Renewal+ with correlationXY
    (SparseConvolutionNoise.cpp:177-180)."""
    f = jnp.exp(-t_seg * t_seg / 4.0) * (0.5 - t_seg * t_seg * 0.25)
    return f, 0.5 - f * f * 2.0


def _xy_seed(pss, scene_seed):
    """Seed of the lateral-gradient Gaussian stream
    (SparseConvolutionNoise.cpp:151)."""
    pss = pss.astype(jnp.uint32)
    return (rng.xxhash32_4(pss[..., 0], pss[..., 1], pss[..., 2], pss[..., 3])
            + rng.xxhash32(scene_seed) + jnp.uint32(1))


def eval_gradient_noise1d(cfg, gp, coeff1, p, t_total, t_segment, ray_dir,
                          pss, scene_seed, conditioning):
    """3D gradient of the 1D GPIS (evaluateGradientNoise1D, :137-239).

    The z (along-ray) component is the 1D noise derivative; x/y are sampled
    lateral Gaussians N(0, 1/2) in iso-ray space (optionally correlated with
    the segment start under Renewal+ correlationXY), plus conditioning terms.
    `t_segment == 0` selects the ray-start variate (used when conditioning)."""
    cov = gp.cov
    seed = compute_seed(cfg, pss, scene_seed)
    ray_dir_iso = normalize(cov.pos_world_to_local(ray_dir, 1.0))
    tg, bt = tangent_frame(ray_dir_iso)

    sx = cov.nonstat_splat_cov_1d(p, p, tg)
    sy = cov.nonstat_splat_cov_1d(p, p, bt)
    xy_scale = jnp.stack([1.0 / sx, 1.0 / sy])

    key = _xy_seed(pss, scene_seed)

    def lateral(ctr0, is_start):
        n0, n1 = rng.normal2(key, ctr0)
        xy1 = jnp.stack([n0, n1]) / jnp.sqrt(2.0)
        if is_start:
            return xy1 * xy_scale
        if not (cfg.ctxt == CTXT_RENEWAL_PLUS and cfg.correlation_xy):
            m0, m1 = rng.normal2(key, ctr0 + 1)
            return jnp.stack([m0, m1]) / jnp.sqrt(2.0) * xy_scale
        f, cvar = _xy_correlation_factor(t_segment)
        mu = f * 2.0 * xy1
        m0, m1 = rng.normal2(key, ctr0 + 1)
        return jnp.stack([m0, m1]) * jnp.sqrt(jnp.maximum(cvar, 1e-12)) + mu

    if not cfg.multi_res(gp):
        base4 = eval_noise1d_normalized(cfg, gp, coeff1, p, t_total, ray_dir,
                                        seed, 1.0, conditioning)
        g_base = base4[1:]
        is_start = t_segment == 0.0
        xy_start = lateral(jnp.uint32(0), True)
        xy_end = lateral(jnp.uint32(0), False)
        xy = jnp.where(is_start, xy_start, xy_end)
        g_ir = jnp.stack([xy[0], xy[1], 0.0]) + g_base
        g_iso = frame_to_world(tg, bt, ray_dir_iso, g_ir)
        return cov.grad_local_to_world(g_iso, 1.0)

    # multi-res variant (:188-238)
    s_lo, s_hi, r_lo, r_hi = kernel_scale_level_ratio(cfg, gp, p)
    b_lo = eval_noise1d_normalized(cfg, gp, coeff1, p, t_total, ray_dir, seed,
                                   s_lo, conditioning, True)[1:]
    b_hi = eval_noise1d_normalized(cfg, gp, coeff1, p, t_total, ray_dir, seed,
                                   s_hi, conditioning, False)[1:]
    is_start = t_segment == 0.0

    def lat2(ctr0, is_start_v):
        n0, n1 = rng.normal2(key, ctr0)
        xy1 = jnp.stack([n0, n1]) / jnp.sqrt(2.0)
        if not (cfg.ctxt == CTXT_RENEWAL_PLUS and cfg.correlation_xy):
            m0, m1 = rng.normal2(key, ctr0 + 2)
            xy2 = jnp.stack([m0, m1]) / jnp.sqrt(2.0) * xy_scale
        else:
            f, cvar = _xy_correlation_factor(t_segment)
            mu = f * 2.0 * xy1
            m0, m1 = rng.normal2(key, ctr0 + 2)
            xy2 = jnp.stack([m0, m1]) * jnp.sqrt(jnp.maximum(cvar, 1e-12)) + mu
        return jnp.where(is_start_v, xy1 * xy_scale, xy2)

    xy_lo = lat2(jnp.uint32(0), is_start)
    xy_hi = lat2(jnp.uint32(1), is_start)
    rdi_lo = normalize(cov.pos_world_to_local(ray_dir, s_lo))
    rdi_hi = normalize(cov.pos_world_to_local(ray_dir, s_hi))
    t_lo, b_lo_f = tangent_frame(rdi_lo)
    t_hi, b_hi_f = tangent_frame(rdi_hi)
    g_lo = frame_to_world(t_lo, b_lo_f, rdi_lo,
                          jnp.stack([xy_lo[0], xy_lo[1], 0.0]) + b_lo)
    g_hi = frame_to_world(t_hi, b_hi_f, rdi_hi,
                          jnp.stack([xy_hi[0], xy_hi[1], 0.0]) + b_hi)
    gw_lo = cov.grad_local_to_world(g_lo, s_lo)
    gw_hi = cov.grad_local_to_world(g_hi, s_hi)
    return r_lo * gw_lo + r_hi * gw_hi


# ---------------------------------------------------------------------------
# Top-level GPIS value / gradient (SparseConvolutionNoise.cpp:72-99)
# ---------------------------------------------------------------------------

def eval_value(cfg, gp, coeff3, coeff1, p, t, ray_dir, pss, scene_seed,
               info_t):
    """GPIS value f(p) = amplitude * noise + mean; returns (val, gp_id)
    (evaluateValue, :73-89)."""
    seed = compute_seed(cfg, pss, scene_seed)
    amp = gp.cov.amplitude(p)
    if cfg.one_d:
        nv = eval_value_noise1d(cfg, gp, coeff1, p, t + info_t, ray_dir, seed,
                                True)
    else:
        nv, _ = eval_noise3d(cfg, gp, coeff3, p, ray_dir, seed, True)
    m, gp_id = gp.mean_and_id(p)
    if cfg.surf_vol_phase_separate:
        gp_id = jnp.where(gp.cov.unscaled_variance(p)
                          < cfg.surf_vol_phase_amp_thresh, 0, 1)
    return amp * nv + m, gp_id


def eval_gradient(cfg, gp, coeff3, coeff1, p, t, ray_dir, pss, scene_seed,
                  info_t):
    """GPIS gradient (evaluateGradient, :92-99)."""
    seed = compute_seed(cfg, pss, scene_seed)
    amp = gp.cov.amplitude(p)
    if cfg.one_d:
        ng = eval_gradient_noise1d(cfg, gp, coeff1, p, t + info_t, t, ray_dir,
                                   pss, scene_seed, True)
    else:
        _, ng = eval_noise3d(cfg, gp, coeff3, p, ray_dir, seed, True)
    _, gp_id = gp.mean_and_id(p)
    mg = gp.mean_grad_by_id(p, gp_id)
    return amp * ng[..., :] + mg


# ---------------------------------------------------------------------------
# Conditioning (SparseConvolutionNoise.cpp:430-595)
# ---------------------------------------------------------------------------

def conditioning_3d(cfg, gp, p, ray_dir, target_val, target_grad, pss,
                    scene_seed):
    """Solve for (value_scale, gradient_scale) so the conditioned realization
    reproduces (target_val, target_grad) at the segment start
    (conditioning3D, :441-517)."""
    cov = gp.cov
    seed = compute_seed(cfg, pss, scene_seed)
    zero = Coeffs.zero()
    amp = cov.amplitude(p)
    safe_amp = jnp.where(amp == 0.0, 1.0, amp)
    m, gp_id = gp.mean_and_id(p)

    nv, ng = eval_noise3d(cfg, gp, zero, p, ray_dir, seed, False)
    value_scale = (target_val - m) / safe_amp - nv

    multi_res = cfg.multi_res(gp)
    if multi_res:
        s_lo, s_hi, r_lo, r_hi = kernel_scale_level_ratio(cfg, gp, p)
        value_scale = value_scale / (r_lo + r_hi)

    gradient_scale = jnp.zeros(3, jnp.float32)
    if cfg.ctxt == CTXT_RENEWAL_PLUS:
        mg = gp.mean_grad_by_id(p, gp_id)
        delta = (target_grad - mg) / safe_amp - ng
        if cfg.isotropic_3d:
            gs_iso = cov.grad_world_to_local(delta, 1.0)
            if cfg.isotropic_ray_3d:
                rdi = normalize(cov.pos_world_to_local(ray_dir, 1.0))
                tg, bt = tangent_frame(rdi)
                gs_iso = frame_to_local(tg, bt, rdi, gs_iso)
            gradient_scale = mat3_vec(cov.one_over_second_derivative(p, True),
                                      gs_iso)
            if multi_res:
                gradient_scale = gradient_scale / (r_lo / s_lo + r_hi / s_hi)
            else:
                gradient_scale = (gradient_scale
                                  * cov.nonstat_splat_kernel_scale(p) ** 2)
        else:
            gradient_scale = mat3_vec(cov.one_over_second_derivative(p, False),
                                      delta)
            if multi_res:
                gradient_scale = gradient_scale / (r_lo / s_lo**2 + r_hi / s_hi**2)
            else:
                gradient_scale = gradient_scale * cov.lateral_scale(p) ** 2

    # amplitude == 0 => no conditioning possible (:459-460)
    ok = amp != 0.0
    return Coeffs(value_scale=jnp.where(ok, value_scale, 0.0),
                  gradient_scale=jnp.where(ok, gradient_scale, 0.0),
                  ray_origin=p)


def conditioning_1d(cfg, gp, p, ray_dir, target_val, target_grad, pss,
                    scene_seed, info_t):
    """(conditioning1D, :519-595)"""
    cov = gp.cov
    seed = compute_seed(cfg, pss, scene_seed)
    zero = Coeffs.zero()
    amp = cov.amplitude(p)
    safe_amp = jnp.where(amp == 0.0, 1.0, amp)
    m, gp_id = gp.mean_and_id(p)

    nv = eval_value_noise1d(cfg, gp, zero, p, info_t, ray_dir, seed, False)
    value_scale = (target_val - m) / safe_amp - nv
    multi_res = cfg.multi_res(gp)
    if multi_res:
        _, _, r_lo, r_hi = kernel_scale_level_ratio(cfg, gp, p)
        value_scale = value_scale / (r_lo**2 + r_hi**2)

    gradient_scale = jnp.zeros(3, jnp.float32)
    if cfg.ctxt == CTXT_RENEWAL_PLUS:
        mg = gp.mean_grad_by_id(p, gp_id)
        ng = eval_gradient_noise1d(cfg, gp, zero, p, info_t, 0.0, ray_dir,
                                   pss, scene_seed, False)
        delta = (target_grad - mg) / safe_amp - ng
        rdi = normalize(cov.pos_world_to_local(ray_dir, 1.0))
        tg, bt = tangent_frame(rdi)
        gs_iso = cov.grad_world_to_local(delta, 1.0)
        gs_iso = frame_to_local(tg, bt, rdi, gs_iso)
        sz = cov.nonstat_splat_cov_1d(p, p, rdi)
        sx = cov.nonstat_splat_cov_1d(p, p, tg)
        sy = cov.nonstat_splat_cov_1d(p, p, bt)
        gradient_scale = -2.0 * gs_iso * jnp.stack([sx**2, sy**2, sz**2])
        if multi_res:
            gradient_scale = gradient_scale / (r_lo**2 + r_hi**2)
        if not cfg.correlation_xy:
            gradient_scale = gradient_scale.at[0].set(0.0).at[1].set(0.0)

    ok = amp != 0.0
    return Coeffs(value_scale=jnp.where(ok, value_scale, 0.0),
                  gradient_scale=jnp.where(ok, gradient_scale, 0.0),
                  ray_origin=p)


def conditioning(cfg, gp, coeff3, coeff1, p, ray_dir, target_val, target_grad,
                 pss, scene_seed, info_t, active=True):
    """Dispatch (conditioning, :431-439).  `active` masks rays that should
    keep their previous coefficients (firstScatter)."""
    if not cfg.activate_conditioning:
        return coeff3, coeff1
    if cfg.one_d:
        new1 = conditioning_1d(cfg, gp, p, ray_dir, target_val, target_grad,
                               pss, scene_seed, info_t)
        coeff1 = jax.tree_util.tree_map(
            lambda n, o: jnp.where(active, n, o), new1, coeff1)
        return coeff3, coeff1
    new3 = conditioning_3d(cfg, gp, p, ray_dir, target_val, target_grad, pss,
                           scene_seed)
    coeff3 = jax.tree_util.tree_map(
        lambda n, o: jnp.where(active, n, o), new3, coeff3)
    return coeff3, coeff1


# ---------------------------------------------------------------------------
# NEE for 1D GPIS with mirror/conductor (SparseConvolutionNoise.cpp:597-743)
# ---------------------------------------------------------------------------

def _nee_shared(cfg, gp, coeff1, ray_dir, normal, p, pss, scene_seed, info_t):
    """(neeShared, :601-648)"""
    cov = gp.cov
    seed = compute_seed(cfg, pss, scene_seed)
    amp = cov.amplitude(p)
    m, gp_id = gp.mean_and_id(p)
    mean_grad = gp.mean_grad_by_id(p, gp_id)

    rdi = normalize(cov.pos_world_to_local(ray_dir, 1.0))
    tg, bt = tangent_frame(rdi)
    mtx_ray = jnp.stack([tg, bt, rdi], axis=-1)  # columns t,b,n
    mtx_pt = amp * (cov.local_to_world_inv_transpose(p) @ mtx_ray)
    mtx_pt_inv = jnp.linalg.inv(mtx_pt)

    if not cfg.multi_res(gp):
        g4 = eval_noise1d_normalized(cfg, gp, coeff1, p, info_t, ray_dir,
                                     seed, 1.0, True)
        grad_constraint = g4[1:]
    else:
        s_lo, s_hi, r_lo, r_hi = kernel_scale_level_ratio(cfg, gp, p)
        g_lo = eval_noise1d_normalized(cfg, gp, coeff1, p, info_t, ray_dir,
                                       seed, s_lo, True, True)[1:]
        g_hi = eval_noise1d_normalized(cfg, gp, coeff1, p, info_t, ray_dir,
                                       seed, s_hi, True, False)[1:]
        grad_constraint = g_lo * r_lo / s_lo + g_hi * r_hi / s_hi

    plane_pt = mat3_vec(mtx_pt, jnp.stack([0.0, 0.0, grad_constraint[2]])) + mean_grad
    plane_x = mtx_pt[:, 0]
    plane_y = mtx_pt[:, 1]
    cp = jnp.cross(plane_x, plane_y)
    plane_stretch = jnp.sqrt(jnp.maximum(dot(cp, cp), 1e-30))
    plane_n = cp / plane_stretch
    isect_dist = dot(plane_pt, plane_n) / dot(normal, plane_n)

    grad_3d_world = isect_dist * normal
    grad_3d_ir = mat3_vec(mtx_pt_inv, grad_3d_world - mean_grad)
    return (mtx_pt, grad_constraint, grad_3d_ir, plane_n, plane_stretch,
            isect_dist, rdi, tg, bt)


def nee_grad(cfg, gp, coeff1, ray_dir, normal, p, pss, scene_seed, info_t):
    """3D gradient consistent with a light-sampled normal (neeGrad, :652-658)."""
    out = _nee_shared(cfg, gp, coeff1, ray_dir, normal, p, pss, scene_seed,
                      info_t)
    isect_dist = out[5]
    return isect_dist * normal


def nee_pdf(cfg, gp, coeff1, ray_dir, normal, p, t_segment, pss, scene_seed,
            info_t):
    """Solid-angle pdf of forward-sampling the normal (neePDF, :661-743)."""
    cov = gp.cov
    (mtx_pt, gc, g_ir, plane_n, stretch, isect_dist, rdi, tg, bt) = _nee_shared(
        cfg, gp, coeff1, ray_dir, normal, p, pss, scene_seed, info_t)

    sx = cov.nonstat_splat_cov_1d(p, p, tg)
    sy = cov.nonstat_splat_cov_1d(p, p, bt)
    key = _xy_seed(pss, scene_seed)

    if not cfg.multi_res(gp):
        if not (cfg.ctxt == CTXT_RENEWAL_PLUS and cfg.correlation_xy):
            samp_x = (g_ir[0] - gc[0]) * jnp.sqrt(2.0) * sx
            samp_y = (g_ir[1] - gc[1]) * jnp.sqrt(2.0) * sy
            pdf_area = (jnp.exp(-0.5 * samp_x**2) * jnp.exp(-0.5 * samp_y**2)
                        / (2.0 * jnp.pi) * 2.0 * sx * sy)
        else:
            n0, n1 = rng.normal2(key, jnp.uint32(0))
            xy1 = jnp.stack([n0, n1]) / jnp.sqrt(2.0)
            f, cvar = _xy_correlation_factor(t_segment)
            mu = f * 2.0 * xy1
            cs = jnp.sqrt(jnp.maximum(cvar, 1e-12))
            samp_x = (g_ir[0] - gc[0] - mu[0]) / cs
            samp_y = (g_ir[1] - gc[1] - mu[1]) / cs
            pdf_area = (jnp.exp(-0.5 * samp_x**2) * jnp.exp(-0.5 * samp_y**2)
                        / (2.0 * jnp.pi) / jnp.maximum(cvar, 1e-12))
    else:
        s_lo, s_hi, r_lo, r_hi = kernel_scale_level_ratio(cfg, gp, p)
        ns = 1.0 / jnp.sqrt((r_lo / s_lo) ** 2 + (r_hi / s_hi) ** 2)
        sx, sy = sx * ns, sy * ns
        if not (cfg.ctxt == CTXT_RENEWAL_PLUS and cfg.correlation_xy):
            samp_x = (g_ir[0] - gc[0]) * jnp.sqrt(2.0) * sx
            samp_y = (g_ir[1] - gc[1]) * jnp.sqrt(2.0) * sy
            pdf_area = (jnp.exp(-0.5 * samp_x**2) * jnp.exp(-0.5 * samp_y**2)
                        / (2.0 * jnp.pi) * 2.0 * sx * sy)
        else:
            n0, n1 = rng.normal2(key, jnp.uint32(0))
            m0, m1 = rng.normal2(key, jnp.uint32(1))
            xy1 = jnp.stack([n0, n1]) / jnp.sqrt(2.0)
            xy2 = jnp.stack([m0, m1]) / jnp.sqrt(2.0)
            f, cvar = _xy_correlation_factor(t_segment)
            mu = f * 2.0 * (xy1 * r_lo / s_lo + xy2 * r_hi / s_hi)
            cs = jnp.sqrt(jnp.maximum(cvar, 1e-12))
            samp_x = (g_ir[0] - gc[0] - mu[0]) / cs * ns
            samp_y = (g_ir[1] - gc[1] - mu[1]) / cs * ns
            pdf_area = (jnp.exp(-0.5 * samp_x**2) * jnp.exp(-0.5 * samp_y**2)
                        / (2.0 * jnp.pi * jnp.maximum(cvar, 1e-12)) * ns**2)

    cos_theta = jnp.abs(dot(normal, plane_n))
    pdf_normal = pdf_area * isect_dist**2 / jnp.maximum(cos_theta, 1e-12) / stretch
    pdf_omega = pdf_normal / jnp.maximum(4.0 * dot(normal, -ray_dir), 1e-12)
    return jnp.where(isect_dist < 0.0, 0.0, pdf_omega)

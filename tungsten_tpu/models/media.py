"""Media: the GPIS <-> transport contract, batched over rays.

Re-design of the reference's Medium/GaussianProcessMedium stack
(src/core/media/Medium.hpp:50-115, GaussianProcessMedium.cpp:221-398,
SparseConvolutionNoiseMedium.cpp:102-183) as fixed-shape batched kernels:

- `MediumState` is an SoA pytree over the ray batch — the per-path GP memory
  (firstScatter, lastAniso, lastVal, accumulated info.t, 1D scheme, and the
  Renewal/Renewal+ conditioning coefficients, 8 floats/ray).
- `sample_distance` runs the fixed-step sign-change march as one
  `lax.while_loop` over the whole batch (uniform control flow; done rays are
  masked).  The secant-style refinement (intp *= 0.9 loop,
  SparseConvolutionNoiseMedium.cpp:143-160) runs as a second bounded loop for
  all crossed rays jointly, so the expensive noise evaluation is always a
  full-batch VPU op.
- `transmittance` is the same march returning binary visibility
  (GaussianProcessMedium.cpp:343-393).

Weight-space and function-space media share the march frontend and swap the
field evaluator, mirroring how all three reference media share
GaussianProcessMedium::sampleDistance.
"""
from __future__ import annotations

import functools
from dataclasses import replace

import jax
import jax.numpy as jnp

from ..ops import gp as gpmod
from ..ops import sparse_conv as sc
from ..ops import weight_space as ws
from ..utils import rng as trng
from ..utils.pytree import static_field, struct
from ..utils.vecmath import dot, normalize

MEDIUM_NONE = -1

GPIS_SPARSE_CONV = "sparse_conv_noise"
GPIS_WEIGHT_SPACE = "weight_space"
GPIS_FUNCTION_SPACE = "function_space"
MEDIUM_HOMOGENEOUS = "homogeneous"
MEDIUM_EXPONENTIAL = "exponential"
MEDIUM_ATMOSPHERIC = "atmospheric"
MEDIUM_VOXEL = "voxel"

_HETERO_KINDS = (MEDIUM_EXPONENTIAL, MEDIUM_ATMOSPHERIC, MEDIUM_VOXEL)

FS_RING = 16  # Global-context conditioning ring size

NORMAL_CONDITIONED = "conditioned_gaussian"
NORMAL_FD = "finite_differences"
NORMAL_BECKMANN = "beckmann"
NORMAL_GGX = "ggx"


@struct(meta=("kind", "min_step", "max_march_steps", "normal_method",
              "sample_points", "basis_functions", "skip_space",
              "ws_sphere_trace", "phase_kind", "phase_bsdf", "march_block"))
class Medium:
    """One medium's static config + differentiable parameters."""
    sigma_a: jnp.ndarray  # [3]
    sigma_s: jnp.ndarray  # [3]
    density: jnp.ndarray
    step_size: jnp.ndarray
    cfg: sc.SparseConvConfig
    gp: sc.GP
    hg_g: jnp.ndarray
    law: object = None  # transmittance.TransmittanceLaw (None = exponential)
    field_params: jnp.ndarray = None  # [8] heterogeneous density params
    grid: jnp.ndarray = None  # [D,H,W] voxel densities
    bounds: jnp.ndarray = None  # [2,3] world AABB of the bounding prims;
    # clamps the GPIS march for rays that leak past the boundary geometry
    # (otherwise one escaped ray marches the full Ray::infinity clamp of
    # 2000 units, GaussianProcessMedium.cpp:228-231, stalling the batch)
    kind: str = static_field(default=GPIS_SPARSE_CONV)
    min_step: int = static_field(default=8)
    max_march_steps: int = static_field(default=8192)
    normal_method: str = static_field(default=NORMAL_CONDITIONED)
    sample_points: int = static_field(default=32)  # function space
    basis_functions: int = static_field(default=300)  # weight space
    skip_space: float = static_field(default=0.0)  # cdf free-flight skip
    ws_sphere_trace: bool = static_field(default=False)  # step_size==0 mode
    phase_kind: str = static_field(default="isotropic")
    phase_bsdf: int = static_field(default=-1)  # BRDF-phase bsdf index
    march_block: int = static_field(default=8)  # steps per while-iteration

    @property
    def sigma_t(self):
        return (self.sigma_a + self.sigma_s) * self.density

    @property
    def absorption_only(self):
        return False  # GPIS media always scatter in our supported configs


@struct
class MediumState:
    """Per-ray GP memory (Medium.hpp:59-88 MediumState + the sparse-conv
    conditioning coefficients that the reference keeps in GPContext)."""
    first_scatter: jnp.ndarray  # [R] bool
    bounce: jnp.ndarray  # [R] i32
    last_gp_id: jnp.ndarray  # [R] i32
    last_aniso: jnp.ndarray  # [R,3]
    last_val: jnp.ndarray  # [R]
    info_t: jnp.ndarray  # [R] accumulated path distance (RayInfo::t)
    scheme: jnp.ndarray  # [R] i32 (active 1D sampling scheme)
    coeff3: sc.Coeffs  # batched leaves
    coeff1: sc.Coeffs
    # function-space Global-context memory: bounded ring of conditioning
    # rows (pts/derivative-kind/values, count) — the fixed-shape analog of
    # the reference's unbounded append (applyMemory Global,
    # GaussianProcess.cpp:165-168); K = FS_RING rows kept
    fs_pts: jnp.ndarray = None  # [R,K,3]
    fs_vals: jnp.ndarray = None  # [R,K]
    fs_dts: jnp.ndarray = None  # [R,K] i32
    fs_n: jnp.ndarray = None  # [R] i32 valid-row count
    # CSG right-child carry (GPRealNodeCsg::applyMemory keeps BOTH
    # children's renewal memory; last_val/last_aniso carry the left child)
    fs_val2: jnp.ndarray = None  # [R]
    fs_grad2: jnp.ndarray = None  # [R,3]

    @staticmethod
    def make(n):
        return MediumState(
            first_scatter=jnp.ones(n, bool),
            bounce=jnp.zeros(n, jnp.int32),
            last_gp_id=jnp.zeros(n, jnp.int32),
            last_aniso=jnp.zeros((n, 3), jnp.float32).at[:, 0].set(1.0),
            last_val=jnp.zeros(n, jnp.float32),
            info_t=jnp.zeros(n, jnp.float32),
            scheme=jnp.zeros(n, jnp.int32),
            coeff3=sc.Coeffs(value_scale=jnp.zeros(n, jnp.float32),
                             gradient_scale=jnp.zeros((n, 3), jnp.float32),
                             ray_origin=jnp.zeros((n, 3), jnp.float32)),
            coeff1=sc.Coeffs(value_scale=jnp.zeros(n, jnp.float32),
                             gradient_scale=jnp.zeros((n, 3), jnp.float32),
                             ray_origin=jnp.zeros((n, 3), jnp.float32)),
            fs_pts=jnp.zeros((n, FS_RING, 3), jnp.float32),
            fs_vals=jnp.zeros((n, FS_RING), jnp.float32),
            fs_dts=jnp.zeros((n, FS_RING), jnp.int32),
            fs_n=jnp.zeros(n, jnp.int32),
            fs_val2=jnp.zeros(n, jnp.float32),
            fs_grad2=jnp.zeros((n, 3), jnp.float32).at[:, 0].set(1.0))

    def reset_where(self, mask):
        """mediumState.reset() on boundary-crossing rays
        (Medium.hpp:71-80, TraceBase.cpp:618-620)."""
        fresh = MediumState.make(self.first_scatter.shape[0])
        keep_info = replace(fresh, info_t=self.info_t)
        return jax.tree_util.tree_map(
            lambda f, o: jnp.where(
                mask.reshape(mask.shape + (1,) * (f.ndim - 1)), f, o),
            keep_info, self)


def _select(mask, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(mask.reshape(mask.shape + (1,) * (x.ndim - 1)),
                               x, y), a, b)


def _detach(tree):
    """stop_gradient over a pytree (Nones/static fields pass through)."""
    return jax.tree_util.tree_map(jax.lax.stop_gradient, tree)


def _clamp_far_to_bounds(med, ro, rd, near, far):
    """Clamp the march interval to the medium's bounding AABB exit (slab
    test).  Inside the boundary geometry this is a no-op; for rays that
    escaped through edge/eps gaps it bounds the march."""
    if med.bounds is None:
        return far
    lo, hi = med.bounds[0], med.bounds[1]
    inv = 1.0 / jnp.where(jnp.abs(rd) < 1e-9,
                          jnp.where(rd < 0, -1e-9, 1e-9), rd)
    ta = (lo[None, :] - ro) * inv
    tb = (hi[None, :] - ro) * inv
    t_exit = jnp.min(jnp.maximum(ta, tb), axis=-1)
    margin = jnp.maximum(med.step_size, 1e-3) * 2.0
    return jnp.minimum(far, jnp.maximum(t_exit, near) + margin)


# ---------------------------------------------------------------------------
# Field evaluators (value along the ray), one per GPIS representation
# ---------------------------------------------------------------------------

def _sc_value_b(med, scene_seed):
    """Batched sparse-conv value evaluator f(t) for the march."""
    cfg, gp = med.cfg, med.gp

    def one(c3, c1, p, t, rd, pss, info_t):
        v, gid = sc.eval_value(cfg, gp, c3, c1, p, t, rd, pss, scene_seed,
                               info_t)
        return v, gid

    return jax.vmap(one)


def _ws_real(med, pss, scene_seed):
    """Per-ray RFF realization (re-synthesized, not stored)
    (WeightSpaceGaussianProcessMedium.cpp:74-78)."""
    cfg = med.cfg
    if cfg.use_single_realization:
        pss0 = jnp.zeros_like(pss)
        return ws.sample_realization(med.gp.cov, med.basis_functions, pss0,
                                     cfg.global_seed, True)
    return ws.sample_realization(med.gp.cov, med.basis_functions, pss,
                                 cfg.global_seed,
                                 cfg.ctxt == sc.CTXT_GLOBAL)


def _ws_value_b(med, scene_seed):
    gp = med.gp

    def one(c3, c1, p, t, rd, pss, info_t):
        real = _ws_real(med, pss, scene_seed)
        return ws.evaluate(real, gp, p)

    return jax.vmap(one)


def make_value_fn(med, scene_seed):
    if med.kind == GPIS_WEIGHT_SPACE:
        return _ws_value_b(med, scene_seed)
    return _sc_value_b(med, scene_seed)


def _use_fast_path():
    """The unrolled SoA evaluator is a TPU-lane optimization; its 81-way
    unroll slows CPU compiles, so it defaults to accelerators only.
    Override with TUNGSTEN_TPU_FAST_MARCH=0/1."""
    import os
    v = os.environ.get("TUNGSTEN_TPU_FAST_MARCH")
    if v is not None:
        return v not in ("0", "false")
    import jax
    return jax.default_backend() != "cpu"


def make_value_at(med, scene_seed, ro, rd, near, state, pss):
    """value_at(t[R]) -> (f[R], gp_id[R]) along each ray.

    Sparse-conv 3D uses the lane-efficient SoA evaluator
    (ops/sparse_conv_fast.py); other representations/configs use the general
    vmapped path."""
    if med.kind == GPIS_SPARSE_CONV and _use_fast_path():
        from ..ops import sparse_conv_fast as fast
        if fast.supports(med.cfg, med.gp):
            return fast.make_value_at(med.cfg, med.gp, state.coeff3, ro, rd,
                                      pss, scene_seed)
        if fast.supports_1d(med.cfg, med.gp):
            return fast.make_value_at_1d(med.cfg, med.gp, state.coeff1, ro,
                                         rd, pss, scene_seed)
    vf = make_value_fn(med, scene_seed)

    def value_at_row(t):
        p = ro + t[:, None] * rd
        return vf(state.coeff3, state.coeff1, p, t - near, rd, pss,
                  state.info_t)

    def value_at(t):
        if t.ndim == 2:  # [S, R] block from the chunked march
            return jax.vmap(value_at_row)(t)
        return value_at_row(t)

    return value_at


# ---------------------------------------------------------------------------
# The march (SparseConvolutionNoiseMedium::intersectGP, :102-183)
# ---------------------------------------------------------------------------

def march(med, value_at, ro, rd, near, far, state, pss, u_jitter, active,
          refine=True):
    """Fixed-step sign-change march over the ray batch, `march_block` steps
    per while-iteration.

    Evaluating a block of steps per iteration turns the [R] per-step tensors
    into [S, R] blocks (more lanes per dispatch) and divides the sequential
    while-loop trip count by S — the TPU analog of the reference's scalar
    step loop (SparseConvolutionNoiseMedium.cpp:132-174).

    The crossing is then localized by fixed-depth bisection (12 halvings of
    one step) instead of the reference's sequential intp*=0.9 secant shrink
    (:143-160): branchless, bounded, and returns a point on the crossed side
    of the first sign change, same contract as the reference.

    Returns dict(hit[R], t[R], sign0[R]).
    """
    R = ro.shape[0]
    S = med.march_block
    step = jnp.minimum(med.step_size, (far - near) / med.min_step)
    step = jnp.maximum(step, 1e-6)

    f0, _ = value_at(near)
    sign0 = jnp.where(f0 < 0, -1, 1)

    t1 = near + step * u_jitter
    offs = jnp.arange(S, dtype=jnp.float32)[:, None]  # [S,1]

    max_blocks = max(med.max_march_steps // S, 1)

    def cond(c):
        return jnp.any(c["marching"]) & (c["it"] < max_blocks)

    def body(c):
        t = c["t"]  # [R] block start
        ts = t[None, :] + step[None, :] * offs  # [S,R]
        fs, _ = value_at(ts)
        signs = jnp.where(fs < 0, -1, 1)

        absorb = (~state.first_scatter) & c["first_block"]  # [R]
        new_sign0 = jnp.where(absorb, signs[0], c["sign0"])

        in_range = ts < far[None, :]
        flips = (signs != new_sign0[None, :]) & in_range
        # the absorbed first step can't flip (reference step==1 handling)
        flips = flips.at[0, :].set(flips[0] & ~absorb)
        any_flip = jnp.any(flips, axis=0) & c["marching"]
        idx = jnp.argmax(flips, axis=0)  # first flip index

        t_hi = t + step * idx.astype(jnp.float32)
        # one-hot row select ([S,R] x [S,R] sum) instead of take_along_axis:
        # the gather lowers to a scalar loop on TPU and dominated the march
        # body (profiled); S is tiny so the arithmetic form fuses free
        rows = jnp.arange(S, dtype=jnp.int32)[:, None]
        f_hi = jnp.sum(jnp.where(rows == idx[None, :], fs, 0.0), axis=0)
        f_im1 = jnp.sum(jnp.where(rows == jnp.maximum(idx - 1, 0)[None, :],
                                  fs, 0.0), axis=0)
        f_lo = jnp.where(idx == 0, c["pf"], f_im1)

        # value at the last in-range step feeds the next block's f_lo
        last_f = fs[S - 1]

        return {
            "it": c["it"] + 1,
            "t": jnp.where(c["marching"], t + step * S, t),
            "pf": jnp.where(c["marching"], last_f, c["pf"]),
            "sign0": new_sign0,
            "first_block": jnp.zeros_like(c["first_block"]),
            "crossed": c["crossed"] | any_flip,
            "t_hi": jnp.where(any_flip, t_hi, c["t_hi"]),
            "f_hi": jnp.where(any_flip, f_hi, c["f_hi"]),
            "f_lo": jnp.where(any_flip, f_lo, c["f_lo"]),
            "marching": c["marching"] & ~any_flip & (t + step * S < far),
        }

    init = {
        "it": jnp.int32(0),
        "t": t1, "pf": f0, "sign0": sign0,
        "first_block": jnp.ones(R, bool),
        "crossed": jnp.zeros(R, bool),
        "t_hi": far,
        "f_hi": jnp.zeros(R), "f_lo": f0,
        "marching": active & (t1 < far),
    }
    out = jax.lax.while_loop(cond, body, init)

    crossed = out["crossed"]
    sign0 = out["sign0"]

    if not refine:
        return {"hit": crossed & active, "t": jnp.where(crossed, out["t_hi"],
                                                        far), "sign0": sign0}

    # Illinois false-position toward the first crossing inside
    # [t_hi - step, t_hi].  The march body already captured the bracket
    # values (f_lo on the start side, f_hi on the crossed side), so the
    # secant estimate converges superlinearly on the smooth GP field —
    # 6 evaluations replace r4's 12 sign-only bisection halvings at equal
    # or better localization (the reference's own refinement is the
    # value-driven intp*=0.9 secant shrink,
    # media/SparseConvolutionNoiseMedium.cpp:143-160).
    def falsi(_, c):
        lo, hi, flo, fhi = c
        denom = flo - fhi
        mid_s = lo + flo * (hi - lo) / jnp.where(jnp.abs(denom) < 1e-30,
                                                 1.0, denom)
        mid = jnp.where((jnp.abs(denom) < 1e-30) | (mid_s <= lo)
                        | (mid_s >= hi), 0.5 * (lo + hi), mid_s)
        fm, _ = value_at(jnp.where(crossed, mid, near))
        on_start_side = jnp.where(fm < 0, -1, 1) == sign0
        return (jnp.where(crossed & on_start_side, mid, lo),
                jnp.where(crossed & ~on_start_side, mid, hi),
                jnp.where(on_start_side, fm, flo * 0.5),
                jnp.where(on_start_side, fhi * 0.5, fm))

    lo0 = jnp.maximum(out["t_hi"] - step, near)
    lo, hi, _, _ = jax.lax.fori_loop(
        0, 6, falsi, (lo0, out["t_hi"], out["f_lo"], out["f_hi"]))
    t_hit = jnp.where(crossed, hi, far)
    return {"hit": crossed & active, "t": jnp.where(active, t_hit, far),
            "sign0": sign0}


# ---------------------------------------------------------------------------
# Gradient sampling at segment ends
# ---------------------------------------------------------------------------

def sample_gradient(med, scene_seed, p, t_seg, rd, state, pss):
    """Medium-specific gradient/normal draw
    (SparseConvolutionNoiseMedium.cpp:93-100,
     WeightSpaceGaussianProcessMedium.cpp:64-157)."""
    cfg, gp = med.cfg, med.gp

    if med.normal_method in (NORMAL_BECKMANN, NORMAL_GGX):
        # NDF shortcut (FunctionSpaceGaussianProcessMedium.cpp:305-342):
        # normal ~ visible-normal distribution around the mean gradient with
        # alpha = compute_beckmann_roughness(p)
        from ..utils.vecmath import (frame_to_local, frame_to_world,
                                     safe_normalize, tangent_frame)
        from . import ndf as nd
        dist = nd.BECKMANN if med.normal_method == NORMAL_BECKMANN else nd.GGX

        def one(p_i, rd_i, pss_i, gid_i):
            n_mean = safe_normalize(gp.mean_grad_by_id(p_i, gid_i))
            t, b = tangent_frame(n_mean)
            wi_l = frame_to_local(t, b, n_mean, -rd_i)
            wi_l = jnp.stack([wi_l[0], wi_l[1],
                              jnp.maximum(jnp.abs(wi_l[2]), 1e-4)])
            alpha = jnp.minimum(gp.cov.compute_beckmann_roughness(p_i), 10.0)
            key = trng.xxhash32_4(pss_i[0], pss_i[1], pss_i[2],
                                  pss_i[3] ^ jnp.uint32(0x9D2C5680))
            key = key ^ jnp.uint32(scene_seed)
            u1 = trng.uniform(key, jnp.uint32(0))
            u2 = trng.uniform(key, jnp.uint32(1))
            if dist == nd.GGX:
                m = nd.sample_vndf_ggx(wi_l, alpha, u1, u2)
            else:
                m = nd.sample_vndf_beckmann(wi_l, alpha, u1, u2)
            return frame_to_world(t, b, n_mean, m)

        return jax.vmap(one)(p, rd, pss, state.last_gp_id)

    if med.kind == GPIS_WEIGHT_SPACE:
        def one(p_i, pss_i):
            real = _ws_real(med, pss_i, scene_seed)
            return ws.evaluate_gradient(real, gp, p_i)
        return jax.vmap(one)(p, pss)

    def one(c3, c1, p_i, t_i, rd_i, pss_i, it_i):
        return sc.eval_gradient(cfg, gp, c3, c1, p_i, t_i, rd_i, pss_i,
                                scene_seed, it_i)

    return jax.vmap(one)(state.coeff3, state.coeff1, p, t_seg, rd, pss,
                         state.info_t)


# ---------------------------------------------------------------------------
# Classic homogeneous medium (media/HomogeneousMedium.cpp) — gray version
# ---------------------------------------------------------------------------

def _law(med):
    from . import transmittance as tr
    if med.law is None:
        return tr.make_law(tr.T_EXPONENTIAL, params=(1.0, 0, 0, 0))
    return med.law


def _sample_distance_homogeneous(med, ro, rd, near, far, state, pss,
                                 u_jitter, active):
    """HomogeneousMedium::sampleDistance, chromatic: sample a free-flight
    in one uniformly-chosen color channel, weight by the per-channel
    transmittance over the averaged pdf (HomogeneousMedium.cpp:83-103)."""
    from . import transmittance as tr
    law = _law(med)
    sig_t = jnp.maximum(med.sigma_t, 1e-9)  # [3]
    sig_s = med.sigma_s * med.density  # [3]
    key = trng.xxhash32_4(pss[:, 0], pss[:, 1], pss[:, 2],
                          pss[:, 3] ^ jnp.uint32(0x7E57A110))
    u2 = trng.uniform(key, jnp.uint32(0))
    uc = trng.uniform(key, jnp.uint32(1))
    comp = jnp.minimum((uc * 3.0).astype(jnp.int32), 2)  # nextDiscrete(3)
    sig_tc = sig_t[comp]  # [R]
    u1 = jnp.clip(u_jitter, 1e-7, 1.0 - 1e-7)
    start_surf = state.first_scatter
    tau_s = jnp.where(start_surf,
                      tr.sample_tau(law, u1, u2, True),
                      tr.sample_tau(law, u1, u2, False))
    t = near + tau_s / sig_tc
    far_eff = jnp.where(far < 1e30, far, near + 2000.0)
    hit = active & (t < far_eff)
    t_out = jnp.where(hit, t, far_eff)
    tau = (t_out - near)[:, None] * sig_t[None, :]  # [R,3]

    def regimes(ss):
        ev_m = tr.eval_tr(law, tau, ss, False)  # [R,3]
        pdf_m = jnp.mean(sig_t[None, :] * tr.medium_pdf(law, tau, ss),
                         axis=-1)  # [R] channel-avg (.avg() in reference)
        w_m = (sig_s[None, :] * tr.sigma_bar(law) * ev_m
               / jnp.maximum(pdf_m, 1e-12)[:, None])
        ev_s = tr.eval_tr(law, tau, ss, True)
        p_s = jnp.mean(tr.surface_probability(law, tau, ss), axis=-1)
        w_s = ev_s / jnp.maximum(p_s, 1e-12)[:, None]
        return w_m, w_s
    wm_t, ws_t = regimes(True)
    wm_f, ws_f = regimes(False)
    w_med = jnp.where(start_surf[:, None], wm_t, wm_f)
    w_sur = jnp.where(start_surf[:, None], ws_t, ws_f)
    weight = jnp.where(hit[:, None], w_med, w_sur)
    new_state = replace(
        state,
        first_scatter=jnp.where(active, False, state.first_scatter),
        info_t=jnp.where(active, state.info_t + t_out - near, state.info_t),
        bounce=jnp.where(active, state.bounce + 1, state.bounce))
    return ({"exited": ~hit, "t": t_out, "weight": weight,
             "aniso": jnp.zeros_like(ro).at[:, 0].set(1.0),
             "gp_id": jnp.zeros(ro.shape[0], jnp.int32),
             "scheme": jnp.zeros(ro.shape[0], jnp.int32),
             "failed": jnp.zeros(ro.shape[0], bool)}, new_state)


# ---------------------------------------------------------------------------
# Heterogeneous classic media (Exponential/Atmospheric/Voxel *.cpp) — one
# fixed-step optical-depth marcher over a density field
# ---------------------------------------------------------------------------

def hetero_density(med, p):
    """Density multiplier at world point p [*,3] (scalar field)."""
    q = med.field_params
    if med.kind == MEDIUM_EXPONENTIAL:
        # ExponentialMedium: rho = exp(-falloff * dot(p - p0, up))
        up = q[0:3]
        falloff = q[3]
        h = jnp.sum((p - q[4:7]) * up, axis=-1)
        return jnp.exp(-falloff * h)
    if med.kind == MEDIUM_ATMOSPHERIC:
        # AtmosphericMedium: rho = exp(-(|p - c| - R)/H)
        c = q[0:3]
        R, H = q[3], q[4]
        r = jnp.linalg.norm(p - c, axis=-1)
        return jnp.exp(-jnp.maximum(r - R, 0.0) / jnp.maximum(H, 1e-6))
    # voxel: trilinear lookup in bbox [q[0:3], q[0:3]+q[4:7]]
    g = med.grid
    D, H_, W = g.shape
    rel = (p - q[0:3]) / jnp.maximum(q[4:7], 1e-9)
    inside = jnp.all((rel >= 0.0) & (rel <= 1.0), axis=-1)
    gx = rel[..., 0] * (W - 1)
    gy = rel[..., 1] * (H_ - 1)
    gz = rel[..., 2] * (D - 1)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, H_ - 2)
    z0 = jnp.clip(jnp.floor(gz).astype(jnp.int32), 0, D - 2)
    fx, fy, fz = gx - x0, gy - y0, gz - z0

    def at(dz, dy, dx):
        return g[z0 + dz, y0 + dy, x0 + dx]

    c00 = at(0, 0, 0) * (1 - fx) + at(0, 0, 1) * fx
    c01 = at(0, 1, 0) * (1 - fx) + at(0, 1, 1) * fx
    c10 = at(1, 0, 0) * (1 - fx) + at(1, 0, 1) * fx
    c11 = at(1, 1, 0) * (1 - fx) + at(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return jnp.where(inside, c0 * (1 - fz) + c1 * fz, 0.0)


_HETERO_STEPS = 256


def _density_march(med, ro, rd, near, far, d_target):
    """Fixed-step accumulation of D(t) = int rho dt; returns
    (t where D reaches d_target [R] (= far when never), D_total [R],
    rho at the hit point [R]).  Uniform trip count: one [S,R] VPU block."""
    R = ro.shape[0]
    dt = (far - near) / _HETERO_STEPS
    s = jnp.arange(_HETERO_STEPS, dtype=jnp.float32)
    ts = near[None, :] + (s[:, None] + 0.5) * dt[None, :]       # [S,R]
    ps = ro[None, :, :] + ts[:, :, None] * rd[None, :, :]        # [S,R,3]
    rho = hetero_density(med, ps.reshape(-1, 3)).reshape(
        _HETERO_STEPS, R)
    dD = rho * dt[None, :]
    cum = jnp.cumsum(dD, axis=0)
    d_total = cum[-1]
    reached = cum >= d_target[None, :]
    idx = jnp.argmax(reached, axis=0)
    any_r = jnp.any(reached, axis=0)
    cum_prev = jnp.where(idx > 0,
                         jnp.take_along_axis(
                             cum, jnp.maximum(idx - 1, 0)[None, :],
                             axis=0)[0], 0.0)
    d_here = jnp.take_along_axis(dD, idx[None, :], axis=0)[0]
    rho_hit = jnp.take_along_axis(rho, idx[None, :], axis=0)[0]
    frac = jnp.clip((d_target - cum_prev) / jnp.maximum(d_here, 1e-12),
                    0.0, 1.0)
    t_hit = near + (idx.astype(jnp.float32) + frac) * dt
    return jnp.where(any_r, t_hit, far), d_total, jnp.where(
        any_r, rho_hit, 0.0)


def _sample_distance_hetero(med, ro, rd, near, far, state, pss, u_jitter,
                            active):
    """Exponential/Atmospheric/Voxel sampleDistance, chromatic: sample a
    per-channel free-flight density target, march the density integral,
    weight by per-channel transmittance over the channel-averaged pdf
    (ExponentialMedium.cpp:124-146)."""
    from . import transmittance as tr
    law = _law(med)
    sig_t = jnp.maximum(med.sigma_t, 1e-9)  # [3]
    sig_s = med.sigma_s * med.density  # [3]
    far_eff = jnp.where(far < 1e30, far, near + 2000.0)
    key = trng.xxhash32_4(pss[:, 0], pss[:, 1], pss[:, 2],
                          pss[:, 3] ^ jnp.uint32(0x48E7E120))
    u2 = trng.uniform(key, jnp.uint32(0))
    uc = trng.uniform(key, jnp.uint32(1))
    comp = jnp.minimum((uc * 3.0).astype(jnp.int32), 2)
    sig_tc = sig_t[comp]
    u1 = jnp.clip(u_jitter, 1e-7, 1.0 - 1e-7)
    start_surf = state.first_scatter
    tau_s = jnp.where(start_surf, tr.sample_tau(law, u1, u2, True),
                      tr.sample_tau(law, u1, u2, False))
    t_hit, d_total, rho_hit = _density_march(med, ro, rd, near, far_eff,
                                             tau_s / sig_tc)
    hit = active & (t_hit < far_eff)
    t_out = jnp.where(hit, t_hit, far_eff)
    d_at = jnp.where(hit, tau_s / sig_tc, d_total)  # density integral at t
    tau = d_at[:, None] * sig_t[None, :]  # [R,3]

    def regimes(ss):
        ev_m = tr.eval_tr(law, tau, ss, False)
        pdf_m = jnp.mean(rho_hit[:, None] * sig_t[None, :]
                         * tr.medium_pdf(law, tau, ss), axis=-1)
        w_m = (rho_hit[:, None] * sig_s[None, :] * tr.sigma_bar(law) * ev_m
               / jnp.maximum(pdf_m, 1e-12)[:, None])
        ev_s = tr.eval_tr(law, tau, ss, True)
        p_s = jnp.mean(tr.surface_probability(law, tau, ss), axis=-1)
        w_s = ev_s / jnp.maximum(p_s, 1e-12)[:, None]
        return w_m, w_s
    wm_t, ws_t = regimes(True)
    wm_f, ws_f = regimes(False)
    w_med = jnp.where(start_surf[:, None], wm_t, wm_f)
    w_sur = jnp.where(start_surf[:, None], ws_t, ws_f)
    weight = jnp.where(hit[:, None], w_med, w_sur)
    new_state = replace(
        state,
        first_scatter=jnp.where(active, False, state.first_scatter),
        info_t=jnp.where(active, state.info_t + t_out - near, state.info_t),
        bounce=jnp.where(active, state.bounce + 1, state.bounce))
    return ({"exited": ~hit, "t": t_out, "weight": weight,
             "aniso": jnp.zeros_like(ro).at[:, 0].set(1.0),
             "gp_id": jnp.zeros(ro.shape[0], jnp.int32),
             "scheme": jnp.zeros(ro.shape[0], jnp.int32),
             "failed": jnp.zeros(ro.shape[0], bool)}, new_state)


# ---------------------------------------------------------------------------
# Function-space driver (models/fs_medium.py does the per-ray chunked work)
# ---------------------------------------------------------------------------

def _sample_distance_fs(med, scene_seed, ro, rd, near, far, state, pss,
                        u_jitter, active):
    from . import fs_medium as fs

    is_csg = med.gp.csg_right is not None
    if is_csg:
        if med.cfg.ctxt == sc.CTXT_GLOBAL:
            raise ValueError(
                "csg GPs are not supported with the Global correlation "
                "context (bounded ring would need per-child duplication); "
                "use renewal/renewal+ (reference paper configs)")
        res = jax.vmap(lambda o, d, nr, fr, fsc, cvl, cgl, cvr, cgr, hc,
                       it, ps, uo, ac:
                       fs.sample_distance_fs_one_csg(
                           med, scene_seed, o, d, nr, fr, fsc, cvl, cgl,
                           cvr, cgr, hc, it, ps, uo, ac))(
            ro, rd, near, far, state.first_scatter, state.last_val,
            jax.vmap(dot)(state.last_aniso, rd), state.fs_val2,
            jax.vmap(dot)(state.fs_grad2, rd), ~state.first_scatter,
            state.info_t, pss, u_jitter, active)
        res["end_val"] = res["val_l"]
        res["ring_pts"], res["ring_vals"] = state.fs_pts, state.fs_vals
        res["ring_dts"], res["ring_n"] = state.fs_dts, state.fs_n
    else:
        res = jax.vmap(lambda o, d, nr, fr, fsc, cv, cg, hc, it, ps, uo, ac,
                       rp, rv, rdt, rn:
                       fs.sample_distance_fs_one(med, scene_seed, o, d, nr,
                                                 fr, fsc, cv, cg, hc, it, ps,
                                                 uo, ac, rp, rv, rdt, rn))(
            ro, rd, near, far, state.first_scatter, state.last_val,
            jax.vmap(dot)(state.last_aniso, rd), ~state.first_scatter,
            state.info_t, pss, u_jitter, active,
            state.fs_pts, state.fs_vals, state.fs_dts, state.fs_n)

    hit = res["hit"]
    t = res["t"]
    grad = res["grad"]
    ip = ro + t[:, None] * rd

    grad_ok = jnp.isfinite(jnp.sum(grad, axis=-1))
    wrong_side = hit & (dot(grad, rd) > 0.0)
    zero_grad = hit & (dot(grad, grad) < 1e-7)
    failed = active & (wrong_side | zero_grad | ~grad_ok)
    # sanitize for downstream masked math (failed paths are killed anyway,
    # GaussianProcessMedium.cpp:291-314 returns false)
    fallback = jnp.zeros_like(grad).at[:, 0].set(1.0)
    grad = jnp.where((grad_ok & ~zero_grad)[:, None], grad, fallback)

    sig_s = med.sigma_s * med.density
    sig_t = jnp.maximum(med.sigma_t, 1e-9)
    weight = jnp.where(hit[:, None], (sig_s / sig_t)[None, :], 1.0)

    # renewal carry: for CSG, last_val/last_aniso hold the LEFT child's own
    # (value, sampled grad) and fs_val2/fs_grad2 the right's
    # (GPRealNodeCsg::applyMemory recurses into both children); non-CSG
    # keeps the r3 behavior (carry == picked grad, 0 at a crossing)
    carry_grad = res["grad_l"] if is_csg else grad
    carry_val = (res["val_l"] if is_csg
                 else jnp.where(hit, 0.0, res["end_val"]))
    new_state = replace(
        state,
        first_scatter=jnp.where(active, False, state.first_scatter),
        last_aniso=jnp.where(active[:, None], carry_grad, state.last_aniso),
        last_val=jnp.where(active, carry_val, state.last_val),
        last_gp_id=jnp.where(active & hit, res["gp_id"], state.last_gp_id),
        scheme=jnp.where(active, sc.SCHEME_UNI, state.scheme),
        info_t=jnp.where(active, state.info_t + t - near, state.info_t),
        bounce=jnp.where(active, state.bounce + 1, state.bounce),
        fs_pts=jnp.where(active[:, None, None], res["ring_pts"],
                         state.fs_pts),
        fs_vals=jnp.where(active[:, None], res["ring_vals"], state.fs_vals),
        fs_dts=jnp.where(active[:, None], res["ring_dts"], state.fs_dts),
        fs_n=jnp.where(active, res["ring_n"], state.fs_n),
        fs_val2=(jnp.where(active, res["val_r"], state.fs_val2)
                 if is_csg else state.fs_val2),
        fs_grad2=(jnp.where(active[:, None], res["grad_r"], state.fs_grad2)
                  if is_csg else state.fs_grad2),
    )
    ip_fs = ro + t[:, None] * rd
    weight = weight * jnp.where(hit[:, None], med.gp.color(ip_fs), 1.0)
    return ({"exited": ~hit, "t": t, "weight": weight, "aniso": grad,
             "emission": jnp.where(hit[:, None], med.gp.emission(ip_fs), 0.0),
             "gp_id": res["gp_id"], "scheme": jnp.zeros_like(res["gp_id"]),
             "failed": failed}, new_state)


# ---------------------------------------------------------------------------
# sampleDistance / transmittance drivers
# (GaussianProcessMedium.cpp:221-341 / :343-393)
# ---------------------------------------------------------------------------

def _precondition(med, scene_seed, ro, rd, near, state, pss, active):
    """Condition the fresh per-bounce realization at the secondary-ray start
    (SparseConvolutionNoiseMedium.cpp:117-123)."""
    if med.kind != GPIS_SPARSE_CONV or not med.cfg.activate_conditioning:
        return state
    cfg, gp = med.cfg, med.gp
    need = active & (~state.first_scatter)
    p0 = ro + near[:, None] * rd

    def one(p_i, rd_i, tv, tg, pss_i, it_i, c3, c1):
        return sc.conditioning(cfg, gp, c3, c1, p_i, rd_i, tv, tg, pss_i,
                               scene_seed, it_i, active=True)

    from ..utils.nanprobe import nanprobe as _np_
    la = _np_(state.last_aniso, "pc_last_aniso")
    lv = _np_(state.last_val, "pc_last_val")
    c3n, c1n = jax.vmap(one)(p0, rd, lv, la, pss,
                             state.info_t, state.coeff3, state.coeff1)
    c3n = sc.Coeffs(value_scale=_np_(c3n.value_scale, "pc_c3_vs"),
                    gradient_scale=_np_(c3n.gradient_scale, "pc_c3_gs"),
                    ray_origin=_np_(c3n.ray_origin, "pc_c3_ro"))
    coeff3 = _select(need, c3n, state.coeff3)
    coeff1 = _select(need, c1n, state.coeff1)
    return replace(state, coeff3=coeff3, coeff1=coeff1)


def sample_distance(med, scene_seed, ro, rd, near, far, state, pss, u_jitter,
                    active):
    """Batched Medium::sampleDistance.

    Returns (result dict, new state).  result: exited[R] (no medium hit),
    t[R], weight[R,3], aniso[R,3], gp_id[R], scheme[R], failed[R] (path
    should be killed: wrong-sided/zero gradient,
    GaussianProcessMedium.cpp:291-314)."""
    far_eff = jnp.where(far < 1e30, far, near + 2000.0)  # Ray::infinity clamp (GaussianProcessMedium.cpp:228-231)
    far_eff = _clamp_far_to_bounds(med, ro, rd, near, far_eff)

    if med.kind == GPIS_FUNCTION_SPACE:
        return _sample_distance_fs(med, scene_seed, ro, rd, near, far_eff,
                                   state, pss, u_jitter, active)
    if med.kind == MEDIUM_HOMOGENEOUS:
        return _sample_distance_homogeneous(med, ro, rd, near, far, state,
                                            pss, u_jitter, active)
    if med.kind in _HETERO_KINDS:
        return _sample_distance_hetero(med, ro, rd, near, far, state, pss,
                                       u_jitter, active)

    state = _precondition(med, scene_seed, ro, rd, near, state, pss, active)
    value_at = make_value_at(med, scene_seed, ro, rd, near, state, pss)
    # The march is a discrete search: run it on fully-detached inputs so the
    # while_loop never sees tangents (reverse-mode cannot traverse it), then
    # reattach hyperparameter gradients through the IFT evals below.
    med_d, ro_d, rd_d, near_d, far_d, state_d = _detach(
        (med, ro, rd, near, far_eff, state))
    value_at_d = make_value_at(med_d, scene_seed, ro_d, rd_d, near_d,
                               state_d, pss)
    if med.kind == GPIS_WEIGHT_SPACE and med.ws_sphere_trace:
        # step_size == 0: adaptive range-bounded sphere trace instead of the
        # fixed-step march (WeightSpaceGaussianProcessMedium.cpp:186-235)
        near_st = near_d + jnp.where(state_d.first_scatter, 0.0,
                                     2e-3)  # skip the start surface
        from ..ops import ws_trace_pallas as wst
        from ..ops.sparse_conv_fast import _use_pallas as _scp_on
        if wst.supports(med_d.gp) and _scp_on():
            import jax as _jax
            real_b = jax.vmap(lambda ps: _ws_real(med_d, ps, scene_seed))(
                pss)
            hit_st, t_st = wst.sphere_trace_batch(
                real_b, med_d.gp, ro_d, rd_d, near_st, far_d,
                interpret=_jax.default_backend() == "cpu")
        else:
            def one_st(o, d, nr, fr, ps):
                real = _ws_real(med_d, ps, scene_seed)
                return ws.sphere_trace_segment(real, med_d.gp, o, d, nr, fr)
            hit_st, t_st = jax.vmap(one_st)(ro_d, rd_d, near_st, far_d, pss)
        m = {"hit": hit_st & active, "t": jnp.where(active, t_st, far_d),
             "sign0": jnp.ones_like(t_st)}
    else:
        from ..ops import ws_trace_pallas as wst
        from ..ops.sparse_conv_fast import _use_pallas as _scp_on
        if (med.kind == GPIS_WEIGHT_SPACE and wst.supports(med_d.gp)
                and _scp_on()):
            # fixed-step WS march with the basis VMEM-resident (BASELINE
            # config 4a, step_size > 0) — same contract/semantics as march()
            import jax as _jax
            real_b = jax.vmap(lambda ps: _ws_real(med_d, ps, scene_seed))(
                pss)
            step_w = jnp.minimum(med_d.step_size,
                                 (far_d - near_d) / med_d.min_step)
            step_w = jnp.maximum(step_w, 1e-6)
            m = wst.fixed_march_batch(
                real_b, med_d.gp, ro_d, rd_d, near_d, far_d, step_w,
                u_jitter, ~state_d.first_scatter, active=active,
                max_steps=med_d.max_march_steps,
                interpret=_jax.default_backend() == "cpu")
            m = {"hit": m["hit"] & active,
                 "t": jnp.where(active, m["t"], far_d),
                 "sign0": m["sign0"]}
        else:
            m = march(med_d, value_at_d, ro_d, rd_d, near_d, far_d, state_d,
                      pss, u_jitter, active)

    hit = m["hit"]
    t = m["t"]
    f_at_t, gid_at_t = value_at(jax.lax.stop_gradient(t))
    end_val = jax.lax.stop_gradient(f_at_t)

    # Differentiable crossing: the march output satisfies f(t*, theta) ~= 0;
    # reattach hyperparameter gradients via the implicit function theorem
    # dt*/dtheta = -(df/dtheta)/(df/dt) as one Newton step around the detached
    # root.  This mirrors the secant refinement's fixed point
    # (SparseConvolutionNoiseMedium.cpp:143-160) and is the standard
    # differentiable-SDF-rendering estimator (SURVEY.md §7 design stance).
    # df/dt comes from the detached evaluator's own t-derivative (one VJP of
    # the realization; f_i depends only on t_i so the ones-cotangent pull
    # back IS the per-ray derivative) so that the conditioned gradient below
    # can be sampled at the REATTACHED point: r4 evaluated sample_gradient at
    # the detached root, severing the d(normal)/dtheta = grad_p(normal).dt*
    # chain that feeds renewal conditioning and shading frames — the l
    # (lengthScale) image gradient came out with the wrong SIGN vs FD
    # (r5 artifacts/debug_adfd_r5.py; sigma was unaffected because the
    # missing term is small for pure amplitude changes).
    from ..utils.nanprobe import nanprobe as _np_
    f_at_t = _np_(f_at_t, "sd_f_at_t")
    _, vjp_t = jax.vjp(lambda tt: value_at_d(tt)[0],
                       jax.lax.stop_gradient(t))
    dfdt = jax.lax.stop_gradient(vjp_t(jnp.ones_like(t))[0])
    ift_ok = hit & (jnp.abs(dfdt) > 1e-3)  # grazing crossings: detach
    corr = ((f_at_t - jax.lax.stop_gradient(f_at_t))
            / jnp.where(ift_ok, dfdt, 1.0))
    corr = _np_(corr, "sd_corr")
    t = t - jnp.where(ift_ok, corr, 0.0)
    ip = ro + t[:, None] * rd
    # conditioned gradient at the reattached crossing (primal identical to
    # the detached point — corr's primal is 0)
    grad = sample_gradient(med, scene_seed, ip, t - near, rd, state, pss)
    grad = _np_(grad, "sd_grad")

    grad_ok = jnp.isfinite(jnp.sum(grad, axis=-1))
    wrong_side = hit & (dot(grad, rd) > 0.0)
    zero_grad = hit & (dot(grad, grad) < 1e-7)
    failed = active & (wrong_side | zero_grad | ~grad_ok)

    # weight: GP color * sigma_s/sigma_t at the scatter point (:316-326);
    # volume emission from the mean's emission field (:317)
    sig_s = med.sigma_s * med.density
    sig_t = jnp.maximum(med.sigma_t, 1e-9)
    color = med.gp.color(ip)
    w_hit = color * (sig_s / sig_t)[None, :]
    weight = jnp.where(hit[:, None], w_hit, 1.0)
    med_emission = jnp.where(hit[:, None], med.gp.emission(ip), 0.0)

    scheme = jax.vmap(lambda p_i: sc.sampling_scheme(med.cfg, med.gp, p_i))(ip)
    scheme = jnp.where(hit, scheme, sc.SCHEME_UNI)

    new_state = replace(
        state,
        first_scatter=jnp.where(active, False, state.first_scatter),
        last_aniso=jnp.where(active[:, None], grad, state.last_aniso),
        last_val=jnp.where(active, jnp.where(hit, 0.0, end_val),
                           state.last_val),
        last_gp_id=jnp.where(active & hit, gid_at_t, state.last_gp_id),
        scheme=jnp.where(active, scheme, state.scheme),
        info_t=jnp.where(active, state.info_t + t - near, state.info_t),
        bounce=jnp.where(active, state.bounce + 1, state.bounce),
    )
    import os as _os
    dbg = {}
    if _os.environ.get("TUNGSTEN_TPU_DEBUG_STASH"):
        dbg = {"dbg_f_at_t": f_at_t, "dbg_corr": corr,
               "dbg_t_raw": m["t"], "dbg_grad_raw": grad}
    return ({"exited": ~hit, "t": t, "weight": weight, "aniso": grad,
             "emission": med_emission,
             "gp_id": gid_at_t, "scheme": scheme, "failed": failed, **dbg},
            new_state)


def transmittance(med, scene_seed, ro, rd, near, far, state, pss, u_jitter,
                  active):
    """Binary visibility on the correlated realization
    (GaussianProcessMedium::transmittance, :343-393).

    The caller passes a *cloned* state (NEE semantics: TraceBase.cpp:291-294
    sets firstScatter=true for surface NEE; volume NEE keeps conditioning and
    overrides lastAniso via phase->evalGrad, TraceBase.cpp:370-374).
    Returns transmittance[R,3] (binary {0,1} per channel for GPIS media;
    chromatic law transmittance for classic media).
    """
    far_eff = jnp.where(far < 1e30, far, near + 2000.0)  # Ray::infinity clamp (GaussianProcessMedium.cpp:228-231)
    far_eff = _clamp_far_to_bounds(med, ro, rd, near, far_eff)
    if med.kind == GPIS_FUNCTION_SPACE:
        res, _ = _sample_distance_fs(med, scene_seed, ro, rd, near, far_eff,
                                     state, pss, u_jitter, active)
        t1 = jnp.where(active, jnp.where(res["exited"], 1.0, 0.0), 1.0)
        return jnp.broadcast_to(t1[:, None], (t1.shape[0], 3))
    if med.kind == MEDIUM_HOMOGENEOUS:
        # chromatic law transmittance (HomogeneousMedium::transmittance;
        # shadow rays end on a surface/light so endOnSurface=true)
        from . import transmittance as tr
        law = _law(med)
        tau = med.sigma_t[None, :] * (far_eff - near)[:, None]  # [R,3]
        tr_s = tr.eval_tr(law, tau, True, True)
        tr_m = tr.eval_tr(law, tau, False, True)
        return jnp.where(active[:, None],
                         jnp.where(state.first_scatter[:, None], tr_s, tr_m),
                         1.0)
    if med.kind in _HETERO_KINDS:
        from . import transmittance as tr
        law = _law(med)
        _, d_total, _ = _density_march(
            med, ro, rd, near, far_eff,
            jnp.full(ro.shape[0], 1e30, jnp.float32))
        tau = d_total[:, None] * med.sigma_t[None, :]  # [R,3]
        tr_s = tr.eval_tr(law, tau, True, True)
        tr_m = tr.eval_tr(law, tau, False, True)
        return jnp.where(active[:, None],
                         jnp.where(state.first_scatter[:, None], tr_s, tr_m),
                         1.0)
    # binary visibility is a discrete event (zero gradient a.e.): march on
    # fully-detached inputs so the while_loop never sees tangents
    med, ro, rd, near, far_eff, state = _detach(
        (med, ro, rd, near, far_eff, state))
    if med.kind == GPIS_WEIGHT_SPACE and med.ws_sphere_trace:
        # same adaptive range-bounded trace as sampleDistance — only the
        # crossed/not bit is consumed (WeightSpaceGaussianProcessMedium
        # inherits GaussianProcessMedium::transmittance's intersectGP call);
        # r4 sent shadow rays through the generic fixed-step march whose
        # [S,R,n] basis contractions dominated the WS pass (profiled at
        # ~2x the camera trace, artifacts/profile_ws_r5.py)
        from ..ops import ws_trace_pallas as wst
        from ..ops.sparse_conv_fast import _use_pallas as _scp_on
        near_st = near + jnp.where(state.first_scatter, 0.0, 2e-3)
        if wst.supports(med.gp) and _scp_on():
            import jax as _jax
            real_b = jax.vmap(lambda ps: _ws_real(med, ps, scene_seed))(pss)
            hit_st, _ = wst.sphere_trace_batch(
                real_b, med.gp, ro, rd, near_st, far_eff,
                interpret=_jax.default_backend() == "cpu")
        else:
            def one_st(o, d, nr, fr, ps):
                real = _ws_real(med, ps, scene_seed)
                return ws.sphere_trace_segment(real, med.gp, o, d, nr, fr)
            hit_st, _ = jax.vmap(one_st)(ro, rd, near_st, far_eff, pss)
        t1 = jnp.where(active, jnp.where(hit_st, 0.0, 1.0), 1.0)
        return jnp.broadcast_to(t1[:, None], (t1.shape[0], 3))
    from ..ops import ws_trace_pallas as wst
    from ..ops.sparse_conv_fast import _use_pallas as _scp_on
    if (med.kind == GPIS_WEIGHT_SPACE and wst.supports(med.gp)
            and _scp_on()):
        import jax as _jax
        real_b = jax.vmap(lambda ps: _ws_real(med, ps, scene_seed))(pss)
        step_w = jnp.minimum(med.step_size, (far_eff - near) / med.min_step)
        step_w = jnp.maximum(step_w, 1e-6)
        m = wst.fixed_march_batch(
            real_b, med.gp, ro, rd, near, far_eff, step_w, u_jitter,
            ~state.first_scatter, active=active,
            max_steps=med.max_march_steps, refine=False,
            interpret=_jax.default_backend() == "cpu")
        t1 = jnp.where(active, jnp.where(m["hit"], 0.0, 1.0), 1.0)
        return jnp.broadcast_to(t1[:, None], (t1.shape[0], 3))
    state = _precondition(med, scene_seed, ro, rd, near, state, pss, active)
    value_at = make_value_at(med, scene_seed, ro, rd, near, state, pss)
    m = march(med, value_at, ro, rd, near, far_eff, state, pss, u_jitter,
              active, refine=False)
    t1 = jnp.where(active, jnp.where(m["hit"], 0.0, 1.0), 1.0)
    return jnp.broadcast_to(t1[:, None], (t1.shape[0], 3))

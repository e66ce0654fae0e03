"""Covariance functions and the sparse-convolution splatting-kernel API.

TPU-native re-design of the reference's CovarianceFunction family
(src/core/math/GPFunctions.hpp:1131-1476 and GPFunctions.cpp:552-1215):
everything is batched jnp math over trailing-axis-3 points, derivatives are
closed form in the hot path (the reference also insists on manual derivatives
there, GPFunctions.hpp:1160-1161), and autodiff (jax.grad) supplies the
general cov derivatives used by the function-space GP.

Three sampling spaces (SparseConvolutionNoise.cpp:241-248):
  - world space: the splat is anisotropic, cells live in world units;
  - isotropic space: world scaled by `world_to_local` so the splat is
    exp(-d^2/2) with cutoff `kernel_scale` (default 3);
  - isotropic ray space: isotropic space rotated so the ray is +z.

A covariance object is a frozen pytree; sigma/l/aniso are differentiable
leaves.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import rng
from ..utils.pytree import static_field, struct
from ..utils.vecmath import dot, mat3_t_vec, mat3_vec, outer3

_SQRT2_OVER_2 = math.sqrt(2.0) / 2.0


def _filter_inv(x):
    """1/x with 0 -> 0 (reference `filterWithZero` on inverse length scales)."""
    return jnp.where(x == 0.0, 0.0, 1.0 / jnp.where(x == 0.0, 1.0, x))


@struct(meta=("use_aniso_mtx", "kernel_scale"))
class SquaredExponentialCov:
    """Stationary squared-exponential covariance with anisotropy.

    cov(a,b) = sigma^2 exp(-|a-b|^2_aniso / (2 l^2)); the associated splat
    kernel in convolution space is exp(-d^2 / l_conv^2 / 2)-shaped with
    l_conv = l*sqrt(2)/2 so that (splat * splat) reproduces cov
    (GPFunctions.cpp:654-679, GPFunctions.hpp:1781-1896).
    """

    sigma: jnp.ndarray
    l: jnp.ndarray
    aniso: jnp.ndarray  # (3,)
    aniso_mtx: jnp.ndarray  # (3,3); used iff use_aniso_mtx
    use_aniso_mtx: bool = static_field(default=False)
    kernel_scale: float = static_field(default=3.0)  # splat cutoff radius (GPFunctions.hpp:1729)

    # -- construction ------------------------------------------------------
    @staticmethod
    def create(sigma=1.0, l=1.0, aniso=(1.0, 1.0, 1.0), aniso_mtx=None,
               kernel_scale=3.0):
        return SquaredExponentialCov(
            sigma=jnp.float32(sigma),
            l=jnp.float32(l),
            aniso=jnp.asarray(aniso, jnp.float32),
            aniso_mtx=(jnp.asarray(aniso_mtx, jnp.float32)
                       if aniso_mtx is not None else jnp.eye(3, dtype=jnp.float32)),
            use_aniso_mtx=aniso_mtx is not None,
            kernel_scale=float(kernel_scale),
        )

    # -- derived quantities (GPFunctions.cpp:654-679) ----------------------
    @property
    def l_conv(self):
        return self.l * _SQRT2_OVER_2

    @property
    def l_aniso(self):
        return self.l_conv * self.aniso

    @property
    def l_aniso_inv(self):
        return _filter_inv(self.l_aniso)

    @property
    def local_to_world(self):
        if self.use_aniso_mtx:
            return self.l_conv * self.aniso_mtx
        return jnp.diag(self.l_aniso)

    @property
    def world_to_local(self):
        if self.use_aniso_mtx:
            return jnp.linalg.inv(self.local_to_world)
        return jnp.diag(self.l_aniso_inv)

    @property
    def inv_cov_world(self):
        """W2L^T W2L — the quadratic form of the world-space splat."""
        w2l = self.world_to_local
        return w2l.T @ w2l

    # -- flags -------------------------------------------------------------
    is_stationary = True
    is_nonstationary_aniso = False
    use_multi_res_grid = False
    has_analytic_spectral_density = True

    # -- pointwise amplitude/scale fields ---------------------------------
    def amplitude(self, p):
        """sparseConvNoiseAmplitude (GPFunctions.cpp:611-613, 711)."""
        return jnp.broadcast_to(self.sigma, p.shape[:-1])

    def lateral_scale(self, p):
        """sparseConvNoiseLateralScale: multi-res grid level driver (==1 stationary)."""
        return jnp.ones(p.shape[:-1], jnp.float32)

    def unscaled_variance(self, p):
        return jnp.ones(p.shape[:-1], jnp.float32)

    def variance(self, p):
        return jnp.broadcast_to(self.sigma**2, p.shape[:-1])

    def nonstat_splat_kernel_scale(self, p):
        """nonStationarySplattingKernelScale (==1 stationary, GPFunctions.hpp:1493)."""
        return jnp.ones(p.shape[:-1], jnp.float32)

    def nonstat_splat_cov_1d(self, p_query, p_center, dir_local):
        """getNonstationaryCovSplatCov1D (==1 stationary, GPFunctions.hpp:1213)."""
        return jnp.ones(p_query.shape[:-1], jnp.float32)

    def world_sampling_spatial_scale(self):
        return jnp.float32(1.0)

    # -- space transforms (GPFunctions.cpp:631-649) ------------------------
    def pos_world_to_local(self, v, local_scale=1.0):
        return mat3_vec(self.world_to_local, v) / local_scale

    def pos_local_to_world(self, v, local_scale=1.0):
        return mat3_vec(self.local_to_world, v) * local_scale

    def grad_world_to_local(self, g, local_scale=1.0):
        return mat3_t_vec(self.local_to_world, g) * local_scale

    def grad_local_to_world(self, g, local_scale=1.0):
        return mat3_t_vec(self.world_to_local, g) / local_scale

    def local_to_world_inv_transpose(self, p):
        """Gradient transform iso->world as a matrix (GPFunctions.cpp:649)."""
        return self.world_to_local.T

    # -- splat cell radius (GPFunctions.cpp:696-709) -----------------------
    def splat_radius(self, is_identity, local_scale=1.0):
        if is_identity:
            return jnp.float32(self.kernel_scale)
        if self.use_aniso_mtx:
            end = jnp.sum(self.local_to_world, axis=1)
            mtx_factor = jnp.max(end)
        else:
            mtx_factor = jnp.max(self.l_aniso)
        return self.kernel_scale * local_scale * mtx_factor

    # -- 3D splat value/grad/hess (GPFunctions.cpp:774-833) ----------------
    def _inv_cov_mtx(self, is_cov, is_isotropic, global_scale, p_world):
        """Quadratic form of exp(-ab^T M ab) (GPFunctions.cpp:774-802).

        local_scale==1 for stationary kernels; the nonstationary wrapper
        overrides this.
        """
        if is_isotropic:
            m = jnp.eye(3, dtype=jnp.float32)
        else:
            m = self.inv_cov_world / (global_scale * global_scale)
        if is_cov:
            m = m * 0.5
        return m * 0.5

    def splat3_val_grad(self, ab, is_cov, is_isotropic, global_scale, p_world):
        """exp-form splat value + gradient wrt the query point.

        `ab` = (query - center) in the sampling space, [...,3].
        """
        m = self._inv_cov_mtx(is_cov, is_isotropic, global_scale, p_world)
        mab = mat3_vec(m, ab)
        f = jnp.exp(-dot(ab, mab))
        grad = -2.0 * mab * f[..., None]
        return f, grad

    def splat3_grad_hess(self, ab, is_cov, is_isotropic, global_scale, p_world):
        """First + second derivative of the splat (GPFunctions.cpp:810-833)."""
        m = self._inv_cov_mtx(is_cov, is_isotropic, global_scale, p_world)
        mab = mat3_vec(m, ab)
        f = jnp.exp(-dot(ab, mab))
        d = -2.0 * mab  # [...,3]
        grad = d * f[..., None]
        hess = (outer3(d, d) - 2.0 * m) * f[..., None, None]
        return grad, hess

    def splat3_conditioning_combo(self, ab, coeff, value_scale, is_cov,
                                  is_isotropic, global_scale, p_world):
        """value_scale*K + sum_i coeff_i * dK/dcenter_i as a (val, grad) pair.

        Fuses splattingKernel3D * value_scale + splattingKernel3DGrad
        (SparseConvolutionNoise.cpp:257).  Note splattingKernel3DGrad composes
        the *first* derivative into the value slot and the Hessian into the
        gradient slots (GPFunctions.cpp:564-577).
        """
        m = self._inv_cov_mtx(is_cov, is_isotropic, global_scale, p_world)
        mab = mat3_vec(m, ab)
        f = jnp.exp(-dot(ab, mab))
        d = -2.0 * mab
        val = (value_scale + dot(d, coeff)) * f
        grad = (d * value_scale[..., None]
                + mat3_vec(outer3(d, d) - 2.0 * m, coeff)) * f[..., None]
        return val, grad

    def one_over_second_derivative(self, p_world, is_isotropic):
        """Inverse Hessian of the covariance splat at 0
        (sparseConvNoiseOneOverSecondDerivative, GPFunctions.cpp:713-739)."""
        if is_isotropic:
            m = jnp.eye(3, dtype=jnp.float32)
        else:
            if self.use_aniso_mtx:
                m = self.inv_cov_world
            else:
                m = jnp.diag(self.l_aniso_inv**2)
        m = m * 0.25
        hess = -2.0 * m
        return jnp.linalg.inv(hess)

    # -- 1D splat/cov kernels (GPFunctions.cpp:835-865) --------------------
    def splat1_val_grad(self, dt, p_center_world, ray_dir_world):
        """1D splat value + d/dquery; dt = query - center in iso-ray units."""
        f = jnp.exp(-0.5 * dt * dt)
        return f, -dt * f

    def cov1_val_grad(self, dt, p_query_world, p_center_world, ray_dir_local):
        """1D covariance kernel (splat at scale sqrt(2)): exp(-dt^2/4)."""
        f = jnp.exp(-0.25 * dt * dt)
        return f, -0.5 * dt * f

    def cov1_grad_grad2(self, dt, p_query_world, p_center_world, ray_dir_local):
        """(d/dq, d2/dq dcenter→ chained) of the 1D cov kernel
        (covarianceKernel1DGrad; GPFunctions.cpp:593-597, 850-859)."""
        f = jnp.exp(-0.25 * dt * dt)
        g1 = -0.5 * dt
        return g1 * f, (g1 * g1 - 0.5) * f

    def cov1_grad2_for_3d_normal(self, dt, p_query_world, p_center_world, dir_local):
        """Lateral second derivative used by correlationXY
        (covarianceKernel2D2ndGradFor3DNormal; GPFunctions.cpp:861-865)."""
        f = jnp.exp(-0.25 * dt * dt)
        return -0.5 * f

    # -- analytic sparse-conv noise variance (GPFunctions.cpp:741-760) -----
    def variance3(self, p, impulse_density, kernel_radius, is_identity,
                  global_scale):
        dens = impulse_density / kernel_radius**3
        if is_identity:
            det_sqrt = jnp.float32(1.0)
        else:
            if self.use_aniso_mtx:
                det_sqrt = 1.0 / jnp.sqrt(jnp.linalg.det(self.inv_cov_world))
            else:
                det_sqrt = jnp.prod(self.l_aniso)
            det_sqrt = det_sqrt * global_scale**3
        return dens * (jnp.pi**1.5) * det_sqrt * jnp.ones(p.shape[:-1], jnp.float32)

    def variance1(self, p, impulse_density, kernel_radius):
        return (impulse_density / kernel_radius * jnp.sqrt(jnp.pi)
                * jnp.ones(p.shape[:-1], jnp.float32))

    # -- covariance function proper (function/weight space) ----------------
    def cov_r2(self, r2):
        return self.sigma**2 * jnp.exp(-r2 / (2.0 * self.l**2))

    def cov(self, pa, pb):
        d = pa - pb
        r2 = dot(d * self.aniso, d)
        return self.cov_r2(r2)

    def compute_beckmann_roughness(self, p):
        """sqrt(2 * E[f_x'^2]) (GPFunctions.hpp:1309-1312)."""
        # d2cov/da db along x at a==b for SE: sigma^2 * aniso_x / l^2
        l2 = self.sigma**2 * self.aniso[0] / (self.l**2)
        return jnp.sqrt(2.0 * l2)

    # -- spectral density (RFF; GPFunctions.hpp:1795-1815) -----------------
    def spectral_density(self, s):
        norm = 1.0 / (jnp.sqrt(jnp.pi / 2) * self.sigma**2)
        return norm * (jnp.exp(-0.5 * self.l**2 * s**2) * self.sigma**2) * self.l

    def sample_spectral_3d(self, key, ctr, p=None):
        """Draw omega ~ S(omega): Gaussian with std sqrt(aniso)/l per axis
        (GPFunctions.hpp:1812-1815)."""
        n0, n1 = rng.normal2(key, 3 * ctr)
        n2, _ = rng.normal2(key, 3 * ctr + 1)
        g = jnp.stack([n0, n1, n2], axis=-1)
        return g / self.l * jnp.sqrt(self.aniso)


@struct(meta=("kernel_scale",))
class RationalQuadraticCov:
    """RQ covariance (GPFunctions.hpp:1897-1969). cov-only + spectral sampling;
    no sparse-conv splatting support (matches reference)."""

    sigma: jnp.ndarray
    l: jnp.ndarray
    a: jnp.ndarray
    aniso: jnp.ndarray
    kernel_scale: float = static_field(default=3.0)

    @staticmethod
    def create(sigma=1.0, l=1.0, a=1.0, aniso=(1.0, 1.0, 1.0), kernel_scale=3.0):
        return RationalQuadraticCov(
            sigma=jnp.float32(sigma), l=jnp.float32(l), a=jnp.float32(a),
            aniso=jnp.asarray(aniso, jnp.float32), kernel_scale=float(kernel_scale))

    is_stationary = True
    is_nonstationary_aniso = False
    use_multi_res_grid = False
    has_analytic_spectral_density = True

    def cov_r2(self, r2):
        return self.sigma**2 * (1.0 + r2 / (2 * self.a * self.l**2)) ** (-self.a)

    def cov(self, pa, pb):
        d = pa - pb
        return self.cov_r2(dot(d * self.aniso, d))

    def variance(self, p):
        return jnp.broadcast_to(self.sigma**2, p.shape[:-1])

    def amplitude(self, p):
        return jnp.broadcast_to(self.sigma, p.shape[:-1])

    def compute_beckmann_roughness(self, p):
        l2 = self.sigma**2 * self.aniso[0] / (self.l**2)
        return jnp.sqrt(2.0 * l2)

    def sample_spectral_3d(self, key, ctr, p=None):
        """tau ~ Gamma(a, .); length = 1/sqrt(tau); omega Gaussian/l_eff
        (GPFunctions.hpp:1948-1953).  Gamma sampled by the Marsaglia-Tsang
        squeeze on hashed normals/uniforms."""
        # Marsaglia-Tsang with fixed 4 proposals (accept-first, masked)
        shape = self.a
        d = shape - 1.0 / 3.0
        c = 1.0 / jnp.sqrt(9.0 * d)
        accepted = None
        val = None
        for i in range(4):
            n, _ = rng.normal2(key, 16 + 2 * ctr * 8 + i)
            u = rng.uniform(key, 97 + 2 * ctr * 8 + i)
            v = (1.0 + c * n) ** 3
            ok = (v > 0) & (jnp.log(u) < 0.5 * n**2 + d - d * v + d * jnp.log(jnp.maximum(v, 1e-9)))
            cand = d * jnp.maximum(v, 1e-9)
            if val is None:
                val, accepted = cand, ok
            else:
                val = jnp.where(accepted, val, cand)
                accepted = accepted | ok
        val = jnp.where(accepted, val, d)  # fall back to the mode
        mean_rate = 1.0 / (self.l**2)
        tau = val * (mean_rate / shape)
        l_eff = 1.0 / jnp.sqrt(tau)
        n0, n1 = rng.normal2(key, 3 * ctr)
        n2, _ = rng.normal2(key, 3 * ctr + 1)
        return jnp.stack([n0, n1, n2], axis=-1) / l_eff


@struct(meta=("kernel_scale",))
class MaternCov:
    """Matern covariance; cov via closed forms for half-integer nu, plus the
    exp-family splatting kernel used by the reference for general nu
    (GPFunctions.cpp:870-1086, GPFunctions.hpp:1971-2038)."""

    sigma: jnp.ndarray
    l: jnp.ndarray
    nu: jnp.ndarray
    aniso: jnp.ndarray
    kernel_scale: float = static_field(default=3.0)

    @staticmethod
    def create(sigma=1.0, l=1.0, nu=1.5, aniso=(1.0, 1.0, 1.0), kernel_scale=3.0):
        return MaternCov(sigma=jnp.float32(sigma), l=jnp.float32(l),
                         nu=jnp.float32(nu), aniso=jnp.asarray(aniso, jnp.float32),
                         kernel_scale=float(kernel_scale))

    is_stationary = True
    is_nonstationary_aniso = False
    use_multi_res_grid = False
    has_analytic_spectral_density = True

    def cov_r2(self, r2):
        """Half-integer Matern forms (nu in {0.5, 1.5, 2.5}), branch chosen
        at trace time by nearest; general-nu Bessel form left to the CPU
        oracle tests."""
        r = jnp.sqrt(jnp.maximum(r2, 1e-20))
        s2 = self.sigma**2
        x = r / self.l
        m05 = s2 * jnp.exp(-x)
        m15 = s2 * (1 + jnp.sqrt(3.0) * x) * jnp.exp(-jnp.sqrt(3.0) * x)
        m25 = s2 * (1 + jnp.sqrt(5.0) * x + 5.0 * x**2 / 3.0) * jnp.exp(-jnp.sqrt(5.0) * x)
        w05 = jnp.exp(-((self.nu - 0.5) ** 2) * 1e6)
        w15 = jnp.exp(-((self.nu - 1.5) ** 2) * 1e6)
        w25 = jnp.exp(-((self.nu - 2.5) ** 2) * 1e6)
        return (w05 * m05 + w15 * m15 + w25 * m25) / (w05 + w15 + w25)

    def cov(self, pa, pb):
        d = pa - pb
        return self.cov_r2(dot(d * self.aniso, d))

    def variance(self, p):
        return jnp.broadcast_to(self.sigma**2, p.shape[:-1])

    def amplitude(self, p):
        return jnp.broadcast_to(self.sigma, p.shape[:-1])

    def sample_spectral_3d(self, key, ctr, p=None):
        """Matern spectral density = multivariate-t: Gaussian / sqrt(Gamma)
        (standard result)."""
        n0, n1 = rng.normal2(key, 3 * ctr)
        n2, n3 = rng.normal2(key, 3 * ctr + 1)
        g = jnp.stack([n0, n1, n2], axis=-1)
        # chi2 with 2*nu dof approximated by sum of squares of 2*ceil(nu) normals
        u = rng.uniform(key, 5 * ctr + 1)
        chi2 = -2.0 * self.nu * jnp.log1p(-u)  # exponential approx for small dof
        return g * jnp.sqrt(2.0 * self.nu / jnp.maximum(chi2, 1e-6)) / self.l


def periodic_cov(sigma, l, period):
    """Periodic covariance closure (GPFunctions.hpp:2112-2150)."""
    def cov(pa, pb):
        r = jnp.sqrt(jnp.maximum(dot(pa - pb, pa - pb), 1e-20))
        return sigma**2 * jnp.exp(-2.0 * jnp.sin(jnp.pi * r / period) ** 2 / l**2)
    return cov


def thin_plate_cov(sigma, R):
    """Thin-plate covariance closure (GPFunctions.hpp:2151-2205)."""
    def cov(pa, pb):
        r = jnp.sqrt(jnp.maximum(dot(pa - pb, pa - pb), 1e-20))
        return sigma**2 * (2 * r**3 - 3 * R * r**2 + R**3) / 12.0
    return cov


# ---------------------------------------------------------------------------
# Gabor covariances (GaborAnisotropicCovariance / GaborIsotropicCovariance,
# GPFunctions.cpp:1087-1215).  World-space sparse-conv-only kernels: the
# reference implements only splat value + 1st gradient (cov() aborts).  Here
# the higher-order splats the conditioning path needs (Hessian, combo) are
# derived with forward-mode autodiff from the closed-form value — strictly
# more capable than the reference while bit-matching its value/grad.
# ---------------------------------------------------------------------------

def _rowwise(fn, ab, out_shape_extra=()):
    """Apply a per-[3]-row function over arbitrary leading batch dims."""
    lead = ab.shape[:-1]
    flat = ab.reshape(-1, 3)
    out = jax.vmap(fn)(flat)
    return out.reshape(lead + out_shape_extra)


def _autodiff_splat_mixin(cls):
    """Derive grad/Hessian/conditioning-combo splats from splat3_val.
    Batch-safe: splat3_val is scalar per [3] row; autodiff is vmapped over
    all leading dims."""

    def splat3_val_grad(self, ab, is_cov, is_isotropic, global_scale,
                        p_world):
        f = _rowwise(self.splat3_val, ab)
        g = _rowwise(jax.grad(self.splat3_val), ab, (3,))
        return f, g

    def splat3_grad_hess(self, ab, is_cov, is_isotropic, global_scale,
                         p_world):
        g = _rowwise(jax.grad(self.splat3_val), ab, (3,))
        h = _rowwise(jax.jacfwd(jax.grad(self.splat3_val)), ab, (3, 3))
        return g, h

    def splat3_conditioning_combo(self, ab, coeff, value_scale, is_cov,
                                  is_isotropic, global_scale, p_world):
        f = _rowwise(self.splat3_val, ab)
        g = _rowwise(jax.grad(self.splat3_val), ab, (3,))
        h = _rowwise(jax.jacfwd(jax.grad(self.splat3_val)), ab, (3, 3))
        # derivative wrt CENTER = -d/dquery (splattingKernel3DGrad chains)
        val = value_scale * f - dot(g, coeff)
        grad = (value_scale[..., None] * g
                - jnp.einsum("...ij,...j->...i", h, coeff,
                             precision="highest"))
        return val, grad

    def one_over_second_derivative(self, p_world, is_isotropic):
        h = jax.jacfwd(jax.grad(self.splat3_val))(jnp.zeros(3))
        return jnp.linalg.inv(h)

    for name, fn in [("splat3_val_grad", splat3_val_grad),
                     ("splat3_grad_hess", splat3_grad_hess),
                     ("splat3_conditioning_combo", splat3_conditioning_combo),
                     ("one_over_second_derivative",
                      one_over_second_derivative)]:
        if name not in cls.__dict__:  # analytic override wins
            setattr(cls, name, fn)
    return cls


class _GaborCommon:
    is_stationary = True
    is_nonstationary_aniso = False
    use_multi_res_grid = False
    has_analytic_spectral_density = False

    def amplitude(self, p):
        return jnp.broadcast_to(self.sigma, p.shape[:-1])

    def lateral_scale(self, p):
        return jnp.ones(p.shape[:-1], jnp.float32)

    def unscaled_variance(self, p):
        return jnp.ones(p.shape[:-1], jnp.float32)

    def variance(self, p):
        return jnp.broadcast_to(self.sigma**2, p.shape[:-1])

    def nonstat_splat_kernel_scale(self, p):
        return jnp.ones(p.shape[:-1], jnp.float32)

    def nonstat_splat_cov_1d(self, p_query, p_center, dir_local):
        return jnp.ones(p_query.shape[:-1], jnp.float32)

    def world_sampling_spatial_scale(self):
        return jnp.float32(1.0)

    # gabor kernels sample in WORLD units (StationaryCovariance with
    # lengthScale 1): the space transforms are identity
    def pos_world_to_local(self, v, local_scale=1.0):
        return v / local_scale

    def pos_local_to_world(self, v, local_scale=1.0):
        return v * local_scale

    def grad_world_to_local(self, g, local_scale=1.0):
        return g * local_scale

    def grad_local_to_world(self, g, local_scale=1.0):
        return g / local_scale

    def local_to_world_inv_transpose(self, p):
        return jnp.eye(3, dtype=jnp.float32)

    def compute_beckmann_roughness(self, p):
        # E[f_x'^2] from the Hessian of the noise autocovariance at 0; use
        # the envelope's curvature (autodiff of the splat at 0)
        h = jax.jacfwd(jax.grad(self.splat3_val))(jnp.zeros(3))
        return jnp.sqrt(jnp.maximum(2.0 * jnp.abs(h[0, 0]), 1e-12))

    # 1D sampling is not supported for gabor kernels in the reference
    def splat1_val_grad(self, dt, p_center_world, ray_dir_world):
        f = jnp.exp(-0.5 * dt * dt)
        return f, -dt * f

    def cov1_val_grad(self, dt, p_query_world, p_center_world, ray_dir_local):
        f = jnp.exp(-0.25 * dt * dt)
        return f, -0.5 * dt * f

    def cov1_grad_grad2(self, dt, p_query_world, p_center_world,
                        ray_dir_local):
        f = jnp.exp(-0.25 * dt * dt)
        g1 = -0.5 * dt
        return g1 * f, (g1 * g1 - 0.5) * f

    def cov1_grad2_for_3d_normal(self, dt, p_query_world, p_center_world,
                                 dir_local):
        return -0.5 * jnp.exp(-0.25 * dt * dt)

    def variance1(self, p, impulse_density, kernel_radius):
        return (impulse_density / kernel_radius * jnp.sqrt(jnp.pi)
                * jnp.ones(p.shape[:-1], jnp.float32))

    def spectral_density(self, s):
        return jnp.zeros_like(s)

    def sample_spectral_3d(self, key, ctr, p=None):
        n0, n1 = rng.normal2(key, 3 * ctr)
        n2, _ = rng.normal2(key, 3 * ctr + 1)
        return jnp.stack([n0, n1, n2], axis=-1)


@_autodiff_splat_mixin
@struct(meta=("kernel_scale",))
class GaborAnisoCov(_GaborCommon):
    """exp(-pi a^2 |x|^2) * cos(2 pi f omega.x) splats
    (GPFunctions.cpp:1087-1151)."""
    sigma: jnp.ndarray
    a: jnp.ndarray        # 1/a_inv
    f: jnp.ndarray        # 1/f_inv
    omega: jnp.ndarray    # [3] unit modulation direction
    kernel_scale: float = static_field(default=3.0)

    @staticmethod
    def create(sigma=1.0, a_inv=1.0, f_inv=1.0, omega=(1.0, 0.0, 0.0),
               kernel_scale=3.0):
        om = np.asarray(omega, np.float32)
        om = om / max(np.linalg.norm(om), 1e-9)
        return GaborAnisoCov(sigma=jnp.float32(sigma),
                             a=jnp.float32(1.0 / a_inv),
                             f=jnp.float32(1.0 / f_inv),
                             omega=jnp.asarray(om),
                             kernel_scale=float(kernel_scale))

    def splat3_val(self, ab):
        return (jnp.exp(-jnp.pi * self.a**2 * dot(ab, ab))
                * jnp.cos(2.0 * jnp.pi * self.f * dot(self.omega, ab)))

    def splat3_val_grad(self, ab, is_cov, is_isotropic, global_scale,
                        p_world):
        """Closed form (GPFunctions.cpp:1141-1151) — the hot march path;
        autodiff stays only on the rare Hessian/conditioning calls."""
        phi = 2.0 * jnp.pi * self.f * jnp.sum(self.omega * ab, axis=-1)
        E = jnp.exp(-jnp.pi * self.a**2 * dot(ab, ab))
        C = jnp.cos(phi)
        g = (-(E * jnp.sin(phi) * 2.0 * jnp.pi * self.f)[..., None]
             * self.omega
             - (C * E * 2.0 * jnp.pi * self.a**2)[..., None] * ab)
        return E * C, g

    def splat_radius(self, is_identity, local_scale=1.0):
        return self.kernel_scale * np.sqrt(2.0) / 2.0 / self.a

    def variance3(self, p, impulse_density, kernel_radius, is_identity,
                  global_scale):
        dens = impulse_density / kernel_radius**3
        integral = ((1.0 / self.a) ** 3
                    * (1.0 + jnp.exp(-2.0 * jnp.pi * (self.f / self.a) ** 2))
                    / (4.0 * jnp.sqrt(2.0)))
        return dens * integral * jnp.ones(p.shape[:-1], jnp.float32)

    def cov(self, pa, pb):
        # analytic autocovariance of gabor noise: gaussian envelope *
        # cosine (Lagae et al.); used only by function/weight space
        d = pa - pb
        return (self.sigma**2 * jnp.exp(-0.5 * jnp.pi * self.a**2 * dot(d, d))
                * jnp.cos(2.0 * jnp.pi * self.f * dot(self.omega, d)))


@_autodiff_splat_mixin
@struct(meta=("kernel_scale",))
class GaborIsoCov(_GaborCommon):
    """exp(-pi a^2 r^2) * 2f sin(2 pi f r)/r splats
    (GPFunctions.cpp:1155-1215)."""
    sigma: jnp.ndarray
    a: jnp.ndarray
    f: jnp.ndarray
    kernel_scale: float = static_field(default=3.0)

    @staticmethod
    def create(sigma=1.0, a_inv=1.0, f_inv=1.0, kernel_scale=3.0):
        return GaborIsoCov(sigma=jnp.float32(sigma),
                           a=jnp.float32(1.0 / a_inv),
                           f=jnp.float32(1.0 / f_inv),
                           kernel_scale=float(kernel_scale))

    def splat3_val(self, ab):
        r2 = dot(ab, ab)
        r = jnp.sqrt(r2 + 1e-12)
        arg = 2.0 * jnp.pi * self.f * r
        # sinc form is smooth at r->0: 2f sin(arg)/r = 4 pi f^2 sinc(arg)
        return (jnp.exp(-jnp.pi * self.a**2 * r2) * 2.0 * self.f
                * jnp.sinc(2.0 * self.f * r) * 2.0 * jnp.pi * self.f)

    def splat3_val_grad(self, ab, is_cov, is_isotropic, global_scale,
                        p_world):
        """Closed form (GPFunctions.cpp:1205-1215)."""
        r2 = dot(ab, ab)
        r = jnp.sqrt(r2 + 1e-12)
        E = jnp.exp(-jnp.pi * self.a**2 * r2)
        arg = 2.0 * jnp.pi * self.f * r
        s, c = jnp.sin(arg), jnp.cos(arg)
        val = E * 2.0 * self.f / r * s
        coef = (2.0 * self.f * E
                * (-s / (r * r2) - 2.0 * jnp.pi * self.a**2 * s / r
                   + 2.0 * jnp.pi * self.f * c / r2))
        return val, coef[..., None] * ab

    def splat_radius(self, is_identity, local_scale=1.0):
        return self.kernel_scale * np.sqrt(2.0) / 4.0 / self.a

    def variance3(self, p, impulse_density, kernel_radius, is_identity,
                  global_scale):
        dens = impulse_density / kernel_radius**3
        integral = (2.0 * jnp.sqrt(2.0) * jnp.pi * self.f**2 / self.a
                    * (1.0 - jnp.exp(-2.0 * jnp.pi * self.f / self.a**2)))
        return dens * integral * jnp.ones(p.shape[:-1], jnp.float32)

    def cov(self, pa, pb):
        d = pa - pb
        r = jnp.sqrt(jnp.maximum(dot(d, d), 1e-12))
        return (self.sigma**2 * jnp.exp(-0.5 * jnp.pi * self.a**2 * r * r)
                * jnp.sinc(2.0 * self.f * r))


# ---------------------------------------------------------------------------
# Covariance-only kernels (no sparse-conv support, like the reference:
# Periodic/ThinPlate/DotProduct, GPFunctions.hpp:1732-1780, :2112-2206) —
# usable with the function-space and weight-space backends.
# ---------------------------------------------------------------------------

@struct
class PeriodicCov:
    sigma: jnp.ndarray
    l: jnp.ndarray
    period: jnp.ndarray

    is_stationary = True
    is_nonstationary_aniso = False
    use_multi_res_grid = False
    has_analytic_spectral_density = False

    @staticmethod
    def create(sigma=1.0, l=1.0, period=1.0):
        return PeriodicCov(sigma=jnp.float32(sigma), l=jnp.float32(l),
                           period=jnp.float32(period))

    def cov(self, pa, pb):
        r = jnp.sqrt(jnp.maximum(dot(pa - pb, pa - pb), 1e-20))
        return self.sigma**2 * jnp.exp(
            -2.0 * jnp.sin(jnp.pi * r / self.period) ** 2 / self.l**2)

    def compute_beckmann_roughness(self, p):
        return 2.0 * jnp.pi / (self.period * self.l) * self.sigma

    def sample_spectral_3d(self, key, ctr, p=None):
        # periodic kernel spectrum: discrete harmonics; draw the fundamental
        n0, n1 = rng.normal2(key, 3 * ctr)
        n2, _ = rng.normal2(key, 3 * ctr + 1)
        g = jnp.stack([n0, n1, n2], axis=-1)
        g = g / jnp.maximum(jnp.linalg.norm(g), 1e-9)
        return g * 2.0 * jnp.pi / self.period


@struct
class ThinPlateCov:
    sigma: jnp.ndarray
    R: jnp.ndarray

    is_stationary = True
    is_nonstationary_aniso = False
    use_multi_res_grid = False
    has_analytic_spectral_density = False

    @staticmethod
    def create(sigma=1.0, R=1.0):
        return ThinPlateCov(sigma=jnp.float32(sigma), R=jnp.float32(R))

    def cov(self, pa, pb):
        r = jnp.sqrt(jnp.maximum(dot(pa - pb, pa - pb), 1e-20))
        r = jnp.minimum(r, self.R)
        return self.sigma**2 * (2 * r**3 - 3 * self.R * r**2
                                + self.R**3) / 12.0

    def compute_beckmann_roughness(self, p):
        return self.sigma * jnp.sqrt(self.R / 2.0)

    def sample_spectral_3d(self, key, ctr, p=None):
        n0, n1 = rng.normal2(key, 3 * ctr)
        n2, _ = rng.normal2(key, 3 * ctr + 1)
        return jnp.stack([n0, n1, n2], axis=-1) / self.R


@struct
class DotProductCov:
    """Non-stationary linear kernel cov(a,b) = sigma^2 (a.b + c)
    (NonstationaryCovariance DotProduct, GPFunctions.hpp:1732-1780)."""
    sigma: jnp.ndarray
    c: jnp.ndarray

    is_stationary = False
    is_nonstationary_aniso = False
    use_multi_res_grid = False
    has_analytic_spectral_density = False

    @staticmethod
    def create(sigma=1.0, c=1.0):
        return DotProductCov(sigma=jnp.float32(sigma), c=jnp.float32(c))

    def cov(self, pa, pb):
        return self.sigma**2 * (dot(pa, pb) + self.c)

    def compute_beckmann_roughness(self, p):
        return self.sigma * jnp.sqrt(2.0)

    def sample_spectral_3d(self, key, ctr, p=None):
        n0, n1 = rng.normal2(key, 3 * ctr)
        n2, _ = rng.normal2(key, 3 * ctr + 1)
        return jnp.stack([n0, n1, n2], axis=-1)

"""Nonstationary covariance: Paciorek-style wrapper over a stationary kernel.

Re-design of NonstationaryCovariance / ProceduralNonstationaryCovariance
(src/core/math/GPFunctions.hpp:2207-2443, GPFunctions.cpp:1219-1332,
1546-1809): per-point sigma(p) ("var" field) and length-scale field ls(p)
modulate a wrapped stationary kernel.

Splatting semantics (for sparse-conv noise):
  - brute-force mode (useMultiResolutionGrid=false): sampling space is the
    stationary space scaled by max(ls); the per-point splat scale is
    ls(p)/max(ls) (nonStationarySplattingKernelScale, GPFunctions.cpp:1223).
  - multi-res mode: the multi-resolution grid [Lagae et al. 2011] carries
    the scale variation instead (sparse_conv.kernel_scale_level_ratio);
    splat scale stays 1 (GPFunctions.cpp:1224-1229).

Covariance proper (function/weight space): Paciorek form
  cov(a,b) = sigma(a) sigma(b) anisoFac k(d^T Sigma_avg^-1 d)
(GPFunctions.cpp:1749-1805), isotropic-per-point version (no aniso field —
the reference's rotation-field anisotropy is future work here as there too).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import static_field, struct
from ..utils.vecmath import dot, mat3_t_vec, mat3_vec, outer3
from .fields import Field


@struct(meta=("use_multi_res_grid", "max_ls", "kernel_scale"))
class ProceduralNonstationaryCov:
    base: object  # stationary covariance (SquaredExponentialCov...)
    var_field: Field  # sigma(p); None -> 1
    ls_field: Field  # ls(p) scalar-ish; None -> 1
    use_multi_res_grid: bool = static_field(default=False)
    max_ls: float = static_field(default=1.0)  # sparseConvNoiseMaxLateralScale
    kernel_scale: float = static_field(default=3.0)

    @staticmethod
    def create(base, var_field=None, ls_field=None, use_multi_res_grid=False):
        if var_field is None:
            var_field = Field.constant(1.0)
        max_ls = ls_field.max_val() if ls_field is not None else 1.0
        if ls_field is None:
            ls_field = Field.constant(1.0)
        return ProceduralNonstationaryCov(
            base=base, var_field=var_field, ls_field=ls_field,
            use_multi_res_grid=use_multi_res_grid, max_ls=float(max_ls),
            kernel_scale=base.kernel_scale)

    is_stationary = False
    is_nonstationary_aniso = False
    has_analytic_spectral_density = False

    # ---- pointwise fields (GPFunctions.cpp:1219-1245) --------------------
    def amplitude(self, p):
        return self.var_field(p) * self.base.amplitude(p)

    def unscaled_variance(self, p):
        return self.var_field(p)

    def variance(self, p):
        return (self.var_field(p) ** 2) * self.base.variance(p)

    def lateral_scale(self, p):
        return self.ls_field(p)

    def nonstat_splat_kernel_scale(self, p):
        if self.use_multi_res_grid:
            return jnp.ones(p.shape[:-1], jnp.float32)
        return self.ls_field(p) / self.max_ls

    def nonstat_splat_cov_1d(self, p_query, p_center, dir_local):
        """(GPFunctions.cpp:1726-1743, no-aniso branch)"""
        s = 0.5 * (self.nonstat_splat_kernel_scale(p_query) ** 2
                   + self.nonstat_splat_kernel_scale(p_center) ** 2)
        return jnp.sqrt(s)

    def world_sampling_spatial_scale(self):
        return jnp.float32(self.max_ls)

    # ---- transforms: stationary with max_ls folded in (:1262-1286) -------
    def _scale(self, global_scale):
        return global_scale if self.use_multi_res_grid else self.max_ls

    def pos_world_to_local(self, v, local_scale=1.0):
        return self.base.pos_world_to_local(v, self._scale(local_scale))

    def pos_local_to_world(self, v, local_scale=1.0):
        return self.base.pos_local_to_world(v, self._scale(local_scale))

    def grad_world_to_local(self, g, local_scale=1.0):
        return self.base.grad_world_to_local(g, self._scale(local_scale))

    def grad_local_to_world(self, g, local_scale=1.0):
        return self.base.grad_local_to_world(g, self._scale(local_scale))

    def local_to_world_inv_transpose(self, p):
        s = 1.0 if self.use_multi_res_grid else self.max_ls
        return self.base.local_to_world_inv_transpose(p) / s

    @property
    def world_to_local(self):
        return self.base.world_to_local

    # ---- splat kernels with per-point local scale (:1289-1307) -----------
    def splat_radius(self, is_identity, local_scale=1.0):
        ls = local_scale * (1.0 if self.use_multi_res_grid else self.max_ls)
        return self.base.splat_radius(is_identity, ls)

    def _local_scale(self, p_world):
        return self.nonstat_splat_kernel_scale(p_world)

    def _inv_cov_mtx(self, is_cov, is_isotropic, global_scale, p_world):
        m = self.base._inv_cov_mtx(is_cov, is_isotropic, global_scale,
                                   p_world)
        ls = self._local_scale(p_world)
        return m / jnp.maximum(ls * ls, 1e-12)[..., None, None] \
            if jnp.ndim(ls) > 0 else m / (ls * ls)

    def splat3_val_grad(self, ab, is_cov, is_isotropic, global_scale,
                        p_world):
        m = self._inv_cov_mtx(is_cov, is_isotropic, global_scale, p_world)
        mab = mat3_vec(m, ab)
        f = jnp.exp(-dot(ab, mab))
        return f, -2.0 * mab * f[..., None]

    def splat3_grad_hess(self, ab, is_cov, is_isotropic, global_scale,
                         p_world):
        m = self._inv_cov_mtx(is_cov, is_isotropic, global_scale, p_world)
        mab = mat3_vec(m, ab)
        f = jnp.exp(-dot(ab, mab))
        d = -2.0 * mab
        return d * f[..., None], (outer3(d, d) - 2.0 * m) * f[..., None, None]

    def splat3_conditioning_combo(self, ab, coeff, value_scale, is_cov,
                                  is_isotropic, global_scale, p_world):
        m = self._inv_cov_mtx(is_cov, is_isotropic, global_scale, p_world)
        mab = mat3_vec(m, ab)
        f = jnp.exp(-dot(ab, mab))
        d = -2.0 * mab
        val = (value_scale + dot(d, coeff)) * f
        grad = (d * value_scale[..., None]
                + mat3_vec(outer3(d, d) - 2.0 * m, coeff)) * f[..., None]
        return val, grad

    def one_over_second_derivative(self, p_world, is_isotropic):
        return self.base.one_over_second_derivative(p_world, is_isotropic)

    # ---- 1D kernels (localScale = nonstat scale; GPFunctions.cpp:1299-1332)
    def splat1_val_grad(self, dt, p_center_world, ray_dir_world):
        ls = self._local_scale(p_center_world)
        f = jnp.exp(-0.5 * (dt / ls) ** 2)
        return f, -dt / (ls * ls) * f

    def cov1_val_grad(self, dt, p_query_world, p_center_world, ray_dir_local):
        s = self.nonstat_splat_cov_1d(p_query_world, p_center_world,
                                      ray_dir_local)
        f = jnp.exp(-0.25 * (dt / s) ** 2)
        return f, -0.5 * dt / (s * s) * f

    def cov1_grad_grad2(self, dt, p_query_world, p_center_world,
                        ray_dir_local):
        s = self.nonstat_splat_cov_1d(p_query_world, p_center_world,
                                      ray_dir_local)
        f = jnp.exp(-0.25 * (dt / s) ** 2)
        g1 = -0.5 * dt / (s * s)
        return g1 * f, (g1 * g1 - 0.5 / (s * s)) * f

    def cov1_grad2_for_3d_normal(self, dt, p_query_world, p_center_world,
                                 dir_local):
        s = self.nonstat_splat_cov_1d(p_query_world, p_center_world,
                                      dir_local)
        f = jnp.exp(-0.25 * (dt / s) ** 2)
        return -0.5 / (s * s) * f

    # ---- analytic variance (:1252-1260) ----------------------------------
    def variance3(self, p, impulse_density, kernel_radius, is_identity,
                  global_scale):
        ls = (jnp.ones(p.shape[:-1], jnp.float32) if self.use_multi_res_grid
              else self.nonstat_splat_kernel_scale(p))
        return self.base.variance3(p, impulse_density, kernel_radius,
                                   is_identity, global_scale) * ls**3

    def variance1(self, p, impulse_density, kernel_radius):
        ls = self.nonstat_splat_kernel_scale(p)
        return self.base.variance1(p, impulse_density, kernel_radius) * ls

    # ---- Paciorek covariance (function/weight space; :1749-1805) ---------
    def cov(self, pa, pb):
        sa = self.var_field(pa)
        sb = self.var_field(pb)
        la = self.ls_field(pa)
        lb = self.ls_field(pb)
        a2 = la * la
        b2 = lb * lb
        avg = 0.5 * (a2 + b2)
        # isotropic per-point Sigma = l^2 I: anisoFac = (la lb)^{3/2}/avg^{3/2}
        aniso_fac = (a2 * b2) ** 0.75 / jnp.maximum(avg, 1e-12) ** 1.5
        d = pa - pb
        dsq = dot(d, d) / jnp.maximum(avg, 1e-12)
        return sa * sb * aniso_fac * self.base.cov_r2(dsq)

    def compute_beckmann_roughness(self, p):
        return self.base.compute_beckmann_roughness(p) * self.var_field(p)

    def sample_spectral_3d(self, key, ctr, p=None):
        """(GPFunctions.cpp:1572-1587): stationary sample / ls(p)."""
        s = self.base.sample_spectral_3d(key, ctr, p)
        if p is None:
            return s
        return s / self.ls_field(p)


# ---------------------------------------------------------------------------
# Mean-gradient-driven anisotropic nonstationarity
# (MeanGradNonstationaryCovariance, GPFunctions.hpp:2338-2364, impl
# GPFunctions.cpp:1811-1912): per-point covariance matrices oriented along
# the mean gradient; full anisotropic Paciorek form for function/weight
# space.  Sparse-conv splatting is intentionally unsupported (the paper's
# configs use it with the exact backends).
# ---------------------------------------------------------------------------

def _aniso_from_normal(n, aniso):
    """compute_ansio_simplified: Sigma = F diag(aniso) F^T with the first
    axis along the (normalized) mean gradient."""
    from ..utils.vecmath import safe_normalize, tangent_frame
    n = safe_normalize(n)
    t, b = tangent_frame(n)
    F = jnp.stack([n, t, b], axis=-1)  # columns
    return F @ jnp.diag(aniso) @ F.T


@struct
class MeanGradNonstationaryCov:
    base: object          # stationary covariance
    mean: object          # MeanFunction (grad() drives the frame)
    aniso: jnp.ndarray    # [3] eigenvalues along (grad, t, b)

    is_stationary = False
    is_nonstationary_aniso = True
    use_multi_res_grid = False
    has_analytic_spectral_density = False

    @staticmethod
    def create(base, mean, aniso=(1.0, 1.0, 1.0)):
        return MeanGradNonstationaryCov(
            base=base, mean=mean,
            aniso=jnp.asarray(np.asarray(aniso, np.float32)))

    def local_aniso(self, p):
        return _aniso_from_normal(self.mean.grad(p), self.aniso)

    def cov(self, pa, pb):
        A = self.local_aniso(pa)
        B = self.local_aniso(pb)
        avg = 0.5 * (A + B)
        det_a = jnp.linalg.det(A)
        det_b = jnp.linalg.det(B)
        det_avg = jnp.maximum(jnp.linalg.det(avg), 1e-20)
        aniso_fac = (jnp.maximum(det_a * det_b, 1e-20) ** 0.25
                     / jnp.sqrt(det_avg))
        d = pa - pb
        dsq = d @ jnp.linalg.solve(avg, d)
        return aniso_fac * self.base.cov_r2(dsq)

    def amplitude(self, p):
        return self.base.amplitude(p)

    def unscaled_variance(self, p):
        return jnp.ones(p.shape[:-1], jnp.float32)

    def variance(self, p):
        return self.base.variance(p)

    def compute_beckmann_roughness(self, p):
        return self.base.compute_beckmann_roughness(p)

    def sample_spectral_3d(self, key, ctr, p=None):
        s = self.base.sample_spectral_3d(key, ctr, None)
        if p is None:
            return s
        # warp the stationary frequency by the local aniso^{-1/2}
        A = self.local_aniso(p)
        evals, evecs = jnp.linalg.eigh(A)
        w = evecs @ (s / jnp.sqrt(jnp.maximum(evals, 1e-9)))
        return w


# ---------------------------------------------------------------------------
# Neural nonstationary covariance (NeuralNonstationaryCovariance,
# GPFunctions.hpp:2412-2443, impl GPFunctions.cpp:1914-1961): a tiny MLP
# produces per-point (sigma, lengthscale); Paciorek form on top.
# ---------------------------------------------------------------------------

@struct
class NeuralNonstationaryCov:
    base: object
    weights: tuple  # ((W,b), ...) -> outputs [sigma, ls]
    transform: jnp.ndarray

    is_stationary = False
    is_nonstationary_aniso = False
    use_multi_res_grid = False
    has_analytic_spectral_density = False

    @staticmethod
    def create(base, weights, transform=None):
        tf = (jnp.eye(4, dtype=jnp.float32) if transform is None
              else jnp.asarray(transform, jnp.float32))
        return NeuralNonstationaryCov(
            base=base,
            weights=tuple((jnp.asarray(w, jnp.float32),
                           jnp.asarray(b, jnp.float32)) for w, b in weights),
            transform=tf)

    def _mlp(self, p):
        ph = jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,), p.dtype)],
                             axis=-1)
        h = jnp.einsum("ij,...j->...i", self.transform, ph,
                       precision="highest")[..., :3]
        n = len(self.weights)
        for i, (w, b) in enumerate(self.weights):
            h = jnp.einsum("...i,io->...o", h, w, precision="highest") + b
            if i < n - 1:
                h = jnp.sin(h)
        # PSD projection: softplus keeps sigma/ls positive
        return jax.nn.softplus(h)

    def sigma_ls(self, p):
        out = self._mlp(p)
        return out[..., 0], out[..., 1]

    def cov(self, pa, pb):
        sa, la = self.sigma_ls(pa)
        sb, lb = self.sigma_ls(pb)
        a2, b2 = la * la, lb * lb
        avg = 0.5 * (a2 + b2)
        aniso_fac = (a2 * b2) ** 0.75 / jnp.maximum(avg, 1e-12) ** 1.5
        d = pa - pb
        dsq = dot(d, d) / jnp.maximum(avg, 1e-12)
        return sa * sb * aniso_fac * self.base.cov_r2(dsq)

    def amplitude(self, p):
        s, _ = self.sigma_ls(p)
        return s * self.base.amplitude(p)

    def unscaled_variance(self, p):
        s, _ = self.sigma_ls(p)
        return s

    def variance(self, p):
        s, _ = self.sigma_ls(p)
        return s * s * self.base.variance(p)

    def compute_beckmann_roughness(self, p):
        s, _ = self.sigma_ls(p)
        return self.base.compute_beckmann_roughness(p) * s

    def sample_spectral_3d(self, key, ctr, p=None):
        s = self.base.sample_spectral_3d(key, ctr, None)
        if p is None:
            return s
        _, ls = self.sigma_ls(p)
        return s / ls

"""GP mean functions (the deterministic SDF part of the implicit surface).

Re-design of the reference's MeanFunction family
(src/core/math/GPFunctions.hpp:795-1129).  Each mean is a frozen pytree with
``mean(p)`` and ``grad(p)`` over batched points; gradients are closed form
where trivial and jax.grad otherwise (the reference hand-writes them).
Color/emission fields ride along for GPIS media weighting
(GaussianProcessMedium.cpp:316-317).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.pytree import static_field, struct
from ..utils.vecmath import dot, length, normalize, safe_normalize
from . import sdf


def _autograd(mean_fn, p):
    g = jax.grad(lambda q: jnp.sum(mean_fn(q)))
    return g(p)


@struct
class HomogeneousMean:
    """Constant offset (GPFunctions.hpp:867-901)."""
    offset: jnp.ndarray

    @staticmethod
    def create(offset=0.0):
        return HomogeneousMean(offset=jnp.float32(offset))

    def mean(self, p):
        return jnp.broadcast_to(self.offset, p.shape[:-1])

    def grad(self, p):
        return jnp.zeros_like(p)

    def lipschitz(self):
        return 0.0

    def shell_embedding(self, p):
        return p


@struct
class SphericalMean:
    """Sphere SDF mean + spherical-shell embedding (GPFunctions.hpp:903-945)."""
    center: jnp.ndarray
    radius: jnp.ndarray

    @staticmethod
    def create(center=(0.0, 0.0, 0.0), radius=1.0):
        return SphericalMean(center=jnp.asarray(center, jnp.float32),
                             radius=jnp.float32(radius))

    def mean(self, p):
        return length(p - self.center) - self.radius

    def grad(self, p):
        return safe_normalize(p - self.center)

    def lipschitz(self):
        return 1.0

    def shell_embedding(self, p):
        pc = p - self.center
        r = length(pc)
        theta = jnp.arccos(jnp.clip(pc[..., 1] / jnp.maximum(r, 1e-12), -1.0, 1.0))
        phi = jnp.arctan2(pc[..., 2], pc[..., 0])
        return jnp.stack([theta * self.radius, phi * self.radius,
                          r - self.radius], axis=-1)


@struct
class LinearMean:
    """Plane SDF with clamping (GPFunctions.hpp:947-1005)."""
    ref: jnp.ndarray
    dir: jnp.ndarray  # normalized
    scale: jnp.ndarray
    min: jnp.ndarray

    @staticmethod
    def create(ref=(0.0, 0.0, 0.0), direction=(1.0, 0.0, 0.0), scale=1.0,
               min_value=-3.0e38):
        d = jnp.asarray(direction, jnp.float32)
        return LinearMean(ref=jnp.asarray(ref, jnp.float32),
                          dir=d / jnp.linalg.norm(d),
                          scale=jnp.float32(scale), min=jnp.float32(min_value))

    def mean(self, p):
        return jnp.maximum(dot(p - self.ref, self.dir) * self.scale, self.min)

    def grad(self, p):
        active = dot(p - self.ref, self.dir) * self.scale >= self.min
        return jnp.where(active[..., None], self.dir * self.scale, 0.0)

    def lipschitz(self):
        return self.scale

    def shell_embedding(self, p):
        from ..utils.vecmath import frame_to_local, tangent_frame
        t, b = tangent_frame(self.dir)
        return frame_to_local(t, b, self.dir, p)


@struct(meta=("fn_name",))
class ProceduralMean:
    """Analytic-SDF mean (ProceduralMean over ProceduralSdf,
    GPFunctions.hpp:1049-1087; SDF dispatch SdfFunctions.hpp:49-63), with an
    optional rigid transform, offset and scale."""
    transform: jnp.ndarray  # (4,4) world->sdf-local (inverse config transform)
    offset: jnp.ndarray
    scale: jnp.ndarray
    min: jnp.ndarray
    fn_name: str = static_field(default="knob")

    @staticmethod
    def create(fn_name="knob", transform=None, offset=0.0, scale=1.0,
               min_value=-3.0e38):
        tf = jnp.eye(4, dtype=jnp.float32) if transform is None else jnp.asarray(transform, jnp.float32)
        return ProceduralMean(transform=tf, offset=jnp.float32(offset),
                              scale=jnp.float32(scale), min=jnp.float32(min_value),
                              fn_name=fn_name)

    def _local(self, p):
        ph = jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,), p.dtype)], axis=-1)
        return jnp.einsum("ij,...j->...i", self.transform, ph, precision="highest")[..., :3]

    def mean(self, p):
        f = sdf.FUNCTIONS[self.fn_name]
        return jnp.maximum(f(self._local(p)) * self.scale + self.offset, self.min)

    def grad(self, p):
        return _autograd(self.mean, p)

    def lipschitz(self):
        return self.scale

    def shell_embedding(self, p):
        return p


@struct(meta=("interp",))
class TabulatedMean:
    """Dense-grid mean with trilinear interpolation (TabulatedMean,
    GPFunctions.hpp:1007-1025, impl GPFunctions.cpp:143-195).  Also the
    landing target for mesh-SDF means: the mesh SDF is baked to a grid on the
    host at scene-load (instead of porting libigl queries into the hot path,
    cf. SURVEY.md §7)."""
    values: jnp.ndarray  # (nx, ny, nz)
    bounds_min: jnp.ndarray  # (3,)
    bounds_max: jnp.ndarray  # (3,)
    offset: jnp.ndarray
    scale: jnp.ndarray
    interp: str = static_field(default="linear")

    @staticmethod
    def create(values, bounds_min, bounds_max, offset=0.0, scale=1.0):
        return TabulatedMean(values=jnp.asarray(values, jnp.float32),
                             bounds_min=jnp.asarray(bounds_min, jnp.float32),
                             bounds_max=jnp.asarray(bounds_max, jnp.float32),
                             offset=jnp.float32(offset), scale=jnp.float32(scale))

    def _sample(self, p):
        shape = jnp.asarray(self.values.shape, jnp.float32)
        uvw = (p - self.bounds_min) / (self.bounds_max - self.bounds_min)
        g = uvw * (shape - 1.0)
        g = jnp.clip(g, 0.0, shape - 1.0 - 1e-4)
        i0 = jnp.floor(g).astype(jnp.int32)
        f = g - i0
        v = 0.0
        for cx in (0, 1):
            for cy in (0, 1):
                for cz in (0, 1):
                    w = ((f[..., 0] if cx else 1 - f[..., 0])
                         * (f[..., 1] if cy else 1 - f[..., 1])
                         * (f[..., 2] if cz else 1 - f[..., 2]))
                    v = v + w * self.values[i0[..., 0] + cx,
                                            i0[..., 1] + cy,
                                            i0[..., 2] + cz]
        return v

    def mean(self, p):
        return self._sample(p) * self.scale + self.offset

    def grad(self, p):
        return _autograd(self.mean, p)

    def lipschitz(self):
        return self.scale

    def shell_embedding(self, p):
        return p


@struct
class NeuralMean:
    """Tiny sin-activated MLP SDF (NeuralMean / GPNeuralNetwork,
    GPFunctions.hpp:1027-1047, math/GPNeuralNetwork.hpp:22-90)."""
    weights: tuple  # tuple of (W, b)
    transform: jnp.ndarray
    offset: jnp.ndarray
    scale: jnp.ndarray

    @staticmethod
    def create(weights, transform=None, offset=0.0, scale=1.0):
        tf = jnp.eye(4, dtype=jnp.float32) if transform is None else jnp.asarray(transform, jnp.float32)
        return NeuralMean(weights=tuple((jnp.asarray(w, jnp.float32), jnp.asarray(b, jnp.float32))
                                        for w, b in weights),
                          transform=tf, offset=jnp.float32(offset),
                          scale=jnp.float32(scale))

    def mean(self, p):
        ph = jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,), p.dtype)], axis=-1)
        x = jnp.einsum("ij,...j->...i", self.transform, ph, precision="highest")[..., :3]
        h = x
        n = len(self.weights)
        for i, (w, b) in enumerate(self.weights):
            h = jnp.einsum("...i,io->...o", h, w, precision="highest") + b
            if i < n - 1:
                h = jnp.sin(h)
        return h[..., 0] * self.scale + self.offset

    def grad(self, p):
        return _autograd(self.mean, p)

    def lipschitz(self):
        return self.scale

    def shell_embedding(self, p):
        return p


def mean_and_id(mean, mean_additional, p):
    """Pointwise min of two means + winning GP id — the "additional mean"
    CSG fast path (mean_weight_space, GaussianProcess.cpp:379-393)."""
    m0 = mean.mean(p)
    if mean_additional is None:
        return m0, jnp.zeros(p.shape[:-1], jnp.int32)
    m1 = mean_additional.mean(p)
    take1 = m1 < m0
    return jnp.where(take1, m1, m0), take1.astype(jnp.int32)


def mean_grad_by_id(mean, mean_additional, p, gp_id):
    """Gradient of whichever mean won the min (SparseConvolutionNoise.cpp:97)."""
    g0 = mean.grad(p)
    if mean_additional is None:
        return g0
    g1 = mean_additional.grad(p)
    return jnp.where((gp_id == 1)[..., None], g1, g0)

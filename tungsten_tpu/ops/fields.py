"""Procedural scalar/vector fields driving nonstationary GPs and GP colors.

Re-design of the reference's ProceduralScalar/Vector family
(src/core/math/GPFunctions.hpp:402-793, impl GPFunctions.cpp:53-141):
constant, log-space directional ramps (bottom_top / left_right / front_back /
bottom_top_left_right), fbm-based Sandstone/Rust looks, analytic SDFs, and
dense regular grids with trilinear lookup.

The simplex-style gradient noise under fbm is re-implemented on the counter
RNG (hash-based lattice gradients) — visually equivalent, not bit-identical
to the reference's sin-hash (SdfFunctions.cpp random3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import rng
from ..utils.pytree import static_field, struct
from ..utils.vecmath import dot
from . import sdf as sdflib


def _hash_grad(ix, iy, iz):
    """Pseudo-random lattice vector in [-0.5, 0.5]^3 keyed by cell."""
    h = rng.xxhash32_3(ix.astype(jnp.int32).astype(jnp.uint32),
                       iy.astype(jnp.int32).astype(jnp.uint32),
                       iz.astype(jnp.int32).astype(jnp.uint32))
    return jnp.stack([rng.uniform(h, np.uint32(0)) - 0.5,
                      rng.uniform(h, np.uint32(1)) - 0.5,
                      rng.uniform(h, np.uint32(2)) - 0.5], axis=-1)


def value_noise(p):
    """Value-gradient lattice noise in roughly [-1, 1] (simplex3d stand-in)."""
    base = jnp.floor(p)
    f = p - base
    w = f * f * (3.0 - 2.0 * f)
    acc = 0.0
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                g = _hash_grad(base[..., 0] + cx, base[..., 1] + cy,
                               base[..., 2] + cz)
                d = f - jnp.stack([jnp.full_like(f[..., 0], cx),
                                   jnp.full_like(f[..., 1], cy),
                                   jnp.full_like(f[..., 2], cz)], axis=-1)
                wx = w[..., 0] if cx else 1 - w[..., 0]
                wy = w[..., 1] if cy else 1 - w[..., 1]
                wz = w[..., 2] if cz else 1 - w[..., 2]
                acc = acc + wx * wy * wz * dot(g, d)
    return acc * 4.0


def fbm(p, octaves=2):
    """(GPFunctions.cpp fbm, :300-329): gain 0.65, lacunarity 2.1042."""
    gain, lac = 0.65, 2.1042
    p = p * 5.0
    total = value_noise(p)
    freq, amp = 0.5, gain
    for _ in range(octaves):
        total = total + value_noise(p * freq) * amp
        freq = freq * lac
        amp = amp * gain
    return (total + 2.0) / 4.0


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


@struct(meta=("kind", "noise", "sdf_fn", "is_vector"))
class Field:
    """One procedural field; __call__(p[...,3]) -> [...] or [...,3]."""
    value: jnp.ndarray  # constant value / (3,) vector
    mn: jnp.ndarray
    mx: jnp.ndarray
    start: jnp.ndarray
    end: jnp.ndarray
    mn2: jnp.ndarray
    mx2: jnp.ndarray
    start2: jnp.ndarray
    end2: jnp.ndarray
    grid: jnp.ndarray  # regular grid values
    bounds_min: jnp.ndarray
    bounds_max: jnp.ndarray
    offset: jnp.ndarray  # sdf offset/scale
    scale: jnp.ndarray
    kind: str = static_field(default="constant")
    noise: str = static_field(default="bottom_top")
    sdf_fn: str = static_field(default="knob")
    is_vector: bool = static_field(default=False)

    @staticmethod
    def constant(v, is_vector=False):
        v = jnp.asarray(v, jnp.float32)
        z = jnp.float32(0.0)
        z3 = jnp.zeros(3, jnp.float32)
        return Field(value=v, mn=z, mx=z, start=z, end=z, mn2=z, mx2=z,
                     start2=z, end2=z, grid=jnp.zeros((2, 2, 2)),
                     bounds_min=z3, bounds_max=jnp.ones(3), offset=z,
                     scale=jnp.float32(1.0), kind="constant",
                     is_vector=is_vector)

    @staticmethod
    def noise_field(noise="bottom_top", mn=1.0, mx=500.0, start=0.0, end=1.0,
                    mn2=1.0, mx2=500.0, start2=0.0, end2=1.0,
                    is_vector=False):
        f = Field.constant(0.0, is_vector)
        from dataclasses import replace
        return replace(f, kind="noise", noise=noise,
                       mn=jnp.float32(mn), mx=jnp.float32(mx),
                       start=jnp.float32(start), end=jnp.float32(end),
                       mn2=jnp.float32(mn2), mx2=jnp.float32(mx2),
                       start2=jnp.float32(start2), end2=jnp.float32(end2))

    @staticmethod
    def sdf(fn="knob", offset=0.0, scale=1.0):
        f = Field.constant(0.0)
        from dataclasses import replace
        return replace(f, kind="sdf", sdf_fn=fn, offset=jnp.float32(offset),
                       scale=jnp.float32(scale))

    @staticmethod
    def regular_grid(values, bounds_min, bounds_max, is_vector=False):
        f = Field.constant(0.0, is_vector)
        from dataclasses import replace
        return replace(f, kind="grid",
                       grid=jnp.asarray(values, jnp.float32),
                       bounds_min=jnp.asarray(bounds_min, jnp.float32),
                       bounds_max=jnp.asarray(bounds_max, jnp.float32))

    def _ramp(self, coord, mn, mx, scale, off):
        """log-space ramp (ProceduralNoise BottomTop etc.,
        GPFunctions.cpp:53-67): sqrt(exp(lerp(log(min^2), log(max^2), u)))."""
        u = jnp.clip(coord * scale + off, 0.0, 1.0)
        lo, hi = jnp.log(mn * mn), jnp.log(mx * mx)
        return jnp.sqrt(jnp.exp(lo + (hi - lo) * u))

    def __call__(self, p):
        if self.kind == "constant":
            if self.is_vector:
                v = jnp.broadcast_to(self.value, p.shape)
                return v
            return jnp.broadcast_to(self.value, p.shape[:-1])
        if self.kind == "sdf":
            v = sdflib.FUNCTIONS[self.sdf_fn](p) * self.scale + self.offset
            return v
        if self.kind == "grid":
            shape = jnp.asarray(self.grid.shape[:3], jnp.float32)
            uvw = (p - self.bounds_min) / (self.bounds_max - self.bounds_min)
            g = jnp.clip(uvw * (shape - 1), 0.0, shape - 1 - 1e-4)
            i0 = jnp.floor(g).astype(jnp.int32)
            f = g - i0
            acc = 0.0
            for cx in (0, 1):
                for cy in (0, 1):
                    for cz in (0, 1):
                        w = ((f[..., 0] if cx else 1 - f[..., 0])
                             * (f[..., 1] if cy else 1 - f[..., 1])
                             * (f[..., 2] if cz else 1 - f[..., 2]))
                        val = self.grid[i0[..., 0] + cx, i0[..., 1] + cy,
                                        i0[..., 2] + cz]
                        acc = acc + (w[..., None] if self.is_vector and
                                     self.grid.ndim == 4 else w) * val
            return acc
        if self.kind == "noise":
            scale = 1.0 / (self.end - self.start)
            off = -self.start * scale
            scale2 = 1.0 / (self.end2 - self.start2)
            off2 = -self.start2 * scale2
            if self.noise == "bottom_top":
                v = self._ramp(p[..., 1], self.mn, self.mx, scale, off)
            elif self.noise == "left_right":
                v = self._ramp(p[..., 0], self.mn, self.mx, scale, off)
            elif self.noise == "front_back":
                v = self._ramp(p[..., 2], self.mn, self.mx, scale, off)
            elif self.noise == "bottom_top_left_right":
                v = (self._ramp(p[..., 1], self.mn, self.mx, scale, off)
                     * self._ramp(p[..., 0], self.mn2, self.mx2, scale2,
                                  off2))
            elif self.noise == "sandstone":
                ps = p * 0.3
                f = fbm(ps + fbm(ps + fbm(ps)[..., None])[..., None])
                c = jnp.sqrt(jnp.maximum(f * 1.9 * 1.2, 0.0)) - 0.35
                v = self.mn + (self.mx - self.mn) * jnp.clip(c, 0.0, 1.0)
            elif self.noise == "rust":
                ps = p * 2.0
                f = _smoothstep(0.4, 0.6,
                                fbm(ps + fbm(ps * 0.1)[..., None] * 0.4)
                                - fbm(ps * 25.0) * 0.1)
                v = self.mn + (self.mx - self.mn) * jnp.clip(f, 0.0, 1.0)
            else:
                raise ValueError(self.noise)
            if self.is_vector:
                return jnp.repeat(v[..., None], 3, axis=-1)
            return v
        raise ValueError(self.kind)

    def max_val(self):
        """Static bound used for sparseConvNoiseMaxLateralScale
        (GPFunctions.cpp:1742-1746)."""
        if self.kind == "constant":
            return float(np.max(np.asarray(self.value)))
        if self.kind == "noise":
            if self.noise in ("bottom_top", "left_right", "front_back"):
                return float(max(np.asarray(self.mn), np.asarray(self.mx)))
            if self.noise == "bottom_top_left_right":
                return float(max(np.asarray(self.mn), np.asarray(self.mx))
                             * max(np.asarray(self.mn2), np.asarray(self.mx2)))
            return 1.0
        if self.kind == "grid":
            return float(np.max(np.asarray(self.grid)))
        return 1.0


def parse_field(doc, is_vector=False):
    """JSON -> Field (ProceduralScalarFactory / ProceduralVectorFactory,
    GaussianProcessFactory.cpp:41-52)."""
    if doc is None:
        return None
    if isinstance(doc, (int, float)):
        return Field.constant(float(doc), is_vector)
    if isinstance(doc, list):
        return Field.constant(doc, is_vector)
    t = doc.get("type", "constant")
    if t == "constant":
        return Field.constant(doc.get("value", 1.0), is_vector)
    if t == "noise":
        return Field.noise_field(
            noise=doc.get("noise", "bottom_top"),
            mn=doc.get("min", 1.0), mx=doc.get("max", 500.0),
            start=doc.get("start", 0.0), end=doc.get("end", 1.0),
            mn2=doc.get("min2", 1.0), mx2=doc.get("max2", 500.0),
            start2=doc.get("start2", 0.0), end2=doc.get("end2", 1.0),
            is_vector=is_vector)
    if t == "sdf":
        return Field.sdf(fn=doc.get("func", "knob"),
                         offset=doc.get("offset", 0.0),
                         scale=doc.get("scale", 1.0))
    raise ValueError(f"procedural field type {t!r} not supported yet")

"""Analytic SDF library (knob / knob_inner / knob_outer / two_spheres / plane).

Re-implementation in JAX of the standard Inigo Quilez distance-function
vocabulary used by the reference's procedural means
(src/core/math/SdfFunctions.cpp; shapes themselves are public-domain
distfunctions).  Everything is differentiable — gradients come from jax.grad
instead of the reference's finite differences (SdfFunctions.hpp:49-63).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..utils.vecmath import dot, length


def _rot_x(p, deg):
    a = math.radians(deg)
    c, s = math.cos(a), math.sin(a)
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    return jnp.stack([x, c * y - s * z, s * y + c * z], axis=-1)


def sd_sphere(p, r):
    return length(p) - r


def sd_torus(p, t0, t1):
    qx = jnp.sqrt(p[..., 0] ** 2 + p[..., 2] ** 2) - t0
    return jnp.sqrt(qx**2 + p[..., 1] ** 2) - t1


def sd_cone(p, c0, c1):
    q = jnp.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2)
    return c0 * q + c1 * p[..., 2]


def sd_capped_cylinder(p, h, r):
    dx = jnp.abs(jnp.sqrt(p[..., 0] ** 2 + p[..., 2] ** 2)) - h
    dy = jnp.abs(p[..., 1]) - r
    return (jnp.minimum(jnp.maximum(dx, dy), 0.0)
            + jnp.sqrt(jnp.maximum(dx, 0.0) ** 2 + jnp.maximum(dy, 0.0) ** 2))


def sd_tri_prism(p, h0, h1):
    q = jnp.abs(p)
    return jnp.maximum(
        q[..., 2] - h1,
        jnp.maximum(q[..., 0] * 0.866025 + p[..., 1] * 0.5, -p[..., 1]) - h0 * 0.5)


def op_smooth_union(d1, d2, k):
    h = jnp.clip(0.5 + 0.5 * (d2 - d1) / k, 0.0, 1.0)
    return d2 + (d1 - d2) * h - k * h * (1.0 - h)


def op_smooth_sub(d1, d2, k):
    h = jnp.clip(0.5 - 0.5 * (d2 + d1) / k, 0.0, 1.0)
    return d2 + (-d1 - d2) * h + k * h * (1.0 - h)


def _sd_base(p):
    pi3 = math.pi / 3.0
    base = op_smooth_union(
        sd_cone(_rot_x(p + jnp.array([0.0, 0.9, 0.0]), -90), pi3, pi3),
        sd_cone(_rot_x(p - jnp.array([0.0, 0.9, 0.0]), 90), pi3, pi3),
        0.02)
    base = jnp.maximum(base, sd_capped_cylinder(p, 1.1, 0.25)) * 0.7
    base = jnp.maximum(-sd_capped_cylinder(p, 0.6, 0.3), base)
    base = jnp.maximum(
        -sd_tri_prism(_rot_x(p + jnp.array([0.0, 0.0, -1.0]), 90), 1.2, 0.3), base)
    return base


def _knob_parts(p):
    sphere = sd_sphere(p, 1.0)
    cutout = sd_sphere(p - jnp.array([0.0, 0.5, 0.5]), 0.7)
    cutout_etch = sd_torus(_rot_x(p - jnp.array([0.0, 0.2, 0.2]), -45), 1.0, 0.05)
    inner = sd_sphere(p, 0.75)
    base = _sd_base(p - jnp.array([0.0, -0.775, 0.0]))
    return sphere, cutout, cutout_etch, inner, base


def knob(p):
    scale = 0.8
    p = p / scale
    sphere, cutout, cutout_etch, inner, base = _knob_parts(p)
    d = op_smooth_sub(cutout, sphere, 0.1)
    d = jnp.minimum(d, inner)
    d = jnp.maximum(-cutout_etch, d)
    d = jnp.minimum(op_smooth_sub(sphere, base, 0.1), d)
    return d * scale


def knob_inner(p):
    scale = 0.8
    return sd_sphere(p / scale, 0.75) * scale


def knob_outer(p):
    scale = 0.8
    p = p / scale
    sphere, cutout, cutout_etch, inner, base = _knob_parts(p)
    d = op_smooth_sub(cutout, sphere, 0.1)
    d = jnp.maximum(d, -inner)
    d = jnp.maximum(-cutout_etch, d)
    d = jnp.minimum(op_smooth_sub(sphere, base, 0.1), d)
    return d * scale


def two_spheres(p):
    return jnp.minimum(length(p - jnp.array([0.0, 10.0, 0.0])) - 9.5,
                       length(p - jnp.array([0.0, -10.0, 0.0])) - 9.5)


def plane(p):
    return p[..., 1]


FUNCTIONS = {
    "knob": knob,
    "knob_inner": knob_inner,
    "knob_outer": knob_outer,
    "two_spheres": two_spheres,
    "plane": plane,
}

"""Mesh SDF baking: signed distance of a triangle mesh on a dense grid.

Replaces the reference MeshSdfMean's on-the-fly libigl queries (AABB-tree
closest point + fast winding number, GPFunctions.cpp:298-460) with a
load-time bake: unsigned point-triangle distance and the generalized winding
number (Jacobson et al. 2013, the quantity libigl's FWN approximates) are
evaluated for every grid cell on the accelerator — an O(G*T) brute-force
that is a few GFLOP, i.e. milliseconds on a TPU — then the hot path is a
trilinear TabulatedMean lookup (SURVEY.md §7 item 7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _point_tri_dist_sq(p, a, b, c):
    """Unsigned squared distance point->triangle ([T] batch, one point)."""
    ab, ac, ap = b - a, c - a, p[None, :] - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p[None, :] - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p[None, :] - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, 1e-20)
    v = jnp.clip(vb / denom, 0.0, 1.0)
    w = jnp.clip(vc / denom, 0.0, 1.0)
    # interior closest point
    q_face = a + v[:, None] * ab + w[:, None] * ac

    def edge_q(e0, ev):
        t = jnp.clip(jnp.sum((p[None, :] - e0) * ev, -1)
                     / jnp.maximum(jnp.sum(ev * ev, -1), 1e-20), 0.0, 1.0)
        return e0 + t[:, None] * ev

    q_ab = edge_q(a, ab)
    q_ac = edge_q(a, ac)
    q_bc = edge_q(b, c - b)

    in_face = (va >= 0) & (vb >= 0) & (vc >= 0)
    d_face = jnp.sum((p[None, :] - q_face) ** 2, -1)
    d_edges = jnp.minimum(jnp.sum((p[None, :] - q_ab) ** 2, -1),
                          jnp.minimum(jnp.sum((p[None, :] - q_ac) ** 2, -1),
                                      jnp.sum((p[None, :] - q_bc) ** 2, -1)))
    return jnp.where(in_face, d_face, d_edges)


def _winding(p, a, b, c):
    """Generalized winding number contribution of each triangle (solid angle
    / 4pi, van Oosterom & Strackee)."""
    va, vb, vc = a - p[None, :], b - p[None, :], c - p[None, :]
    la = jnp.linalg.norm(va, axis=-1)
    lb = jnp.linalg.norm(vb, axis=-1)
    lc = jnp.linalg.norm(vc, axis=-1)
    num = jnp.sum(va * jnp.cross(vb, vc), -1)
    den = (la * lb * lc + jnp.sum(va * vb, -1) * lc
           + jnp.sum(vb * vc, -1) * la + jnp.sum(vc * va, -1) * lb)
    return jnp.arctan2(num, den) / (2.0 * jnp.pi)


def _sdf_one(p, a, b, c, signed):
    d = jnp.sqrt(jnp.maximum(jnp.min(_point_tri_dist_sq(p, a, b, c)), 0.0))
    if not signed:
        return d
    w = jnp.sum(_winding(p, a, b, c))
    return jnp.where(w > 0.5, -d, d)


def bake_mesh_sdf(pos, tris, res=64, pad=0.15, signed=True):
    """Returns (grid [res,res,res], bounds_min [3], bounds_max [3]);
    grid[i,j,k] indexed x,y,z like TabulatedMean."""
    pos = np.asarray(pos, np.float32)
    tris = np.asarray(tris, np.int64)
    a = jnp.asarray(pos[tris[:, 0]])
    b = jnp.asarray(pos[tris[:, 1]])
    c = jnp.asarray(pos[tris[:, 2]])
    bmin = pos.min(0)
    bmax = pos.max(0)
    ext = (bmax - bmin).max()
    bmin = bmin - pad * ext
    bmax = bmax + pad * ext

    xs = np.linspace(bmin[0], bmax[0], res, dtype=np.float32)
    ys = np.linspace(bmin[1], bmax[1], res, dtype=np.float32)
    zs = np.linspace(bmin[2], bmax[2], res, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3))

    f = jax.jit(lambda ps: jax.lax.map(
        lambda p: _sdf_one(p, a, b, c, signed), ps, batch_size=1024))
    grid = np.asarray(f(pts)).reshape(res, res, res)
    return grid.astype(np.float32), bmin.astype(np.float32), \
        bmax.astype(np.float32)

"""Analytic primitives as a single SoA table + brute-force batched intersection.

Replaces the reference's Embree-2 BVH + per-class Primitive objects
(src/core/primitives/, renderer/TraceableScene.hpp:25-220) with a TPU-native
design: all primitives live in one padded SoA; a ray batch intersects every
primitive at once ([R, P] elementwise work on the VPU) and takes the min.
Paper scenes have O(10) primitives, so brute force beats any tree on this
hardware (uniform control flow, zero divergence).

Geometry conventions match the reference exactly so scene JSONs are
compatible:
  quad: unit square in xz, centered, transformed (Quad.cpp prepareForRender)
  sphere: transform origin + max scale as radius (Sphere.cpp)
  cube: [-s, s] box in rotated frame (Cube.cpp)
  disk: unit radius in xz plane (Disk.cpp)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.pytree import struct
from ..utils.vecmath import (dot, frame_to_world, length, normalize,
                             safe_normalize, tangent_frame, tlookup)
from .mesh import (MeshSoA, build_mesh_soa, direct_pdf_mesh, empty_mesh,
                   mesh_intersect, sample_direct_mesh,
                   sample_position_mesh)

PRIM_QUAD = 0
PRIM_SPHERE = 1
PRIM_CUBE = 2
PRIM_DISK = 3
PRIM_MESH = 4
# cylinder: unit cylinder along local +y, radius/halfHeight from the
# transform, optional caps (Cylinder.cpp:56-113).  scale = (capped,
# halfHeight, _); radius field holds the radius.
PRIM_CYLINDER = 5
# point: non-intersectable Dirac light (Point.cpp:31-34; sampleDirect
# pdf = r^2, Point.cpp:98-115)
PRIM_POINT = 6

_INF = np.float32(3.0e38)


@struct
class PrimitiveSoA:
    """Padded SoA of all primitives.  Per-prim data (P = prim count):

    kind[P], p0[P,3] (quad base / sphere center / cube center / disk center),
    e0[P,3], e1[P,3] (quad edges), n[P,3] (quad/disk normal),
    rot[P,3,3] (cube rotation world->local), scale[P,3] (cube half extents),
    radius[P] (sphere/disk), area[P], emission[P,3],
    bsdf[P] (index), int_medium[P] / ext_medium[P] (-1 = keep current),
    is_light[P] (bool).
    """
    kind: jnp.ndarray
    p0: jnp.ndarray
    e0: jnp.ndarray
    e1: jnp.ndarray
    n: jnp.ndarray
    rot: jnp.ndarray
    scale: jnp.ndarray
    radius: jnp.ndarray
    area: jnp.ndarray
    emission: jnp.ndarray
    bsdf: jnp.ndarray
    int_medium: jnp.ndarray
    ext_medium: jnp.ndarray
    is_light: jnp.ndarray
    mesh: MeshSoA

    @property
    def count(self):
        return self.kind.shape[0]


def build_soa(prims: list[dict]) -> PrimitiveSoA:
    """Host-side build from parsed primitive dicts (scene/parse.py)."""
    P = max(len(prims), 1)

    def z(shape, dtype=np.float32):
        return np.zeros(shape, dtype)

    kind = z(P, np.int32)
    p0, e0, e1, n = z((P, 3)), z((P, 3)), z((P, 3)), z((P, 3))
    rot = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
    scale = z((P, 3))
    radius, area = z(P), z(P)
    emission = z((P, 3))
    bsdf = z(P, np.int32)
    int_m = -np.ones(P, np.int32)
    ext_m = -np.ones(P, np.int32)
    is_light = np.zeros(P, bool)

    meshes = []
    for i, pr in enumerate(prims):
        kind[i] = pr["kind"]
        tf = np.asarray(pr["transform"], np.float32)  # 4x4
        pos = tf[:3, 3]
        if pr["kind"] == PRIM_QUAD:
            base = pos.copy()
            ed0 = tf[:3, :3] @ np.array([1.0, 0, 0], np.float32)
            ed1 = tf[:3, :3] @ np.array([0, 0, 1.0], np.float32)
            base -= 0.5 * ed0 + 0.5 * ed1
            nn = np.cross(ed1, ed0)
            a = np.linalg.norm(nn)
            p0[i], e0[i], e1[i], n[i] = base, ed0, ed1, nn / max(a, 1e-20)
            area[i] = a
        elif pr["kind"] == PRIM_SPHERE:
            s = np.linalg.norm(tf[:3, :3], axis=0)
            r = float(s.max())
            p0[i], radius[i] = pos, r
            area[i] = 4.0 * np.pi * r * r
        elif pr["kind"] == PRIM_CUBE:
            s = np.linalg.norm(tf[:3, :3], axis=0)
            rr = tf[:3, :3] / s[None, :]
            p0[i], scale[i] = pos, 0.5 * s
            rot[i] = rr.T  # world -> local
            area[i] = 8.0 * (s[1] * s[2] + s[2] * s[0] + s[0] * s[1]) / 4.0
        elif pr["kind"] == PRIM_DISK:
            ed0 = tf[:3, :3] @ np.array([1.0, 0, 0], np.float32)
            ed1 = tf[:3, :3] @ np.array([0, 0, 1.0], np.float32)
            nn = np.cross(ed1, ed0)
            a = np.linalg.norm(nn)
            r = float(np.linalg.norm(ed0))
            p0[i], n[i], radius[i] = pos, nn / max(a, 1e-20), r
            area[i] = np.pi * r * r
        elif pr["kind"] == PRIM_CYLINDER:
            s = np.linalg.norm(tf[:3, :3], axis=0)
            rr = tf[:3, :3] / s[None, :]
            r = 0.5 * float(s[0] + s[2])
            hh = float(s[1])
            capped = 1.0 if pr.get("capped", True) else 0.0
            p0[i], radius[i] = pos, r
            scale[i] = (capped, hh, 0.0)
            rot[i] = rr.T  # world -> local
            area[i] = 2.0 * np.pi * r * (2.0 * hh) \
                + (2.0 * np.pi * r * r if capped else 0.0)
        elif pr["kind"] == PRIM_POINT:
            p0[i] = pos
            area[i] = 0.0
        elif pr["kind"] == PRIM_MESH:
            md = dict(pr["mesh"])  # pos/normal/uv/tris (+smooth)
            lin = tf[:3, :3]
            mpos = np.asarray(md["pos"], np.float32) @ lin.T + pos[None, :]
            # normals transform by inverse-transpose
            nrm = np.asarray(md.get("normal"), np.float32)
            if nrm is not None and nrm.size:
                it = np.linalg.inv(lin).T
                nrm = nrm @ it.T
            # strand tangents transform as directions (linear part only)
            tgv = md.get("tangent")
            if tgv is not None:
                tgw = np.asarray(tgv, np.float32) @ lin.T
                tgw /= np.maximum(
                    np.linalg.norm(tgw, axis=-1, keepdims=True), 1e-20)
                md["tangent"] = tgw
            md.update(pos=mpos, normal=nrm, prim=i,
                      smooth=pr.get("smooth", True))
            meshes.append(md)
            tris = np.asarray(md["tris"], np.int64)
            aa, bb, cc = mpos[tris[:, 0]], mpos[tris[:, 1]], mpos[tris[:, 2]]
            area[i] = 0.5 * np.linalg.norm(
                np.cross(bb - aa, cc - aa), axis=-1).sum()
            p0[i] = 0.5 * (mpos.min(0) + mpos.max(0))
        emission[i] = np.asarray(pr.get("emission", (0.0, 0.0, 0.0)), np.float32)
        bsdf[i] = pr.get("bsdf", 0)
        int_m[i] = pr.get("int_medium", -1)
        ext_m[i] = pr.get("ext_medium", -1)
        is_light[i] = bool(np.any(emission[i] > 0.0))

    if not prims:
        kind[0] = PRIM_QUAD  # degenerate zero-area placeholder

    return PrimitiveSoA(
        kind=jnp.asarray(kind), p0=jnp.asarray(p0), e0=jnp.asarray(e0),
        e1=jnp.asarray(e1), n=jnp.asarray(n), rot=jnp.asarray(rot),
        scale=jnp.asarray(scale), radius=jnp.asarray(radius),
        area=jnp.asarray(area), emission=jnp.asarray(emission),
        bsdf=jnp.asarray(bsdf), int_medium=jnp.asarray(int_m),
        ext_medium=jnp.asarray(ext_m), is_light=jnp.asarray(is_light),
        mesh=build_mesh_soa(meshes) if meshes else empty_mesh())


# ---------------------------------------------------------------------------
# Intersection: one ray vs the whole table ([P] math; vmap over rays)
# ---------------------------------------------------------------------------

def _isect_quad(s, ro, rd):
    n_dot_w = dot(rd[None, :], s.n)
    t = dot(s.n, s.p0 - ro[None, :]) / jnp.where(jnp.abs(n_dot_w) < 1e-6,
                                                 jnp.float32(1e30), n_dot_w)
    q = ro[None, :] + t[:, None] * rd[None, :]
    v = q - s.p0
    l0 = dot(v, s.e0) / jnp.maximum(dot(s.e0, s.e0), 1e-20)
    l1 = dot(v, s.e1) / jnp.maximum(dot(s.e1, s.e1), 1e-20)
    valid = (jnp.abs(n_dot_w) >= 1e-6) & (l0 >= 0) & (l0 <= 1) & (l1 >= 0) & (l1 <= 1)
    back = n_dot_w >= 0.0
    return jnp.where(valid, t, _INF), back, jnp.broadcast_to(s.n, (s.count, 3))


def _isect_sphere(s, ro, rd):
    p = ro[None, :] - s.p0
    B = dot(p, rd[None, :])
    C = dot(p, p) - s.radius**2
    det_sq = B * B - C
    det = jnp.sqrt(jnp.maximum(det_sq, 1e-12))
    t0, t1 = -B - det, -B + det
    # prefer t0 if positive; else t1 (near/far gating happens in the caller
    # via the eps comparison)
    use0 = t0 > 1e-4
    t = jnp.where(use0, t0, t1)
    valid = (det_sq >= 0.0) & (t > 1e-4)
    back = ~use0
    t_safe = jnp.where(valid, t, 1.0)  # keep masked lanes NaN-free
    hit_p = ro[None, :] + t_safe[:, None] * rd[None, :]
    normal = safe_normalize(hit_p - s.p0)
    return jnp.where(valid, t, _INF), back, normal


def _isect_cube(s, ro, rd):
    p = jnp.einsum("pij,pj->pi", s.rot, ro[None, :] - s.p0, precision="highest")
    d = jnp.einsum("pij,pj->pi", s.rot, jnp.broadcast_to(rd, (s.count, 3)),
                   precision="highest")
    # clip keeps |dt/dd| bounded for rays near-parallel to a face (the
    # unclipped 1/d^2 backward overflows f32 and poisons gradients)
    inv_d = jnp.clip(1.0 / jnp.where(jnp.abs(d) < 1e-7,
                                     jnp.where(d < 0, -1e-7, 1e-7), d),
                     -1e7, 1e7)
    rel_min = (-s.scale - p) * inv_d
    rel_max = (s.scale - p) * inv_d
    tmin_ax = jnp.minimum(rel_min, rel_max)
    tmax_ax = jnp.maximum(rel_min, rel_max)
    tmin = jnp.maximum(jnp.max(tmin_ax, axis=-1), 1e-4)
    tmax = jnp.min(tmax_ax, axis=-1)
    use0 = tmin > 1e-4
    hit = (tmin <= tmax) & (tmax > 1e-4)
    t_entry = jnp.max(tmin_ax, axis=-1)
    t = jnp.where(t_entry > 1e-4, t_entry, tmax)
    back = ~(t_entry > 1e-4)
    # normal: axis of max tmin (entry) or min tmax (exit)
    ax_entry = jnp.argmax(tmin_ax, axis=-1)
    ax_exit = jnp.argmin(tmax_ax, axis=-1)
    ax = jnp.where(back, ax_exit, ax_entry)
    # one-hot select instead of take_along_axis / eye-gather: both lower to
    # scalar gathers that Mosaic executes at ~0.05 GB/s (profiled at 8.4 ms
    # per render pass for a [P,3] table); the arithmetic form is fused free
    onehot = (ax[:, None] == jnp.arange(3)[None, :]).astype(d.dtype)
    sign = -jnp.sign(jnp.sum(d * onehot, axis=-1))
    n_local = onehot * sign[:, None]
    normal = jnp.einsum("pji,pj->pi", s.rot, n_local, precision="highest")  # rot^T (local->world)
    return jnp.where(hit, t, _INF), back, normal


def _isect_disk(s, ro, rd):
    n_dot_w = dot(rd[None, :], s.n)
    t = dot(s.n, s.p0 - ro[None, :]) / jnp.where(jnp.abs(n_dot_w) < 1e-6,
                                                 jnp.float32(1e30), n_dot_w)
    q = ro[None, :] + t[:, None] * rd[None, :]
    v = q - s.p0
    valid = (jnp.abs(n_dot_w) >= 1e-6) & (dot(v, v) <= s.radius**2)
    back = n_dot_w >= 0.0
    return jnp.where(valid, t, _INF), back, jnp.broadcast_to(s.n, (s.count, 3))


def _isect_cylinder(s, ro, rd):
    """Side + optional caps in the local frame (Cylinder.cpp:56-113)."""
    p = jnp.einsum("pij,pj->pi", s.rot, ro[None, :] - s.p0,
                   precision="highest")
    d = jnp.einsum("pij,pj->pi", s.rot, jnp.broadcast_to(rd, (s.count, 3)),
                   precision="highest")
    inv_r = 1.0 / jnp.maximum(s.radius, 1e-9)
    hh = s.scale[:, 1]
    capped = s.scale[:, 0] > 0.5
    p2 = p[:, (0, 2)] * inv_r[:, None]
    d2 = d[:, (0, 2)] * inv_r[:, None]
    A = jnp.maximum(dot(d2, d2), 1e-12)
    B = dot(p2, d2)
    C = dot(p2, p2) - 1.0
    det_sq = B * B - A * C
    det = jnp.sqrt(jnp.maximum(det_sq, 1e-12))
    t0 = (-B - det) / A
    t1 = (-B + det) / A
    h0 = p[:, 1] + d[:, 1] * t0
    h1 = p[:, 1] + d[:, 1] * t1
    ok0 = (det_sq >= 0) & (t0 > 1e-4) & (jnp.abs(h0) <= hh)
    ok1 = (det_sq >= 0) & (t1 > 1e-4) & (jnp.abs(h1) <= hh)
    t_side = jnp.where(ok0, t0, jnp.where(ok1, t1, _INF))
    back_side = ~ok0 & ok1
    # caps
    dy = jnp.where(jnp.abs(d[:, 1]) < 1e-6,
                   jnp.where(d[:, 1] < 0, -1e-6, 1e-6), d[:, 1])
    t_cap = _INF
    cap_sign = jnp.zeros(s.count)
    for sign in (1.0, -1.0):
        tcs = (sign * hh - p[:, 1]) / dy
        ph = p2 + tcs[:, None] * d2
        okc = capped & (tcs > 1e-4) & (dot(ph, ph) < 1.0)
        better = okc & (tcs < t_cap)
        cap_sign = jnp.where(better, sign, cap_sign)
        t_cap = jnp.where(better, tcs, t_cap)
    use_cap = t_cap < t_side
    t = jnp.minimum(t_side, t_cap)
    hit = t < _INF
    # normals (local): side (x,0,z)/r at hit; cap (0,±1,0)
    ph_side = p2 + jnp.where(hit, t, 0.0)[:, None] * d2
    n_loc = jnp.stack([ph_side[:, 0], jnp.zeros(s.count), ph_side[:, 1]],
                      -1)
    n_cap = jnp.stack([jnp.zeros(s.count), cap_sign,
                       jnp.zeros(s.count)], -1)
    n_loc = jnp.where(use_cap[:, None], n_cap, n_loc)
    normal = jnp.einsum("pji,pj->pi", s.rot, n_loc, precision="highest")
    normal = safe_normalize(normal)
    back = jnp.where(use_cap, cap_sign * d[:, 1] > 0.0, back_side)
    return jnp.where(hit, t, _INF), back, normal


def intersect(soa: PrimitiveSoA, ro, rd, near, far):
    """Closest hit of one ray against all prims.

    Returns dict(hit, t, prim, normal(geometric, facing convention: raw
    primitive normal), back_side).  vmap over rays.
    """
    tq, bq, nq = _isect_quad(soa, ro, rd)
    ts, bs, ns = _isect_sphere(soa, ro, rd)
    tc, bc, nc = _isect_cube(soa, ro, rd)
    td, bd, nd = _isect_disk(soa, ro, rd)

    k = soa.kind
    t = jnp.select([k == PRIM_QUAD, k == PRIM_SPHERE, k == PRIM_CUBE,
                    k == PRIM_DISK], [tq, ts, tc, td], _INF)
    back = jnp.select([k == PRIM_QUAD, k == PRIM_SPHERE, k == PRIM_CUBE,
                       k == PRIM_DISK], [bq, bs, bc, bd], False)
    nrm = jnp.select([(k == PRIM_QUAD)[:, None], (k == PRIM_SPHERE)[:, None],
                      (k == PRIM_CUBE)[:, None], (k == PRIM_DISK)[:, None]],
                     [nq, ns, nc, nd], 0.0)
    tcy, bcy, ncy = _isect_cylinder(soa, ro, rd)
    is_cy = k == PRIM_CYLINDER
    t = jnp.where(is_cy, tcy, t)
    back = jnp.where(is_cy, bcy, back)
    nrm = jnp.where(is_cy[:, None], ncy, nrm)

    t = jnp.where((t > near) & (t < far), t, _INF)
    idx = jnp.argmin(t)
    # winner extraction via one-hot contraction (tlookup): vmapped scalar
    # gathers from the [P] tables lowered to ~8 ms/pass scalar loops
    t_min = tlookup(t, idx)
    nrm_w = tlookup(nrm, idx)
    back_w = tlookup(back, idx)
    # preferred shading tangent for analytic prims: the cylinder axis
    # (world-space local +y = rot row 1), matching Cylinder::tangentSpace;
    # zero elsewhere (fiber frames then fall back to the Duff ONB)
    tg_prim = jnp.where(is_cy[:, None], soa.rot[:, 1, :], 0.0)
    tg_w = tlookup(tg_prim, idx)

    if soa.mesh.has:
        mh = mesh_intersect(soa.mesh, ro, rd, near, far)
        m_better = mh["hit"] & (mh["t"] < t_min)
        hit = (t_min < _INF) | m_better
        return {
            "hit": hit,
            "t": jnp.where(m_better, mh["t"],
                           jnp.where(t_min < _INF, t_min, far)),
            "prim": jnp.where(m_better, mh["prim"],
                              idx.astype(jnp.int32)),
            "normal": jnp.where(m_better, mh["normal"], nrm_w),
            "tangent": jnp.where(m_better, mh["tangent"], tg_w),
            "back_side": jnp.where(m_better, mh["back_side"], back_w),
        }

    hit = t_min < _INF
    return {
        "hit": hit,
        "t": jnp.where(hit, t_min, far),
        "prim": idx.astype(jnp.int32),
        "normal": nrm_w,
        "tangent": tg_w,
        "back_side": back_w,
    }


# ---------------------------------------------------------------------------
# Light sampling (Quad.cpp:172-223, Sphere.cpp sampleDirect)
# ---------------------------------------------------------------------------

def sample_direct(soa: PrimitiveSoA, li, p, u1, u2):
    """Sample a direction toward light prim `li` from point p.

    Returns (d, dist, pdf_solid_angle, valid).  Quad area sampling with
    solid-angle conversion (Quad.cpp:172-186); sphere cap sampling
    (Sphere.cpp sampleDirect)."""
    kind = tlookup(soa.kind, li)

    # quad
    q = tlookup(soa.p0, li) + u1 * tlookup(soa.e0, li) + u2 * tlookup(soa.e1, li)
    dq = q - p
    r_sq = jnp.maximum(dot(dq, dq), 1e-12)
    dist_q = jnp.sqrt(r_sq)
    dq = dq / dist_q
    cos_q = -dot(tlookup(soa.n, li), dq)
    pdf_q = r_sq / (jnp.maximum(cos_q, 1e-6) * jnp.maximum(tlookup(soa.area, li), 1e-12))
    valid_q = (dot(tlookup(soa.n, li), p - tlookup(soa.p0, li)) > 0.0) & (cos_q > 1e-6)

    # sphere: uniform cap.  For non-sphere lights this branch is masked out
    # but still computed — use a benign radius so its (co)tangents stay
    # finite (radius 0 drives the cap pdf singular).
    is_quad = (kind == PRIM_QUAD) | (kind == PRIM_DISK)
    L = tlookup(soa.p0, li) - p
    d2 = jnp.maximum(dot(L, L), 1e-12)
    dist_c = jnp.sqrt(d2)
    r_eff = jnp.where(is_quad, 0.5 * dist_c, tlookup(soa.radius, li))
    C = d2 - r_eff**2
    cos_theta_max = jnp.sqrt(jnp.maximum(C, 1e-12)) / dist_c
    Ln = L / dist_c
    phi = u1 * 2.0 * jnp.pi
    z = u2 * (1.0 - cos_theta_max) + cos_theta_max
    xy = jnp.sqrt(jnp.maximum(1.0 - z * z, 1e-12))
    local = jnp.stack([jnp.cos(phi) * xy, jnp.sin(phi) * xy, z])
    tg, bt = tangent_frame(Ln)
    ds = frame_to_world(tg, bt, Ln, local)
    B = dist_c * z
    det = jnp.sqrt(jnp.maximum(B * B - C, 1e-12))
    dist_s = B - det
    pdf_s = 1.0 / (2.0 * jnp.pi * jnp.maximum(1.0 - cos_theta_max, 1e-8))
    valid_s = C > 0.0

    d = jnp.where(is_quad, dq, ds)
    dist = jnp.where(is_quad, dist_q, dist_s)
    pdf = jnp.where(is_quad, pdf_q, pdf_s)
    valid = jnp.where(is_quad, valid_q, valid_s)

    # point light: Dirac direction, pdf = r^2 so weight = Le/r^2
    # (Point.cpp:98-115; callers must skip MIS — the light is unhittable)
    is_point = kind == PRIM_POINT
    d = jnp.where(is_point, Ln, d)
    dist = jnp.where(is_point, dist_c, dist)
    pdf = jnp.where(is_point, d2, pdf)
    valid = jnp.where(is_point, True, valid)

    # cylinder: area-sample the side surface and convert to solid angle
    # (Cylinder.cpp:185-201 — samplePosition + r^2/(cos*A)); consistent
    # with sample_position's side-only area pdf
    is_cyl = kind == PRIM_CYLINDER
    hh_cy = tlookup(soa.scale, li)[1]
    r_cy = tlookup(soa.radius, li)
    phi_cy = u2 * 2.0 * jnp.pi
    pcy_l = jnp.stack([r_cy * jnp.cos(phi_cy), (2.0 * u1 - 1.0) * hh_cy,
                       r_cy * jnp.sin(phi_cy)])
    ncy_l = jnp.stack([jnp.cos(phi_cy), 0.0 * phi_cy, jnp.sin(phi_cy)])
    pcy = tlookup(soa.p0, li) + jnp.einsum("ji,j->i", tlookup(soa.rot, li), pcy_l,
                                  precision="highest")
    ncy = jnp.einsum("ji,j->i", tlookup(soa.rot, li), ncy_l, precision="highest")
    area_cy = jnp.maximum(2.0 * jnp.pi * r_cy * 2.0 * hh_cy, 1e-12)
    dcy = pcy - p
    r2_cy = jnp.maximum(dot(dcy, dcy), 1e-12)
    dist_cy = jnp.sqrt(r2_cy)
    dcy = dcy / dist_cy
    cos_cy = -dot(ncy, dcy)
    d = jnp.where(is_cyl, dcy, d)
    dist = jnp.where(is_cyl, dist_cy, dist)
    pdf = jnp.where(is_cyl,
                    r2_cy / (jnp.maximum(cos_cy, 1e-6) * area_cy), pdf)
    valid = jnp.where(is_cyl, cos_cy > 1e-6, valid)

    if soa.mesh.has:
        dm, distm, pdfm, vm = sample_direct_mesh(
            soa.mesh, li, tlookup(soa.area, li), p, u1, u2)
        is_mesh = kind == PRIM_MESH
        d = jnp.where(is_mesh, dm, d)
        dist = jnp.where(is_mesh, distm, dist)
        pdf = jnp.where(is_mesh, pdfm, pdf)
        valid = jnp.where(is_mesh, vm, valid)
    return d, dist, pdf, valid


def sample_position(soa: PrimitiveSoA, li, u1, u2):
    """Sample a point on primitive `li`'s surface (Primitive::samplePosition:
    Quad.cpp:188-200, Sphere.cpp samplePosition, Disk samplePosition).

    Returns (p [3], n [3], pdf_area) — used by light-emitting integrators
    (light tracer / photon map / BDPT light subpaths)."""
    kind = tlookup(soa.kind, li)
    inv_area = 1.0 / jnp.maximum(tlookup(soa.area, li), 1e-12)

    # quad
    pq = tlookup(soa.p0, li) + u1 * tlookup(soa.e0, li) + u2 * tlookup(soa.e1, li)
    nq = tlookup(soa.n, li)

    # sphere: uniform over the full sphere
    z = 1.0 - 2.0 * u1
    r_xy = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u2
    ns = jnp.stack([r_xy * jnp.cos(phi), r_xy * jnp.sin(phi), z])
    ps = tlookup(soa.p0, li) + tlookup(soa.radius, li) * ns

    # disk: uniform over the disk in the (n) plane
    tg, bt = tangent_frame(tlookup(soa.n, li))
    rd_ = tlookup(soa.radius, li) * jnp.sqrt(jnp.maximum(u1, 0.0))
    pd = tlookup(soa.p0, li) + rd_ * (jnp.cos(phi) * tg + jnp.sin(phi) * bt)

    # cube: pick a face by area, uniform point on it (Cube::samplePosition)
    sc_ = jnp.maximum(tlookup(soa.scale, li), 1e-12)  # half extents, local
    fa = jnp.stack([sc_[1] * sc_[2], sc_[2] * sc_[0], sc_[0] * sc_[1]])
    fa = fa / jnp.sum(fa)
    cdf = jnp.cumsum(fa)
    u1r = jnp.mod(u1 * 6.0, 1.0)  # re-use u1: face-pair select + sign
    axis = jnp.minimum(jnp.sum((u1r > cdf).astype(jnp.int32)), 2)
    sign = jnp.where(jnp.mod(u1 * 6.0, 2.0) >= 1.0, 1.0, -1.0)
    a1 = (axis + 1) % 3
    a2 = (axis + 2) % 3
    pl = jnp.zeros(3).at[axis].set(sign * sc_[axis])
    pl = pl.at[a1].set((2.0 * jnp.mod(u1 * 36.0, 1.0) - 1.0) * sc_[a1])
    pl = pl.at[a2].set((2.0 * u2 - 1.0) * sc_[a2])
    nl = jnp.zeros(3).at[axis].set(sign)
    # rot is world->local; transpose back
    pc = tlookup(soa.p0, li) + jnp.einsum("ji,j->i", tlookup(soa.rot, li), pl,
                                 precision="highest")
    ncb = jnp.einsum("ji,j->i", tlookup(soa.rot, li), nl, precision="highest")

    # cylinder: uniform on the side surface (Cylinder.cpp:148-169 without
    # the cap branch; emission pdf uses the side area only)
    hh_cy = tlookup(soa.scale, li)[1]
    r_cy = tlookup(soa.radius, li)
    pcy_l = jnp.stack([r_cy * jnp.cos(phi), (2.0 * u1 - 1.0) * hh_cy,
                       r_cy * jnp.sin(phi)])
    ncy_l = jnp.stack([jnp.cos(phi), 0.0 * phi, jnp.sin(phi)])
    pcy = tlookup(soa.p0, li) + jnp.einsum("ji,j->i", tlookup(soa.rot, li), pcy_l,
                                  precision="highest")
    ncy = jnp.einsum("ji,j->i", tlookup(soa.rot, li), ncy_l, precision="highest")
    inv_area_cy = 1.0 / jnp.maximum(
        2.0 * jnp.pi * r_cy * 2.0 * hh_cy, 1e-12)

    is_sphere = kind == PRIM_SPHERE
    is_disk = kind == PRIM_DISK
    is_cube = kind == PRIM_CUBE
    is_cyl = kind == PRIM_CYLINDER
    is_point = kind == PRIM_POINT
    p = jnp.where(is_sphere, ps,
                  jnp.where(is_disk, pd, jnp.where(is_cube, pc, pq)))
    p = jnp.where(is_cyl, pcy, jnp.where(is_point, tlookup(soa.p0, li), p))
    n = jnp.where(is_sphere, ns, jnp.where(is_cube, ncb, nq))
    n = jnp.where(is_cyl, ncy,
                  jnp.where(is_point, jnp.asarray([0.0, 1.0, 0.0]), n))
    inv_area = jnp.where(is_cyl, inv_area_cy,
                         jnp.where(is_point, 1.0, inv_area))
    if soa.mesh.has:
        pm, nm, vm = sample_position_mesh(soa.mesh, li, u1, u2)
        is_mesh = kind == PRIM_MESH
        p = jnp.where(is_mesh, pm, p)
        n = jnp.where(is_mesh, nm, n)
    return p, n, inv_area


def direct_pdf(soa: PrimitiveSoA, li, p, w, t_hit, n_hit=None):
    """Solid-angle pdf of hitting light `li` from p along w at distance t_hit
    (Quad.cpp:216-223, Sphere.cpp directPdf, TriangleMesh.cpp:477-480).
    `n_hit` is the geometric normal at the hit (needed for mesh lights)."""
    kind = tlookup(soa.kind, li)
    cos_theta = jnp.abs(dot(tlookup(soa.n, li), w))
    pdf_q = t_hit * t_hit / (jnp.maximum(cos_theta, 1e-6)
                             * jnp.maximum(tlookup(soa.area, li), 1e-12))
    is_quad = (kind == PRIM_QUAD) | (kind == PRIM_DISK)
    L = tlookup(soa.p0, li) - p
    d2 = jnp.maximum(dot(L, L), 1e-12)
    r_eff = jnp.where(is_quad, 0.5 * jnp.sqrt(d2), tlookup(soa.radius, li))
    cos_theta_max = jnp.sqrt(jnp.maximum((d2 - r_eff**2) / d2, 1e-12))
    pdf_s = 1.0 / (2.0 * jnp.pi * jnp.maximum(1.0 - cos_theta_max, 1e-8))
    pdf = jnp.where(is_quad, pdf_q, pdf_s)
    if n_hit is not None:
        # cylinder (Cylinder.cpp:230-234): t^2 / (|cos(n_hit, w)| * A_side)
        a_cy = jnp.maximum(2.0 * jnp.pi * tlookup(soa.radius, li)
                           * 2.0 * tlookup(soa.scale, li)[1], 1e-12)
        pdf_cy = t_hit * t_hit / (jnp.maximum(jnp.abs(dot(n_hit, w)), 1e-6)
                                  * a_cy)
        pdf = jnp.where(kind == PRIM_CYLINDER, pdf_cy, pdf)
    if soa.mesh.has and n_hit is not None:
        pdf = jnp.where(kind == PRIM_MESH,
                        direct_pdf_mesh(tlookup(soa.area, li), n_hit, w, t_hit), pdf)
    return pdf


def invert_position(soa: PrimitiveSoA, li, p, ur1, ur2):
    """(u1, u2, ok): PSS slots with sample_position(li, u1, u2) == p
    (ReversibleJumpMLT light-root inversion; the reference's
    PathVertex::invertRootVertex emitter branch).  Supported: quad (solve
    the bilinear coords), sphere (z/phi of the unit offset), point
    (position is fixed; slots free).  Other kinds: ok=False — the RJ
    strategy jump is rejected."""
    kind = tlookup(soa.kind, li)
    d = p - tlookup(soa.p0, li)

    # quad: p = p0 + u1 e0 + u2 e1
    e0 = tlookup(soa.e0, li)
    e1 = tlookup(soa.e1, li)
    u1q = jnp.sum(d * e0) / jnp.maximum(jnp.sum(e0 * e0), 1e-12)
    u2q = jnp.sum(d * e1) / jnp.maximum(jnp.sum(e1 * e1), 1e-12)
    ok_q = ((u1q > -1e-4) & (u1q < 1.0 + 1e-4)
            & (u2q > -1e-4) & (u2q < 1.0 + 1e-4))

    # sphere: n = d / radius, z = 1 - 2 u1, phi = 2 pi u2
    r = jnp.maximum(tlookup(soa.radius, li), 1e-12)
    n = d / r
    u1s = jnp.clip((1.0 - n[2]) * 0.5, 0.0, 1.0)
    phi = jnp.mod(jnp.arctan2(n[1], n[0]), 2.0 * jnp.pi)
    u2s = phi / (2.0 * jnp.pi)
    ok_s = jnp.abs(jnp.sum(n * n) - 1.0) < 1e-2

    is_q = kind == PRIM_QUAD
    is_s = kind == PRIM_SPHERE
    is_p = kind == PRIM_POINT
    u1 = jnp.where(is_q, jnp.clip(u1q, 0.0, 1.0),
                   jnp.where(is_s, u1s, ur1))
    u2 = jnp.where(is_q, jnp.clip(u2q, 0.0, 1.0),
                   jnp.where(is_s, u2s, ur2))
    ok = jnp.where(is_q, ok_q, jnp.where(is_s, ok_s, is_p))
    return u1, u2, ok

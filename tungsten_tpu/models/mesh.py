"""Triangle meshes: SoA storage, host-built BVH, batched JAX traversal.

Replaces the reference's Embree-2 triangle BVH + TriangleMesh primitive
(src/core/primitives/TriangleMesh.cpp, renderer/TraceableScene.hpp:20-21)
with a TPU-native design:

- All meshes in the scene share ONE triangle SoA (static shapes).
- Small scenes (T <= BRUTE_MAX) intersect every triangle per ray — a scan
  over fixed-size chunks keeps memory bounded while the VPU stays full and
  control flow stays uniform (no divergence at all).
- Larger scenes use a flattened median-split BVH traversed with a
  lax.while_loop + fixed-size stack per ray (vmapped); leaves are padded to
  LEAF triangles so every leaf visit is a fixed-shape gather.
- Emissive meshes are area-sampled for NEE with a per-mesh triangle-area CDF
  (TriangleMesh.cpp:401-410 Distribution1D analog) and the standard
  area->solid-angle pdf (TriangleMesh.cpp:448-462, :477-480).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import static_field, struct
from ..utils.vecmath import dot, safe_normalize

_INF = np.float32(3.0e38)
LEAF = 4
BRUTE_MAX = 512
STACK = 64
_CHUNK = 128


@struct(meta=("use_bvh", "has"))
class MeshSoA:
    """All scene triangles, one SoA.  T triangles (padded to >=1)."""
    v0: jnp.ndarray        # [T,3]
    e1: jnp.ndarray        # [T,3] v1-v0
    e2: jnp.ndarray        # [T,3] v2-v0
    n0: jnp.ndarray        # [T,3] shading normals per corner
    n1: jnp.ndarray
    n2: jnp.ndarray
    t0: jnp.ndarray        # [T,3] strand/surface tangents per corner
    t1: jnp.ndarray        # (zero when the mesh has no preferred tangent;
    t2: jnp.ndarray        #  fiber BCSDF frames fall back to the Duff ONB)
    uv0: jnp.ndarray       # [T,2]
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    gn: jnp.ndarray        # [T,3] geometric normal (unit)
    prim: jnp.ndarray      # [T] owning PrimitiveSoA row
    tri_cdf: jnp.ndarray   # [T] per-mesh cumulative area in (0,1]
    # BVH (empty arrays when use_bvh=False)
    node_min: jnp.ndarray  # [N,3]
    node_max: jnp.ndarray  # [N,3]
    node_child: jnp.ndarray  # [N] >=0: right child (left=i+1); <0: leaf -(id+1)
    leaf_tris: jnp.ndarray   # [Nleaf, LEAF] tri ids, -1 = pad
    use_bvh: bool = static_field(default=False)
    has: bool = static_field(default=False)

    @property
    def count(self):
        return self.v0.shape[0]


def empty_mesh() -> MeshSoA:
    z3, z2 = jnp.zeros((1, 3), jnp.float32), jnp.zeros((1, 2), jnp.float32)
    return MeshSoA(v0=z3, e1=z3, e2=z3, n0=z3, n1=z3, n2=z3,
                   t0=z3, t1=z3, t2=z3,
                   uv0=z2, uv1=z2, uv2=z2, gn=z3,
                   prim=jnp.full((1,), -1, jnp.int32),
                   tri_cdf=jnp.ones((1,), jnp.float32),
                   node_min=z3, node_max=z3,
                   node_child=jnp.zeros((1,), jnp.int32),
                   leaf_tris=jnp.full((1, LEAF), -1, jnp.int32),
                   use_bvh=False, has=False)


# ---------------------------------------------------------------------------
# Host-side build
# ---------------------------------------------------------------------------

def _build_bvh(v0, e1, e2):
    """Median-split BVH over triangle centroids.  Returns flattened arrays
    (node_min, node_max, node_child, leaf_tris); triangles stay in place —
    leaves store (padded) index lists."""
    T = v0.shape[0]
    p1, p2 = v0 + e1, v0 + e2
    tmin = np.minimum(np.minimum(v0, p1), p2)
    tmax = np.maximum(np.maximum(v0, p1), p2)
    cent = (tmin + tmax) * 0.5

    node_min, node_max, node_child = [], [], []
    leaf_tris = []

    def emit(ids):
        me = len(node_min)
        node_min.append(tmin[ids].min(0))
        node_max.append(tmax[ids].max(0))
        node_child.append(0)  # patched below
        if len(ids) <= LEAF:
            pad = np.full(LEAF, -1, np.int64)
            pad[:len(ids)] = ids
            node_child[me] = -(len(leaf_tris) + 1)
            leaf_tris.append(pad)
            return me
        ext = cent[ids].max(0) - cent[ids].min(0)
        ax = int(np.argmax(ext))
        order = ids[np.argsort(cent[ids, ax], kind="stable")]
        half = len(order) // 2
        emit(order[:half])          # left child lands at me+1 (DFS preorder)
        rc = emit(order[half:])
        node_child[me] = rc
        return me

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        emit(np.arange(T))
    finally:
        sys.setrecursionlimit(old)
    return (np.asarray(node_min, np.float32),
            np.asarray(node_max, np.float32),
            np.asarray(node_child, np.int32),
            np.asarray(leaf_tris, np.int32))


def build_mesh_soa(meshes: list[dict]) -> MeshSoA:
    """meshes: list of dicts with pos/normal/uv/tris (numpy, world space
    already) + 'prim' (owning PrimitiveSoA row) + 'smooth' flag."""
    if not meshes:
        return empty_mesh()
    v0s, e1s, e2s, n0s, n1s, n2s = [], [], [], [], [], []
    uv0s, uv1s, uv2s, gns, prims, cdfs = [], [], [], [], [], []
    t0s, t1s, t2s = [], [], []
    for m in meshes:
        pos = np.asarray(m["pos"], np.float32)
        tris = np.asarray(m["tris"], np.int64)
        nrm = np.asarray(m.get("normal"), np.float32)
        uv = np.asarray(m.get("uv"), np.float32)
        a, b, c = pos[tris[:, 0]], pos[tris[:, 1]], pos[tris[:, 2]]
        e1, e2 = b - a, c - a
        gn = np.cross(e1, e2)
        area2 = np.linalg.norm(gn, axis=-1)
        gn = gn / np.maximum(area2, 1e-20)[:, None]
        if m.get("smooth", True) and np.any(
                np.linalg.norm(nrm, axis=-1) > 0):
            nn = nrm / np.maximum(
                np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
            n0, n1, n2 = nn[tris[:, 0]], nn[tris[:, 1]], nn[tris[:, 2]]
        else:
            n0 = n1 = n2 = gn
        tgv = m.get("tangent")
        if tgv is not None:
            tg = np.asarray(tgv, np.float32)
            t0s.append(tg[tris[:, 0]]); t1s.append(tg[tris[:, 1]])
            t2s.append(tg[tris[:, 2]])
        else:
            z = np.zeros_like(a)
            t0s.append(z); t1s.append(z); t2s.append(z)
        areas = 0.5 * area2
        cdf = np.cumsum(areas)
        cdf = cdf / max(cdf[-1], 1e-20)
        v0s.append(a); e1s.append(e1); e2s.append(e2)
        n0s.append(n0); n1s.append(n1); n2s.append(n2)
        uv0s.append(uv[tris[:, 0]]); uv1s.append(uv[tris[:, 1]])
        uv2s.append(uv[tris[:, 2]])
        gns.append(gn)
        prims.append(np.full(len(tris), m["prim"], np.int32))
        cdfs.append(cdf.astype(np.float32))

    v0 = np.concatenate(v0s)
    e1, e2 = np.concatenate(e1s), np.concatenate(e2s)
    T = v0.shape[0]
    use_bvh = T > BRUTE_MAX
    if use_bvh:
        nmin, nmax, nchild, ltris = _build_bvh(v0, e1, e2)
    else:
        nmin = nmax = np.zeros((1, 3), np.float32)
        nchild = np.zeros(1, np.int32)
        ltris = np.full((1, LEAF), -1, np.int32)

    pad = (-T) % _CHUNK if not use_bvh else 0

    def cat(xs, fill=0.0):
        x = np.concatenate(xs)
        if pad:
            x = np.concatenate(
                [x, np.full((pad,) + x.shape[1:], fill, x.dtype)])
        return jnp.asarray(x)

    return MeshSoA(
        v0=cat(v0s), e1=cat(e1s), e2=cat(e2s),
        n0=cat(n0s), n1=cat(n1s), n2=cat(n2s),
        t0=cat(t0s), t1=cat(t1s), t2=cat(t2s),
        uv0=cat(uv0s), uv1=cat(uv1s), uv2=cat(uv2s),
        gn=cat(gns), prim=cat(prims, fill=-1),
        tri_cdf=cat(cdfs, fill=2.0),
        node_min=jnp.asarray(nmin), node_max=jnp.asarray(nmax),
        node_child=jnp.asarray(nchild), leaf_tris=jnp.asarray(ltris),
        use_bvh=use_bvh, has=True)


# ---------------------------------------------------------------------------
# Intersection
# ---------------------------------------------------------------------------

def _tri_hit(v0, e1, e2, ro, rd, near):
    """Moeller-Trumbore over a [K]-batch of triangles vs one ray."""
    pv = jnp.cross(jnp.broadcast_to(rd, v0.shape), e2)
    det = dot(e1, pv)
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12,
                          jnp.where(det < 0, -1e-12, 1e-12), det)
    tv = ro[None, :] - v0
    u = dot(tv, pv) * inv
    qv = jnp.cross(tv, e1)
    v = dot(jnp.broadcast_to(rd, v0.shape), qv) * inv
    t = dot(e2, qv) * inv
    ok = ((jnp.abs(det) >= 1e-12) & (u >= 0.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t > near))
    return jnp.where(ok, t, _INF), u, v


def _brute_intersect(mesh: MeshSoA, ro, rd, near, far):
    T = mesh.count
    C = min(_CHUNK, T)
    nchunk = T // C

    def body(carry, sl):
        t, u, v, idx = carry
        cv0 = jax.lax.dynamic_slice_in_dim(mesh.v0, sl * C, C)
        ce1 = jax.lax.dynamic_slice_in_dim(mesh.e1, sl * C, C)
        ce2 = jax.lax.dynamic_slice_in_dim(mesh.e2, sl * C, C)
        tc, uc, vc = _tri_hit(cv0, ce1, ce2, ro, rd, near)
        j = jnp.argmin(tc)
        tj = tc[j]
        better = tj < t
        return (jnp.where(better, tj, t), jnp.where(better, uc[j], u),
                jnp.where(better, vc[j], v),
                jnp.where(better, sl * C + j, idx)), None

    init = (far, jnp.float32(0), jnp.float32(0), jnp.int32(-1))
    (t, u, v, idx), _ = jax.lax.scan(body, init,
                                     jnp.arange(nchunk, dtype=jnp.int32))
    return t, u, v, idx


def _bvh_intersect(mesh: MeshSoA, ro, rd, near, far):
    inv_d = 1.0 / jnp.where(jnp.abs(rd) < 1e-12,
                            jnp.where(rd < 0, -1e-12, 1e-12), rd)

    def slab(node):
        lo = (mesh.node_min[node] - ro) * inv_d
        hi = (mesh.node_max[node] - ro) * inv_d
        t0 = jnp.max(jnp.minimum(lo, hi))
        t1 = jnp.min(jnp.maximum(lo, hi))
        return t0, t1

    def cond(s):
        return s["sp"] > 0

    def body(s):
        sp = s["sp"] - 1
        node = s["stack"][sp]
        t0, t1 = slab(node)
        box_hit = (t1 >= jnp.maximum(t0, near)) & (t0 < s["t"])
        child = mesh.node_child[node]
        is_leaf = child < 0

        # leaf: fixed-shape LEAF-triangle test
        lid = jnp.maximum(-(child + 1), 0)
        tri_ids = mesh.leaf_tris[lid]
        safe_ids = jnp.maximum(tri_ids, 0)
        tc, uc, vc = _tri_hit(mesh.v0[safe_ids], mesh.e1[safe_ids],
                              mesh.e2[safe_ids], ro, rd, near)
        tc = jnp.where((tri_ids >= 0) & box_hit & is_leaf, tc, _INF)
        j = jnp.argmin(tc)
        better = tc[j] < s["t"]
        t = jnp.where(better, tc[j], s["t"])
        u = jnp.where(better, uc[j], s["u"])
        v = jnp.where(better, vc[j], s["v"])
        idx = jnp.where(better, safe_ids[j], s["idx"])

        # internal: push both children (left = node+1, right = child)
        push = box_hit & ~is_leaf
        stack = s["stack"]
        stack = jax.lax.dynamic_update_index_in_dim(
            stack, jnp.where(push, node + 1, stack[sp]), sp, 0)
        i2 = jnp.minimum(sp + 1, STACK - 1)
        stack = jax.lax.dynamic_update_index_in_dim(
            stack, jnp.where(push, child, stack[i2]), i2, 0)
        sp = jnp.where(push, jnp.minimum(sp + 2, STACK), sp)
        return dict(sp=sp, stack=stack, t=t, u=u, v=v, idx=idx)

    init = dict(sp=jnp.int32(1),
                stack=jnp.zeros(STACK, jnp.int32),
                t=far, u=jnp.float32(0), v=jnp.float32(0),
                idx=jnp.int32(-1))
    out = jax.lax.while_loop(cond, body, init)
    return out["t"], out["u"], out["v"], out["idx"]


def mesh_intersect(mesh: MeshSoA, ro, rd, near, far):
    """Closest triangle hit for ONE ray (vmap over rays).

    Returns dict(t, tri, prim, normal(shading), gnormal, uv, back_side);
    t = far and prim = -1 when missed."""
    if mesh.use_bvh:
        t, u, v, idx = _bvh_intersect(mesh, ro, rd, near, far)
    else:
        t, u, v, idx = _brute_intersect(mesh, ro, rd, near, far)
    hit = (idx >= 0) & (t < far)
    i = jnp.maximum(idx, 0)
    w = 1.0 - u - v
    sn = safe_normalize(w * mesh.n0[i] + u * mesh.n1[i] + v * mesh.n2[i])
    uvi = w * mesh.uv0[i] + u * mesh.uv1[i] + v * mesh.uv2[i]
    gn = mesh.gn[i]
    back = dot(gn[None, :], rd[None, :])[0] > 0.0
    # use the geometric orientation but the smooth direction: flip the
    # shading normal to the geometric side (Embree-side convention in
    # TraceableScene intersection filling)
    sn = jnp.where(dot(sn[None, :], gn[None, :])[0] < 0.0, -sn, sn)
    # interpolated preferred tangent (strand direction for fiber tubes);
    # left unnormalized-zero when the mesh carries none
    tg = w * mesh.t0[i] + u * mesh.t1[i] + v * mesh.t2[i]
    return dict(t=jnp.where(hit, t, far), tri=i,
                prim=jnp.where(hit, mesh.prim[i], -1),
                normal=sn, gnormal=gn, tangent=tg, uv=uvi, back_side=back,
                hit=hit)


# ---------------------------------------------------------------------------
# Emissive-mesh light sampling (TriangleMesh.cpp:415-480)
# ---------------------------------------------------------------------------

def sample_direct_mesh(mesh: MeshSoA, li, total_area, p, u1, u2):
    """Area-sample a point on the mesh owned by prim row `li`; returns
    (dir, dist, pdf_solid_angle, valid)."""
    mine = mesh.prim == li
    # first triangle of this mesh with cdf >= u1 (masked Distribution1D)
    ge = mine & (mesh.tri_cdf >= u1)
    T = mesh.count
    first = jnp.min(jnp.where(ge, jnp.arange(T), T))
    any_mine = first < T
    i = jnp.minimum(first, T - 1)
    cdf_i = mesh.tri_cdf[i]
    prev = jnp.where((i > 0) & (mesh.prim[jnp.maximum(i - 1, 0)] == li),
                     mesh.tri_cdf[jnp.maximum(i - 1, 0)], 0.0)
    ur = jnp.clip((u1 - prev) / jnp.maximum(cdf_i - prev, 1e-12), 0.0, 1.0)
    # uniform point in triangle (SampleWarp::uniformTriangle)
    su = jnp.sqrt(jnp.maximum(ur, 1e-12))
    b0 = 1.0 - su
    b1 = u2 * su
    q = mesh.v0[i] + b0 * mesh.e1[i] + b1 * mesh.e2[i]
    d = q - p
    r_sq = jnp.maximum(dot(d[None], d[None])[0], 1e-12)
    dist = jnp.sqrt(r_sq)
    d = d / dist
    cos_t = jnp.abs(dot(mesh.gn[i][None], d[None])[0])
    pdf = r_sq / (jnp.maximum(cos_t, 1e-6) * jnp.maximum(total_area, 1e-12))
    return d, dist, pdf, any_mine


def sample_position_mesh(mesh: MeshSoA, li, u1, u2):
    """Area-sample a point+normal on the mesh owned by prim row `li`
    (TriangleMesh::samplePosition; light-emitting integrators).
    Returns (p [3], n [3], valid)."""
    mine = mesh.prim == li
    ge = mine & (mesh.tri_cdf >= u1)
    T = mesh.count
    first = jnp.min(jnp.where(ge, jnp.arange(T), T))
    any_mine = first < T
    i = jnp.minimum(first, T - 1)
    cdf_i = mesh.tri_cdf[i]
    prev = jnp.where((i > 0) & (mesh.prim[jnp.maximum(i - 1, 0)] == li),
                     mesh.tri_cdf[jnp.maximum(i - 1, 0)], 0.0)
    ur = jnp.clip((u1 - prev) / jnp.maximum(cdf_i - prev, 1e-12), 0.0, 1.0)
    su = jnp.sqrt(jnp.maximum(ur, 1e-12))
    b0 = 1.0 - su
    b1 = u2 * su
    q = mesh.v0[i] + b0 * mesh.e1[i] + b1 * mesh.e2[i]
    return q, mesh.gn[i], any_mine


def direct_pdf_mesh(total_area, gn_hit, w, t_hit):
    """Solid-angle pdf of hitting an area-sampled mesh light
    (TriangleMesh.cpp:477-480)."""
    cos_t = jnp.abs(dot(gn_hit[None], w[None])[0])
    return t_hit * t_hit / (jnp.maximum(cos_t, 1e-6)
                            * jnp.maximum(total_area, 1e-12))

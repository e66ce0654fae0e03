"""Curve geometry IO: cemyuksel .hair loader + tube tessellation.

Re-design of src/core/io/CurveIO.cpp (loadHair, :120-210) and
primitives/Curves.cpp.  The reference intersects quadratic b-spline tubes
directly per ray (Curves.cpp's iterative spline root find — scalar, branchy,
pointer-chasing through a BVH).  TPU-native choice: tessellate strands to
watertight triangle tubes at LOAD time (numpy, host-side) and reuse the
batched triangle-mesh BVH for intersection — uniform control flow on
device, zero new kernel surface.  Fiber BCSDFs shade the tubes; the
azimuthal frame comes from the tube's smooth normals (parallel-transported
ring frames prevent twist).
"""
from __future__ import annotations

import struct

import numpy as np


def load_hair(path):
    """cemyuksel .hair format (CurveIO.cpp:120-210).

    Returns dict(curve_ends [C] int64 exclusive prefix ends,
    pos [N,3] float32, width [N] float32)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != b"HAIR":
        raise ValueError(f"{path}: missing HAIR magic")
    (n_strands, n_points, flags, d_segments) = struct.unpack_from(
        "<IIII", buf, 4)
    (d_thickness, _d_transparency) = struct.unpack_from("<ff", buf, 20)
    # default color 3f + 88-byte info fills the 128-byte header
    off = 128
    has_segments = flags & 1
    has_points = flags & 2
    has_thickness = flags & 4
    if not has_points:
        raise ValueError(f"{path}: no point data")
    if has_segments:
        segs = np.frombuffer(buf, np.uint16, n_strands, off).astype(np.int64)
        off += 2 * n_strands
    else:
        segs = np.full(n_strands, d_segments, np.int64)
    pos = np.frombuffer(buf, np.float32, n_points * 3, off).reshape(-1, 3)
    off += 12 * n_points
    if has_thickness:
        width = np.frombuffer(buf, np.float32, n_points, off).copy()
    else:
        width = np.full(n_points, d_thickness, np.float32)
    curve_ends = np.cumsum(segs + 1)
    if curve_ends[-1] != n_points:
        raise ValueError(f"{path}: segment/point count mismatch "
                         f"({curve_ends[-1]} vs {n_points})")
    return dict(curve_ends=curve_ends, pos=np.ascontiguousarray(pos),
                width=width)


def _transport_frames(tangents):
    """Parallel-transported ring frames along one strand ([S,3] tangents ->
    [S,3] normals, [S,3] binormals) — the standard rotation-minimizing
    frame, matching the twist-free tubes the reference's spline
    intersection implies."""
    S = tangents.shape[0]
    n = np.zeros((S, 3), np.float32)
    b = np.zeros((S, 3), np.float32)
    t0 = tangents[0]
    ref = np.array([0.0, 1.0, 0.0], np.float32)
    if abs(np.dot(t0, ref)) > 0.9:
        ref = np.array([1.0, 0.0, 0.0], np.float32)
    n[0] = np.cross(t0, ref)
    n[0] /= max(np.linalg.norm(n[0]), 1e-12)
    b[0] = np.cross(t0, n[0])
    for i in range(1, S):
        # rotate the previous normal by the minimal rotation t[i-1]->t[i]
        v = np.cross(tangents[i - 1], tangents[i])
        c = float(np.dot(tangents[i - 1], tangents[i]))
        if np.linalg.norm(v) < 1e-9 or c < -0.999:
            n[i] = n[i - 1]
        else:
            # Rodrigues with axis v (unnormalized, use quaternion-free form)
            k = 1.0 / (1.0 + c)
            nv = n[i - 1]
            n[i] = (nv * c + np.cross(v, nv)
                    + v * np.dot(v, nv) * k)
            n[i] -= tangents[i] * np.dot(n[i], tangents[i])
            n[i] /= max(np.linalg.norm(n[i]), 1e-12)
        b[i] = np.cross(tangents[i], n[i])
    return n, b


def curves_to_tube_mesh(pos, curve_ends, width, n_sides=4, taper=False,
                        width_scale=1.0):
    """Tessellate strand polylines into closed triangle tubes.

    Returns dict(pos [V,3], normal [V,3], tris [F,3]) with smooth ring
    normals (the tube analog of Curves.cpp's 'mode cylinder')."""
    verts, norms, tris, tans = [], [], [], []
    vbase = 0
    start = 0
    ring_phi = np.arange(n_sides) / n_sides * 2.0 * np.pi
    cosr, sinr = np.cos(ring_phi), np.sin(ring_phi)
    for end in curve_ends:
        p = pos[start:end]
        w = width[start:end].astype(np.float32) * width_scale
        S = p.shape[0]
        if S < 2:
            start = end
            continue
        tan = np.zeros((S, 3), np.float32)
        tan[:-1] = p[1:] - p[:-1]
        tan[-1] = tan[-2]
        tan[1:-1] = 0.5 * (tan[1:-1] + tan[:-2])
        tan /= np.maximum(np.linalg.norm(tan, axis=-1, keepdims=True),
                          1e-12)
        nrm, binrm = _transport_frames(tan)
        r = 0.5 * w
        if taper:
            r = r * (1.0 - np.arange(S) / max(S - 1, 1))
        # rings: [S, n_sides, 3]
        ring_n = (nrm[:, None, :] * cosr[None, :, None]
                  + binrm[:, None, :] * sinr[None, :, None])
        ring_v = p[:, None, :] + ring_n * r[:, None, None]
        verts.append(ring_v.reshape(-1, 3))
        norms.append(ring_n.reshape(-1, 3))
        tans.append(np.repeat(tan, n_sides, axis=0))
        idx = vbase + np.arange(S * n_sides).reshape(S, n_sides)
        a = idx[:-1]
        bb = np.roll(idx[:-1], -1, axis=1)
        c = idx[1:]
        d = np.roll(idx[1:], -1, axis=1)
        tris.append(np.stack([a, bb, c], -1).reshape(-1, 3))
        tris.append(np.stack([bb, d, c], -1).reshape(-1, 3))
        vbase += S * n_sides
        start = end
    if not verts:
        raise ValueError("no valid strands")
    pos_all = np.concatenate(verts).astype(np.float32)
    return dict(pos=pos_all,
                normal=np.concatenate(norms).astype(np.float32),
                tangent=np.concatenate(tans).astype(np.float32),
                tris=np.concatenate(tris).astype(np.int64),
                uv=np.zeros((pos_all.shape[0], 2), np.float32))

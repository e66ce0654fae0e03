"""Curves: .hair loader round-trip, tube tessellation geometry, and a
rendered strand with a fiber BCSDF (CurveIO.cpp, Curves.cpp semantics)."""
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tungsten_tpu.io.curveio import (curves_to_tube_mesh, load_hair)
from tungsten_tpu.models import primitives as pr
from tungsten_tpu.models.integrator import render_pass
from tungsten_tpu.scene.parse import scene_from_dict


def _write_hair(path, strands, width=0.02):
    """Minimal cemyuksel .hair writer for fixtures."""
    n_points = sum(len(s) for s in strands)
    segs = [len(s) - 1 for s in strands]
    flags = 1 | 2  # segments + points arrays
    hdr = b"HAIR" + struct.pack("<IIII", len(strands), n_points, flags, 0)
    hdr += struct.pack("<ff", width, 1.0)
    hdr += struct.pack("<fff", 1.0, 1.0, 1.0)
    hdr += b"\x00" * (128 - len(hdr))
    body = b"".join(struct.pack("<H", s) for s in segs)
    for s in strands:
        for p in s:
            body += struct.pack("<fff", *p)
    with open(path, "wb") as f:
        f.write(hdr + body)


@pytest.mark.smoke
def test_hair_loader_roundtrip(tmp_path):
    strands = [[(0, 0, 0), (0, 1, 0), (0.2, 2, 0)],
               [(1, 0, 0), (1, 1, 0.3)]]
    p = str(tmp_path / "t.hair")
    _write_hair(p, strands, width=0.05)
    d = load_hair(p)
    assert list(d["curve_ends"]) == [3, 5]
    assert d["pos"].shape == (5, 3)
    assert np.allclose(d["pos"][2], [0.2, 2, 0])
    assert np.allclose(d["width"], 0.05)


@pytest.mark.smoke
def test_tube_tessellation_radius():
    pos = np.array([[0, 0, 0], [0, 1, 0], [0, 2, 0]], np.float32)
    m = curves_to_tube_mesh(pos, np.array([3]), np.full(3, 0.2), n_sides=8)
    v = m["pos"]
    assert v.shape == (24, 3)
    r = np.sqrt(v[:, 0] ** 2 + v[:, 2] ** 2)
    assert np.allclose(r, 0.1, atol=1e-5)       # radius = width/2
    assert m["tris"].shape[0] == 2 * 2 * 8      # 2 segs x 8 sides x 2 tris
    # normals are radial (perpendicular to the straight fiber)
    assert np.allclose(np.abs(m["normal"][:, 1]), 0.0, atol=1e-5)


def test_curve_strand_renders_with_fiber_bsdf(tmp_path):
    strands = [[(x * 0.0, -0.5 + 0.25 * i, 0.0) for i in range(5)]
               for x in [0]]
    p = str(tmp_path / "s.hair")
    _write_hair(p, strands, width=0.3)
    doc = {
        "__dir__": str(tmp_path),
        "bsdfs": [{"name": "h", "type": "rough_wire", "roughness": 0.3,
                   "albedo": 1.0},
                  {"name": "l", "type": "null"}],
        "primitives": [
            {"type": "curves", "file": "s.hair", "bsdf": "h"},
            {"name": "light",
             "transform": {"position": [0, 2.2, 0], "scale": [3, 1, 3],
                           "rotation": [0, 0, -180]},
             "type": "quad", "bsdf": "l", "emission": [8, 8, 8]},
        ],
        "camera": {"type": "pinhole", "fov": 40, "resolution": [16, 16],
                   "transform": {"position": [0, 0.2, 2.2],
                                 "look_at": [0, 0.2, 0], "up": [0, 1, 0]}},
        "integrator": {"type": "path_tracer", "max_bounces": 2},
    }
    scene, _ = scene_from_dict(doc)
    # the tube is hittable where expected
    h = jax.vmap(lambda o, d: pr.intersect(scene.prims, o, d, 1e-4, 1e30))(
        jnp.asarray([[0.0, 0.2, 2.0]]), jnp.asarray([[0.0, 0.0, -1.0]]))
    assert bool(h["hit"][0])
    assert abs(float(h["t"][0]) - 1.85) < 1e-2  # radius 0.15 tube at z=0
    img = None
    f = jax.jit(render_pass)
    for s in range(4):
        a = f(scene, jnp.int32(s))
        img = a if img is None else img + a
    img = np.asarray(img) / 4
    assert np.isfinite(img).all()
    # the strand occludes the dark background -> some lit pixels in the
    # central column
    assert img[:, 7:9].mean() > 0.0
    assert img.mean() > 0.0

"""BDPT vs path tracer: both estimate the same integral on a diffuse box
(VERDICT r1 next-round #9; reference integrators/bidirectional_path_tracer).
"""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.models.bdpt import render_pass_bdpt
from tungsten_tpu.models.integrator import render_pass
from tungsten_tpu.scene.parse import scene_from_dict


# compile-heavy integrator suite: mid tier (default run stays <15 min)
pytestmark = pytest.mark.mid

_BOX = {
    "bsdfs": [
        {"name": "white", "albedo": 0.7, "type": "lambert"},
        {"name": "red", "albedo": [0.7, 0.1, 0.1], "type": "lambert"},
        {"name": "light", "albedo": 1.0, "type": "null"},
    ],
    "primitives": [
        {"name": "floor", "transform": {"scale": [2, 1, 2]},
         "type": "quad", "bsdf": "white"},
        {"name": "ceiling",
         "transform": {"position": [0, 2, 0], "scale": [2, 1, 2],
                       "rotation": [0, 0, -180]},
         "type": "quad", "bsdf": "white"},
        {"name": "back",
         "transform": {"position": [0, 1, -1], "scale": [2, 4, 2],
                       "rotation": [0, 90, 90]},
         "type": "quad", "bsdf": "red"},
        {"name": "light",
         "transform": {"position": [0, 1.98, 0], "scale": [0.6, 1, 0.6],
                       "rotation": [0, 0, -180]},
         "type": "quad", "bsdf": "light", "emission": [12, 10, 8]},
    ],
    "camera": {"type": "pinhole", "fov": 40, "resolution": [12, 12],
               "transform": {"position": [0, 1, 3.2], "look_at": [0, 1, 0],
                             "up": [0, 1, 0]}},
    "integrator": {"type": "path_tracer", "max_bounces": 4},
}


def test_bdpt_matches_path_tracer():
    scene, _ = scene_from_dict(_BOX)
    fpt = jax.jit(render_pass)
    fbd = jax.jit(render_pass_bdpt)
    pt = bd = None
    n = 20
    for s in range(n):
        a = fpt(scene, jnp.int32(s))
        b = fbd(scene, jnp.int32(s))
        pt = a if pt is None else pt + a
        bd = b if bd is None else bd + b
    pt = np.asarray(pt) / n
    bd = np.asarray(bd) / n
    assert np.isfinite(bd).all()
    assert bd.mean() > 0
    ratio = bd.mean() / max(pt.mean(), 1e-9)
    assert 0.8 < ratio < 1.25, (pt.mean(), bd.mean())
    # per-channel agreement too (the back wall is red)
    for c in range(3):
        rc = bd[..., c].mean() / max(pt[..., c].mean(), 1e-9)
        assert 0.75 < rc < 1.35, (c, pt[..., c].mean(), bd[..., c].mean())


_GLASS_MEDIA_BOX = {
    "media": [
        {"name": "fog", "type": "homogeneous", "sigma_a": [0.02, 0.02, 0.02],
         "sigma_s": [0.25, 0.25, 0.25],
         "phase_function": {"type": "isotropic"}},
    ],
    "bsdfs": [
        {"name": "white", "albedo": 0.7, "type": "lambert"},
        {"name": "glass", "albedo": 1.0, "type": "dielectric", "ior": 1.5},
        {"name": "light", "albedo": 1.0, "type": "null"},
    ],
    "primitives": [
        {"name": "floor", "transform": {"scale": [2, 1, 2]},
         "type": "quad", "bsdf": "white"},
        {"name": "ceiling",
         "transform": {"position": [0, 2, 0], "scale": [2, 1, 2],
                       "rotation": [0, 0, -180]},
         "type": "quad", "bsdf": "white"},
        {"name": "back",
         "transform": {"position": [0, 1, -1], "scale": [2, 4, 2],
                       "rotation": [90, 0, 0]},
         "type": "quad", "bsdf": "white"},
        {"name": "ball",
         "transform": {"position": [0.3, 0.5, 0.2], "scale": 0.35},
         "type": "sphere", "bsdf": "glass"},
        {"name": "fogbox",
         "transform": {"position": [-0.5, 0.45, -0.3], "scale": 0.8},
         "type": "cube", "bsdf": "light", "int_medium": "fog"},
        {"name": "light",
         "transform": {"position": [0, 1.98, 0], "scale": [0.6, 1, 0.6],
                       "rotation": [0, 0, -180]},
         "type": "quad", "bsdf": "light", "emission": [12, 10, 8]},
    ],
    "camera": {"type": "pinhole", "fov": 40, "resolution": [12, 12],
               "transform": {"position": [0, 1, 3.2], "look_at": [0, 1, 0],
                             "up": [0, 1, 0]}},
    "integrator": {"type": "path_tracer", "max_bounces": 5},
}


def test_bdpt_media_and_specular_matches_pt():
    """Glass sphere + homogeneous fog: BDPT (with media vertices, env/t=1
    machinery) must agree with the PT per 4x4 bucket within combined MC
    error (VERDICT r2 #7: specular interfaces are where naive PT and BDPT
    differ most, so MIS-weight bias shows here)."""
    scene, _ = scene_from_dict(_GLASS_MEDIA_BOX)
    fpt = jax.jit(render_pass)
    fbd = jax.jit(render_pass_bdpt)
    n = 48
    pts, bds = [], []
    for s in range(n):
        pts.append(np.asarray(fpt(scene, jnp.int32(s))))
        bds.append(np.asarray(fbd(scene, jnp.int32(s))))
    pts = np.stack(pts); bds = np.stack(bds)
    pt, bd = pts.mean(0), bds.mean(0)
    assert np.isfinite(bd).all()
    ratio = bd.mean() / max(pt.mean(), 1e-9)
    assert 0.85 < ratio < 1.18, (pt.mean(), bd.mean())
    # bucketed comparison with per-bucket stderr of both estimators
    def bk(x):
        return x.reshape(x.shape[0], 3, 4, 3, 4, 3).mean(axis=(2, 4))
    pb, bb = bk(pts), bk(bds)
    pm, bm = pb.mean(0), bb.mean(0)
    se = np.sqrt(pb.var(0) / n) + np.sqrt(bb.var(0) / n)
    bad = np.abs(pm - bm) > 4.0 * se + 0.02
    assert bad.mean() < 0.12, (bad.mean(), np.abs(pm - bm).max())

"""Light tracer vs path tracer: two estimators of the same transport
integral must agree in the mean (LightTracer.cpp; ADVICE r1 #2 — the
integrator was previously unwired and untested)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tungsten_tpu.models.integrator import render_pass
from tungsten_tpu.models.light_tracer import render_pass_lt, trace_light
from tungsten_tpu.scene.parse import scene_from_dict


# compile-heavy integrator suite: mid tier (default run stays <15 min)
pytestmark = pytest.mark.mid

_BOX = {
    "bsdfs": [
        {"name": "white", "albedo": 0.7, "type": "lambert"},
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
         "type": "quad", "bsdf": "white"},
        {"name": "light",
         "transform": {"position": [0, 1.98, 0], "scale": [0.7, 1, 0.7],
                       "rotation": [0, 0, -180]},
         "type": "quad", "bsdf": "light", "emission": [10, 10, 10]},
    ],
    "camera": {"type": "pinhole", "fov": 40, "resolution": [12, 12],
               "transform": {"position": [0, 1, 3.2], "look_at": [0, 1, 0],
                             "up": [0, 1, 0]}},
    "integrator": {"type": "path_tracer", "max_bounces": 4},
}


def test_light_tracer_converges_to_path_tracer():
    scene, rdoc = scene_from_dict(_BOX)
    assert rdoc["integrator_type"] == "path_tracer"

    fpt = jax.jit(render_pass)
    flt = jax.jit(render_pass_lt)
    pt = None
    lt = None
    n = 24
    for s in range(n):
        a = fpt(scene, jnp.int32(s))
        b = flt(scene, jnp.int32(s))
        pt = a if pt is None else pt + a
        lt = b if lt is None else lt + b
    pt = np.asarray(pt) / n
    lt = np.asarray(lt) / n
    assert np.isfinite(pt).all() and np.isfinite(lt).all()
    assert lt.mean() > 0, "light tracer produced a black image"
    # same integral, different estimators: agree in the image mean within
    # loose MC bounds
    ratio = lt.mean() / max(pt.mean(), 1e-9)
    assert 0.75 < ratio < 1.35, (pt.mean(), lt.mean())

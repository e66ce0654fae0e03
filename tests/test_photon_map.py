"""Photon map / PPM vs path tracer: density estimation must agree with the
unbiased estimator in the mean on a smooth diffuse scene
(PhotonTracer.cpp:398-417 gather math; PPM radius shrink per Hachisuka)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tungsten_tpu.models.integrator import render_pass
from tungsten_tpu.models.photon_map import (render_pass_pm, render_ppm,
                                            trace_photons)
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
    "camera": {"type": "pinhole", "fov": 40, "resolution": [16, 16],
               "transform": {"position": [0, 1, 3.2], "look_at": [0, 1, 0],
                             "up": [0, 1, 0]}},
    "integrator": {"type": "path_tracer", "max_bounces": 4},
}


@pytest.fixture(scope="module")
def box():
    scene, _ = scene_from_dict(_BOX)
    return scene


def _pt_mean(scene, n=16):
    f = jax.jit(render_pass)
    acc = None
    for s in range(n):
        a = f(scene, jnp.int32(s))
        acc = a if acc is None else acc + a
    return np.asarray(acc) / n


def test_photon_deposit_sane(box):
    ph = jax.jit(lambda s: trace_photons(box, 256, s))(jnp.int32(0))
    ph = {k: np.asarray(v) for k, v in ph.items()}
    assert ph["valid"].any(), "no photons deposited"
    v = ph["valid"]
    assert np.isfinite(ph["power"][v]).all()
    assert (ph["power"][v] >= 0).all()
    assert not ph["is_vol"][v].any()          # no media in this scene
    # deposits sit on scene surfaces (|y| in {0,2} planes or back wall)
    pos = ph["pos"][v]
    on_surf = (np.abs(pos[:, 1]) < 1e-3) | (np.abs(pos[:, 1] - 2) < 1e-3) \
        | (np.abs(pos[:, 2] + 1) < 1e-3)
    assert on_surf.mean() > 0.99


def test_photon_map_converges_to_path_tracer(box):
    pt = _pt_mean(box, 16)
    f = jax.jit(lambda s: render_pass_pm(box, s, n_photon_paths=2048,
                                         r_surf=0.12))
    acc = None
    n = 8
    for s in range(n):
        a = f(jnp.int32(s))
        acc = a if acc is None else acc + a
    pm = np.asarray(acc) / n
    assert np.isfinite(pm).all()
    assert pm.mean() > 0
    ratio = pm.mean() / max(pt.mean(), 1e-9)
    # density estimation is biased at finite radius — loose mean agreement
    assert 0.7 < ratio < 1.4, (pt.mean(), pm.mean())


def test_ppm_radius_shrinks_and_converges(box):
    pt = _pt_mean(box, 16)
    img = np.asarray(render_ppm(box, n_passes=6, n_photon_paths=2048,
                                r0=0.15))
    assert np.isfinite(img).all()
    ratio = img.mean() / max(pt.mean(), 1e-9)
    assert 0.65 < ratio < 1.45, (pt.mean(), img.mean())

"""Cylinder / point-light / instance primitives (Cylinder.cpp, Point.cpp,
Instance.cpp semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tungsten_tpu.models import primitives as pr
from tungsten_tpu.models.integrator import render_pass
from tungsten_tpu.scene.parse import scene_from_dict


def _cyl_soa(capped=True):
    tf = np.eye(4, dtype=np.float32)
    tf[0, 0] = tf[2, 2] = 0.5      # radius 0.5
    tf[1, 1] = 1.0                 # half height 1
    return pr.build_soa([{
        "kind": pr.PRIM_CYLINDER, "transform": tf, "bsdf": 0,
        "capped": capped,
    }])


@pytest.mark.smoke
def test_cylinder_intersect_side_and_caps():
    soa = _cyl_soa(capped=True)
    # side hit: ray along -x at y=0
    h = pr.intersect(soa, jnp.asarray([3.0, 0.0, 0.0]),
                     jnp.asarray([-1.0, 0.0, 0.0]), 1e-4, 1e30)
    assert bool(h["hit"])
    assert abs(float(h["t"]) - 2.5) < 1e-3
    assert np.allclose(np.asarray(h["normal"]), [1, 0, 0], atol=1e-3)
    # cap hit: ray along -y from above
    h2 = pr.intersect(soa, jnp.asarray([0.0, 3.0, 0.0]),
                      jnp.asarray([0.0, -1.0, 0.0]), 1e-4, 1e30)
    assert bool(h2["hit"])
    assert abs(float(h2["t"]) - 2.0) < 1e-3
    assert np.allclose(np.asarray(h2["normal"]), [0, 1, 0], atol=1e-3)
    # miss: offset beyond the radius
    h3 = pr.intersect(soa, jnp.asarray([3.0, 0.0, 0.8]),
                      jnp.asarray([-1.0, 0.0, 0.0]), 1e-4, 1e30)
    assert not bool(h3["hit"])


@pytest.mark.smoke
def test_cylinder_uncapped_passes_through_axis():
    soa = _cyl_soa(capped=False)
    h = pr.intersect(soa, jnp.asarray([0.0, 3.0, 0.0]),
                     jnp.asarray([0.0, -1.0, 0.0]), 1e-4, 1e30)
    assert not bool(h["hit"])  # straight down the open tube


def test_cylinder_sample_position_on_surface():
    soa = _cyl_soa()
    u = np.random.default_rng(0).random((256, 2)).astype(np.float32)
    p, n, inv_a = jax.vmap(
        lambda a, b: pr.sample_position(soa, jnp.int32(0), a, b))(
        u[:, 0], u[:, 1])
    p = np.asarray(p)
    r = np.sqrt(p[:, 0] ** 2 + p[:, 2] ** 2)
    assert np.allclose(r, 0.5, atol=1e-3)
    assert (np.abs(p[:, 1]) <= 1.0 + 1e-5).all()
    # side area = 2 pi r * 2h = 2pi
    assert np.allclose(np.asarray(inv_a), 1.0 / (2 * np.pi), rtol=1e-3)


def test_point_light_renders_inverse_square():
    """A point light above a floor: NEE radiance = albedo/pi * Le cos/r^2."""
    doc = {
        "bsdfs": [{"name": "w", "albedo": 1.0, "type": "lambert"}],
        "primitives": [
            {"name": "floor", "transform": {"scale": [4, 1, 4]},
             "type": "quad", "bsdf": "w"},
            {"name": "pl", "transform": {"position": [0, 2, 0]},
             "type": "point", "emission": [5, 5, 5]},
        ],
        "camera": {"type": "pinhole", "fov": 30, "resolution": [8, 8],
                   "transform": {"position": [0, 1.0, 2.5],
                                 "look_at": [0, 0, 0], "up": [0, 1, 0]}},
        "integrator": {"type": "path_tracer", "max_bounces": 2},
    }
    scene, _ = scene_from_dict(doc)
    f = jax.jit(render_pass)
    acc = None
    for s in range(8):
        a = f(scene, jnp.int32(s))
        acc = a if acc is None else acc + a
    img = np.asarray(acc) / 8
    assert np.isfinite(img).all()
    # center pixel looks at the origin: L = (1/pi) * 5 * cos(0)/4 = 0.398
    cy, cx = 4, 4
    c = img[cy, cx].mean()
    assert 0.2 < c < 0.7, c
    assert img.mean() > 0.05


def test_instances_expand():
    doc = {
        "bsdfs": [{"name": "w", "albedo": 0.5, "type": "lambert"}],
        "primitives": [
            {"type": "instances", "bsdf": "w",
             "master": {"type": "sphere",
                        "transform": {"scale": [0.5, 0.5, 0.5]}},
             "instances": [
                 {"transform": {"position": [-1, 0, 0]}},
                 {"transform": {"position": [1, 0, 0]}},
                 {"transform": {"position": [0, 0, 1]}},
             ]},
        ],
        "camera": {"type": "pinhole", "fov": 40, "resolution": [4, 4],
                   "transform": {"position": [0, 0, 4],
                                 "look_at": [0, 0, 0], "up": [0, 1, 0]}},
        "integrator": {"type": "path_tracer", "max_bounces": 1},
    }
    scene, _ = scene_from_dict(doc)
    kinds = np.asarray(scene.prims.kind)
    assert (kinds == pr.PRIM_SPHERE).sum() == 3
    centers = np.asarray(scene.prims.p0)[kinds == pr.PRIM_SPHERE]
    assert sorted(round(float(c[0])) for c in centers) == [-1, 0, 1]
    assert np.allclose(np.asarray(scene.prims.radius)[
        kinds == pr.PRIM_SPHERE], 0.5, atol=1e-5)

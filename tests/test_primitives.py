import jax
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.models import primitives as pr
from tungsten_tpu.scene.parse import parse_transform


def _tf(position=None, scale=None, rotation=None):
    d = {}
    if position is not None:
        d["position"] = position
    if scale is not None:
        d["scale"] = scale
    if rotation is not None:
        d["rotation"] = rotation
    return parse_transform(d)


def test_quad_intersect():
    soa = pr.build_soa([{"kind": pr.PRIM_QUAD, "transform": _tf(scale=[2, 1, 2])}])
    # floor quad at y=0 spanning [-1,1]^2 in xz
    hit = pr.intersect(soa, jnp.array([0.0, 1.0, 0.0]),
                       jnp.array([0.0, -1.0, 0.0]), 1e-4, 1e30)
    assert bool(hit["hit"])
    np.testing.assert_allclose(float(hit["t"]), 1.0, rtol=1e-5)
    miss = pr.intersect(soa, jnp.array([1.5, 1.0, 0.0]),
                        jnp.array([0.0, -1.0, 0.0]), 1e-4, 1e30)
    assert not bool(miss["hit"])


def test_sphere_intersect_inside_outside():
    soa = pr.build_soa([{"kind": pr.PRIM_SPHERE,
                         "transform": _tf(position=[0, 0, 0], scale=[1, 1, 1])}])
    out = pr.intersect(soa, jnp.array([0.0, 0.0, 3.0]),
                       jnp.array([0.0, 0.0, -1.0]), 1e-4, 1e30)
    assert bool(out["hit"]) and abs(float(out["t"]) - 2.0) < 1e-4
    assert not bool(out["back_side"])
    ins = pr.intersect(soa, jnp.array([0.0, 0.0, 0.0]),
                       jnp.array([0.0, 0.0, -1.0]), 1e-4, 1e30)
    assert bool(ins["hit"]) and abs(float(ins["t"]) - 1.0) < 1e-4
    assert bool(ins["back_side"])


def test_cube_intersect_and_normal():
    soa = pr.build_soa([{"kind": pr.PRIM_CUBE,
                         "transform": _tf(position=[0, 0, 0], scale=[2, 2, 2])}])
    h = pr.intersect(soa, jnp.array([0.0, 0.0, 5.0]),
                     jnp.array([0.0, 0.0, -1.0]), 1e-4, 1e30)
    assert bool(h["hit"]) and abs(float(h["t"]) - 4.0) < 1e-4
    np.testing.assert_allclose(np.asarray(h["normal"]), [0, 0, 1], atol=1e-5)
    ins = pr.intersect(soa, jnp.zeros(3), jnp.array([1.0, 0.0, 0.0]),
                       1e-4, 1e30)
    assert bool(ins["hit"]) and abs(float(ins["t"]) - 1.0) < 1e-4
    assert bool(ins["back_side"])


def test_closest_of_many():
    soa = pr.build_soa([
        {"kind": pr.PRIM_SPHERE, "transform": _tf(position=[0, 0, -5])},
        {"kind": pr.PRIM_SPHERE, "transform": _tf(position=[0, 0, -2])},
    ])
    h = pr.intersect(soa, jnp.zeros(3), jnp.array([0.0, 0.0, -1.0]),
                     1e-4, 1e30)
    assert int(h["prim"]) == 1


def test_quad_light_sampling_pdf_consistency():
    """sample_direct pdf matches direct_pdf at the sampled point."""
    soa = pr.build_soa([{
        "kind": pr.PRIM_QUAD,
        "transform": _tf(position=[0, 2, 0], scale=[1, 1, 1],
                         rotation=[0, 0, -180]),
        "emission": (5, 5, 5)}])
    p = jnp.array([0.2, 0.0, 0.1])
    d, dist, pdf, valid = pr.sample_direct(soa, 0, p, jnp.float32(0.3),
                                           jnp.float32(0.7))
    assert bool(valid)
    pdf2 = pr.direct_pdf(soa, 0, p, d, dist)
    np.testing.assert_allclose(float(pdf), float(pdf2), rtol=1e-4)


def test_sphere_solid_angle_sampling_integrates():
    """Uniform-cap pdf integrates to 1 over the cap (MC check)."""
    soa = pr.build_soa([{"kind": pr.PRIM_SPHERE,
                         "transform": _tf(position=[0, 5, 0])}])
    p = jnp.zeros(3)
    u = np.random.RandomState(0).rand(2000, 2).astype(np.float32)
    d, dist, pdf, valid = jax.vmap(
        lambda a, b: pr.sample_direct(soa, 0, p, a, b))(u[:, 0], u[:, 1])
    assert bool(jnp.all(valid))
    # all sampled directions actually hit the sphere
    hits = jax.vmap(lambda w: pr.intersect(soa, p, w, 1e-4, 1e30)["hit"])(d)
    assert float(jnp.mean(hits.astype(jnp.float32))) > 0.999

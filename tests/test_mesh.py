"""Triangle meshes: IO round-trip, BVH vs brute-force agreement, light
sampling, and integration into PrimitiveSoA.intersect."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.io import meshio
from tungsten_tpu.models import mesh as mm
from tungsten_tpu.models import primitives as pr


def _soup(T, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    e1 = rng.uniform(-0.2, 0.2, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-0.2, 0.2, (T, 3)).astype(np.float32)
    pos = np.concatenate([v0, v0 + e1, v0 + e2])
    tris = np.stack([np.arange(T), np.arange(T) + T, np.arange(T) + 2 * T],
                    -1).astype(np.int32)
    return dict(pos=pos, normal=np.zeros_like(pos),
                uv=np.zeros((3 * T, 2), np.float32),
                color=np.zeros_like(pos), tris=tris)


def test_wo3_roundtrip():
    m = _soup(17)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.wo3")
        meshio.save_wo3(p, m["pos"], m["tris"])
        r = meshio.load_wo3(p)
    np.testing.assert_allclose(r["pos"], m["pos"])
    np.testing.assert_array_equal(r["tris"], m["tris"])


def test_obj_load():
    obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2 4 3\n"
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.obj")
        with open(p, "w") as f:
            f.write(obj)
        r = meshio.load_obj(p)
    assert r["tris"].shape == (2, 3)
    assert r["pos"].shape[0] == 4
    # auto smooth normals point +z
    np.testing.assert_allclose(r["normal"][:, 2], 1.0, atol=1e-5)


def test_bvh_matches_brute():
    m = _soup(900, seed=3)  # > BRUTE_MAX -> BVH
    m["prim"] = 0
    m["smooth"] = False
    soa_bvh = mm.build_mesh_soa([m])
    assert soa_bvh.use_bvh
    soa_brute = mm.build_mesh_soa([dict(m)])
    object.__setattr__(soa_brute, "__dict__", soa_brute.__dict__)
    # force a brute-force twin by rebuilding below the threshold path
    import dataclasses
    soa_brute = dataclasses.replace(soa_bvh, use_bvh=False)
    # pad check: brute path slices in _CHUNK blocks; T=900 not multiple of
    # 128, so rebuild through the public path with monkeypatched threshold
    import tungsten_tpu.models.mesh as mesh_mod
    old = mesh_mod.BRUTE_MAX
    mesh_mod.BRUTE_MAX = 10**9
    try:
        soa_brute = mm.build_mesh_soa([dict(m)])
    finally:
        mesh_mod.BRUTE_MAX = old
    assert not soa_brute.use_bvh

    rng = np.random.default_rng(1)
    R = 64
    ro = rng.uniform(-2, 2, (R, 3)).astype(np.float32)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    far = jnp.full(R, 3.0e38, jnp.float32)

    f = jax.jit(lambda s, o, d, fa: jax.vmap(
        lambda oo, dd, ff: mm.mesh_intersect(s, oo, dd, 1e-4, ff))(o, d, fa))
    a = f(soa_bvh, ro, rd, far)
    b = f(soa_brute, ro, rd, far)
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               rtol=1e-5)
    hit = np.asarray(a["hit"])
    np.testing.assert_array_equal(np.asarray(a["tri"])[hit],
                                  np.asarray(b["tri"])[hit])


def test_mesh_in_prim_soa_intersect():
    sphere = meshio.make_sphere(radius=0.8, subdiv=8)
    prims = [
        {"kind": pr.PRIM_MESH, "mesh": sphere, "smooth": True,
         "transform": np.eye(4, dtype=np.float32), "bsdf": 0},
        {"kind": pr.PRIM_QUAD,
         "transform": np.array([[4, 0, 0, 0], [0, 1, 0, -2],
                                [0, 0, 4, 0], [0, 0, 0, 1]], np.float32),
         "bsdf": 0},
    ]
    soa = pr.build_soa(prims)
    assert soa.mesh.has

    ro = jnp.asarray([[0.0, 0.0, -3.0], [2.5, 0.0, -3.0]])
    rd = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    out = jax.vmap(lambda o, d: pr.intersect(soa, o, d, 1e-4, 3.0e38))(ro, rd)
    assert bool(out["hit"][0])
    assert int(out["prim"][0]) == 0
    # ray 1 misses the sphere entirely (and the quad: parallel)
    assert not bool(out["hit"][1])
    assert abs(float(out["t"][0]) - 2.2) < 0.05
    n = np.asarray(out["normal"][0])
    np.testing.assert_allclose(n, [0, 0, -1], atol=0.05)


def test_mesh_light_sampling_hits_mesh():
    quadm = _soup(1)
    # one big triangle light above origin
    quadm["pos"] = np.array([[-1, 2, -1], [1, 2, -1], [0, 2, 1]], np.float32)
    quadm["tris"] = np.array([[0, 1, 2]], np.int32)
    prims = [{"kind": pr.PRIM_MESH, "mesh": quadm, "smooth": False,
              "transform": np.eye(4, dtype=np.float32),
              "emission": (5.0, 5.0, 5.0), "bsdf": 0}]
    soa = pr.build_soa(prims)
    assert bool(np.asarray(soa.is_light)[0])

    p = jnp.zeros(3)
    rng = np.random.default_rng(0)
    ok = 0
    for _ in range(32):
        u1, u2 = rng.uniform(), rng.uniform()
        d, dist, pdf, valid = jax.jit(pr.sample_direct, static_argnums=())(
            soa, jnp.int32(0), p, jnp.float32(u1), jnp.float32(u2))
        assert bool(valid)
        assert float(pdf) > 0
        isect = pr.intersect(soa, p, d, 1e-4, 3.0e38)
        ok += int(bool(isect["hit"])
                  and abs(float(isect["t"]) - float(dist)) < 1e-2)
    assert ok >= 30

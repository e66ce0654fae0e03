"""Distributed semantics on the virtual 8-device CPU mesh (SURVEY.md §4):
sharded render equals single-device render bit-for-bit (seeds are keyed by
pixel id, never device id), and parameter gradients all-reduce
deterministically."""
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tungsten_tpu.models.camera import Camera
from tungsten_tpu.models.integrator import render_pass, trace
from tungsten_tpu.parallel.mesh import make_render_mesh, shard_render_pass
from tungsten_tpu.scene.parse import scene_from_dict


def small_scene(res=8):
    path = os.path.join(os.path.dirname(__file__), "..", "scenes",
                        "gpis-sphere-box.json")
    with open(path) as f:
        doc = json.load(f)
    doc["camera"]["resolution"] = [res, res]
    scene, _ = scene_from_dict(doc)
    return scene


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single_device():
    scene = small_scene(res=8)
    ref = np.asarray(jax.jit(render_pass)(scene, jnp.int32(0)))

    mesh = make_render_mesh()
    fn = shard_render_pass(scene, mesh)
    out = np.asarray(fn(jnp.int32(0)))
    np.testing.assert_array_equal(out, ref)


def test_gradient_allreduce_deterministic():
    """Same sharded gradient twice -> bit-identical (all-reduce determinism,
    SURVEY.md §4 distributed test)."""
    scene = small_scene(res=8)
    mesh = make_render_mesh()
    W = 8

    def loss_rows(sigma, rows):
        cov = dataclasses.replace(scene.media[0].gp.cov, sigma=sigma)
        gp = dataclasses.replace(scene.media[0].gp, cov=cov)
        med = dataclasses.replace(scene.media[0], gp=gp)
        s2 = dataclasses.replace(scene, media=(med,))
        px, py = jnp.meshgrid(jnp.arange(W, dtype=jnp.int32), rows)
        img = trace(s2, px.reshape(-1), py.reshape(-1), jnp.int32(0))
        return jnp.sum(img**2)

    def step(sigma, rows):
        g = jax.grad(loss_rows)(sigma, rows)
        return jax.lax.psum(g, "rays")

    sharded = shard_map(step, mesh=mesh, in_specs=(P(), P("rays")),
                        out_specs=P(), check_rep=False)
    rows = jnp.arange(8, dtype=jnp.int32)
    with mesh:
        g1 = jax.jit(sharded)(jnp.float32(0.06), rows)
        g2 = jax.jit(sharded)(jnp.float32(0.06), rows)
    assert np.isfinite(float(g1))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)

"""Device-mesh parallelism: pixels sharded over all chips, film psum-free.

The reference's only parallelism is shared-memory tiles over a thread pool
(src/core/thread/ThreadPool.hpp:48, tiles at PathTraceIntegrator.cpp:26-41).
The TPU-native equivalent: a 1-axis `rays` mesh; each device renders its
pixel shard (scene/GP parameters replicated — they are tiny), and the film
stays sharded until the host gathers it.  Multi-host runs initialize
jax.distributed and let the same mesh span hosts (DCN between hosts, ICI
within) — see SURVEY.md §2.4.

For inverse rendering, parameter gradients are all-reduced with jax.lax.psum
inside the same shard_map (tested in tests/test_parallel.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.integrator import Scene, trace


def make_render_mesh(devices=None, axis="rays"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(devices, (axis,))


def shard_render_pass(scene: Scene, mesh: Mesh, axis="rays"):
    """Returns a jitted fn(spp_idx) -> film [H,W,3], pixels sharded on rows.

    The row dimension is padded to a multiple of the mesh size by the caller's
    resolution choice; standard resolutions divide evenly.
    """
    H, W = scene.camera.res_y, scene.camera.res_x
    n = mesh.devices.size
    assert H % n == 0, f"image height {H} must divide over {n} devices"

    def pass_rows(spp_idx, rows):
        # rows: [H/n] row indices of this shard
        px, py = jnp.meshgrid(jnp.arange(W, dtype=jnp.int32), rows)
        c = trace(scene, px.reshape(-1), py.reshape(-1), spp_idx)
        return c.reshape(rows.shape[0], W, 3)

    from jax.experimental.shard_map import shard_map

    sharded = shard_map(
        pass_rows, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_rep=False)

    rows_all = jnp.arange(H, dtype=jnp.int32)

    @jax.jit
    def run(spp_idx):
        return sharded(spp_idx, rows_all)

    return run


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (scene/params) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "shape") else x, tree)

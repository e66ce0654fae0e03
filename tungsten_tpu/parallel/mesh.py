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


# ---------------------------------------------------------------------------
# Multi-host (SURVEY.md §2.4/§5: jax.distributed over DCN, host-0 scene
# broadcast, global-mesh film reduction)
# ---------------------------------------------------------------------------

def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Initialize jax.distributed for a multi-host run.

    No-op when the env describes a single process.  Reads the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID variables
    when args are None; returns (process_index, process_count)."""
    import os
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    process_id = process_id or os.environ.get("JAX_PROCESS_ID")
    if coordinator and num_processes and int(num_processes) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(num_processes),
            process_id=int(process_id or 0))
    return jax.process_index(), jax.process_count()


def broadcast_scene(scene: Scene):
    """Host-0 scene broadcast: every array leaf is replaced by host 0's
    value (the multi-host analog of the reference's single-process scene
    load; guards against rank-dependent file parsing).  Single-process:
    identity."""
    if jax.process_count() == 1:
        return scene
    from jax.experimental import multihost_utils
    leaves, treedef = jax.tree_util.tree_flatten(scene)
    arr = [leaf for leaf in leaves if hasattr(leaf, "shape")]
    synced = multihost_utils.broadcast_one_to_all(tuple(arr))
    it = iter(synced)
    # broadcast_one_to_all returns host numpy — rewrap as device arrays so
    # downstream tracers can index them
    out = [jnp.asarray(next(it)) if hasattr(leaf, "shape") else leaf
           for leaf in leaves]
    return jax.tree_util.tree_unflatten(treedef, out)


def make_global_mesh(axis="rays"):
    """One mesh over every device of every host (ICI within a host, DCN
    across hosts); pixels shard over the global axis."""
    return Mesh(jax.devices(), (axis,))


def film_allreduce_pass(scene: Scene, mesh: Mesh, axis="rays"):
    """Returns fn(spp_idx) -> fully-replicated film [H,W,3]: each device
    renders its row shard, then the film is all-gathered across the global
    mesh so every host holds the full frame (multi-host film reduction)."""
    run = shard_render_pass(scene, mesh, axis=axis)

    @jax.jit
    def gathered(spp_idx):
        film = run(spp_idx)
        return jax.lax.with_sharding_constraint(
            film, jax.sharding.NamedSharding(mesh, P()))

    return gathered

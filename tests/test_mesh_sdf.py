"""Mesh SDF bake: signed distance of an icosphere grid matches the analytic
sphere SDF; winding-number sign is negative inside."""
import numpy as np

from tungsten_tpu.io.meshio import make_sphere
from tungsten_tpu.ops.mesh_sdf import bake_mesh_sdf


def test_sphere_sdf_bake():
    m = make_sphere(radius=0.7, subdiv=12)
    grid, bmin, bmax = bake_mesh_sdf(m["pos"], m["tris"], res=24)
    res = grid.shape[0]
    xs = np.linspace(bmin[0], bmax[0], res)
    ys = np.linspace(bmin[1], bmax[1], res)
    zs = np.linspace(bmin[2], bmax[2], res)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    r = np.sqrt(gx**2 + gy**2 + gz**2)
    ana = r - 0.7
    # faceted sphere: tolerance covers the tessellation error
    err = np.abs(grid - ana)
    assert np.quantile(err, 0.95) < 0.03, np.quantile(err, 0.95)
    # sign correctness
    inside = r < 0.55
    outside = r > 0.85
    assert (grid[inside] < 0).all()
    assert (grid[outside] > 0).all()


def test_mesh_mean_via_parse():
    import json
    import os
    import tempfile

    import jax.numpy as jnp

    from tungsten_tpu.io.meshio import make_sphere, save_wo3
    from tungsten_tpu.scene.parse import parse_mean

    m = make_sphere(radius=0.5, subdiv=10)
    with tempfile.TemporaryDirectory() as d:
        save_wo3(os.path.join(d, "s.wo3"), m["pos"], m["tris"])
        mean = parse_mean({"type": "mesh", "file": "s.wo3",
                           "grid_res": 32}, base_dir=d)
    v_out = float(mean.mean(jnp.asarray([0.6, 0.0, 0.0])))
    v_in = float(mean.mean(jnp.asarray([0.0, 0.0, 0.0])))
    assert abs(v_out - 0.1) < 0.04, v_out
    assert v_in < -0.3, v_in
    g = np.asarray(mean.grad(jnp.asarray([0.4, 0.0, 0.0])))
    assert g[0] > 0.5  # gradient points outward along +x

"""Cameras: ray normalization for all kinds, filter warp distributions."""
import jax
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.models.camera import Camera, _filter_warp


def _norms(cam, n=64):
    px = jnp.arange(n, dtype=jnp.int32) % cam.res_x
    py = (jnp.arange(n, dtype=jnp.int32) * 7) % cam.res_y
    uf = jnp.full((n, 2), 0.3)
    ul = jnp.full((n, 2), 0.6)
    ro, rd = cam.sample_ray(px, py, uf, ul)
    return np.linalg.norm(np.asarray(rd), axis=-1)


def test_ray_norms_all_kinds():
    tf = np.eye(4, dtype=np.float32)
    for kind in ("pinhole", "thinlens", "equirectangular", "cubemap"):
        cam = Camera.create(transform=tf, res=(96, 48), kind=kind,
                            aperture=0.1, focus_dist=2.0)
        nrm = _norms(cam)
        np.testing.assert_allclose(nrm, 1.0, atol=2e-5, err_msg=kind)


def test_equirect_covers_sphere():
    cam = Camera.create(transform=np.eye(4, dtype=np.float32), res=(64, 32),
                        kind="equirectangular")
    px, py = jnp.meshgrid(jnp.arange(64, dtype=jnp.int32),
                          jnp.arange(32, dtype=jnp.int32))
    _, rd = cam.sample_ray(px.reshape(-1), py.reshape(-1),
                           jnp.full((64 * 32, 2), 0.5))
    d = np.asarray(rd)
    # directions span all octants
    for axis in range(3):
        assert d[:, axis].max() > 0.5 and d[:, axis].min() < -0.5


def test_filter_warps():
    u = jnp.linspace(0.001, 0.999, 4001)
    box = np.asarray(_filter_warp(u, "box"))
    assert abs(box.mean()) < 1e-3 and box.min() >= -0.5 and box.max() <= 0.5
    tent = np.asarray(_filter_warp(u, "tent"))
    assert abs(tent.mean()) < 1e-3
    assert tent.min() >= -1.0 and tent.max() <= 1.0
    # tent variance = 1/6
    assert abs((tent ** 2).mean() - 1 / 6) < 0.01
    gs = np.asarray(_filter_warp(u, "gaussian"))
    assert abs(gs.mean()) < 1e-3
    assert gs.min() >= -1.5 and gs.max() <= 1.5

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


def _rand_tf(seed):
    rng = np.random.default_rng(seed)
    # random rotation via QR + a translation
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.linalg.det(q))
    tf = np.eye(4, dtype=np.float32)
    tf[:3, :3] = q.astype(np.float32)
    tf[:3, 3] = rng.normal(size=3).astype(np.float32)
    return tf


def test_invert_ray_roundtrip_all_filters():
    """invert_ray must reproduce (px, py, u_filter) for every
    reconstruction filter (RJMLT camera-root inversion,
    PathVertex::invertRootVertex camera branch): sample -> invert ->
    re-sample gives the same direction."""
    n = 256
    rng = np.random.default_rng(3)
    for fk in ("box", "tent", "gaussian"):
        cam = Camera.create(transform=_rand_tf(7), res=(64, 48),
                            fov_deg=55.0, filter_kind=fk)
        px = jnp.asarray(rng.integers(0, 64, n), jnp.int32)
        py = jnp.asarray(rng.integers(0, 48, n), jnp.int32)
        uf = jnp.asarray(rng.uniform(0.02, 0.98, (n, 2)), jnp.float32)
        _, rd = cam.sample_ray(px, py, uf)
        px2, py2, uf2, ok = cam.invert_ray(rd)
        _, rd2 = cam.sample_ray(px2, py2, uf2)
        assert np.asarray(ok).all(), fk
        # the same-pixel preimage may differ from the original (px, u) when
        # a wide filter crossed a pixel boundary, but must emit the SAME ray
        np.testing.assert_allclose(np.asarray(rd2), np.asarray(rd),
                                   atol=3e-5, err_msg=fk)
        # and where no boundary was crossed, the exact slots come back
        same = np.asarray(px2) == np.asarray(px)
        assert same.mean() > (0.9 if fk == "box" else 0.4), fk
        np.testing.assert_allclose(np.asarray(uf2)[same, 0],
                                   np.asarray(uf)[same, 0], atol=2e-4)


def test_invert_ray_lens_roundtrip():
    """Thinlens inversion recovers (pixel, filter, lens) slots such that
    re-sampling reproduces both ray origin and direction
    (ThinlensCamera.cpp evalDirection)."""
    n = 256
    rng = np.random.default_rng(11)
    cam = Camera.create(transform=_rand_tf(5), res=(48, 48), fov_deg=50.0,
                        kind="thinlens", aperture=0.08, focus_dist=2.5,
                        filter_kind="tent")
    px = jnp.asarray(rng.integers(0, 48, n), jnp.int32)
    py = jnp.asarray(rng.integers(0, 48, n), jnp.int32)
    uf = jnp.asarray(rng.uniform(0.02, 0.98, (n, 2)), jnp.float32)
    ul = jnp.asarray(rng.uniform(0.01, 0.99, (n, 2)), jnp.float32)
    ro, rd = cam.sample_ray(px, py, uf, ul)
    px2, py2, uf2, ul2, ok = cam.invert_ray_lens(ro, rd)
    assert np.asarray(ok).all()
    ro2, rd2 = cam.sample_ray(px2, py2, uf2, ul2)
    np.testing.assert_allclose(np.asarray(ro2), np.asarray(ro), atol=3e-5)
    np.testing.assert_allclose(np.asarray(rd2), np.asarray(rd), atol=3e-4)
    # lens slots are uniquely determined (no preimage ambiguity there)
    np.testing.assert_allclose(np.asarray(ul2), np.asarray(ul), atol=2e-3)


def test_invert_ray_rejects_behind():
    cam = Camera.create(transform=np.eye(4, dtype=np.float32), res=(32, 32))
    _, _, _, ok = cam.invert_ray(jnp.asarray([[0.0, 0.0, -1.0],
                                              [5.0, 0.0, 1.0]]))
    assert not bool(np.asarray(ok)[0])   # behind the camera
    assert not bool(np.asarray(ok)[1])   # off-frame

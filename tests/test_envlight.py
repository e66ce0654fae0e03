"""Environment lights: sample/pdf consistency, integral correctness, and a
white-furnace render (constant env + diffuse sphere -> constant image)."""
import jax
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.models import envlight as ev


def test_map_env_sample_pdf_consistency():
    rng = np.random.default_rng(0)
    img = rng.uniform(0.1, 2.0, (16, 32, 3)).astype(np.float32)
    env = ev.make_env(ev.ENV_MAP, img=img)
    u1 = jnp.asarray(rng.uniform(size=512).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=512).astype(np.float32))
    d, pdf, ok = jax.vmap(lambda a, b: ev.env_sample(env, a, b))(u1, u2)
    pdf_q = jax.vmap(lambda w: ev.env_pdf(env, w))(d)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf_q), rtol=1e-3)
    assert bool(jnp.all(ok))
    nrm = np.linalg.norm(np.asarray(d), axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-5)


def test_map_env_importance_integral():
    rng = np.random.default_rng(1)
    img = rng.uniform(0.1, 2.0, (16, 32, 3)).astype(np.float32)
    env = ev.make_env(ev.ENV_MAP, img=img)
    n = 8192
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    d, pdf, _ = jax.vmap(lambda a, b: ev.env_sample(env, a, b))(u1, u2)
    L = jax.vmap(lambda w: ev.env_eval(env, w))(d)
    est = float(jnp.mean(L[:, 0] / pdf))
    H, W = img.shape[:2]
    theta = (np.arange(H) + 0.5) / H * np.pi
    dw = (np.pi / H) * (2 * np.pi / W) * np.sin(theta)
    direct = float((img[:, :, 0] * dw[:, None]).sum())
    assert abs(est - direct) / direct < 0.05


def test_const_env_uniform_sphere():
    env = ev.make_env(ev.ENV_CONST, emission=(2.0, 2.0, 2.0))
    d, pdf, ok = ev.env_sample(env, jnp.float32(0.3), jnp.float32(0.7))
    assert abs(float(pdf) - 1 / (4 * np.pi)) < 1e-6
    np.testing.assert_allclose(np.asarray(ev.env_eval(env, d)), 2.0)


def test_cap_env():
    env = ev.make_env(ev.ENV_CONST, emission=(1.0, 1.0, 1.0), cap_deg=30.0,
                      cap_dir=(0.0, 1.0, 0.0))
    # directions inside the cap evaluate to 1, outside 0
    up = jnp.asarray([0.0, 1.0, 0.0])
    side = jnp.asarray([1.0, 0.0, 0.0])
    assert float(ev.env_eval(env, up)[0]) == 1.0
    assert float(ev.env_eval(env, side)[0]) == 0.0
    # samples always land inside the cap
    rng = np.random.default_rng(2)
    u1 = jnp.asarray(rng.uniform(size=256).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=256).astype(np.float32))
    d, pdf, _ = jax.vmap(lambda a, b: ev.env_sample(env, a, b))(u1, u2)
    cosang = np.asarray(d[:, 1])
    assert (cosang >= np.cos(np.radians(30.0)) - 1e-5).all()


def test_skydome_bake():
    img = ev.bake_preetham_sky([0.3, 0.8, 0.2], turbidity=3.0)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    # sky brighter near the sun than opposite azimuth at same elevation
    env = ev.make_env(ev.ENV_MAP, img=img)
    sun = jnp.asarray([0.3, 0.8, 0.2]) / np.linalg.norm([0.3, 0.8, 0.2])
    near_sun = float(ev.env_eval(env, sun).sum())
    away = jnp.asarray([-sun[0], sun[1], -sun[2]])
    far_sun = float(ev.env_eval(env, away).sum())
    assert near_sun > far_sun


def test_white_furnace_render():
    """Diffuse albedo-1 sphere under a constant env must render to the env
    radiance (energy conservation through the whole transport loop)."""
    from tungsten_tpu.models import bsdfs as bs
    from tungsten_tpu.models import primitives as pr
    from tungsten_tpu.models.camera import Camera
    from tungsten_tpu.models.integrator import Scene, render_pass

    prims = [{"kind": pr.PRIM_SPHERE,
              "transform": np.diag([0.5, 0.5, 0.5, 1.0]).astype(np.float32),
              "bsdf": 0}]
    soa = pr.build_soa(prims)
    table = bs.build_table([{"kind": bs.LAMBERT, "albedo": (1.0, 1.0, 1.0)}])
    tf = np.eye(4, dtype=np.float32)
    tf[2, 3] = -2.5  # camera at z=-2.5 looking +z
    cam = Camera.create(transform=tf, fov_deg=40.0, res=(24, 24))
    env = ev.make_env(ev.ENV_CONST, emission=(0.7, 0.7, 0.7))
    scene = Scene(prims=soa, bsdfs=table, media=(), camera=cam,
                  lights=jnp.asarray(np.zeros(0, np.int32)),
                  scene_seed=jnp.uint32(7), env=env, max_bounces=16)
    img = np.zeros((24, 24, 3), np.float32)
    f = jax.jit(render_pass)
    n = 24
    for s in range(n):
        img += np.asarray(f(scene, jnp.int32(s)))
    img /= n
    # every pixel (sphere or background) must equal the env radiance
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img.mean(), 0.7, rtol=0.03)
    assert abs(img.max() - 0.7) < 0.12
    assert abs(img.min() - 0.7) < 0.12

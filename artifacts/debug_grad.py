"""Diagnose the r3 e2e gradient sign flip (VERDICT r3 weak #2).

Computes, on the 16x16 gpis-sphere-box scene:
  - AD image-sum gradient dl
  - central FD at several eps
  - per-pixel AD vs per-pixel FD on 'smooth' pixels (small second
    difference under +-eps), to separate continuous-part disagreement
    from discrete-event FD noise.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tungsten_tpu.models.integrator import trace
from tungsten_tpu.scene.parse import load_scene
from tungsten_tpu.models.camera import Camera


def _scene(res, max_bounces=2):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scenes", "gpis-sphere-box.json")
    scene, _ = load_scene(path)
    cam = Camera.create(transform=jax.device_get(scene.camera.transform),
                        fov_deg=35.0, res=(res, res))
    return dataclasses.replace(scene, camera=cam, max_bounces=max_bounces)


def _set_params(scene, sigma, l):
    cov = dataclasses.replace(scene.media[0].gp.cov, sigma=sigma, l=l)
    gp2 = dataclasses.replace(scene.media[0].gp, cov=cov)
    med2 = dataclasses.replace(scene.media[0], gp=gp2)
    return dataclasses.replace(scene, media=(med2,) + scene.media[1:])


res = 16
scene = _scene(res=res)
sigma0, l0 = scene.media[0].gp.cov.sigma, scene.media[0].gp.cov.l
px, py = jnp.meshgrid(jnp.arange(res, dtype=jnp.int32),
                      jnp.arange(res, dtype=jnp.int32))
px, py = px.reshape(-1), py.reshape(-1)


def img_fn(sigma, l):
    return trace(_set_params(scene, sigma, l), px, py, jnp.int32(0)).sum(-1)


jimg = jax.jit(img_fn)

# per-pixel AD gradient wrt l
gimg = jax.jit(jax.jacrev(lambda l: img_fn(sigma0, l)))(l0)
print("AD dl (image sum):", float(gimg.sum()), flush=True)

i0 = jimg(sigma0, l0)
for eps in (1e-3, 2e-3, 4e-3, 8e-3):
    ip = jimg(sigma0, l0 + eps)
    im = jimg(sigma0, l0 - eps)
    fd = (ip - im) / (2 * eps)
    sec = (ip + im - 2 * i0)
    smooth = jnp.abs(sec) < 0.25 * jnp.abs(ip - im) + 1e-5
    print(f"eps={eps}: FD sum={float(fd.sum()):+.2f} "
          f"smooth_n={int(smooth.sum())}/{res*res} "
          f"FD|smooth={float(jnp.where(smooth, fd, 0).sum()):+.2f} "
          f"AD|smooth={float(jnp.where(smooth, gimg, 0).sum()):+.2f}",
          flush=True)
    # top disagreeing pixels at this eps
    if eps == 2e-3:
        diff = jnp.where(smooth, jnp.abs(fd - gimg), 0.0)
        order = jnp.argsort(-diff)[:8]
        for k in order:
            k = int(k)
            print(f"  px=({k % res},{k // res}) AD={float(gimg[k]):+.3f} "
                  f"FD={float(fd[k]):+.3f} I0={float(i0[k]):.3f}")

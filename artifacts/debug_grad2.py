"""Check AD against the LOCAL slope of loss(l): fine sweep of l around l0,
per-pixel, at the pixels carrying the largest |AD|.  Between discrete
crossing-jumps the fixed-seed image is piecewise-smooth; AD (detached
sampling + IFT reattach) must match the within-piece slope."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tungsten_tpu.models.integrator import trace
from tungsten_tpu.scene.parse import load_scene
from tungsten_tpu.models.camera import Camera

res = 16
path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scenes", "gpis-sphere-box.json")
scene, _ = load_scene(path)
cam = Camera.create(transform=jax.device_get(scene.camera.transform),
                    fov_deg=35.0, res=(res, res))
scene = dataclasses.replace(scene, camera=cam, max_bounces=2)
sigma0, l0 = scene.media[0].gp.cov.sigma, scene.media[0].gp.cov.l
px, py = jnp.meshgrid(jnp.arange(res, dtype=jnp.int32),
                      jnp.arange(res, dtype=jnp.int32))
px, py = px.reshape(-1), py.reshape(-1)


def img_fn(l):
    cov = dataclasses.replace(scene.media[0].gp.cov, l=l)
    gp2 = dataclasses.replace(scene.media[0].gp, cov=cov)
    med2 = dataclasses.replace(scene.media[0], gp=gp2)
    sc2 = dataclasses.replace(scene, media=(med2,) + scene.media[1:])
    return trace(sc2, px, py, jnp.int32(0)).sum(-1)


jimg = jax.jit(img_fn)
gimg = jax.jit(jax.jacfwd(img_fn))(l0)   # forward mode: 1 input, cheap
print("AD dl (image sum):", float(gimg.sum()), flush=True)

order = np.argsort(-np.abs(np.asarray(gimg)))[:6]
print("top-|AD| pixels:", [(int(k % res), int(k // res),
                            float(gimg[k])) for k in order], flush=True)

eps_grid = np.linspace(-2e-3, 2e-3, 17)
vals = np.stack([np.asarray(jimg(l0 + e)) for e in eps_grid])  # [17, 256]
for k in order:
    k = int(k)
    v = vals[:, k]
    # local slope from the 5 central samples (piecewise-linear fit)
    c = slice(6, 11)
    slope = np.polyfit(eps_grid[c], v[c], 1)[0]
    print(f"px=({k % res:2d},{k // res:2d}) AD={float(gimg[k]):+9.3f} "
          f"local_slope={slope:+9.3f} "
          f"vals={np.array2string(v, precision=3, max_line_width=200)}",
          flush=True)
sum_slope = np.polyfit(eps_grid[6:11], vals[6:11].sum(1), 1)[0]
print("sum local slope:", sum_slope, " vs AD", float(gimg.sum()))

"""Print the primal image map + multi-pass (averaged spp) mask counts."""
import os
import sys

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")

import dataclasses
import jax.numpy as jnp
import numpy as np
from tungsten_tpu.models.integrator import trace
from tungsten_tpu.scene.parse import load_scene


def _set_params(scene, sigma, l):
    cov = dataclasses.replace(scene.media[0].gp.cov, sigma=sigma, l=l)
    gp2 = dataclasses.replace(scene.media[0].gp, cov=cov)
    med2 = dataclasses.replace(scene.media[0], gp=gp2)
    return dataclasses.replace(scene, media=(med2,) + scene.media[1:])


res = 24
eps = 4e-3
nspp = int(sys.argv[1]) if len(sys.argv) > 1 else 8
base, _ = load_scene("/root/repo/scenes/gpis-sphere-box.json",
                     res_override=(res, res))
sigma0 = base.media[0].gp.cov.sigma
l0 = base.media[0].gp.cov.l

px, py = jnp.meshgrid(jnp.arange(res, dtype=jnp.int32),
                      jnp.arange(res, dtype=jnp.int32))
px, py = px.reshape(-1), py.reshape(-1)


def img(sigma, l):
    sc = _set_params(base, sigma, l)

    def body(i, a):
        return a + trace(sc, px, py, jnp.int32(i)).sum(-1)
    return jax.lax.fori_loop(0, nspp, body,
                             jnp.zeros(res * res)) / nspp


jimg = jax.jit(img)
i0 = np.asarray(jimg(sigma0, l0))
print(f"nspp={nspp}  i0: min {i0.min():.4g} max {i0.max():.4g} "
      f"mean {i0.mean():.4g}, n>0.01: {(i0>0.01).sum()}")
m = i0.reshape(res, res)
lv = " .:-=+*#@"
mx = max(i0.max(), 1e-9)
for r in range(res):
    print("   ", "".join(lv[min(8, int(8 * (m[r, c] / mx) ** 0.4))]
                         for c in range(res)))

for pname, (ds, dl) in (("sigma", (eps, 0.0)), ("l", (0.0, eps))):
    ip = np.asarray(jimg(sigma0 + ds, l0 + dl))
    im = np.asarray(jimg(sigma0 - ds, l0 - dl))
    lin = np.abs(ip + im - 2.0 * i0)
    d1 = np.abs(ip - im)
    mask = (lin < 0.25 * d1 + 1e-4) & (d1 > 1e-6)
    print(f"{pname}: mask={mask.sum()} (need >= {res}), "
          f"nonzero-d1={(d1 > 1e-6).sum()}")

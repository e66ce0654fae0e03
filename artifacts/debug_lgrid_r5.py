"""Is the masked-pixel FD for l a clean derivative?  Sweep eps at fixed mask."""
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


nspp = 16
res = 24
base, _ = load_scene("/root/repo/scenes/gpis-sphere-box.json",
                     res_override=(res, res))
med_iso = dataclasses.replace(base.media[0], phase_kind="isotropic",
                              phase_bsdf=-1)
base = dataclasses.replace(base, media=(med_iso,) + base.media[1:])
sigma0 = base.media[0].gp.cov.sigma
l0 = base.media[0].gp.cov.l

px, py = jnp.meshgrid(jnp.arange(res, dtype=jnp.int32),
                      jnp.arange(res, dtype=jnp.int32))
px, py = px.reshape(-1), py.reshape(-1)


def img(sigma, l):
    sc = _set_params(base, sigma, l)

    def body(i, a):
        return a + trace(sc, px, py, jnp.int32(i)).sum(-1)
    return jax.lax.fori_loop(0, nspp, body, jnp.zeros(res * res)) / nspp


jimg = jax.jit(img)
i0 = jimg(sigma0, l0)
# mask from the canonical eps
eps0 = 1e-3
ip0 = jimg(sigma0, l0 + eps0)
im0 = jimg(sigma0, l0 - eps0)
lin = jnp.abs(ip0 + im0 - 2.0 * i0)
d1 = jnp.abs(ip0 - im0)
m = (lin < 0.35 * d1 + 1e-4) & (d1 > 1e-6)
print("mask", int(m.sum()))


def msum(l):
    return float(jnp.sum(jnp.where(m, jimg(sigma0, l), 0.0)))


import numpy as _np
offs = _np.linspace(-2e-3, 2e-3, 21)
vals = []
for e in offs:
    v = msum(l0 + float(e))
    vals.append(v)
    print(f"l0{e:+.5f}: {v:.5f}", flush=True)
vals = _np.array(vals)
sl = _np.polyfit(offs, vals, 1)[0]
print("least-squares slope over +-2e-3:", sl)
sl2 = _np.polyfit(offs[5:16], vals[5:16], 1)[0]
print("least-squares slope over +-1e-3:", sl2)

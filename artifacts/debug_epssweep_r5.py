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


s0 = msum(l0)
for eps in (1e-4, 2e-4, 5e-4, 1e-3, 2e-3):
    fd = (msum(l0 + eps) - msum(l0 - eps)) / (2 * eps)
    fwd = (msum(l0 + eps) - s0) / eps
    bwd = (s0 - msum(l0 - eps)) / eps
    print(f"eps={eps:g}: central={fd:+.2f} fwd={fwd:+.2f} bwd={bwd:+.2f}",
          flush=True)

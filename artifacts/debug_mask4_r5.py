"""Sweep nspp x eps x linearity-threshold for the event-stable mask."""
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


name = sys.argv[1] if len(sys.argv) > 1 else "gpis-sphere-box"
nspp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
res = 24
base, _ = load_scene(f"/root/repo/scenes/{name}.json",
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
    return jax.lax.fori_loop(0, nspp, body, jnp.zeros(res * res)) / nspp


jimg = jax.jit(img)
i0 = np.asarray(jimg(sigma0, l0))
for pname, mk in (("sigma", lambda e: (e, 0.0)), ("l", lambda e: (0.0, e))):
    for eps in (1e-3, 2e-3, 4e-3):
        ds, dl = mk(eps)
        ip = np.asarray(jimg(sigma0 + ds, l0 + dl))
        im = np.asarray(jimg(sigma0 - ds, l0 - dl))
        lin = np.abs(ip + im - 2.0 * i0)
        d1 = np.abs(ip - im)
        for thr in (0.25, 0.35, 0.5):
            mask = (lin < thr * d1 + 1e-4) & (d1 > 1e-6)
            print(f"{name} nspp={nspp} {pname} eps={eps:g} thr={thr}: "
                  f"mask={mask.sum()}", flush=True)

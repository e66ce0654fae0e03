"""End-to-end hyperparameter gradient check vs central finite differences.

Usage: [JAX_PLATFORMS=cpu] python gradcheck.py [res...]
"""
import sys

sys.path.insert(0, "/root/repo")
import dataclasses

import jax
import jax.numpy as jnp

from __graft_entry__ import _small_scene
from tungsten_tpu.models.integrator import trace


def set_params(scene, sigma, l):
    cov = dataclasses.replace(scene.media[0].gp.cov, sigma=sigma, l=l)
    gp2 = dataclasses.replace(scene.media[0].gp, cov=cov)
    med2 = dataclasses.replace(scene.media[0], gp=gp2)
    return dataclasses.replace(scene, media=(med2,) + scene.media[1:])


def main(resolutions):
    for res in resolutions:
        scene = _small_scene(res=res, max_bounces=2)
        sigma0, l0 = scene.media[0].gp.cov.sigma, scene.media[0].gp.cov.l
        px, py = jnp.meshgrid(jnp.arange(res, dtype=jnp.int32),
                              jnp.arange(res, dtype=jnp.int32))
        px, py = px.reshape(-1), py.reshape(-1)

        def loss(sigma, l, scene=scene, px=px, py=py):
            img = trace(set_params(scene, sigma, l), px, py, jnp.int32(0))
            return jnp.sum(img)

        v, g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(sigma0, l0)
        f = jax.jit(loss)
        eps = 2e-3
        fd = ((float(f(sigma0 + eps, l0)) - float(f(sigma0 - eps, l0)))
              / (2 * eps),
              (float(f(sigma0, l0 + eps)) - float(f(sigma0, l0 - eps)))
              / (2 * eps))
        print(f"res={res} loss={float(v):.4f} "
              f"ad=({float(g[0]):.3f}, {float(g[1]):.3f}) "
              f"fd=({fd[0]:.3f}, {fd[1]:.3f})", flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [16, 24])

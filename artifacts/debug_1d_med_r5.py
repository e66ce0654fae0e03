"""Medium-level AD-vs-FD for the mirror-1d medium: is sample_distance's t
gradient wrt sigma/l correct for the 1D scheme?"""
import os
import sys

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")

import dataclasses
import jax.numpy as jnp
from tungsten_tpu.models import media as md
from tungsten_tpu.scene.parse import load_scene


def _set(scene, sigma, l):
    cov = dataclasses.replace(scene.media[0].gp.cov, sigma=sigma, l=l)
    gp2 = dataclasses.replace(scene.media[0].gp, cov=cov)
    med2 = dataclasses.replace(scene.media[0], gp=gp2)
    return dataclasses.replace(scene, media=(med2,) + scene.media[1:])


scene, _ = load_scene("/root/repo/scenes/gpis-mirror-1d.json")
med = scene.media[0]
print("one_d:", med.cfg.one_d, "cond:", med.cfg.activate_conditioning)
R = 48
ths = jnp.linspace(-0.15, 0.15, R)
ro = jnp.tile(jnp.array([[0.0, 0.9, 3.0]]), (R, 1))
rd = jnp.stack([jnp.sin(ths), jnp.zeros(R) - 0.01, -jnp.cos(ths)], axis=-1)
rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
state = md.MediumState.make(R)
pss = jnp.stack([jnp.arange(R, dtype=jnp.uint32), jnp.zeros(R, jnp.uint32),
                 jnp.zeros(R, jnp.uint32), jnp.zeros(R, jnp.uint32)],
                axis=-1)
uj = jnp.full(R, 0.5)
act = jnp.ones(R, bool)
near, far = jnp.full(R, 1.2), jnp.full(R, 4.5)
sigma0, l0 = med.gp.cov.sigma, med.gp.cov.l


def hits(sigma, l):
    res, _ = md.sample_distance(_set(scene, sigma, l).media[0],
                                scene.scene_seed, ro, rd, near, far, state,
                                pss, uj, act)
    return ~res["exited"]


eps = 2e-3
stable = hits(sigma0, l0)
for ds, dl in [(eps, 0), (-eps, 0), (0, eps), (0, -eps)]:
    stable = stable & hits(sigma0 + ds, l0 + dl)
print("stable lanes:", int(stable.sum()))


def loss(sigma, l):
    res, _ = md.sample_distance(_set(scene, sigma, l).media[0],
                                scene.scene_seed, ro, rd, near, far, state,
                                pss, uj, act)
    return jnp.sum(jnp.where(stable, res["t"], 0.0))


g = jax.jit(jax.grad(loss, argnums=(0, 1)))(sigma0, l0)
f = jax.jit(loss)
for name, idx, (ds, dl) in (("sigma", 0, (eps, 0.0)), ("l", 1, (0.0, eps))):
    fd = (f(sigma0 + ds, l0 + dl) - f(sigma0 - ds, l0 - dl)) / (2 * eps)
    ad = float(g[idx])
    rel = abs(ad - float(fd)) / max(abs(float(fd)), 1e-9)
    print(f"{name}: AD={ad:+.4f} FD={float(fd):+.4f} rel={rel:.3f} "
          f"{'PASS' if rel < 0.15 else 'FAIL'}")

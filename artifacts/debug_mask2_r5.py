"""Deeper diagnosis: which pixels respond to the sigma/l shift, and at what
magnitude?  Prints i0 stats, d1 histogram, and a response map."""
import os
import sys
import time

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
base, _ = load_scene("/root/repo/scenes/gpis-sphere-box.json",
                     res_override=(res, res))
sigma0 = base.media[0].gp.cov.sigma
l0 = base.media[0].gp.cov.l
print("sigma0", sigma0, "l0", l0)

px, py = jnp.meshgrid(jnp.arange(res, dtype=jnp.int32),
                      jnp.arange(res, dtype=jnp.int32))
px, py = px.reshape(-1), py.reshape(-1)


def img(sigma, l):
    return trace(_set_params(base, sigma, l), px, py, jnp.int32(0)).sum(-1)


jimg = jax.jit(img)
i0 = np.asarray(jimg(sigma0, l0))
print("i0: min %.4g max %.4g mean %.4g, n>0.01: %d" % (
    i0.min(), i0.max(), i0.mean(), (i0 > 0.01).sum()))

for pname, (ds, dl) in (("sigma", (eps, 0.0)), ("l", (0.0, eps))):
    ip = np.asarray(jimg(sigma0 + ds, l0 + dl))
    im = np.asarray(jimg(sigma0 - ds, l0 - dl))
    d1 = np.abs(ip - im)
    print(f"\n{pname}: d1 quantiles",
          np.round(np.quantile(d1, [0.5, 0.9, 0.99, 1.0]), 8))
    for thr in (1e-8, 1e-7, 1e-6, 1e-5, 1e-4, 1e-3):
        print(f"  d1>{thr:.0e}: {(d1 > thr).sum()}")
    # response map at 1e-7
    m = (d1 > 1e-7).reshape(res, res)
    print("  map(d1>1e-7):")
    for r in range(res):
        print("   ", "".join("#" if m[r, c] else "." for c in range(res)))

# also: AD per-pixel gradient magnitudes for comparison
gimg = np.asarray(jax.jit(jax.jacfwd(lambda l: img(sigma0, l)))(l0))
print("\nAD dl per-pixel: quantiles",
      np.round(np.quantile(np.abs(gimg), [0.5, 0.9, 0.99, 1.0]), 6))
print("AD |g|>1e-3 count:", (np.abs(gimg) > 1e-3).sum())
m = (np.abs(gimg) > 1e-3).reshape(res, res)
print("map(|AD dl|>1e-3):")
for r in range(res):
    print("   ", "".join("#" if m[r, c] else "." for c in range(res)))

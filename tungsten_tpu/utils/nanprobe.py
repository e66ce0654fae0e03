"""Debug-only identity op that reports non-finite cotangents in backward.

Enable with TUNGSTEN_TPU_NANPROBE=1 (uses jax.debug.print — CPU backend
only; the axon TPU plugin has no host-callback support)."""
import os

import jax
import jax.numpy as jnp

_ON = bool(os.environ.get("TUNGSTEN_TPU_NANPROBE"))


def nanprobe(x, name):
    if not _ON:
        return x

    @jax.custom_vjp
    def probe(v):
        return v

    def fwd(v):
        jax.debug.print(name + " fwd nonfinite={n}",
                        n=jnp.sum(~jnp.isfinite(v)))
        return v, None

    def bwd(_, g):
        jax.debug.print(name + " bwd nonfinite={n}",
                        n=jnp.sum(~jnp.isfinite(g)))
        return (g,)

    probe.defvjp(fwd, bwd)
    return probe(x)

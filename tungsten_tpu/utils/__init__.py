from . import pytree, rng, vecmath  # noqa: F401

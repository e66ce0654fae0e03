"""tungsten_tpu — a TPU-native differentiable renderer for Gaussian-process
implicit surfaces via sparse convolution noise.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
sparse-conv-gpis-tungsten reference (SIGGRAPH Asia 2025, "Practical Gaussian
Process Implicit Surfaces with Sparse Convolutions"):

- `ops/`      GP kernel layer: mean functions, covariance/splat kernels,
              the sparse-convolution noise evaluator (pure-JAX + Pallas),
              weight-space (RFF) and function-space (batched Cholesky) GPs.
- `models/`   transport layer: media, BSDFs, phase functions, primitives,
              cameras, and the wavefront path tracer.
- `scene/`    Tungsten-compatible JSON scene parsing into pytrees.
- `parallel/` device-mesh sharding (shard_map over pixels, psum film).
- `utils/`    counter-based RNG, vector math, pytree dataclasses.

Everything is functional and jit-compiled end-to-end; randomness is
procedural/seekable (hash-keyed), mirroring the reference's re-seedable PCG
(src/core/sampling/UniformSampler.hpp:41-48) with TPU-friendly counter-based
hashing instead of sequential state.
"""

__version__ = "0.1.0"

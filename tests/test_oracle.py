"""Cross-language oracle: the C++ scalar implementation (csrc/) must agree
with the JAX evaluator bit-close — same counter RNG, same impulse layout,
same splat math (the reference repo's facet-forge test pattern of
closed-form-oracle-next-to-implementation, SURVEY.md §4)."""
import ctypes
import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

CSRC = os.path.join(os.path.dirname(__file__), "..", "csrc")
LIB = os.path.join(CSRC, "libscgpis_oracle.so")


@pytest.fixture(scope="module")
def oracle():
    if not os.path.exists(LIB):
        subprocess.run(["make", "-C", CSRC], check=True, capture_output=True)
    lib = ctypes.CDLL(LIB)
    lib.noise3d_world_se.argtypes = [
        ctypes.POINTER(ctypes.c_float)] * 3 + [
        ctypes.c_int, ctypes.c_uint32, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_float)]
    lib.oracle_xxhash32_2.restype = ctypes.c_uint32
    lib.oracle_xxhash32_2.argtypes = [ctypes.c_uint32, ctypes.c_uint32]
    lib.oracle_uniform.restype = ctypes.c_float
    lib.oracle_uniform.argtypes = [ctypes.c_uint32, ctypes.c_uint32]
    return lib


def test_rng_streams_match(oracle):
    from tungsten_tpu.utils import rng
    for key, ctr in [(1, 0), (123456, 7), (0xDEADBEEF, 81)]:
        assert int(rng.xxhash32_2(jnp.uint32(key), jnp.uint32(ctr))) == \
            oracle.oracle_xxhash32_2(key, ctr)
        np.testing.assert_allclose(
            float(rng.uniform(jnp.uint32(key), jnp.uint32(ctr))),
            oracle.oracle_uniform(key, ctr), rtol=0, atol=0)


def test_noise_values_match(oracle):
    from tungsten_tpu.ops import sparse_conv as sc
    from tungsten_tpu.ops.covariance import SquaredExponentialCov
    from tungsten_tpu.ops.means import HomogeneousMean

    l = 0.4
    gp = sc.GP(mean=HomogeneousMean.create(0.0),
               cov=SquaredExponentialCov.create(sigma=1.0, l=l))
    cfg = sc.SparseConvConfig.create(ctxt=sc.CTXT_NONE)
    zero = sc.Coeffs.zero()
    rd = jnp.array([0.0, 0.0, 1.0])

    r = np.random.RandomState(0)
    pts = r.randn(64, 3).astype(np.float32) * 2.0
    seed = 4242

    import jax
    vals_jax = np.asarray(jax.vmap(
        lambda p: sc.eval_noise3d(cfg, gp, zero, p, rd, jnp.uint32(seed),
                                  False)[0])(jnp.asarray(pts)))

    out = np.zeros(64, np.float32)
    px = np.ascontiguousarray(pts[:, 0])
    py = np.ascontiguousarray(pts[:, 1])
    pz = np.ascontiguousarray(pts[:, 2])
    fp = ctypes.POINTER(ctypes.c_float)
    oracle.noise3d_world_se(px.ctypes.data_as(fp), py.ctypes.data_as(fp),
                            pz.ctypes.data_as(fp), 64, seed,
                            ctypes.c_float(l), ctypes.c_float(3.0), 3,
                            ctypes.c_float(3.0),
                            out.ctypes.data_as(fp))
    np.testing.assert_allclose(vals_jax, out, rtol=2e-4, atol=2e-5)

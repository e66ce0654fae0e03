import jax
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.ops import sparse_conv as sc
from tungsten_tpu.ops import weight_space as ws
from tungsten_tpu.ops.covariance import SquaredExponentialCov
from tungsten_tpu.ops.means import HomogeneousMean


def make_gp(sigma=1.0, l=0.7):
    return sc.GP(mean=HomogeneousMean.create(0.0),
                 cov=SquaredExponentialCov.create(sigma=sigma, l=l))


def test_rff_moments_and_autocovariance():
    """RFF realizations reproduce the kernel: Var[f]=sigma^2,
    cov(f(0), f(d)) = SE(d) (WeightSpaceGaussianProcess.cpp:120-127)."""
    gp = make_gp(sigma=1.3, l=0.7)
    n = 256

    def draw(i):
        pss = jnp.array([i, 0, 0, 0], jnp.uint32)
        real = ws.sample_realization(gp.cov, n, pss, 0, False)
        v0, _ = ws.evaluate(real, gp, jnp.zeros(3))
        v1, _ = ws.evaluate(real, gp, jnp.array([0.4, 0.0, 0.0]))
        return v0, v1

    v0, v1 = jax.vmap(draw)(jnp.arange(3000, dtype=jnp.uint32))
    v0, v1 = np.asarray(v0), np.asarray(v1)
    assert abs(v0.mean()) < 0.08
    np.testing.assert_allclose(v0.var(), 1.3**2, rtol=0.12)
    emp_cov = np.mean(v0 * v1) - v0.mean() * v1.mean()
    expected = 1.3**2 * np.exp(-0.4**2 / (2 * 0.7**2))
    np.testing.assert_allclose(emp_cov, expected, rtol=0.15)


def test_rff_gradient_matches_fd():
    gp = make_gp()
    pss = jnp.array([5, 6, 1, 0], jnp.uint32)
    real = ws.sample_realization(gp.cov, 128, pss, 0, False)
    p = jnp.array([0.3, -0.2, 0.5])
    g = ws.evaluate_gradient(real, gp, p)
    eps = 1e-3
    for ax in range(3):
        dp = jnp.zeros(3).at[ax].set(eps)
        vp, _ = ws.evaluate(real, gp, p + dp)
        vm, _ = ws.evaluate(real, gp, p - dp)
        fd = float((vp - vm) / (2 * eps))
        np.testing.assert_allclose(fd, float(g[ax]), rtol=2e-2, atol=1e-3)


def test_evaluate_many_matches_single():
    gp = make_gp()
    pss = jnp.array([1, 2, 3, 0], jnp.uint32)
    real = ws.sample_realization(gp.cov, 64, pss, 7, False)
    pts = jnp.array([[0.1, 0.2, 0.3], [0.5, -0.5, 0.0], [1.0, 1.0, 1.0]])
    vm, _ = ws.evaluate_many(real, gp, pts)
    vs = jnp.stack([ws.evaluate(real, gp, p)[0] for p in pts])
    np.testing.assert_allclose(np.asarray(vm), np.asarray(vs), rtol=1e-4,
                               atol=1e-5)


def test_global_context_strips_bounce():
    gp = make_gp()
    a = ws.realization_key(jnp.array([1, 2, 3, 4], jnp.uint32), 0, True)
    b = ws.realization_key(jnp.array([1, 2, 3, 9], jnp.uint32), 0, True)
    c = ws.realization_key(jnp.array([1, 2, 3, 9], jnp.uint32), 0, False)
    assert int(a) == int(b)
    assert int(a) != int(c)


def test_range_bound_sound():
    """The segment range bound must contain every sampled value inside the
    segment (soundness of the affine-arithmetic replacement)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tungsten_tpu.ops import weight_space as ws
    from tungsten_tpu.scene.parse import parse_gp
    gp = parse_gp({"mean": {"type": "spherical", "center": [0, 0, 0],
                            "radius": 0.4},
                   "covariance": {"type": "squared_exponential",
                                  "sigma": 0.2, "lengthScale": 0.3}})
    pss = jnp.array([3, 7, 1, 0], jnp.uint32)
    real = ws.sample_realization(gp.cov, 64, pss, 0, False)
    ro = jnp.array([0.0, 0.1, 1.4])
    rd = jnp.array([0.1, -0.05, -1.0])
    rd = rd / jnp.linalg.norm(rd)
    for (t0, t1) in [(0.0, 0.3), (0.5, 0.52), (0.9, 1.8), (2.0, 2.001)]:
        lo, hi = ws.range_bound_segment(real, gp, ro, rd,
                                        jnp.float32(t0), jnp.float32(t1))
        ts = jnp.linspace(t0, t1, 200)
        vals = jax.vmap(lambda t: ws.evaluate(real, gp, ro + t * rd)[0])(ts)
        assert float(vals.min()) >= float(lo) - 1e-4, (t0, t1)
        assert float(vals.max()) <= float(hi) + 1e-4, (t0, t1)


def test_sphere_trace_matches_fixed_step():
    """step_size=0 adaptive sphere trace finds the same crossings as a fine
    fixed-step scan of the same realization."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tungsten_tpu.ops import weight_space as ws
    from tungsten_tpu.scene.parse import parse_gp
    gp = parse_gp({"mean": {"type": "spherical", "center": [0, 0, 0],
                            "radius": 0.4},
                   "covariance": {"type": "squared_exponential",
                                  "sigma": 0.1, "lengthScale": 0.25}})
    for lane in range(6):
        pss = jnp.array([lane, 11, 2, 0], jnp.uint32)
        real = ws.sample_realization(gp.cov, 96, pss, 0, False)
        ro = jnp.array([0.02 * lane, 0.1, 1.4])
        rd = jnp.array([0.05, -0.04, -1.0])
        rd = rd / jnp.linalg.norm(rd)
        hit, t_hit = ws.sphere_trace_segment(real, gp, ro, rd,
                                             jnp.float32(0.0),
                                             jnp.float32(3.0),
                                             min_step=5e-4)
        # dense scan oracle
        ts = jnp.linspace(0.0, 3.0, 4000)
        vals = jax.vmap(lambda t: ws.evaluate(real, gp, ro + t * rd)[0])(ts)
        signs = jnp.sign(vals)
        flips = signs[1:] != signs[:-1]
        any_flip = bool(jnp.any(flips))
        assert bool(hit) == any_flip, lane
        if any_flip:
            t_ref = float(ts[jnp.argmax(flips)])
            assert abs(float(t_hit) - t_ref) < 5e-3, (lane, float(t_hit),
                                                      t_ref)


def test_sphere_trace_batch_matches_vmapped():
    """The VMEM-resident Mosaic trace (ops/ws_trace_pallas.py, interpret
    mode on CPU) agrees with vmap(sphere_trace_segment): identical hit
    decisions and hit distances (same math, same iteration schedule)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tungsten_tpu.ops import weight_space as ws
    from tungsten_tpu.ops import ws_trace_pallas as wst
    from tungsten_tpu.scene.parse import parse_gp
    gp = parse_gp({"mean": {"type": "spherical", "center": [0, 0, 0],
                            "radius": 0.4},
                   "covariance": {"type": "squared_exponential",
                                  "sigma": 0.1, "lengthScale": 0.25}})
    assert wst.supports(gp)
    R = 24
    lanes = jnp.arange(R, dtype=jnp.uint32)
    pss = jnp.stack([lanes, jnp.full(R, 11, jnp.uint32),
                     jnp.full(R, 2, jnp.uint32),
                     jnp.zeros(R, jnp.uint32)], axis=-1)
    real = jax.vmap(lambda p: ws.sample_realization(gp.cov, 96, p, 0,
                                                    False))(pss)
    ths = jnp.linspace(-0.3, 0.3, R)
    ro = jnp.stack([0.02 * jnp.arange(R, dtype=jnp.float32) - 0.2,
                    jnp.full(R, 0.1), jnp.full(R, 1.4)], axis=-1)
    rd = jnp.stack([jnp.sin(ths) * 0.2, jnp.full(R, -0.04),
                    -jnp.ones(R)], axis=-1)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    near = jnp.zeros(R)
    far = jnp.full(R, 3.0)

    hit_v, t_v = jax.vmap(
        lambda rr, o, d, nr, fr: ws.sphere_trace_segment(
            rr, gp, o, d, nr, fr))(real, ro, rd, near, far)
    hit_b, t_b = wst.sphere_trace_batch(real, gp, ro, rd, near, far,
                                        interpret=True)
    assert bool(jnp.all(hit_v == hit_b)), (hit_v, hit_b)
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_v),
                               rtol=0, atol=2e-3)


def test_fixed_march_batch_matches_generic():
    """WS fixed-step march kernel (interpret mode) agrees with the generic
    march through sample_distance: same hit set, same hit distances."""
    import os
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tungsten_tpu.models import media as md
    from tungsten_tpu.scene.parse import load_scene

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene, _ = load_scene(os.path.join(root, "scenes",
                                       "gpis-weight-space.json"))
    med = scene.media[0]
    assert med.step_size > 0 and not med.ws_sphere_trace
    R = 48
    ths = jnp.linspace(-0.25, 0.25, R)
    ro = jnp.tile(jnp.array([[0.0, 0.9, 2.2]]), (R, 1))
    rd = jnp.stack([jnp.sin(ths), jnp.zeros(R), -jnp.cos(ths)], axis=-1)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    near, far = jnp.full(R, 0.5), jnp.full(R, 4.0)
    state = md.MediumState.make(R)
    pss = jnp.stack([jnp.arange(R, dtype=jnp.uint32),
                     jnp.full(R, 3, jnp.uint32), jnp.zeros(R, jnp.uint32),
                     jnp.zeros(R, jnp.uint32)], axis=-1)
    uj = jnp.full(R, 0.37)
    act = jnp.ones(R, bool)

    outs = {}
    for flag in ("1", "0"):
        os.environ["TUNGSTEN_TPU_PALLAS"] = flag
        try:
            res, _st = md.sample_distance(med, scene.scene_seed, ro, rd,
                                          near, far, state, pss, uj, act)
            outs[flag] = (np.asarray(res["exited"]), np.asarray(res["t"]))
        finally:
            del os.environ["TUNGSTEN_TPU_PALLAS"]
    ex_k, t_k = outs["1"]
    ex_g, t_g = outs["0"]
    assert (~ex_k).sum() > 5, "no hits — test scene degenerate"
    assert (ex_k == ex_g).all(), (ex_k, ex_g)
    hits = ~ex_k
    np.testing.assert_allclose(t_k[hits], t_g[hits], rtol=0, atol=2e-3)

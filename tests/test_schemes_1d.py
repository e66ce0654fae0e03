"""End-to-end 1D sparse-conv sampling with the NEE/MIS schemes on a mirror
GPIS (BASELINE config 3; MirrorBsdf.cpp:31-115, TraceBase.cpp:354-417).

The three schemes (UNI / NEE / MIS) are different estimators of the same
integral — their images must agree in expectation.  At test spp we check
consistency within loose Monte-Carlo bounds plus structural sanity."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tungsten_tpu.scene.parse import scene_from_dict
from tungsten_tpu.models.integrator import render_pass


def scheme_scene(scheme, corr_xy=False, res=5):
    path = os.path.join(os.path.dirname(__file__), "..", "scenes",
                        "gpis-mirror-1d.json")
    with open(path) as f:
        doc = json.load(f)
    doc["camera"]["resolution"] = [res, res]
    doc["media"][0]["1D_sampling_scheme"] = scheme
    doc["media"][0]["1D_gradient_correlationXY"] = corr_xy
    doc["integrator"]["max_bounces"] = 3
    scene, _ = scene_from_dict(doc)
    return scene


def render_mean(scene, spp=16):
    fn = jax.jit(render_pass)
    acc = None
    for s in range(spp):
        img = fn(scene, jnp.int32(s))
        acc = img if acc is None else acc + img
    return np.asarray(acc) / spp


@pytest.mark.parametrize("corr_xy", [False, True])
def test_schemes_consistent(corr_xy):
    means = {}
    for scheme in ("uni", "nee", "mis"):
        img = render_mean(scheme_scene(scheme, corr_xy), spp=8)
        assert np.isfinite(img).all(), scheme
        assert img.max() > 0, scheme
        means[scheme] = img.mean()
    # same integral, different estimators: loose MC agreement
    vals = np.array(list(means.values()))
    assert vals.max() / max(vals.min(), 1e-6) < 2.5, means


@pytest.mark.parametrize("corr_xy", [False, True])
def test_nee_pdf_integrates_to_one(corr_xy):
    """nee_pdf is a solid-angle density over the scattered direction: its
    integral over the sphere must be 1 (SparseConvolutionNoise.cpp:661-743
    converts the gradient-plane area density through normal -> reflected
    direction; SURVEY §7 hard-part #2)."""
    from tungsten_tpu.ops import sparse_conv as sc

    scene = scheme_scene("nee", corr_xy)
    med = scene.media[0]
    cfg, gp = med.cfg, med.gp
    assert cfg.one_d

    p = jnp.array([0.05, 0.95, 0.1])
    rd = jnp.array([0.3, -0.5, -0.81])
    rd = rd / jnp.linalg.norm(rd)
    c1 = sc.Coeffs.zero()
    info_t = jnp.float32(0.7)
    t_seg = jnp.float32(0.4)

    def integral(pss, n=120_000):
        # uniform sphere directions (deterministic lattice + hash jitter)
        i = jnp.arange(n, dtype=jnp.uint32)
        from tungsten_tpu.utils import rng as trng
        u1 = trng.uniform(trng.xxhash32_2(i, jnp.uint32(1)), jnp.uint32(0))
        u2 = trng.uniform(trng.xxhash32_2(i, jnp.uint32(2)), jnp.uint32(0))
        z = 1.0 - 2.0 * u1
        r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        phi = 2.0 * jnp.pi * u2
        w = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
        half = (w - rd) / jnp.linalg.norm(w - rd, axis=-1, keepdims=True)

        def one(h):
            return sc.nee_pdf(cfg, gp, c1, rd, h, p, t_seg, pss,
                              scene.scene_seed, info_t)

        pdf = jax.jit(jax.vmap(one))(half)
        assert bool(jnp.all(jnp.isfinite(pdf)))
        assert bool(jnp.all(pdf >= 0.0))
        return float(jnp.mean(pdf) * 4.0 * jnp.pi)

    for k in (0, 1, 2):
        pss = jnp.array([3 + k, 11, 2 * k, 1], jnp.uint32)
        val = integral(pss)
        # MC integration error at 120k uniform-sphere samples of a peaked
        # density: a few percent
        assert 0.85 < val < 1.15, (corr_xy, k, val)

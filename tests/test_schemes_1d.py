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

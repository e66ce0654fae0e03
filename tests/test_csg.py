"""Two-GP CSG union: min of two independent realizations with per-child
covariance and id tracking (GPSampleNodeCSG / GPRealNodeCsg,
/root/reference/src/core/math/GaussianProcess.{hpp:41-95,cpp:25-66}).

Backend contract mirrors the reference exactly:
- function-space: both children sampled per chunk, pointwise min, argmin id,
  per-child renewal carries, per-child conditioned gradients
  (FunctionSpaceGaussianProcessMedium.cpp:375-396 via the CSG node);
- sparse-conv / weight-space: left GP with right's mean as additional
  min-mean (the reference's own _csg construction in
  GPSampleNodeCSG::fromJson — those media call get_gaussian_process()).
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tungsten_tpu.scene.parse import load_scene
from tungsten_tpu.models.camera import Camera

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scene(res=24, bounces=2):
    scene, _ = load_scene(os.path.join(ROOT, "scenes", "gpis-csg.json"))
    cam = Camera.create(transform=jax.device_get(scene.camera.transform),
                        fov_deg=35.0, res=(res, res))
    return dataclasses.replace(scene, camera=cam, max_bounces=bounces)


def test_parse_keeps_both_children():
    scene, _ = load_scene(os.path.join(ROOT, "scenes", "gpis-csg.json"))
    gp = scene.media[0].gp
    assert gp.csg_right is not None, "right child GP dropped at parse"
    assert gp.mean_additional is not None, \
        "additional min-mean missing (sparse-conv/ws approximation path)"
    # the children carry DIFFERENT covariances — the r3 silent-drop bug
    assert float(gp.cov.sigma) != float(gp.csg_right.cov.sigma)
    assert float(gp.cov.l) != float(gp.csg_right.cov.l)


def test_csg_mean_is_min():
    scene, _ = load_scene(os.path.join(ROOT, "scenes", "gpis-csg.json"))
    gp = scene.media[0].gp
    # on the right sphere's side the min-mean must be the right child's
    p = jnp.array([[0.35, 0.9, 0.0], [-0.35, 0.9, 0.0], [0.0, 0.3, 0.0]])
    m, ids = gp.mean_and_id(p)
    m_l = gp.mean.mean(p)
    m_r = gp.mean_additional.mean(p)
    np.testing.assert_allclose(np.asarray(m),
                               np.minimum(np.asarray(m_l), np.asarray(m_r)),
                               rtol=1e-6)
    assert int(ids[0]) == 1 and int(ids[1]) == 0  # argmin child tracked


@pytest.mark.mid
def test_fs_csg_renders_both_lobes():
    """The FS union must occlude the back wall behind BOTH spheres; a
    left-GP-only render must show the right sphere's region as background.
    Uses hit masks (first-bounce alpha) via image differences."""
    res = 24
    scene = _scene(res=res)
    from tungsten_tpu.models.integrator import render_pass
    img = np.asarray(jax.jit(render_pass)(scene, jnp.int32(0)))
    assert np.isfinite(img).all()

    # strip the right child -> left-only GP scene
    gp = scene.media[0].gp
    gp_l = dataclasses.replace(gp, mean_additional=None, csg_right=None)
    med_l = dataclasses.replace(scene.media[0], gp=gp_l)
    scene_l = dataclasses.replace(scene, media=(med_l,) + scene.media[1:])
    img_l = np.asarray(jax.jit(render_pass)(scene_l, jnp.int32(0)))

    # rows through the blob centers; columns on each half
    mid = res // 2
    band = slice(mid - 4, mid + 4)
    left_cols = slice(2, mid - 1)
    right_cols = slice(mid + 1, res - 2)
    # right half: union has a surface there, left-only does not -> images
    # must differ substantially on the right, much less on the left
    d_right = np.abs(img[band, right_cols] - img_l[band, right_cols]).mean()
    d_left = np.abs(img[band, left_cols] - img_l[band, left_cols]).mean()
    assert d_right > 2.0 * d_left + 0.02, (d_right, d_left)


def test_fs_csg_gp_id_dispatch():
    """sample_distance on rays aimed at each lobe returns the right
    child id (lastGPId dispatch, FunctionSpaceGaussianProcessMedium.cpp:300)."""
    from tungsten_tpu.models import media as md
    scene = _scene()
    med = scene.media[0]
    R = 8
    # rays straight down onto each sphere's pole
    ro = jnp.array([[-0.35, 1.9, 0.0]] * 4 + [[0.35, 1.9, 0.0]] * 4)
    rd = jnp.tile(jnp.array([[0.0, -1.0, 0.0]]), (R, 1))
    state = md.MediumState.make(R)
    pss = jnp.stack([jnp.arange(R, dtype=jnp.uint32)] * 4, axis=-1)
    res, _ = md.sample_distance(med, scene.scene_seed, ro, rd,
                                jnp.zeros(R), jnp.full(R, 3.0), state, pss,
                                jnp.full(R, 0.5), jnp.ones(R, bool))
    hit = ~res["exited"]
    gid = np.asarray(res["gp_id"])
    hitn = np.asarray(hit)
    # every hitting ray over the left pole must report id 0, right pole id 1
    assert hitn[:4].any() and hitn[4:].any()
    assert (gid[:4][hitn[:4]] == 0).all(), gid
    assert (gid[4:][hitn[4:]] == 1).all(), gid
    # hits land near the expected pole heights (sphere tops ~ y=1.25)
    t = np.asarray(res["t"])
    assert (np.abs(t[:4][hitn[:4]] - 0.65) < 0.3).all()
    assert (np.abs(t[4:][hitn[4:]] - 0.65) < 0.3).all()

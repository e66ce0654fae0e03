"""Row-tiled large-frame renderer (VERDICT r4 next #5): frames above
TUNGSTEN_TPU_MAX_RAYS rays render in equal row chunks with one compile
(render._render_tiled) — the TPU analog of the reference's TileGenerator
tile loop (src/core/renderer/TraceableScene.hpp + thread/TaskGroup).

Because the per-pixel RNG stream is keyed on (px, py, spp_idx), the tiled
accumulation must be exactly the untiled one — including at odd row counts
where the last chunk is clipped."""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tungsten_tpu.render import render, _render_tiled
from tungsten_tpu.scene.parse import scene_from_dict


def _scene(res_x=12, res_y=10):
    path = os.path.join(os.path.dirname(__file__), "..", "scenes",
                        "gpis-sphere-box.json")
    with open(path) as f:
        doc = json.load(f)
    doc["camera"]["resolution"] = [res_x, res_y]
    doc["integrator"]["max_bounces"] = 2
    scene, _ = scene_from_dict(doc)
    return scene


@pytest.mark.parametrize("rows_per", [3, 4, 10, 16])
def test_tiled_matches_untiled(rows_per):
    # 10 rows: rows_per=3 leaves a clipped 1-row tail; =4 a 2-row tail;
    # =10 exactly one tile; =16 a single over-sized tile (all clipped)
    scene = _scene()
    spp = 2
    ref = render(scene, spp)
    film = jnp.zeros((scene.camera.res_y, scene.camera.res_x, 3),
                     jnp.float32)
    tiled = _render_tiled(scene, spp, 0, film, None, rows_per)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    assert np.isfinite(np.asarray(tiled)).all()


def test_render_auto_tiles_above_max_rays(monkeypatch):
    # force the tiling threshold below the frame size; render() must take
    # the tiled path and still agree with the untiled film
    scene = _scene()
    ref = render(scene, 1)
    monkeypatch.setenv("TUNGSTEN_TPU_MAX_RAYS", "36")  # 3 rows of 12
    out = render(scene, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_tiled_resume_offset():
    # spp_start continuation (checkpoint/resume path) through the tiled
    # renderer: film(0..3) == film(0..1) + film(2..3)
    scene = _scene()
    H, W = scene.camera.res_y, scene.camera.res_x
    z = jnp.zeros((H, W, 3), jnp.float32)
    full = _render_tiled(scene, 4, 0, z, None, 4)
    a = _render_tiled(scene, 2, 0, z, None, 4)
    b = _render_tiled(scene, 2, 2, a, None, 4)
    np.testing.assert_allclose(np.asarray(b), np.asarray(full),
                               rtol=1e-6, atol=1e-6)

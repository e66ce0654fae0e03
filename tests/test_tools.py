"""Tools: denoiser, server, hdrmanip, scenemanip, obj2json, json2xml."""
import json
import os
import urllib.request

import numpy as np
import pytest

from tungsten_tpu.io.image import read_pfm, write_pfm


def test_nl_means_reduces_noise(tmp_path):
    from tungsten_tpu.tools.denoiser import nl_means
    rng = np.random.default_rng(0)
    clean = np.zeros((32, 32, 3), np.float32)
    clean[:, 16:] = 1.0
    noisy = clean + rng.normal(0, 0.25, clean.shape).astype(np.float32)
    out = nl_means(noisy, variance=np.full((32, 32, 3), 0.25 ** 2),
                   radius=4, patch=1)
    assert np.mean((out - clean) ** 2) < 0.5 * np.mean((noisy - clean) ** 2)


def test_denoiser_cli(tmp_path):
    from tungsten_tpu.tools import denoiser
    img = np.random.default_rng(1).random((16, 16, 3)).astype(np.float32)
    pin, pout = str(tmp_path / "in.pfm"), str(tmp_path / "out.pfm")
    write_pfm(pin, img)
    denoiser.main([pin, pout, "--radius", "2"])
    out = read_pfm(pout)
    assert out.shape == (16, 16, 3) and np.all(np.isfinite(out))


def test_render_server():
    from tungsten_tpu.server import RenderServer
    srv = RenderServer(port=0)
    try:
        srv.update(film=np.ones((8, 8, 3), np.float32) * 0.5,
                   state="rendering", spp_done=3, spp_total=8)
        srv.log("hello")
        base = f"http://127.0.0.1:{srv.port}"
        st = json.loads(urllib.request.urlopen(base + "/status").read())
        assert st["spp_done"] == 3 and st["state"] == "rendering"
        png = urllib.request.urlopen(base + "/framebuffer").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        log = urllib.request.urlopen(base + "/log").read().decode()
        assert "hello" in log
    finally:
        srv.shutdown()


def test_hdrmanip_merge_compare(tmp_path, capsys):
    from tungsten_tpu.tools import hdrmanip
    a = np.full((8, 8, 3), 1.0, np.float32)
    b = np.full((8, 8, 3), 3.0, np.float32)
    pa, pb = str(tmp_path / "a.pfm"), str(tmp_path / "b.pfm")
    pm = str(tmp_path / "m.pfm")
    write_pfm(pa, a)
    write_pfm(pb, b)
    hdrmanip.main(["merge", pm, pa, pb])
    assert np.allclose(read_pfm(pm), 2.0)
    hdrmanip.main(["compare", pa, pm])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert abs(json.loads(out)["mse"] - 1.0) < 1e-6
    hdrmanip.main(["convert", pa, str(tmp_path / "a.png"),
                   "--tonemap", "filmic"])
    assert os.path.exists(tmp_path / "a.png")


def test_scenemanip_pack_roundtrip(tmp_path):
    from tungsten_tpu.tools import scenemanip
    res = tmp_path / "tex.bin"
    res.write_bytes(b"\x00" * 16)
    scene = {"primitives": [{"type": "mesh", "file": "tex.bin"}]}
    sp = tmp_path / "s.json"
    sp.write_text(json.dumps(scene))
    zp = str(tmp_path / "s.zip")
    scenemanip.main(["pack", str(sp), zp])
    outdir = tmp_path / "out"
    scenemanip.main(["unpack", zp, str(outdir)])
    assert (outdir / "tex.bin").read_bytes() == b"\x00" * 16
    assert json.loads((outdir / "s.json").read_text()) == scene


def test_obj2json_and_json2xml(tmp_path):
    from tungsten_tpu.tools import json2xml, obj2json
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    sj = str(tmp_path / "scene.json")
    obj2json.main([str(obj), sj])
    doc = json.loads(open(sj).read())
    assert doc["primitives"][0]["type"] == "mesh"
    xj = str(tmp_path / "scene.xml")
    json2xml.main([sj, xj])
    txt = open(xj).read()
    assert "<scene" in txt and "perspective" in txt


def test_resume_continues_sampler_streams(tmp_path):
    """Resume must continue the per-spp sample streams, not repeat them:
    2 spp + resumed 2 spp == uninterrupted 4 spp, bit-exact
    (PathTraceIntegrator.cpp:165-179 sampler-state resume semantics; the
    counter-based sampler makes the state the spp index itself)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tungsten_tpu.render import render
    from tungsten_tpu.scene.parse import scene_from_dict
    doc = {
        "bsdfs": [{"name": "w", "albedo": 0.6, "type": "lambert"}],
        "primitives": [
            {"name": "f", "transform": {"scale": [2, 1, 2]}, "type": "quad",
             "bsdf": "w"},
            {"name": "l",
             "transform": {"position": [0, 1.5, 0], "scale": [0.5, 1, 0.5],
                           "rotation": [0, 0, -180]},
             "type": "quad", "bsdf": "w", "emission": [5, 5, 5]},
        ],
        "camera": {"type": "pinhole", "fov": 45, "resolution": [8, 8],
                   "transform": {"position": [0, 1, 2.5],
                                 "look_at": [0, 0.5, 0], "up": [0, 1, 0]}},
        "integrator": {"max_bounces": 2},
    }
    scene, _ = scene_from_dict(doc)
    full = render(scene, 4)
    part = render(scene, 2)
    resumed = render(scene, 2, spp_start=2, film=part)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(resumed))

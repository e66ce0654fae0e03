"""EXR codec round-trips (io/exr.py vs io/ImageIO.cpp saveExr/loadExr) and
IES photometry parsing/baking (io/ies.py vs textures/IesTexture.cpp)."""
import os

import numpy as np
import pytest

from tungsten_tpu.io.exr import read_exr, write_exr
from tungsten_tpu.io.ies import bake_ies, parse_ies


@pytest.mark.smoke
def test_exr_roundtrip_float_zip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((37, 53, 3)) * 10.0).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, half=False, compress=True)
    back = read_exr(p)
    assert back.shape == img.shape
    assert np.allclose(back, img, atol=0.0), np.abs(back - img).max()


@pytest.mark.smoke
def test_exr_roundtrip_half_uncompressed(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.random((16, 16, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, half=True, compress=False)
    back = read_exr(p)
    # half precision: ~1e-3 relative
    assert np.allclose(back, img, rtol=2e-3, atol=2e-3)


def test_exr_roundtrip_half_zip(tmp_path):
    img = np.linspace(0, 4, 64 * 48 * 3, dtype=np.float32).reshape(48, 64, 3)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, half=True, compress=True)
    back = read_exr(p)
    assert np.allclose(back, img, rtol=2e-3, atol=2e-3)


_IES = """IESNA:LM-63-1995
[TEST] demo
TILT=NONE
1 1000 1 5 3 1 1 0.1 0.1 0.1
1.0 1.0 1.0
0 45 90 135 180
0 90 180
1000 800 500 200 0
1000 800 500 200 0
1000 800 500 200 0
"""


def _write_ies(tmp_path):
    p = str(tmp_path / "demo.ies")
    with open(p, "w") as f:
        f.write(_IES)
    return p


@pytest.mark.smoke
def test_ies_parse(tmp_path):
    p = _write_ies(tmp_path)
    ies = parse_ies(p)
    assert ies["vert_angles"].shape == (5,)
    assert ies["horz_angles"].shape == (3,)
    assert ies["candela"].shape == (3, 5)
    assert ies["candela"][0, 0] == 1000


def test_ies_bake_monotone_and_symmetric(tmp_path):
    p = _write_ies(tmp_path)
    img = bake_ies(p, resolution=64)
    assert img.shape == (64, 128, 3)
    assert np.isfinite(img).all() and img.max() <= 1.0 + 1e-6
    col = img[:, 0, 0]
    # candela decreases from nadir (row 0) to zenith
    assert col[0] > col[31] > col[62]
    # bilateral symmetry (180-mirror expanded to 360)
    assert np.allclose(img[:, 32, 0], img[:, 128 - 32, 0], atol=1e-4)

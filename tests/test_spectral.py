"""Spectral utilities vs the CIE 1931 observer (reference
src/core/math/Spectral.{hpp,cpp}).  The analytic Wyman-Sloan-Shirley fit
replaces the 471-entry table; these tests pin its accuracy both by known
observer properties and — when the reference checkout is present — directly
against the reference's own table parsed from Spectral.cpp."""
import os
import re

import numpy as np
import pytest

from tungsten_tpu.utils.spectral import (
    CIE_MAX, CIE_MIN, Y_INTEGRAL, blackbody_rgb, planck,
    spectral_xyz_weights, wavelength_to_rgb, wavelength_to_xyz, xyz_to_rgb)

REF_SPECTRAL = "/root/reference/src/core/math/Spectral.cpp"


def test_observer_peaks():
    lam = np.linspace(CIE_MIN, CIE_MAX, 2351)
    xyz = np.asarray(wavelength_to_xyz(lam))
    # canonical CIE 1931 peaks: x-bar ~599 nm/1.063, y-bar 555 nm/1.0,
    # z-bar ~449 nm/1.78
    assert abs(lam[xyz[:, 0].argmax()] - 599) < 6
    assert abs(lam[xyz[:, 1].argmax()] - 555) < 6
    assert abs(lam[xyz[:, 2].argmax()] - 449) < 8
    assert abs(xyz[:, 1].max() - 1.0) < 0.03
    assert abs(xyz[:, 2].max() - 1.78) < 0.06


def test_y_integral_constant():
    lam = np.arange(CIE_MIN, CIE_MAX + 0.5)
    y = np.asarray(wavelength_to_xyz(lam))[:, 1]
    trap = np.trapezoid if hasattr(np, "trapezoid") else np.trapz
    assert abs(trap(y, lam) - Y_INTEGRAL) / Y_INTEGRAL < 0.01


def test_flat_spectrum_is_equal_energy_white():
    # illuminant E: integrals of the three observers are near-equal, so a
    # flat unit spectrum must weight to XYZ ~ (1, 1, 1)
    _, w = spectral_xyz_weights(128)
    xyz = np.asarray(w).sum(0)
    assert abs(xyz[1] - 1.0) < 0.01
    assert np.all(np.abs(xyz - 1.0) < 0.04), xyz


def test_weights_converge_in_sample_count():
    _, w64 = spectral_xyz_weights(64)
    _, w256 = spectral_xyz_weights(256)
    np.testing.assert_allclose(np.asarray(w64).sum(0),
                               np.asarray(w256).sum(0), rtol=0.02)


def test_monochromatic_hues():
    r = np.asarray(wavelength_to_rgb(680.0))
    g = np.asarray(wavelength_to_rgb(550.0))
    b = np.asarray(wavelength_to_rgb(450.0))
    assert r[0] > abs(r[1]) and r[0] > abs(r[2])
    assert g[1] > g[0] and g[1] > g[2]
    assert b[2] > b[0] and b[2] > b[1]


def test_blackbody_colors():
    warm = np.asarray(blackbody_rgb(2000.0))
    d65ish = np.asarray(blackbody_rgb(6504.0))
    cold = np.asarray(blackbody_rgb(20000.0))
    assert warm[0] > warm[1] > warm[2]
    assert cold[2] > cold[1] > cold[0]
    # 6504 K is the D65 correlated color temperature: near-neutral in sRGB
    assert np.all(d65ish > 0.82), d65ish
    # Wien displacement check on the raw Planck curve at 5778 K: peak
    # within the visible band near 501 nm
    lam = np.linspace(300.0, 1100.0, 1601)
    rad = np.asarray(planck(lam, 5778.0))
    assert abs(lam[rad.argmax()] - 501.0) < 5.0


@pytest.mark.skipif(not os.path.exists(REF_SPECTRAL),
                    reason="reference checkout not present")
def test_fit_matches_reference_table():
    """Parse the reference's 471-sample CIE table straight out of
    Spectral.cpp and bound the analytic fit's error against it."""
    src = open(REF_SPECTRAL).read()

    def arr(name):
        m = re.search(name + r"\[\] = \{(.*?)\};", src, re.S)
        return np.array([float(v) for v in
                         re.findall(r"[-0-9.e+]+f", m.group(1))
                         for v in [v[:-1]]], np.float64)

    table = np.stack([arr("CIE_X_entries"), arr("CIE_Y_entries"),
                      arr("CIE_Z_entries")], -1)
    assert table.shape == (471, 3)
    lam = np.linspace(CIE_MIN, CIE_MAX, 471)
    fit = np.asarray(wavelength_to_xyz(lam), np.float64)
    # JCGT 2013 multi-lobe fit: ~1% of peak per channel
    err = np.abs(fit - table).max(0)
    assert np.all(err < np.array([0.045, 0.035, 0.06])), err
    # and the integrals (what spectral_xyz_weights actually uses) much
    # tighter still
    np.testing.assert_allclose(fit.sum(0), table.sum(0), rtol=0.006)


def test_skydome_temperature_tint():
    # Skydome.cpp:29,77 exposes the sun blackbody temperature; a cooler sun
    # must redden the baked sky, a hotter one must blue it
    from tungsten_tpu.models.envlight import bake_preetham_sky
    sun = (0.3, 0.8, 0.2)
    base = bake_preetham_sky(sun, res=(16, 32))
    warm = bake_preetham_sky(sun, res=(16, 32), temperature=3000.0)
    cold = bake_preetham_sky(sun, res=(16, 32), temperature=12000.0)
    def ratio(img):
        m = img.reshape(-1, 3).mean(0)
        return m[0] / max(m[2], 1e-6)
    assert ratio(warm) > ratio(base) > ratio(cold)
    np.testing.assert_allclose(
        base, bake_preetham_sky(sun, res=(16, 32), temperature=5777.0))

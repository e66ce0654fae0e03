"""Spectral <-> tristimulus utilities (reference: src/core/math/Spectral.{hpp,cpp}).

The reference carries a 471-sample CIE 1931 2-degree standard-observer table
(Spectral.cpp:7-369) and exposes wavelengthToXyz / spectralXyzWeights /
xyzToRgb (Spectral.hpp:19-44); Skydome.cpp:287-296 uses them to integrate a
spectral sun/sky model down to RGB.

TPU-native design: instead of a 471-entry gather table (a bad fit for the
VPU, and a wholesale data copy besides), the color-matching functions are
evaluated with the published piecewise-Gaussian analytic fits of
Wyman, Sloan & Shirley, "Simple Analytic Approximations to the CIE XYZ
Color Matching Functions", JCGT 2(2), 2013 (multi-lobe form, table 1) —
closed-form, branch-free (two exp lobes per channel), differentiable, and
within ~1% of the tabulated observer over 360-830 nm.  Everything here is
plain jnp and works both traced (jit) and with numpy inputs.
"""
from __future__ import annotations

import jax.numpy as jnp

CIE_MIN = 360.0
CIE_MAX = 830.0

# Integral of the CIE y-bar observer over wavelength (the reference's `ref`
# normalizer in spectralXyzWeights, Spectral.cpp:379-390, equals the
# trapezoid sum of CIE_Y at 1 nm = ~106.857); the analytic fit integrates
# to the same value within 0.3% (checked in tests/test_spectral.py).
Y_INTEGRAL = 106.857


def _lobe(lam, alpha, mu, s1, s2):
    """One asymmetric Gaussian lobe: sigma = s1 below the mean, s2 above."""
    t = (lam - mu) * jnp.where(lam < mu, 1.0 / s1, 1.0 / s2)
    return alpha * jnp.exp(-0.5 * t * t)


def wavelength_to_xyz(lam):
    """CIE 1931 (x̄, ȳ, z̄) at wavelength(s) `lam` in nm.  [..., 3].

    Wyman-Sloan-Shirley multi-lobe fit (JCGT 2013, eq. 2 + table 1);
    reference semantics: Spectral.hpp:29-38 (table lerp)."""
    lam = jnp.asarray(lam, jnp.float32)
    x = (_lobe(lam, 0.362, 442.0, 16.0, 26.7)
         + _lobe(lam, 1.056, 599.8, 37.9, 31.0)
         + _lobe(lam, -0.065, 501.1, 20.4, 26.2))
    y = (_lobe(lam, 0.821, 568.8, 46.9, 40.5)
         + _lobe(lam, 0.286, 530.9, 16.3, 31.1))
    z = (_lobe(lam, 1.217, 437.0, 11.8, 36.0)
         + _lobe(lam, 0.681, 459.0, 26.0, 13.8))
    return jnp.stack([x, y, z], axis=-1)


def xyz_to_rgb(xyz):
    """CIE XYZ -> linear sRGB (D65), same matrix as Spectral.hpp:21-27."""
    xyz = jnp.asarray(xyz, jnp.float32)
    m = jnp.array([[3.240479, -1.537150, -0.498535],
                   [-0.969256, 1.875991, 0.041556],
                   [0.055648, -0.204043, 1.057311]], jnp.float32)
    return xyz @ m.T


def wavelength_to_rgb(lam):
    """Linear-sRGB response of a monochromatic unit radiance at `lam` nm
    (Spectral.hpp:40-43)."""
    return xyz_to_rgb(wavelength_to_xyz(lam))


def spectral_xyz_weights(samples):
    """(lambdas [S], weights [S, 3]) such that for a spectral radiance
    L(lambda), sum_i L(lambdas_i) * weights_i ~= XYZ of L with Y normalized
    so that a flat unit spectrum maps to Y = 1.

    Matches the semantics of Spectral.cpp:370-390: `samples` wavelengths
    uniform on [CIE_MIN, CIE_MAX], each weight the observer integrated over
    that sample's cell, normalized by the integral of ȳ.  Here the
    per-cell integral is a 1 nm midpoint quadrature of the analytic fit
    instead of scattering the 1 nm table into bins."""
    lambdas = jnp.linspace(CIE_MIN, CIE_MAX, samples)
    delta = (CIE_MAX - CIE_MIN) / (samples - 1)
    # 1 nm sub-quadrature inside each cell, cells centered on lambdas
    sub = int(max(round(delta), 1))
    off = (jnp.arange(sub) + 0.5) / sub - 0.5
    lam_grid = lambdas[:, None] + off[None, :] * delta  # [S, sub]
    xyz = wavelength_to_xyz(lam_grid)                   # [S, sub, 3]
    w = xyz.mean(1) * delta / Y_INTEGRAL
    return lambdas, w


# ---------------------------------------------------------------------------
# Blackbody emitters (Planck's law) — the standard companion utility the
# spectral tables exist to serve; gives physically-plausible emission
# colors for temperature-specified lights.
# ---------------------------------------------------------------------------

_H = 6.62607015e-34   # J s
_C = 2.99792458e8     # m / s
_KB = 1.380649e-23    # J / K


def planck(lam_nm, temperature):
    """Spectral radiance of a blackbody [W / (m^2 sr nm)] at `lam_nm`."""
    lam = jnp.asarray(lam_nm, jnp.float32) * 1e-9
    t = jnp.asarray(temperature, jnp.float32)
    c1 = 2.0 * _H * _C * _C
    c2 = _H * _C / _KB
    return (c1 / lam ** 5) / jnp.expm1(c2 / (lam * t)) * 1e-9


def blackbody_xyz(temperature, samples=64):
    """XYZ of a blackbody at `temperature` K (Y normalized per
    spectral_xyz_weights; absolute scale in cd-like units is up to the
    caller)."""
    lambdas, w = spectral_xyz_weights(samples)
    rad = planck(lambdas, temperature)
    return (rad[:, None] * w).sum(0)


def blackbody_rgb(temperature, samples=64, normalize=True):
    """Linear-sRGB color of a blackbody; `normalize=True` scales so that
    max(r, g, b) = 1 (color only — pair with an intensity)."""
    rgb = jnp.maximum(xyz_to_rgb(blackbody_xyz(temperature, samples)), 0.0)
    if normalize:
        rgb = rgb / jnp.maximum(rgb.max(), 1e-20)
    return rgb

"""Environment lights: infinite sphere / cap / skydome.

Re-design of src/core/primitives/{InfiniteSphere,InfiniteSphereCap,
Skydome}.cpp for the wavefront tracer: the environment is scene-level state
(not a primitive row) evaluated when a ray escapes, and importance-sampled
for NEE via a precomputed lat-long CDF (the MAP_SPHERICAL makeSamplable path,
InfiniteSphere.cpp:117-121, :160-175).

Direction <-> uv convention matches InfiniteSphere::directionToUV
(InfiniteSphere.cpp:27-38): u = atan2(z,x)/2pi + 0.5, v = acos(-y)/pi in the
env's local frame.  Skydome bakes a Preetham sky into a lat-long bitmap at
load (the reference links the `skylight` thirdparty for the same purpose).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.pytree import static_field, struct
from ..utils.vecmath import dot, frame_to_world, safe_normalize, tangent_frame

ENV_NONE = 0
ENV_CONST = 1     # constant emission over the sphere (or a cap)
ENV_MAP = 2       # lat-long radiance map (importance sampled)

_INV_4PI = 1.0 / (4.0 * np.pi)


@struct(meta=("kind", "sample"))
class EnvLight:
    rot: jnp.ndarray        # [3,3] local->world
    inv_rot: jnp.ndarray    # [3,3]
    emission: jnp.ndarray   # [3] scale (const color for ENV_CONST)
    cap_cos: jnp.ndarray    # scalar; cos of cap half-angle (-1 = full sphere)
    cap_dir: jnp.ndarray    # [3] cap axis (world)
    img: jnp.ndarray        # [H,W,3] radiance map
    cond_cdf: jnp.ndarray   # [H,W] row-wise cdf over W
    marg_cdf: jnp.ndarray   # [H] cdf over rows
    kind: int = static_field(default=ENV_NONE)
    sample: bool = static_field(default=True)


def no_env() -> EnvLight:
    eye = jnp.eye(3)
    return EnvLight(rot=eye, inv_rot=eye, emission=jnp.zeros(3),
                    cap_cos=jnp.float32(-1.0), cap_dir=jnp.array([0., 1., 0.]),
                    img=jnp.zeros((1, 1, 3)), cond_cdf=jnp.ones((1, 1)),
                    marg_cdf=jnp.ones((1,)), kind=ENV_NONE)


def make_env(kind, emission=(1.0, 1.0, 1.0), rot=None, img=None,
             cap_deg=180.0, cap_dir=(0.0, 1.0, 0.0), sample=True) -> EnvLight:
    rot = np.eye(3, dtype=np.float32) if rot is None else np.asarray(
        rot, np.float32)
    if img is None:
        img_a = np.zeros((1, 1, 3), np.float32)
        cond = np.ones((1, 1), np.float32)
        marg = np.ones((1,), np.float32)
    else:
        img_a = np.asarray(img, np.float32)
        H, W = img_a.shape[:2]
        lum = img_a.mean(-1) + 1e-8
        # solid-angle weight per row (sin theta)
        st = np.sin((np.arange(H) + 0.5) / H * np.pi)
        w = lum * st[:, None]
        cond = np.cumsum(w, axis=1)
        row_sum = cond[:, -1:]
        cond = cond / row_sum
        marg = np.cumsum(row_sum[:, 0])
        marg = marg / marg[-1]
        cond = cond.astype(np.float32)
        marg = marg.astype(np.float32)
    return EnvLight(rot=jnp.asarray(rot),
                    inv_rot=jnp.asarray(rot.T),
                    emission=jnp.asarray(np.asarray(emission, np.float32)),
                    cap_cos=jnp.float32(np.cos(np.radians(cap_deg))
                                        if cap_deg < 180.0 else -1.0),
                    cap_dir=jnp.asarray(np.asarray(cap_dir, np.float32)),
                    img=jnp.asarray(img_a),
                    cond_cdf=jnp.asarray(cond), marg_cdf=jnp.asarray(marg),
                    kind=kind, sample=sample)


def _dir_to_uv(env: EnvLight, d):
    dl = env.inv_rot @ d
    u = jnp.arctan2(dl[2], dl[0]) / (2 * jnp.pi) + 0.5
    v = jnp.arccos(jnp.clip(-dl[1], -1.0, 1.0)) / jnp.pi
    sin_t = jnp.sqrt(jnp.maximum(1.0 - dl[1] * dl[1], 1e-12))
    return u, v, sin_t


def _uv_to_dir(env: EnvLight, u, v):
    phi = (u - 0.5) * 2 * jnp.pi
    theta = v * jnp.pi
    st = jnp.sin(theta)
    dl = jnp.stack([jnp.cos(phi) * st, -jnp.cos(theta), jnp.sin(phi) * st])
    return env.rot @ dl, st


def env_eval(env: EnvLight, d):
    """Radiance arriving from direction d (world)."""
    if env.kind == ENV_NONE:
        return jnp.zeros(3)
    if env.kind == ENV_CONST:
        inside = dot(d[None], env.cap_dir[None])[0] >= env.cap_cos
        return jnp.where(inside, env.emission, 0.0)
    u, v, _ = _dir_to_uv(env, d)
    H, W = env.img.shape[0], env.img.shape[1]
    x = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
    return env.img[y, x] * env.emission


def env_sample(env: EnvLight, u1, u2):
    """Sample a direction toward the environment.  Returns (d, pdf, valid)."""
    if env.kind == ENV_CONST:
        # uniform cap around cap_dir (full sphere when cap_cos = -1)
        z = env.cap_cos + u2 * (1.0 - env.cap_cos)
        phi = u1 * 2 * jnp.pi
        xy = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        local = jnp.stack([jnp.cos(phi) * xy, jnp.sin(phi) * xy, z])
        t, b = tangent_frame(env.cap_dir)
        d = frame_to_world(t, b, env.cap_dir, local)
        pdf = 1.0 / (2 * jnp.pi * jnp.maximum(1.0 - env.cap_cos, 1e-6))
        return d, pdf, jnp.bool_(True)
    # 2D CDF inversion (Distribution2D analog)
    H, W = env.img.shape[0], env.img.shape[1]
    row = jnp.searchsorted(env.marg_cdf, u1, side="left")
    row = jnp.clip(row, 0, H - 1)
    col = jnp.searchsorted(env.cond_cdf[row], u2, side="left")
    col = jnp.clip(col, 0, W - 1)
    # pdf over (u,v): marginal * conditional, each normalized per texel
    m_lo = jnp.where(row > 0, env.marg_cdf[jnp.maximum(row - 1, 0)], 0.0)
    c_lo = jnp.where(col > 0, env.cond_cdf[row, jnp.maximum(col - 1, 0)], 0.0)
    p_uv = (env.marg_cdf[row] - m_lo) * H * (env.cond_cdf[row, col] - c_lo) * W
    u = (col.astype(jnp.float32) + 0.5) / W
    v = (row.astype(jnp.float32) + 0.5) / H
    d, st = _uv_to_dir(env, u, v)
    pdf = p_uv / jnp.maximum(2 * jnp.pi * jnp.pi * st, 1e-8)
    return d, pdf, pdf > 0


def env_pdf(env: EnvLight, d):
    """Solid-angle pdf of env_sample having produced direction d
    (InfiniteSphere::directPdf analog)."""
    if env.kind == ENV_CONST:
        inside = dot(d[None], env.cap_dir[None])[0] >= env.cap_cos
        pdf = 1.0 / (2 * jnp.pi * jnp.maximum(1.0 - env.cap_cos, 1e-6))
        return jnp.where(inside, pdf, 0.0)
    u, v, st = _dir_to_uv(env, d)
    H, W = env.img.shape[0], env.img.shape[1]
    x = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
    m_lo = jnp.where(y > 0, env.marg_cdf[jnp.maximum(y - 1, 0)], 0.0)
    c_lo = jnp.where(x > 0, env.cond_cdf[y, jnp.maximum(x - 1, 0)], 0.0)
    p_uv = (env.marg_cdf[y] - m_lo) * H * (env.cond_cdf[y, x] - c_lo) * W
    return p_uv / jnp.maximum(2 * jnp.pi * jnp.pi * st, 1e-8)


# ---------------------------------------------------------------------------
# Skydome: Preetham sky baked to a lat-long map (Skydome.cpp analog; the
# reference links the `skylight` thirdparty for its sky model)
# ---------------------------------------------------------------------------

def _perez(theta, gamma, c):
    return ((1.0 + c[0] * np.exp(c[1] / np.maximum(np.cos(theta), 0.01)))
            * (1.0 + c[2] * np.exp(c[3] * gamma)
               + c[4] * np.cos(gamma) ** 2))


def bake_preetham_sky(sun_dir, turbidity=3.0, res=(128, 256),
                      intensity=2.0, gamma_scale=1.0, temperature=5777.0):
    """Preetham analytic sky -> linear RGB lat-long [H,W,3].

    `temperature` is the sun's blackbody temperature (Skydome.cpp:29,
    passed to the Hosek alienworld state in the reference,
    Skydome.cpp:302-303): the sky is tinted by the blackbody color at T
    relative to the 5777 K solar default, via utils/spectral.py's analytic
    CIE integration."""
    sun = np.asarray(sun_dir, np.float64)
    sun = sun / np.linalg.norm(sun)
    theta_s = np.arccos(np.clip(sun[1], -1, 1))
    T = turbidity

    # Preetham luminance/chromaticity coefficient tables
    cY = [0.1787 * T - 1.4630, -0.3554 * T + 0.4275, -0.0227 * T + 5.3251,
          0.1206 * T - 2.5771, -0.0670 * T + 0.3703]
    cx = [-0.0193 * T - 0.2592, -0.0665 * T + 0.0008, -0.0004 * T + 0.2125,
          -0.0641 * T - 0.8989, -0.0033 * T + 0.0452]
    cy = [-0.0167 * T - 0.2608, -0.0950 * T + 0.0092, -0.0079 * T + 0.2102,
          -0.0441 * T - 1.6537, -0.0109 * T + 0.0529]

    chi = (4.0 / 9.0 - T / 120.0) * (np.pi - 2 * theta_s)
    Yz = (4.0453 * T - 4.9710) * np.tan(chi) - 0.2155 * T + 2.4192
    t2, t3 = theta_s ** 2, theta_s ** 3
    xz = ((0.00166 * t3 - 0.00375 * t2 + 0.00209 * theta_s) * T * T
          + (-0.02903 * t3 + 0.06377 * t2 - 0.03202 * theta_s + 0.00394) * T
          + (0.11693 * t3 - 0.21196 * t2 + 0.06052 * theta_s + 0.25886))
    yz = ((0.00275 * t3 - 0.00610 * t2 + 0.00317 * theta_s) * T * T
          + (-0.04214 * t3 + 0.08970 * t2 - 0.04153 * theta_s + 0.00516) * T
          + (0.15346 * t3 - 0.26756 * t2 + 0.06670 * theta_s + 0.26688))

    H, W = res
    v = (np.arange(H) + 0.5) / H * np.pi
    u = ((np.arange(W) + 0.5) / W - 0.5) * 2 * np.pi
    theta = v[:, None] * np.ones((1, W))
    st = np.sin(theta)
    d = np.stack([np.cos(u)[None, :] * st, -np.cos(theta) * np.ones((H, W)),
                  np.sin(u)[None, :] * st], -1)
    cos_g = np.clip(d @ sun, -1, 1)
    gamma = np.arccos(cos_g) * gamma_scale
    # lat-long row 0 points DOWN (v = acos(-y)/pi); zenith angle from up
    zen = np.pi - theta
    th = np.minimum(zen, np.pi / 2 - 1e-3)  # clamp below horizon

    def F(c, z):
        return _perez(th, gamma, c) / _perez(np.zeros_like(th),
                                             np.full_like(th, z), c)

    Y = Yz * F(cY, theta_s)
    x = xz * F(cx, theta_s)
    y = yz * F(cy, theta_s)
    # xyY -> XYZ -> linear sRGB
    Y = np.maximum(Y, 0.0) * 0.035 * intensity
    X = x / np.maximum(y, 1e-4) * Y
    Z = (1 - x - y) / np.maximum(y, 1e-4) * Y
    r = 3.2406 * X - 1.5372 * Y - 0.4986 * Z
    g = -0.9689 * X + 1.8758 * Y + 0.0415 * Z
    b = 0.0557 * X - 0.2040 * Y + 1.0570 * Z
    img = np.clip(np.stack([r, g, b], -1), 0.0, None)
    img[zen > np.pi / 2] *= 0.0  # ground half
    if abs(temperature - 5777.0) > 1.0:
        from ..utils.spectral import blackbody_rgb
        tint = (np.asarray(blackbody_rgb(float(temperature)))
                / np.maximum(np.asarray(blackbody_rgb(5777.0)), 1e-6))
        img = img * tint[None, None, :]
    return img.astype(np.float32)

"""Cameras: pinhole + thinlens (src/core/cameras/{Pinhole,Thinlens}Camera.cpp).

A camera generates one ray per (pixel, sample); the film is a plain [H,W,3]
accumulation (one sample per pixel per pass — no atomics needed, unlike the
reference's CAS framebuffer, cameras/AtomicFramebuffer.hpp:26-31).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..utils.pytree import static_field, struct
from ..utils.vecmath import normalize


@struct(meta=("res_x", "res_y", "kind"))
class Camera:
    transform: jnp.ndarray  # (4,4) camera-to-world
    fov_deg: jnp.ndarray
    aperture: jnp.ndarray  # thinlens only
    focus_dist: jnp.ndarray
    res_x: int = static_field(default=512)
    res_y: int = static_field(default=512)
    kind: str = static_field(default="pinhole")

    @staticmethod
    def create(transform=None, fov_deg=60.0, res=(512, 512), kind="pinhole",
               aperture=0.0, focus_dist=1.0):
        tf = np.eye(4, dtype=np.float32) if transform is None else np.asarray(
            transform, np.float32)
        return Camera(transform=jnp.asarray(tf), fov_deg=jnp.float32(fov_deg),
                      aperture=jnp.float32(aperture),
                      focus_dist=jnp.float32(focus_dist),
                      res_x=int(res[0]), res_y=int(res[1]), kind=kind)

    @property
    def pos(self):
        return self.transform[:3, 3]

    def sample_ray(self, px, py, u_filter, u_lens=None):
        """Ray for pixel (px, py) with sub-pixel jitter u_filter [2] in [0,1)
        (PinholeCamera::sampleDirection, PinholeCamera.cpp:70-86; box filter)."""
        plane_dist = 1.0 / jnp.tan(jnp.deg2rad(self.fov_deg) * 0.5)
        ratio = self.res_y / self.res_x
        pixel_size = 1.0 / self.res_x
        uv = u_filter - 0.5
        local_d = jnp.stack([
            -1.0 + (px.astype(jnp.float32) + 0.5 + uv[..., 0]) * 2.0 * pixel_size,
            ratio - (py.astype(jnp.float32) + 0.5 + uv[..., 1]) * 2.0 * pixel_size,
            jnp.broadcast_to(plane_dist, px.shape).astype(jnp.float32),
        ], axis=-1)
        local_d = normalize(local_d)
        if self.kind == "thinlens" and u_lens is not None:
            # ThinlensCamera: offset origin on the aperture disk, refocus
            r = jnp.sqrt(u_lens[..., 0]) * self.aperture
            phi = u_lens[..., 1] * 2.0 * jnp.pi
            lens = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                              jnp.zeros_like(r)], axis=-1)
            focus_p = local_d * (self.focus_dist / local_d[..., 2:3])
            local_d = normalize(focus_p - lens)
            ro_local = lens
        else:
            ro_local = jnp.zeros_like(local_d)
        rd = jnp.einsum("ij,...j->...i", self.transform[:3, :3], local_d)
        ro = (jnp.einsum("ij,...j->...i", self.transform[:3, :3], ro_local)
              + self.transform[:3, 3])
        return ro, rd

"""Cameras: pinhole / thinlens / equirectangular / cubemap
(src/core/cameras/{Pinhole,Thinlens,Equirectangular,Cubemap}Camera.cpp)
with box/tent/gaussian reconstruction filters (cameras/ReconstructionFilter).

A camera generates one ray per (pixel, sample); the film is a plain [H,W,3]
accumulation (one sample per pixel per pass — no atomics needed, unlike the
reference's CAS framebuffer, cameras/AtomicFramebuffer.hpp:26-31).  Filters
are applied by warping the sub-pixel jitter through the filter's inverse CDF
(sample-placement filtering, equivalent in expectation to splat filtering
for these separable kernels).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..utils.pytree import static_field, struct
from ..utils.vecmath import normalize

FILTER_BOX = "box"
FILTER_TENT = "tent"
FILTER_GAUSSIAN = "gaussian"
_FILTERS = (FILTER_BOX, FILTER_TENT, FILTER_GAUSSIAN)


def _filter_warp(u, kind):
    """Map u in [0,1) to a filter-distributed sub-pixel offset."""
    if kind == FILTER_TENT:
        # inverse CDF of the tent on [-1, 1]
        return jnp.where(u < 0.5, jnp.sqrt(2.0 * u) - 1.0,
                         1.0 - jnp.sqrt(jnp.maximum(2.0 * (1.0 - u), 0.0)))
    if kind == FILTER_GAUSSIAN:
        # truncated gaussian (sigma ~ 0.5 px, clipped to ±1.5)
        t = jnp.clip(u, 1e-6, 1.0 - 1e-6)
        from jax.scipy.special import erfinv
        return jnp.clip(0.5 * math.sqrt(2.0) * erfinv(2.0 * t - 1.0),
                        -1.5, 1.5)
    return u - 0.5


_FILTER_SUPPORT = {FILTER_BOX: 0.5, FILTER_TENT: 1.0, FILTER_GAUSSIAN: 1.5}


def _filter_unwarp(uv, kind):
    """Inverse of _filter_warp: sub-pixel offset -> uniform u in [0,1)
    (exact on offsets within the filter's support — box 0.5, tent 1,
    truncated gaussian 1.5 px)."""
    if kind == FILTER_TENT:
        u = jnp.where(uv < 0.0, 0.5 * (uv + 1.0) ** 2,
                      1.0 - 0.5 * (1.0 - uv) ** 2)
    elif kind == FILTER_GAUSSIAN:
        from jax.scipy.special import erf
        u = 0.5 * (1.0 + erf(uv / (0.5 * math.sqrt(2.0))))
    else:
        u = uv + 0.5
    return jnp.clip(u, 0.0, 1.0 - 1e-6)


@struct(meta=("res_x", "res_y", "kind", "filter_kind"))
class Camera:
    transform: jnp.ndarray  # (4,4) camera-to-world
    fov_deg: jnp.ndarray
    aperture: jnp.ndarray  # thinlens only
    focus_dist: jnp.ndarray
    res_x: int = static_field(default=512)
    res_y: int = static_field(default=512)
    kind: str = static_field(default="pinhole")
    filter_kind: str = static_field(default=FILTER_BOX)

    @staticmethod
    def create(transform=None, fov_deg=60.0, res=(512, 512), kind="pinhole",
               aperture=0.0, focus_dist=1.0, filter_kind=FILTER_BOX):
        tf = np.eye(4, dtype=np.float32) if transform is None else np.asarray(
            transform, np.float32)
        if filter_kind not in _FILTERS:
            filter_kind = FILTER_BOX
        return Camera(transform=jnp.asarray(tf), fov_deg=jnp.float32(fov_deg),
                      aperture=jnp.float32(aperture),
                      focus_dist=jnp.float32(focus_dist),
                      res_x=int(res[0]), res_y=int(res[1]), kind=kind,
                      filter_kind=filter_kind)

    @property
    def pos(self):
        return self.transform[:3, 3]

    def connect(self, p):
        """Inverse projection for light-emitting integrators (the analog of
        Camera::sampleDirect / evalDirection, cameras/PinholeCamera.cpp).

        Given world points p [..., 3], returns a dict with
          px, py   int32 pixel indices,
          dir      unit direction p -> camera,
          dist     |p - camera|,
          we       pinhole importance  d_plane^2 / (A_pixel * cos^3 theta)
                   such that  integral(we dOmega) over one pixel's solid
                   angle = 1; a light-vertex splat is
                   beta * f * we / dist^2 (f includes the vertex cosine),
          valid    in front of the camera and inside the frame.

        Thinlens is treated as a pinhole at the lens center (exact when
        aperture -> 0); equirect/cubemap cameras are not supported for
        light tracing."""
        cam_pos = self.transform[:3, 3]
        to_cam = cam_pos - p
        dist = jnp.sqrt(jnp.maximum(jnp.sum(to_cam * to_cam, -1), 1e-12))
        d = to_cam / dist[..., None]
        # world -> camera-local (rotation is orthonormal)
        local = jnp.einsum("ji,...j->...i", self.transform[:3, :3], p - cam_pos,
                           precision="highest")
        z = local[..., 2]
        valid = z > 1e-5
        z_safe = jnp.where(valid, z, 1.0)
        plane_dist = 1.0 / jnp.tan(jnp.deg2rad(self.fov_deg) * 0.5)
        xp = local[..., 0] / z_safe * plane_dist
        yp = local[..., 1] / z_safe * plane_dist
        ratio = self.res_y / self.res_x
        pxf = (xp + 1.0) * (self.res_x * 0.5)
        pyf = (ratio - yp) * (self.res_x * 0.5)
        px = jnp.floor(pxf).astype(jnp.int32)
        py = jnp.floor(pyf).astype(jnp.int32)
        valid = valid & (px >= 0) & (px < self.res_x) \
            & (py >= 0) & (py < self.res_y)
        cos_t = z_safe / dist
        a_pix = (2.0 / self.res_x) ** 2
        we = plane_dist * plane_dist \
            / (a_pix * jnp.maximum(cos_t, 1e-6) ** 3)
        return {"px": jnp.clip(px, 0, self.res_x - 1),
                "py": jnp.clip(py, 0, self.res_y - 1),
                "dir": d, "dist": dist, "we": we, "valid": valid}

    def dir_pdf(self, w):
        """Solid-angle pdf of emitting direction w from the lens
        (PinholeCamera::sampleDirection pdf = _invPlaneArea / cos^3;
        thinlens treated as pinhole at the lens center).  w [...,3] world."""
        local = jnp.einsum("ji,...j->...i", self.transform[:3, :3], w,
                           precision="highest")
        cz = local[..., 2]
        plane_dist = 1.0 / jnp.tan(jnp.deg2rad(self.fov_deg) * 0.5)
        ratio = self.res_y / self.res_x
        inv_plane_area = 1.0 / ((2.0 / plane_dist)
                                * (2.0 * ratio / plane_dist))
        return jnp.where(cz > 1e-6,
                         inv_plane_area / jnp.maximum(cz, 1e-6) ** 3, 0.0)

    def invert_ray(self, rd):
        """(px, py, u_filter[2], ok): pixel + sub-pixel jitter such that
        sample_ray(px, py, u_filter) emits direction rd (ReversibleJumpMLT
        camera-root inversion; PathVertex::invertRootVertex camera branch).
        Pinhole with any reconstruction filter (box/tent/gaussian, via the
        same-pixel preimage of the filter warp); equirect/cubemap return
        ok=False, thinlens goes through invert_ray_lens."""
        local = jnp.einsum("ji,...j->...i", self.transform[:3, :3], rd,
                           precision="highest")
        lz = local[..., 2]
        ok = lz > 1e-6
        lz_safe = jnp.where(ok, lz, 1.0)
        plane_dist = 1.0 / jnp.tan(jnp.deg2rad(self.fov_deg) * 0.5)
        ratio = self.res_y / self.res_x
        xp = local[..., 0] / lz_safe * plane_dist
        yp = local[..., 1] / lz_safe * plane_dist
        pxf = (xp + 1.0) * (self.res_x * 0.5)
        pyf = (ratio - yp) * (self.res_x * 0.5)
        px, py, uf, ok_f = self._invert_plane(pxf, pyf)
        ok = ok & ok_f
        if self.kind != "pinhole":
            ok = ok & False
        return px, py, uf, ok

    def _invert_plane(self, pxf, pyf):
        """Nearest-pixel preimage of a continuous image-plane position under
        the reconstruction filter: a wide filter lets edge pixels place
        samples slightly off-frame, so the preimage clamps into the frame
        and accepts any offset within the filter's support."""
        sup = _FILTER_SUPPORT[self.filter_kind] + 1e-4
        px = jnp.clip(jnp.floor(pxf).astype(jnp.int32), 0, self.res_x - 1)
        py = jnp.clip(jnp.floor(pyf).astype(jnp.int32), 0, self.res_y - 1)
        ux = pxf - px.astype(jnp.float32) - 0.5
        uy = pyf - py.astype(jnp.float32) - 0.5
        ok = (jnp.abs(ux) <= sup) & (jnp.abs(uy) <= sup)
        uf = jnp.stack([_filter_unwarp(ux, self.filter_kind),
                        _filter_unwarp(uy, self.filter_kind)], axis=-1)
        return px, py, jnp.clip(uf, 0.0, 1.0 - 1e-6), ok

    def invert_ray_lens(self, ro, rd):
        """Thinlens inversion: (px, py, u_filter[2], u_lens[2], ok) such
        that sample_ray(px, py, u_filter, u_lens) emits (ro, rd)
        (ThinlensCamera.cpp evalDirection / the lens branch of
        invertRootVertex).  Pinhole falls back to invert_ray with
        u_lens = 0."""
        if self.kind != "thinlens":
            px, py, uf, ok = self.invert_ray(rd)
            return px, py, uf, jnp.zeros_like(uf), ok
        R = self.transform[:3, :3]
        lens = jnp.einsum("ji,...j->...i", R, ro - self.transform[:3, 3],
                          precision="highest")
        r = jnp.sqrt(lens[..., 0] ** 2 + lens[..., 1] ** 2)
        ok = (r <= self.aperture * (1.0 + 1e-4)) \
            & (jnp.abs(lens[..., 2]) < 1e-4)
        u0 = jnp.clip((r / jnp.maximum(self.aperture, 1e-12)) ** 2,
                      0.0, 1.0 - 1e-6)
        phi = jnp.arctan2(lens[..., 1], lens[..., 0])
        u1 = jnp.mod(phi / (2.0 * jnp.pi), 1.0)
        u_lens = jnp.stack([u0, u1], axis=-1)
        # focal-plane point hit by (lens, rd): its pre-lens direction from
        # the lens center recovers the image-plane position
        local_d = jnp.einsum("ji,...j->...i", R, rd, precision="highest")
        dz = local_d[..., 2]
        ok = ok & (dz > 1e-6)
        dz_safe = jnp.where(dz > 1e-6, dz, 1.0)
        focus_p = lens + local_d * (self.focus_dist
                                    - lens[..., 2:3]) / dz_safe[..., None]
        plane_dist = 1.0 / jnp.tan(jnp.deg2rad(self.fov_deg) * 0.5)
        ratio = self.res_y / self.res_x
        xp = focus_p[..., 0] / self.focus_dist * plane_dist
        yp = focus_p[..., 1] / self.focus_dist * plane_dist
        pxf = (xp + 1.0) * (self.res_x * 0.5)
        pyf = (ratio - yp) * (self.res_x * 0.5)
        px, py, uf, ok_f = self._invert_plane(pxf, pyf)
        return px, py, uf, u_lens, ok & ok_f

    def sample_ray(self, px, py, u_filter, u_lens=None):
        """Ray for pixel (px, py) with sub-pixel jitter u_filter [2] in [0,1)
        (PinholeCamera::sampleDirection, PinholeCamera.cpp:70-86)."""
        if self.kind == "equirectangular":
            # EquirectangularCamera: full lat-long sphere
            u = (px.astype(jnp.float32) + u_filter[..., 0]) / self.res_x
            v = (py.astype(jnp.float32) + u_filter[..., 1]) / self.res_y
            phi = (u - 0.5) * 2.0 * jnp.pi
            theta = v * jnp.pi
            st = jnp.sin(theta)
            local_d = jnp.stack([jnp.cos(phi) * st, -jnp.cos(theta),
                                 jnp.sin(phi) * st], axis=-1)
            rd = jnp.einsum("ij,...j->...i", self.transform[:3, :3], local_d, precision="highest")
            ro = jnp.broadcast_to(self.transform[:3, 3], rd.shape)
            return ro, rd
        if self.kind == "cubemap":
            # CubemapCamera: 6 faces in a horizontal strip [6W' x H]
            fw = self.res_x // 6
            face = jnp.clip(px // fw, 0, 5)
            fx = (px - face * fw).astype(jnp.float32)
            a = (fx + u_filter[..., 0]) / fw * 2.0 - 1.0
            b = 1.0 - (py.astype(jnp.float32) + u_filter[..., 1]) \
                / self.res_y * 2.0
            one = jnp.ones_like(a)
            dirs = jnp.stack([
                jnp.stack([one, b, -a], -1),    # +x
                jnp.stack([-one, b, a], -1),    # -x
                jnp.stack([a, one, -b], -1),    # +y
                jnp.stack([a, -one, b], -1),    # -y
                jnp.stack([a, b, one], -1),     # +z
                jnp.stack([-a, b, -one], -1),   # -z
            ], axis=0)
            local_d = normalize(jnp.take_along_axis(
                dirs, face[None, ..., None].astype(jnp.int32), axis=0)[0])
            rd = jnp.einsum("ij,...j->...i", self.transform[:3, :3], local_d, precision="highest")
            ro = jnp.broadcast_to(self.transform[:3, 3], rd.shape)
            return ro, rd

        plane_dist = 1.0 / jnp.tan(jnp.deg2rad(self.fov_deg) * 0.5)
        ratio = self.res_y / self.res_x
        pixel_size = 1.0 / self.res_x
        uv = jnp.stack([_filter_warp(u_filter[..., 0], self.filter_kind),
                        _filter_warp(u_filter[..., 1], self.filter_kind)],
                       axis=-1)
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
        rd = jnp.einsum("ij,...j->...i", self.transform[:3, :3], local_d, precision="highest")
        ro = (jnp.einsum("ij,...j->...i", self.transform[:3, :3], ro_local, precision="highest")
              + self.transform[:3, 3])
        return ro, rd

"""Offline NL-means / joint-feature denoiser.

TPU-native re-design of the reference's denoiser tool (src/denoiser/
Denoiser.cpp, nlmeans/*): non-local means over the color buffer with
per-pixel variance modulation, plus first-order feature regression against
the AOV buffers (normal/albedo/depth) when available.  The whole filter is
one jitted window-scan over shifted images (no per-pixel scalar loops).

Usage:
    python -m tungsten_tpu.tools.denoiser in.pfm out.pfm \
        [--normal n.pfm --albedo a.pfm --depth d.pfm --variance v.pfm] \
        [--radius 7 --patch 1 --k 0.45]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def _shift(img, dy, dx):
    """Shift with edge clamp (same spatial shape).  dy/dx are python ints
    (trace-time constants); edge padding instead of wrap keeps NL-means
    candidate patches from mixing opposite image borders."""
    H, W = img.shape[0], img.shape[1]
    r = max(abs(dy), abs(dx))
    if r == 0:
        return img
    pad = [(r, r), (r, r)] + [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pad, mode="edge")
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(p, r + dy, H, axis=0), r + dx, W,
        axis=1)


def _box(img, r):
    """Separable box filter of half-width r over H,W (leading dims kept)."""
    k = 2 * r + 1
    c = jnp.cumsum(jnp.pad(img, [(r + 1, r)] + [(0, 0)] * (img.ndim - 1),
                           mode="edge"), axis=0)
    img = (c[k:] - c[:-k]) / k
    c = jnp.cumsum(jnp.pad(img, [(0, 0), (r + 1, r)]
                           + [(0, 0)] * (img.ndim - 2), mode="edge"), axis=1)
    return (c[:, k:] - c[:, :-k]) / k


def nl_means(color, variance=None, normal=None, albedo=None, depth=None,
             radius=7, patch=1, k=0.45, feature_k=0.6):
    """Joint NL-means.  color [H,W,3]; optional variance [H,W,(3)],
    normal/albedo [H,W,3], depth [H,W].  Returns filtered [H,W,3].

    Weight for offset (dy,dx):
      w = exp(-max(d2_patch, 0)) * prod_f exp(-d2_feature)
    with the variance-modulated patch distance of Rousselle et al. (the
    reference's nlmeans formulation): d2 = ((u-v)^2 - (Vu+min(Vu,Vv)))
                                           / (eps + k^2 (Vu+Vv)).
    """
    color = jnp.asarray(color, jnp.float32)
    H, W, _ = color.shape
    var = (jnp.zeros((H, W, 3), jnp.float32) if variance is None
           else jnp.broadcast_to(
               jnp.asarray(variance, jnp.float32).reshape(H, W, -1),
               (H, W, 3)))
    feats = []
    if normal is not None:
        feats.append((jnp.asarray(normal, jnp.float32), feature_k))
    if albedo is not None:
        feats.append((jnp.asarray(albedo, jnp.float32), feature_k))
    if depth is not None:
        d = jnp.asarray(depth, jnp.float32).reshape(H, W, 1)
        d = d / jnp.maximum(jnp.max(d), 1e-6)
        feats.append((d, feature_k))

    offs = [(dy, dx) for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)]

    def weight_one(dy, dx):
        cs = _shift(color, dy, dx)
        vs = _shift(var, dy, dx)
        d2 = ((color - cs) ** 2 - (var + jnp.minimum(var, vs))) \
            / (1e-4 + k * k * (var + vs))
        d2 = jnp.mean(_box(jnp.maximum(d2, 0.0), patch), axis=-1)
        w = jnp.exp(-d2)
        for f, fk in feats:
            fd2 = jnp.sum((f - _shift(f, dy, dx)) ** 2, axis=-1) / (fk * fk)
            w = w * jnp.exp(-jnp.minimum(fd2, 30.0))
        return w

    @jax.jit
    def run():
        acc = jnp.zeros_like(color)
        wsum = jnp.zeros((H, W), jnp.float32)
        for dy, dx in offs:
            w = weight_one(dy, dx)
            acc = acc + w[..., None] * _shift(color, dy, dx)
            wsum = wsum + w
        return acc / jnp.maximum(wsum, 1e-8)[..., None]

    return np.asarray(run())


def main(argv=None):
    from ..io.image import read_pfm, write_pfm, write_png
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--normal")
    ap.add_argument("--albedo")
    ap.add_argument("--depth")
    ap.add_argument("--variance")
    ap.add_argument("--radius", type=int, default=7)
    ap.add_argument("--patch", type=int, default=1)
    ap.add_argument("--k", type=float, default=0.45)
    args = ap.parse_args(argv)
    ld = lambda p: None if p is None else read_pfm(p)
    out = nl_means(read_pfm(args.input), variance=ld(args.variance),
                   normal=ld(args.normal), albedo=ld(args.albedo),
                   depth=(None if args.depth is None
                          else read_pfm(args.depth)[..., 0]),
                   radius=args.radius, patch=args.patch, k=args.k)
    if args.output.endswith(".png"):
        write_png(args.output, out)
    else:
        write_pfm(args.output, out)


if __name__ == "__main__":
    main()

"""Texture system: constant / bitmap / checker (+ disk, blade) lookups.

Re-design of src/core/textures/ (ConstantTexture, BitmapTexture,
CheckerTexture, DiskTexture, BladeTexture) for static-shape TPU execution:
every texture in the scene is baked at load time into ONE padded atlas
[N, H, W, 3] (constants/procedurals become tiny rasters only when a bitmap
exists; otherwise lookups stay closed-form).  Lookup is bilinear with wrap
addressing, matching BitmapTexture's default sampling.

LDR bitmaps are converted sRGB->linear like the reference ImageIO
(src/core/io/ImageIO.cpp); HDR inputs (.pfm, .hdr) stay linear.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..utils.pytree import static_field, struct

TEX_CONST = 0
TEX_BITMAP = 1
TEX_CHECKER = 2
TEX_DISK = 3
TEX_BLADE = 4


def _srgb_to_linear(x):
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def read_hdr(path):
    """Minimal Radiance RGBE (.hdr) reader (RLE + flat scanlines)."""
    with open(path, "rb") as f:
        raw = f.read()
    # header ends at empty line; next line is resolution
    pos = raw.find(b"\n\n")
    if pos < 0:
        raise ValueError("bad hdr header")
    res_end = raw.find(b"\n", pos + 2)
    res = raw[pos + 2:res_end].split()
    if res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"unsupported hdr orientation {res}")
    H, W = int(res[1]), int(res[3])
    data = np.frombuffer(raw[res_end + 1:], np.uint8)
    out = np.zeros((H, W, 4), np.uint8)
    off = 0
    for y in range(H):
        if (data[off] == 2 and data[off + 1] == 2
                and (int(data[off + 2]) << 8 | int(data[off + 3])) == W):
            off += 4
            for c in range(4):
                x = 0
                while x < W:
                    n = int(data[off]); off += 1
                    if n > 128:
                        out[y, x:x + n - 128, c] = data[off]
                        off += 1
                        x += n - 128
                    else:
                        out[y, x:x + n, c] = data[off:off + n]
                        off += n
                        x += n
        else:  # flat
            row = data[off:off + 4 * W].reshape(W, 4)
            out[y] = row
            off += 4 * W
    rgbe = out.astype(np.float32)
    e = np.ldexp(1.0, out[:, :, 3].astype(np.int32) - 136)
    rgb = rgbe[:, :, :3] * e[:, :, None]
    rgb[out[:, :, 3] == 0] = 0.0
    return rgb.astype(np.float32)


def load_bitmap(path):
    """Returns linear float32 [H,W,3]."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".pfm":
        from ..io.image import read_pfm
        img = read_pfm(path)
        return np.asarray(img, np.float32)
    if ext == ".hdr":
        return read_hdr(path)
    if ext == ".exr":
        from ..io.exr import read_exr
        img = read_exr(path)
        if img.shape[-1] >= 3:
            return np.ascontiguousarray(img[..., :3], np.float32)
        return np.repeat(img[..., :1], 3, axis=-1).astype(np.float32)
    from PIL import Image
    im = Image.open(path).convert("RGB")
    arr = np.asarray(im, np.float32) / 255.0
    return _srgb_to_linear(arr).astype(np.float32)


@struct(meta=("n_tex", "has_bitmaps"))
class TexTable:
    """All scene textures.  kind[N]; const value / checker params in
    params[N, 8]; bitmaps in one padded atlas."""
    kind: jnp.ndarray     # [N]
    value: jnp.ndarray    # [N,3]  constant / checker on-color
    value2: jnp.ndarray   # [N,3]  checker off-color
    params: jnp.ndarray   # [N,4]  checker res_u,res_v | blade angle etc.
    atlas: jnp.ndarray    # [N,H,W,3] (H=W=1 when no bitmaps)
    size: jnp.ndarray     # [N,2] (h,w) of the valid region
    n_tex: int = static_field(default=0)
    has_bitmaps: bool = static_field(default=False)


def build_tex_table(texs: list[dict]) -> TexTable:
    """texs: parsed texture dicts: {kind, value, value2, params, bitmap}."""
    N = max(len(texs), 1)
    kind = np.zeros(N, np.int32)
    value = np.ones((N, 3), np.float32)
    value2 = np.zeros((N, 3), np.float32)
    params = np.zeros((N, 4), np.float32)
    params[:, :2] = 20.0  # checker default res (CheckerTexture default)
    bitmaps = []
    for i, t in enumerate(texs):
        kind[i] = t.get("kind", TEX_CONST)
        value[i] = t.get("value", (1.0, 1.0, 1.0))
        value2[i] = t.get("value2", (0.0, 0.0, 0.0))
        params[i] = t.get("params", (20.0, 20.0, 0.0, 0.0))
        if t.get("bitmap") is not None:
            bitmaps.append((i, np.asarray(t["bitmap"], np.float32)))
    has_bitmaps = len(bitmaps) > 0
    if has_bitmaps:
        Hm = max(b.shape[0] for _, b in bitmaps)
        Wm = max(b.shape[1] for _, b in bitmaps)
        atlas = np.zeros((N, Hm, Wm, 3), np.float32)
        size = np.ones((N, 2), np.int32)
        for i, b in bitmaps:
            atlas[i, :b.shape[0], :b.shape[1]] = b
            size[i] = (b.shape[0], b.shape[1])
    else:
        atlas = np.zeros((N, 1, 1, 3), np.float32)
        size = np.ones((N, 2), np.int32)
    return TexTable(kind=jnp.asarray(kind), value=jnp.asarray(value),
                    value2=jnp.asarray(value2), params=jnp.asarray(params),
                    atlas=jnp.asarray(atlas), size=jnp.asarray(size),
                    n_tex=N, has_bitmaps=has_bitmaps)


def default_table() -> TexTable:
    return build_tex_table([])


def _bilinear(img, h, w, u, v):
    """Wrap-addressed bilinear fetch from img[:h,:w]."""
    x = u * w.astype(jnp.float32) - 0.5
    y = v * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx, fy = x - x0, y - y0

    def at(yy, xx):
        yy = jnp.mod(yy, h)
        xx = jnp.mod(xx, w)
        return img[yy, xx]

    a = at(y0, x0) * (1 - fx) + at(y0, x0 + 1) * fx
    b = at(y0 + 1, x0) * (1 - fx) + at(y0 + 1, x0 + 1) * fx
    return a * (1 - fy) + b * fy


def tex_lookup(table: TexTable, ti, uv):
    """Evaluate texture `ti` at uv [2] -> rgb [3].  ti < 0 -> ones."""
    i = jnp.maximum(ti, 0)
    k = table.kind[i]
    rgb = table.value[i]
    # checker (CheckerTexture::operator[])
    ru, rv = table.params[i, 0], table.params[i, 1]
    cu = (uv[0] * ru).astype(jnp.int32)
    cv = (uv[1] * rv).astype(jnp.int32)
    on = (cu ^ cv) & 1
    checker = jnp.where(on == 1, table.value[i], table.value2[i])
    rgb = jnp.where(k == TEX_CHECKER, checker, rgb)
    # disk (DiskTexture: unit disk at uv center)
    r2 = (uv[0] - 0.5) ** 2 + (uv[1] - 0.5) ** 2
    rgb = jnp.where(k == TEX_DISK,
                    jnp.where(r2 <= 0.25, table.value[i], 0.0), rgb)
    if table.has_bitmaps:
        h, w = table.size[i, 0], table.size[i, 1]
        bm = _bilinear(table.atlas[i], h, w,
                       jnp.mod(uv[0], 1.0), jnp.mod(uv[1], 1.0))
        rgb = jnp.where(k == TEX_BITMAP, bm, rgb)
    return jnp.where(ti < 0, jnp.ones(3), rgb)

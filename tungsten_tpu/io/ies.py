"""IESNA LM-63 photometry parser + equirect bake.

Re-design of textures/IesTexture.cpp: the reference parses an .ies file and
bakes the candela distribution into a lat-long bitmap (resolution field,
IesTexture.hpp:11), including the horizontal-angle symmetry unwrapping
(wrapHorzAngles, IesTexture.cpp:45-75).  Same approach here, baked with
numpy at load time; the result plugs in wherever a bitmap does (environment
emitters, light emission scale).
"""
from __future__ import annotations

import numpy as np


def parse_ies(path):
    """Returns dict(vert_angles [V] deg, horz_angles [H] deg,
    candela [H, V], lumens, multiplier)."""
    with open(path, "r", errors="replace") as f:
        text = f.read()
    lines = text.splitlines()
    i = 0
    while i < len(lines) and not lines[i].upper().startswith("TILT="):
        i += 1
    if i == len(lines):
        raise ValueError(f"{path}: no TILT= line — not an IES file")
    tilt = lines[i].split("=", 1)[1].strip().upper()
    i += 1
    nums = []
    if tilt == "INCLUDE":
        # <lamp-to-luminaire> <#pairs> <angles...> <factors...>
        flat = " ".join(lines[i:]).split()
        n_pairs = int(float(flat[1]))
        skip = 2 + 2 * n_pairs
        nums = [float(v) for v in flat[skip:]]
    else:
        nums = [float(v) for v in " ".join(lines[i:]).split()]
    (n_lamps, lumens, mult, n_v, n_h, _ptype, _units,
     _w, _l, _h) = nums[:10]
    n_v, n_h = int(n_v), int(n_h)
    vals = nums[13:]
    vert = np.asarray(vals[:n_v], np.float32)
    horz = np.asarray(vals[n_v:n_v + n_h], np.float32)
    cd = np.asarray(vals[n_v + n_h:n_v + n_h + n_v * n_h],
                    np.float32).reshape(n_h, n_v)
    return dict(vert_angles=vert, horz_angles=horz, candela=cd,
                lumens=lumens, multiplier=mult)


def _unwrap_horz(horz, cd):
    """Expand photometric symmetries to the full [0, 360] range
    (IesTexture.cpp wrapHorzAngles)."""
    last = float(horz[-1])
    if horz.size == 1 or last == 0.0:
        return (np.asarray([0.0, 360.0], np.float32),
                np.vstack([cd[0], cd[0]]))
    if last == 90.0:
        h2 = np.concatenate([horz, 180.0 - horz[-2::-1]])
        c2 = np.vstack([cd, cd[-2::-1]])
        horz, cd = h2, c2
        last = 180.0
    if last == 180.0:
        h2 = np.concatenate([horz, 360.0 - horz[-2::-1]])
        c2 = np.vstack([cd, cd[-2::-1]])
        return h2.astype(np.float32), c2
    return horz, cd


def bake_ies(path, resolution=256, normalize=True):
    """Bake to an equirect [resolution, 2*resolution, 3] luminance map.
    Rows = vertical angle 0..180 deg (0 = nadir per LM-63), columns =
    horizontal angle 0..360."""
    ies = parse_ies(path)
    horz, cd = _unwrap_horz(ies["horz_angles"], ies["candela"])
    vert = ies["vert_angles"]
    H, W = resolution, 2 * resolution
    vt = (np.arange(H) + 0.5) / H * 180.0
    hz = (np.arange(W) + 0.5) / W * 360.0
    vi = np.clip(np.searchsorted(vert, vt) - 1, 0, max(vert.size - 2, 0))
    hi = np.clip(np.searchsorted(horz, hz) - 1, 0, max(horz.size - 2, 0))
    if vert.size > 1:
        fv = np.clip((vt - vert[vi]) / np.maximum(
            vert[vi + 1] - vert[vi], 1e-6), 0.0, 1.0)
    else:
        fv = np.zeros(H)
        vi = np.zeros(H, np.int64)
    if horz.size > 1:
        fh = np.clip((hz - horz[hi]) / np.maximum(
            horz[hi + 1] - horz[hi], 1e-6), 0.0, 1.0)
    else:
        fh = np.zeros(W)
        hi = np.zeros(W, np.int64)
    # out-of-range vertical angles emit nothing
    vmask = (vt >= vert.min() - 1e-3) & (vt <= vert.max() + 1e-3)
    c00 = cd[np.ix_(hi, vi)]
    c01 = cd[np.ix_(hi, np.minimum(vi + 1, vert.size - 1))]
    c10 = cd[np.ix_(np.minimum(hi + 1, horz.size - 1), vi)]
    c11 = cd[np.ix_(np.minimum(hi + 1, horz.size - 1),
                    np.minimum(vi + 1, vert.size - 1))]
    img = ((c00 * (1 - fv)[None, :] + c01 * fv[None, :]) * (1 - fh)[:, None]
           + (c10 * (1 - fv)[None, :] + c11 * fv[None, :]) * fh[:, None])
    img = img.T * vmask[:, None]          # [H(vert), W(horz)]
    img = img * float(ies["multiplier"])
    if normalize and img.max() > 0:
        img = img / img.max()
    return np.repeat(img[:, :, None], 3, axis=2).astype(np.float32)

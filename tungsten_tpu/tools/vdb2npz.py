"""Offline .vdb -> .npz converter for grid-backed media / nonstationary
covariances.

The reference reads OpenVDB grids directly (src/core/grids/VdbGrid.cpp,
GPVdbGrid.hpp:16-55: density plus the mean/variance/aniso triple for
GridNonstationaryCovariance).  TPU-native choice: VDB's pointer-heavy
sparse tree is a poor fit for XLA; we densify ONCE offline into a regular
grid (.npz: data [X,Y,Z] or [X,Y,Z,3], bounds_min [3], bounds_max [3]) and
render from the dense array with trilinear lookups (ops/fields.py
Field.regular_grid) — load-time work stays off the device, render-time
reads are fused gathers.

Usage:
    python -m tungsten_tpu.tools.vdb2npz in.vdb out.npz [--grid density]
                                                        [--max-dim 256]

Requires the `pyopenvdb` (or `openvdb`) Python bindings at CONVERSION time
only; the renderer itself never touches VDB.  Scene JSONs then reference
the .npz:
    "covariance": {"type": "nonstationary", "grid": "out.npz", ...}
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def _import_vdb():
    for name in ("pyopenvdb", "openvdb"):
        try:
            return __import__(name)
        except ImportError:
            continue
    raise SystemExit(
        "vdb2npz: no OpenVDB Python bindings found (pyopenvdb/openvdb).\n"
        "Run this converter on a machine with OpenVDB installed; the\n"
        "renderer consumes only the resulting .npz (dense grid + bounds).")


def convert(path_in, path_out, grid_name=None, max_dim=256):
    vdb = _import_vdb()
    grids = vdb.readAllGridMetadata(path_in)
    names = [g.name for g in grids]
    if grid_name is None:
        grid_name = names[0]
    if grid_name not in names:
        raise SystemExit(f"grid {grid_name!r} not in {names}")
    grid = vdb.read(path_in, grid_name)

    bbox = grid.evalActiveVoxelBoundingBox()
    (i0, j0, k0), (i1, j1, k1) = bbox
    shape = (i1 - i0 + 1, j1 - j0 + 1, k1 - k0 + 1)
    stride = max(1, int(np.ceil(max(shape) / max_dim)))
    out_shape = tuple((s + stride - 1) // stride for s in shape)

    dense = np.empty(shape, np.float32)
    grid.copyToArray(dense, ijk=(i0, j0, k0))
    if stride > 1:
        dense = dense[::stride, ::stride, ::stride]

    tf = grid.transform
    wmin = np.asarray(tf.indexToWorld((i0, j0, k0)), np.float64)
    wmax = np.asarray(tf.indexToWorld((i1 + 1, j1 + 1, k1 + 1)), np.float64)

    np.savez_compressed(path_out, data=dense.astype(np.float32),
                        bounds_min=np.minimum(wmin, wmax).astype(np.float32),
                        bounds_max=np.maximum(wmin, wmax).astype(np.float32))
    print(f"wrote {path_out}: {dense.shape} voxels, "
          f"bounds {np.minimum(wmin, wmax)} .. {np.maximum(wmin, wmax)}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--grid", default=None,
                    help="grid name inside the vdb (default: first)")
    ap.add_argument("--max-dim", type=int, default=256,
                    help="downsample so no axis exceeds this many voxels")
    args = ap.parse_args(argv)
    convert(args.input, args.output, args.grid, args.max_dim)


if __name__ == "__main__":
    main()

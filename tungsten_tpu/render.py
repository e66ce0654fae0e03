"""Render driver: `python -m tungsten_tpu.render scene.json [options]`.

The TPU-native analog of the reference's standalone renderer
(src/tungsten/tungsten.cpp:6-24, Shared.hpp:99-383): loads a Tungsten JSON
scene, renders spp samples in jitted passes, writes PNG+PFM, and supports
checkpoint/resume of (film, spp counter) keyed by a scene hash.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .io.image import write_pfm, write_png
from .models.integrator import render_pass
from .parallel.mesh import make_render_mesh, shard_render_pass
from .scene.parse import load_scene


def scene_hash(path):
    with open(path) as f:
        doc = json.load(f)
    doc.pop("renderer", None)
    return hashlib.sha256(
        json.dumps(doc, sort_keys=True).encode()).hexdigest()[:16]


def render(scene, spp, spp_start=0, film=None, progress=None, sharded=False):
    """Accumulate spp samples; returns film [H,W,3] (running sum / spp)."""
    H, W = scene.camera.res_y, scene.camera.res_x
    if film is None:
        film = jnp.zeros((H, W, 3), jnp.float32)

    if sharded and len(jax.devices()) > 1:
        mesh = make_render_mesh()
        pass_fn = shard_render_pass(scene, mesh)
    else:
        jfn = jax.jit(render_pass)
        pass_fn = lambda s: jfn(scene, s)

    for s in range(spp_start, spp_start + spp):
        film = film + pass_fn(jnp.int32(s))
        if progress:
            progress(s, film)
    return film


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0xBA5EBA11)
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--checkpoint-interval", type=int, default=0,
                    help="write a checkpoint every N spp")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--sharded", action="store_true",
                    help="shard pixels over all local devices")
    args = ap.parse_args(argv)

    scene, rdoc = load_scene(args.scene, seed=args.seed)
    spp = args.spp or int(rdoc.get("spp", 32))
    out = args.output or rdoc.get("output_file",
                                  os.path.splitext(args.scene)[0] + ".png")
    ckpt_path = os.path.splitext(out)[0] + ".ckpt.npz"
    shash = scene_hash(args.scene)

    film = None
    spp_start = 0
    if args.resume and os.path.exists(ckpt_path):
        d = np.load(ckpt_path, allow_pickle=False)
        if str(d["scene_hash"]) == shash:
            film = jnp.asarray(d["film"])
            spp_start = int(d["spp"])
            print(f"resumed at spp={spp_start}")
        else:
            print("scene hash mismatch; starting fresh "
                  "(Integrator::resumeRender guard)")

    t0 = time.time()
    done = [spp_start]

    def progress(s, f):
        done[0] = s + 1
        el = time.time() - t0
        print(f"spp {s + 1}/{spp_start + spp}  ({el:.1f}s, "
              f"{el / max(s + 1 - spp_start, 1):.2f}s/spp)", flush=True)
        if args.checkpoint_interval and (s + 1) % args.checkpoint_interval == 0:
            np.savez(ckpt_path, film=np.asarray(f), spp=s + 1,
                     scene_hash=shash)

    film = render(scene, spp, spp_start=spp_start, film=film,
                  progress=progress, sharded=args.sharded)
    img = np.asarray(film) / done[0]
    write_png(out, img)
    write_pfm(os.path.splitext(out)[0] + ".pfm", img)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

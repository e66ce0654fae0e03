"""Profile one WS render pass on the TPU; print top device ops by time."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
import dataclasses
import jax
import jax.numpy as jnp

from tungsten_tpu.scene.parse import load_scene
from tungsten_tpu.models.integrator import render_pass

name = sys.argv[1] if len(sys.argv) > 1 else "gpis-weight-space"
res = 128
scene, _ = load_scene(f"/root/repo/scenes/{name}.json",
                      res_override=(res, res))
scene = dataclasses.replace(scene, max_bounces=2)
f = jax.jit(render_pass)
f(scene, jnp.int32(0)).block_until_ready()
out_dir = f"/tmp/prof_{name}"
os.system(f"rm -rf {out_dir}")
with jax.profiler.trace(out_dir):
    for s in range(2):
        a = f(scene, jnp.int32(s + 1))
    a.block_until_ready()

# aggregate device events from the trace proto (xplane) via trace.json.gz
files = glob.glob(out_dir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
agg = defaultdict(float)
total = 0.0
for fn in files:
    with gzip.open(fn, "rt") as fh:
        doc = json.load(fh)
    # find TPU device track pids
    dev_pids = set()
    for ev in doc.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower():
                dev_pids.add(ev["pid"])
    for ev in doc.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
            # only leaf-ish xla op events have 'dur'
            d = ev.get("dur", 0) / 1e3  # ms
            nm = ev.get("name", "?")
            if ev.get("tid") is not None and d > 0:
                agg[nm] += d
                total += d
rows = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
print(f"total device op time {total:.1f} ms (2 passes)")
for nm, ms in rows:
    print(f"  {ms:9.2f} ms  {100*ms/max(total,1e-9):5.1f}%  {nm[:110]}")

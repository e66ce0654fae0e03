"""Equal-quality (time-to-equal-MSE) comparison vs the real reference
binary on BASELINE config 1 (VERDICT r4 next #8).

Protocol:
  * truth: THIS renderer on the TPU chip at TRUTH_SPP (default 4096),
    128x128.  Caveat (stated in the output): using our own render as truth
    zeroes our systematic bias by construction; the reference's golden
    parity tests (tests/test_golden_parity.py) bound that bias at 64x64.
    A reference-rendered truth at 4096 spp would take ~4 h single-thread
    on this box.  The reference fit below therefore includes a bias term.
  * reference: /tmp/refbuild/build/tungsten (build via
    tools/build_reference.sh), -t THREADS (cores-1 per
    tungsten/Shared.hpp:132), spp in REF_SPPS; wall-clock + MSE vs truth.
  * ours: render_pass on the chip via the donated-accumulator fori loop
    (same protocol as bench.py), spp in OUR_SPPS; wall-clock + MSE.
  * fit MSE(spp) = a/spp (+ b^2 for the reference) by least squares;
    equal-MSE time ratio at the reference's best measured MSE is reported.

Usage:  python tools/equal_quality.py        (writes artifacts/equal_quality_r5.json)
"""
import dataclasses
import json
import os
import subprocess
import sys
import time
from functools import partial

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

REF = "/tmp/refbuild/build/tungsten"
RES = 128
TRUTH_SPP = int(os.environ.get("TRUTH_SPP", "4096"))
REF_SPPS = (8, 32, 128)
OUR_SPPS = (8, 32, 128)
THREADS = max(os.cpu_count() - 1, 1)


def our_render(scene, n_passes, chunk=16):
    from tungsten_tpu.models.integrator import render_pass
    H, W = scene.camera.res_y, scene.camera.res_x

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(1,))
    def run_chunk(s0, acc, n):
        def body(i, a):
            return a + render_pass(scene, s0 + i)
        return jax.lax.fori_loop(0, n, body, acc)

    acc = jnp.zeros((H, W, 3), jnp.float32)
    acc = run_chunk(jnp.int32(0), acc, min(chunk, n_passes))  # compile+warm
    acc.block_until_ready()
    t0 = time.time()
    acc = jnp.zeros((H, W, 3), jnp.float32)
    done = 0
    while done < n_passes:
        c = min(chunk, n_passes - done)
        acc = run_chunk(jnp.int32(done + 1), acc, c)
        done += c
    acc.block_until_ready()
    return np.asarray(acc) / n_passes, time.time() - t0


def ref_render(spp, work):
    from tungsten_tpu.io.image import read_pfm
    with open(os.path.join(ROOT, "scenes", "gpis-sphere-box.json")) as f:
        doc = json.load(f)
    doc["camera"]["resolution"] = [RES, RES]
    doc.setdefault("renderer", {})
    doc["renderer"].update({
        "spp": spp, "spp_step": spp, "adaptive_sampling": False,
        "output_file": f"ref{spp}.png", "hdr_output_file": f"ref{spp}.pfm",
        "enable_resume_render": False})
    sp = os.path.join(work, f"ref{spp}.json")
    with open(sp, "w") as f:
        json.dump(doc, f)
    t0 = time.time()
    r = subprocess.run([REF, "-t", str(THREADS), "-d", work, sp],
                       capture_output=True, text=True, timeout=7200)
    dt = time.time() - t0
    assert r.returncode == 0, r.stderr[-400:]
    return read_pfm(os.path.join(work, f"ref{spp}.pfm")), dt


def main():
    from tungsten_tpu.scene.parse import load_scene

    work = "/tmp/eqq_work"
    os.makedirs(work, exist_ok=True)
    scene, _ = load_scene(os.path.join(ROOT, "scenes",
                                       "gpis-sphere-box.json"),
                          res_override=(RES, RES))
    scene = dataclasses.replace(scene, max_bounces=2)

    print(f"truth: ours @ {TRUTH_SPP} spp ...", flush=True)
    truth, t_truth = our_render(scene, TRUTH_SPP)
    print(f"  {t_truth:.1f}s", flush=True)

    def mse(img):
        return float(np.mean((np.asarray(img, np.float64)
                              - np.asarray(truth, np.float64)) ** 2))

    ours = []
    for spp in OUR_SPPS:
        img, dt = our_render(scene, spp)
        ours.append({"spp": spp, "time_s": round(dt, 3),
                     "mse": mse(img)})
        print(f"ours  spp={spp}: {dt:.2f}s mse={ours[-1]['mse']:.3e}",
              flush=True)

    ref = []
    for spp in REF_SPPS:
        img, dt = ref_render(spp, work)
        if img.shape != truth.shape:
            img = img.reshape(truth.shape)
        ref.append({"spp": spp, "time_s": round(dt, 3), "mse": mse(img)})
        print(f"ref   spp={spp}: {dt:.2f}s mse={ref[-1]['mse']:.3e}",
              flush=True)

    # fits: ours mse = a/spp; ref mse = a/spp + b^2
    a_our = float(np.mean([d["mse"] * d["spp"] for d in ours]))
    x = np.array([1.0 / d["spp"] for d in ref])
    y = np.array([d["mse"] for d in ref])
    A = np.stack([x, np.ones_like(x)], axis=-1)
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    a_ref, b2_ref = float(coef[0]), float(max(coef[1], 0.0))

    tps_our = float(np.mean([d["time_s"] / d["spp"] for d in ours]))
    tps_ref = float(np.mean([d["time_s"] / d["spp"] for d in ref]))

    # target: the reference's best measured MSE; find each renderer's spp
    # and wall-clock to reach it
    target = ref[-1]["mse"]
    spp_ref = a_ref / max(target - b2_ref, 1e-12)
    spp_our = a_our / target
    t_ref = spp_ref * tps_ref
    t_our = spp_our * tps_our
    out = {
        "scene": "gpis-sphere-box", "res": RES,
        "truth": {"renderer": "ours_tpu", "spp": TRUTH_SPP,
                  "caveat": "self-truth zeroes our systematic bias; "
                            "reference bias absorbed in fitted b^2; golden "
                            "parity tests bound cross-renderer bias"},
        "reference": {"binary": REF, "threads": THREADS, "points": ref,
                      "fit_a": a_ref, "fit_bias2": b2_ref,
                      "time_per_spp_s": tps_ref},
        "ours": {"device": str(jax.devices()[0]), "points": ours,
                 "fit_a": a_our, "time_per_spp_s": tps_our},
        "equal_mse_target": target,
        "time_to_target_s": {"reference": round(t_ref, 2),
                             "ours": round(t_our, 2)},
        "speedup_equal_mse": round(t_ref / max(t_our, 1e-9), 1),
    }
    path = os.path.join(ROOT, "artifacts", "equal_quality_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"speedup_equal_mse": out["speedup_equal_mse"],
                      "t_ref_s": out["time_to_target_s"]["reference"],
                      "t_our_s": out["time_to_target_s"]["ours"]}))
    print("wrote", path)


if __name__ == "__main__":
    main()

"""Render golden HDR images with the patched reference CPU binary
(/tmp/refbuild/build/tungsten) for the BASELINE scene configs and store
them under goldens/ for the transport-parity tests.

The binary is built from the UNMODIFIED reference source except for
dependency shims (boost::math -> libstdc++ special functions, no
OpenVDB/FFTW); see VERDICT r1 next-round #3.
"""
import json
import os
import shutil
import subprocess
import sys

REF = "/tmp/refbuild/build/tungsten"
SCENES = ["gpis-sphere-box", "gpis-mirror-1d", "gpis-mirror-1d-corrxy",
          "gpis-weight-space", "gpis-function-space", "gpis-ensemble",
          "gpis-hero", "gpis-csg"]
SPP = int(os.environ.get("GOLDEN_SPP", "256"))
RES = int(os.environ.get("GOLDEN_RES", "64"))


def main():
    root = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(root, "goldens"), exist_ok=True)
    work = "/tmp/golden_work"
    os.makedirs(work, exist_ok=True)
    for name in SCENES:
        with open(os.path.join(root, "scenes", name + ".json")) as f:
            doc = json.load(f)
        doc["camera"]["resolution"] = [RES, RES]
        doc.setdefault("renderer", {})
        doc["renderer"]["spp"] = SPP
        doc["renderer"]["spp_step"] = SPP
        doc["renderer"]["adaptive_sampling"] = False
        doc["renderer"]["output_file"] = name + ".png"
        doc["renderer"]["hdr_output_file"] = name + ".pfm"
        doc["renderer"]["enable_resume_render"] = False
        sp = os.path.join(work, name + ".json")
        with open(sp, "w") as f:
            json.dump(doc, f)
        print(f"rendering {name} ({RES}x{RES}@{SPP}spp)...", flush=True)
        r = subprocess.run([REF, "-t", "2", "-d", work, sp],
                           capture_output=True, text=True, timeout=3600)
        if r.returncode != 0:
            print(f"FAILED {name}: {r.stdout[-400:]} {r.stderr[-400:]}")
            continue
        for ext in (".pfm", ".png"):
            src = os.path.join(work, name + ext)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(root, "goldens", name + ext))
        print(f"done {name}", flush=True)


if __name__ == "__main__":
    main()

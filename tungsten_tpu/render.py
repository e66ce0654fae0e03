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
from functools import partial
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


def _render_tiled(scene, spp, spp_start, film, progress, rows_per):
    """Row-tiled accumulation for large frames: the wavefront state of a
    full 1080p pass needs ~32 GB of HBM temp (AOT memory_analysis), so
    frames above TUNGSTEN_TPU_MAX_RAYS rays per dispatch render in equal
    row chunks (one compile, bounded memory) — the TPU analog of the
    reference's TileGenerator (thread/TaskGroup tile loop)."""
    from .models.integrator import trace
    H, W = scene.camera.res_y, scene.camera.res_x

    @partial(jax.jit, static_argnames=("n",))
    def tile_chunk(sc, r0, s0, n):
        rows = jnp.clip(r0 + jnp.arange(rows_per, dtype=jnp.int32), 0, H - 1)
        px, py = jnp.meshgrid(jnp.arange(W, dtype=jnp.int32), rows)
        pxf, pyf = px.reshape(-1), py.reshape(-1)

        def body(i, a):
            return a + trace(sc, pxf, pyf, s0 + i)

        acc = jax.lax.fori_loop(
            0, n, body, jnp.zeros((rows_per * W, 3), jnp.float32))
        return acc.reshape(rows_per, W, 3)

    chunk = 4 if jax.default_backend() != "cpu" else 1
    for r0 in range(0, H, rows_per):
        valid = min(rows_per, H - r0)
        acc = None
        s = spp_start
        while s < spp_start + spp:
            n = min(chunk, spp_start + spp - s)
            t = tile_chunk(scene, jnp.int32(r0), jnp.int32(s), n)
            acc = t if acc is None else acc + t
            s += n
        film = film.at[r0:r0 + valid].add(acc[:valid])
        if progress:
            progress(spp_start + spp - 1, film)
    return film


def render(scene, spp, spp_start=0, film=None, progress=None, sharded=False,
           sampler="independent"):
    """Accumulate spp samples; returns film [H,W,3] (running sum / spp)."""
    H, W = scene.camera.res_y, scene.camera.res_x
    if film is None:
        film = jnp.zeros((H, W, 3), jnp.float32)

    use_qmc = sampler == "sobol"
    max_rays = int(os.environ.get("TUNGSTEN_TPU_MAX_RAYS", str(1 << 18)))
    if H * W > max_rays and not sharded and not use_qmc:
        rows_per = max(1, max_rays // W)
        return _render_tiled(scene, spp, spp_start, film, progress, rows_per)
    if sharded and len(jax.devices()) > 1:
        mesh = make_render_mesh()
        pass_fn = shard_render_pass(scene, mesh)
        use_qmc = False
    else:
        jfn = jax.jit(render_pass)
        if use_qmc:
            from .utils.sobol import sobol_point
            pass_fn = lambda s: jfn(scene, s,
                                    jnp.asarray(sobol_point(int(s))))
        else:
            # batch passes on device (lax.fori over render_pass with a
            # donated accumulator) — erases the per-pass dispatch gap
            # (~8 ms/pass measured, BENCH_NOTES.md).  On CPU the fori body
            # re-traces render_pass per chunk step: keep chunk=1 there so
            # the test tier doesn't pay a 4x compile
            chunk = 4 if jax.default_backend() != "cpu" else 1

            @partial(jax.jit, static_argnames=("n",), donate_argnums=(2,))
            def run_chunk(s0, sc, acc, n):
                def body(i, a):
                    return a + render_pass(sc, s0 + i)
                return jax.lax.fori_loop(0, n, body, acc)

            s = spp_start
            while s < spp_start + spp:
                n = min(chunk, spp_start + spp - s)
                film = run_chunk(jnp.int32(s), scene, film, n)
                if progress:
                    progress(s + n - 1, film)
                s += n
            return film

    for s in range(spp_start, spp_start + spp):
        film = film + pass_fn(jnp.int32(s))
        if progress:
            progress(s, film)
    return film


def render_adaptive(scene, base_spp, extra_spp, progress=None,
                    sampler="independent", tile=4, quantile=0.95):
    """Adaptive sampling, TPU style (PathTraceIntegrator.cpp:43-133).

    Base pass fills twin buffers (even/odd spp) for a per-pixel variance
    estimate; per-4x4-tile errors above the clamped threshold select pixels,
    which are COMPACTED into a flat ray batch (instead of the reference's
    per-tile work lists) and traced for `extra_spp` more samples.  Returns
    (film_sum [H,W,3], counts [H,W])."""
    from .models.integrator import trace
    H, W = scene.camera.res_y, scene.camera.res_x
    even = jnp.zeros((H, W, 3), jnp.float32)
    odd = jnp.zeros((H, W, 3), jnp.float32)
    jfn = jax.jit(render_pass)
    for s in range(base_spp):
        img = jfn(scene, jnp.int32(s))
        if s % 2 == 0:
            even = even + img
        else:
            odd = odd + img
        if progress:
            progress(s, even + odd)
    film = even + odd
    counts = np.full((H, W), base_spp, np.float32)
    if extra_spp <= 0:
        return film, jnp.asarray(counts)

    ne, no = (base_spp + 1) // 2, base_spp // 2
    me = np.asarray(even) / max(ne, 1)
    mo = np.asarray(odd) / max(no, 1)
    err = np.abs(me - mo).sum(-1) / np.maximum(
        (me + mo).sum(-1), 1e-3)  # relative twin-buffer error
    th, tw = H // tile, W // tile
    tile_err = err[:th * tile, :tw * tile].reshape(th, tile, tw, tile) \
        .mean((1, 3))
    clamp = np.quantile(tile_err, quantile)
    tile_err = np.minimum(tile_err, clamp)
    sel = tile_err > 0.5 * clamp
    # dilate one tile (PathTraceIntegrator error dilation)
    sel = (sel | np.roll(sel, 1, 0) | np.roll(sel, -1, 0)
           | np.roll(sel, 1, 1) | np.roll(sel, -1, 1))
    mask = np.zeros((H, W), bool)
    mask[:th * tile, :tw * tile] = np.repeat(
        np.repeat(sel, tile, 0), tile, 1)
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return film, jnp.asarray(counts)
    pad = (-len(xs)) % 1024
    px = np.concatenate([xs, np.zeros(pad, np.int64)]).astype(np.int32)
    py = np.concatenate([ys, np.zeros(pad, np.int64)]).astype(np.int32)
    valid = np.concatenate([np.ones(len(xs)), np.zeros(pad)]) > 0

    tfn = jax.jit(lambda sc, x, y, s: trace(sc, x, y, s))
    add = np.zeros((H, W, 3), np.float32)
    for s in range(base_spp, base_spp + extra_spp):
        c = np.asarray(tfn(scene, jnp.asarray(px), jnp.asarray(py),
                           jnp.int32(s)))
        np.add.at(add, (py[valid], px[valid]), c[valid])
        if progress:
            progress(s, film)
    counts[ys, xs] += extra_spp
    return film + jnp.asarray(add), jnp.asarray(counts)


def dump_pixel(scene, px, py, spp=0, n=512):
    """--data-dump-pixel: SDF values along the primary ray as JSON-ready
    dict (RendererSettings.hpp:141-158, DumpData Medium.hpp:22-36)."""
    from .models import media as md
    cam = scene.camera
    pxa = jnp.asarray([px], jnp.int32)
    pya = jnp.asarray([py], jnp.int32)
    ro, rd = cam.sample_ray(pxa, pya, jnp.full((1, 2), 0.5))
    if not scene.media:
        return {"t": [], "f": []}
    medium = scene.media[scene.cam_medium if scene.cam_medium >= 0 else 0]
    state = md.MediumState.make(1)
    pss = jnp.asarray([[px, py, spp, 0]], jnp.uint32)
    value_at = md.make_value_at(medium, scene.scene_seed, ro, rd,
                                jnp.zeros(1), state, pss)
    ts = jnp.linspace(0.0, 4.0, n)
    fs = []
    for t in np.asarray(ts):
        f, _ = value_at(jnp.full(1, t, jnp.float32))
        fs.append(float(f[0]))
    return {"t": [float(t) for t in np.asarray(ts)], "f": fs}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--res", default=None, metavar="WxH",
                    help="override the camera resolution (e.g. 256x256)")
    ap.add_argument("--seed", type=int, default=0xBA5EBA11)
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--checkpoint-interval", type=int, default=0,
                    help="write a checkpoint every N spp")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--sharded", action="store_true",
                    help="shard pixels over all local devices")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the render loop "
                         "into DIR (view with TensorBoard / Perfetto)")
    ap.add_argument("--aovs", action="store_true",
                    help="also write depth/normal/albedo/visibility buffers")
    ap.add_argument("--tonemap", default="gamma",
                    choices=["linear", "gamma", "reinhard", "filmic"])
    ap.add_argument("--integrator", default=None,
                    choices=["path_tracer", "light_tracer",
                             "bidirectional_path_tracer", "photon_map",
                             "progressive_photon_map", "kelemen_mlt",
                             "multiplexed_mlt", "reversible_jump_mlt"],
                    help="overrides the scene's integrator type")
    ap.add_argument("--sampler", default=None,
                    choices=["independent", "sobol"],
                    help="overrides the scene's sampler_type")
    ap.add_argument("--adaptive", type=int, default=0, metavar="EXTRA_SPP",
                    help="extra adaptive samples for high-variance tiles")
    ap.add_argument("--data-dump-pixel", default=None, metavar="X,Y",
                    help="dump SDF values along the primary ray to JSON")
    ap.add_argument("--serve", type=int, default=0, metavar="PORT",
                    help="expose /status /framebuffer /log on PORT "
                         "(tungsten-server analog)")
    args = ap.parse_args(argv)

    srv = None
    if args.serve:
        from .server import RenderServer
        srv = RenderServer(port=args.serve)
        print(f"serving render status on http://127.0.0.1:{srv.port}")

    res_override = None
    if args.res:
        wh = args.res.lower().split("x")
        res_override = (int(wh[0]), int(wh[-1]))
    scene, rdoc = load_scene(args.scene, seed=args.seed,
                             res_override=res_override)
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
        H, W = scene.camera.res_y, scene.camera.res_x
        n_done = max(s + 1 - spp_start, 1)
        ksps = H * W * n_done / max(el, 1e-6) / 1e3
        # each pixel-sample casts ~(2 + 2*depth) GPIS-marched rays
        # (camera + per-bounce scatter + [2R] NEE shadow walk) — the
        # Mrays/s figure is the SURVEY north-star observability metric
        mrays = ksps * (2 + 2 * scene.max_bounces) / 1e3
        print(f"spp {s + 1}/{spp_start + spp}  ({el:.1f}s, "
              f"{el / n_done:.2f}s/spp, {ksps:.1f} Ksamples/s, "
              f"~{mrays:.2f} Mrays/s)", flush=True)
        if args.checkpoint_interval and (s + 1) % args.checkpoint_interval == 0:
            np.savez(ckpt_path, film=np.asarray(f), spp=s + 1,
                     scene_hash=shash)
        if srv is not None:
            H, W = scene.camera.res_y, scene.camera.res_x
            srv.update(film=np.asarray(f) / (s + 1), state="rendering",
                       scene=args.scene, spp_done=s + 1,
                       spp_total=spp_start + spp,
                       ksamples_s=round(H * W * (s + 1 - spp_start)
                                        / max(el, 1e-6) / 1e3, 2))
            srv.log(f"spp {s + 1}/{spp_start + spp}")

    sampler = args.sampler or rdoc.get("sampler_type", "independent")
    if sampler not in ("independent", "sobol"):
        sampler = "sobol"  # reference default sampler is Sobol

    integ_kind = args.integrator or rdoc.get("integrator_type", "path_tracer")

    if args.data_dump_pixel:
        dx, dy = (int(v) for v in args.data_dump_pixel.split(","))
        data = dump_pixel(scene, dx, dy)
        dump_path = os.path.splitext(out)[0] + f".dump_{dx}_{dy}.json"
        with open(dump_path, "w") as f:
            json.dump(data, f)
        print(f"wrote {dump_path}")
        return

    if args.profile:
        jax.profiler.start_trace(args.profile)

    H, W = scene.camera.res_y, scene.camera.res_x
    if integ_kind == "progressive_photon_map":
        from .models.photon_map import render_ppm
        img = np.asarray(render_ppm(scene, n_passes=spp)).reshape(H, W, 3)
        film, done = img, [1]
    elif integ_kind in ("light_tracer", "bidirectional_path_tracer",
                        "photon_map", "kelemen_mlt", "multiplexed_mlt",
                        "reversible_jump_mlt"):
        if integ_kind == "light_tracer":
            from .models.light_tracer import render_pass_lt as _pass
        elif integ_kind == "photon_map":
            from .models.photon_map import render_pass_pm as _pass
        elif integ_kind == "kelemen_mlt":
            from .models.mlt import render_pass_mlt as _pass
        elif integ_kind == "multiplexed_mlt":
            from .models.mmlt import render_pass_mmlt as _pass
        elif integ_kind == "reversible_jump_mlt":
            from .models.rjmlt import render_pass_rjmlt as _pass
        else:
            from .models.bdpt import render_pass_bdpt as _pass
        f = jax.jit(_pass)
        acc = film
        for s in range(spp_start, spp_start + spp):
            img_s = f(scene, jnp.int32(s))
            acc = img_s if acc is None else acc + img_s
            progress(s, acc)
        film = acc
        # secondary integrators return flat [H*W, 3] films
        img = np.asarray(film).reshape(H, W, 3) / done[0]
    elif args.adaptive > 0 and spp_start == 0:
        film, cnt = render_adaptive(scene, spp, args.adaptive,
                                    progress=progress, sampler=sampler)
        img = np.asarray(film) / np.asarray(cnt)[..., None]
    else:
        film = render(scene, spp, spp_start=spp_start, film=film,
                      progress=progress, sharded=args.sharded,
                      sampler=sampler)
        img = np.asarray(film) / done[0]
    if args.profile:
        jax.profiler.stop_trace()
        print(f"wrote profiler trace to {args.profile}")

    if out.lower().endswith(".exr"):
        from .io.exr import write_exr
        write_exr(out, img)
        write_png(os.path.splitext(out)[0] + ".png", img, tonemap=True,
                  curve=args.tonemap)
    else:
        write_png(out, img, tonemap=True, curve=args.tonemap)
        write_pfm(os.path.splitext(out)[0] + ".pfm", img)
    print(f"wrote {out}")
    if srv is not None:
        srv.update(film=img, state="done", spp_done=done[0])

    if args.aovs:
        from .models.integrator import render_aovs
        n_aov = min(8, spp)
        f = jax.jit(render_aovs)
        acc = None
        for s in range(n_aov):
            _, a = f(scene, jnp.int32(s))
            a = {k: np.asarray(v) for k, v in a.items()}
            acc = a if acc is None else {k: acc[k] + a[k] for k in a}
        base = os.path.splitext(out)[0]
        for k, v in acc.items():
            v = v / n_aov
            if v.ndim == 2:
                v = np.repeat(v[..., None], 3, axis=-1)
            if k == "depth":
                v = v / max(v.max(), 1e-6)
            if k == "normal":
                v = v * 0.5 + 0.5
            write_pfm(f"{base}.{k}.pfm", v.astype(np.float32))
            write_png(f"{base}.{k}.png", v, tonemap=(k == "albedo"))
        print(f"wrote AOVs {base}.{{depth,normal,albedo,visibility}}")


if __name__ == "__main__":
    main()

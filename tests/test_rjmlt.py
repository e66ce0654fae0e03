"""ReversibleJumpMLT building blocks + integrator convergence.

Reference: /root/reference/src/core/integrators/reversible_jump_mlt/
(ReversibleJumpMltTracer.cpp:151-268 runSampleChain: large / small /
strategy-perturbation mutations with LightPath::invert, LightPath.cpp:408-460)
and the per-Bsdf invert() family.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tungsten_tpu.models import bsdfs as bs

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rand_wi(rng, n, up=True):
    w = rng.normal(size=(n, 3)).astype(np.float32)
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    if up:
        w[:, 2] = np.abs(w[:, 2]) + 0.05
        w /= np.linalg.norm(w, axis=-1, keepdims=True)
    return jnp.asarray(w)


def _roundtrip(kind, n=128, ior=1.5, up=True, extra=None, match_frac=0.9):
    """sample -> invert -> re-sample must reproduce wo exactly."""
    spec = {"kind": kind, "albedo": (1.0, 1.0, 1.0), "ior": ior}
    if extra:
        spec.update(extra)
    table = bs.build_table([spec])
    rng = np.random.default_rng(11)
    wi = _rand_wi(rng, n, up=up)
    u = jnp.asarray(rng.uniform(size=(n, 5)).astype(np.float32))
    ur = jnp.asarray(rng.uniform(size=(n, 5)).astype(np.float32))
    bi = jnp.zeros(n, jnp.int32)
    s = jax.vmap(lambda b, w, uu: bs.sample_bsdf(table, b, w, uu))(bi, wi, u)
    u_inv, ok = jax.vmap(lambda b, w, wo, r: bs.invert_bsdf(
        table, b, w, wo, r))(bi, wi, s["wo"], ur)
    valid = np.asarray(s["valid"])
    okn = np.asarray(ok)
    # inversion must succeed on (nearly) all forward-sampled events
    assert (okn & valid).sum() >= match_frac * valid.sum(), \
        (okn.sum(), valid.sum())
    s2 = jax.vmap(lambda b, w, uu: bs.sample_bsdf(table, b, w, uu))(
        bi, wi, u_inv)
    m = okn & valid
    err = np.max(np.abs(np.asarray(s2["wo"]) - np.asarray(s["wo"])), axis=-1)
    assert (err[m] < 2e-3).all(), float(err[m].max())
    # and the branch pdfs must agree (same discrete choice reproduced)
    perr = np.abs(np.asarray(s2["pdf"]) - np.asarray(s["pdf"]))[m]
    rel = perr / np.maximum(np.abs(np.asarray(s["pdf"]))[m], 1e-6)
    assert (rel < 1e-3).all(), float(rel.max())


def test_invert_lambert():
    _roundtrip(bs.LAMBERT)


def test_invert_oren_nayar():
    _roundtrip(bs.OREN_NAYAR, extra={"roughness": 0.3})


def test_invert_mirror():
    _roundtrip(bs.MIRROR)


def test_invert_conductor():
    _roundtrip(bs.CONDUCTOR)


def test_invert_dielectric():
    _roundtrip(bs.DIELECTRIC, up=False)


def test_invert_plastic():
    _roundtrip(bs.PLASTIC)


def test_invert_thin_sheet():
    _roundtrip(bs.THIN_SHEET)


def test_invert_diffuse_transmission():
    _roundtrip(bs.DIFFUSE_TRANSMISSION, up=False, extra={"transmittance": 0.5})


def test_invert_unsupported_fails_cleanly():
    table = bs.build_table([{"kind": bs.ROUGH_CONDUCTOR,
                             "albedo": (1.0, 1.0, 1.0), "roughness": 0.3}])
    rng = np.random.default_rng(5)
    wi = _rand_wi(rng, 8)
    u = jnp.asarray(rng.uniform(size=(8, 5)).astype(np.float32))
    bi = jnp.zeros(8, jnp.int32)
    s = jax.vmap(lambda b, w, uu: bs.sample_bsdf(table, b, w, uu))(bi, wi, u)
    _, ok = jax.vmap(lambda b, w, wo, r: bs.invert_bsdf(
        table, b, w, wo, r))(bi, wi, s["wo"], u)
    assert not np.asarray(ok).any()


_BOX = {
    "bsdfs": [
        {"name": "white", "albedo": 0.7, "type": "lambert"},
        {"name": "light", "albedo": 1.0, "type": "null"},
    ],
    "primitives": [
        {"name": "floor", "transform": {"scale": [2, 1, 2]},
         "type": "quad", "bsdf": "white"},
        {"name": "ceiling",
         "transform": {"position": [0, 2, 0], "scale": [2, 1, 2],
                       "rotation": [0, 0, -180]},
         "type": "quad", "bsdf": "white"},
        {"name": "back",
         "transform": {"position": [0, 1, -1], "scale": [2, 4, 2],
                       "rotation": [0, 90, 90]},
         "type": "quad", "bsdf": "white"},
        {"name": "light",
         "transform": {"position": [0, 1.98, 0], "scale": [0.7, 1, 0.7],
                       "rotation": [0, 0, -180]},
         "type": "quad", "bsdf": "light", "emission": [10, 10, 10]},
    ],
    "camera": {"type": "pinhole", "fov": 40, "resolution": [12, 12],
               "transform": {"position": [0, 1, 3.2], "look_at": [0, 1, 0],
                             "up": [0, 1, 0]}},
    "integrator": {"type": "path_tracer", "max_bounces": 4},
}


@pytest.fixture(scope="module")
def box():
    from tungsten_tpu.scene.parse import scene_from_dict
    scene, _ = scene_from_dict(_BOX)
    return scene


@pytest.mark.mid
def test_rjmlt_inversion_reproduces_path(box):
    """The reversible jump's core invariant: inverting the current path
    into a new strategy's PSS and re-evaluating reproduces the SAME
    physical path (vertex positions match to float tolerance) — the
    LightPath::invert exactness the acceptance ratio relies on."""
    from tungsten_tpu.models import rjmlt

    V = 3
    C = 64
    D = (V + 2) * 64 + 2
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.random((C, D), np.float32))
    key = jnp.arange(C, dtype=jnp.uint32) + jnp.uint32(123)

    res = jax.jit(lambda uu: rjmlt.eval_strategies_V(box, uu, jnp.int32(0),
                                                     V))(u)
    lum = np.asarray(rjmlt._lum(res["rgb"]))  # [C, V+1]

    for sl_from, sl_to in [(1, 2), (2, 1), (1, 0), (2, 3)]:
        path = rjmlt.build_path(res, jnp.full(C, sl_from, jnp.int32), V)
        u2, ok = jax.jit(lambda p, uu: rjmlt.invert_to_strategy(
            box, p, sl_to, uu, V, key, 0))(path, u)
        okn = np.asarray(ok)
        # only meaningful where the source strategy produced a real path
        src_ok = lum[:, sl_from] > 0
        m = okn & src_ok
        if m.sum() == 0:
            continue
        res2 = jax.jit(lambda uu: rjmlt.eval_strategies_V(
            box, uu, jnp.int32(0), V))(u2)
        path2 = rjmlt.build_path(res2, jnp.full(C, sl_to, jnp.int32), V)
        p_old = np.asarray(path["p"])[m]
        p_new = np.asarray(path2["p"])[m]
        err = np.abs(p_new - p_old).max(axis=(1, 2))
        frac = (err < 5e-3).mean()
        assert frac > 0.9, (sl_from, sl_to, frac, np.sort(err)[-4:])


@pytest.mark.heavy
def test_rjmlt_converges_to_pt(box):
    from tungsten_tpu.models.integrator import render_pass
    from tungsten_tpu.models.rjmlt import render_pass_rjmlt

    fpt = jax.jit(render_pass)
    pt = None
    n = 16
    for s in range(n):
        a = fpt(box, jnp.int32(s))
        pt = a if pt is None else pt + a
    pt = np.asarray(pt) / n

    frj = jax.jit(lambda s: render_pass_rjmlt(box, s, n_chains=512,
                                              n_mutations=24, max_len=4))
    rj = None
    m = 4
    for s in range(m):
        a = frj(jnp.int32(s))
        rj = a if rj is None else rj + a
    rj = np.asarray(rj).reshape(pt.shape) / m
    assert np.isfinite(rj).all()
    assert rj.mean() > 0, "RJMLT produced a black image"
    ratio = rj.mean() / max(pt.mean(), 1e-9)
    assert 0.75 < ratio < 1.3, (pt.mean(), rj.mean())

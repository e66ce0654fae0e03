"""Fiber/hair BCSDFs: pdf normalization over the sphere, sample/eval
consistency, and energy bounds (RoughWireBcsdf.cpp, LambertianFiberBcsdf.cpp,
HairBcsdf.cpp semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tungsten_tpu.models import bsdfs as bs
from tungsten_tpu.models import fiber as fb


def _sphere_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


def _wi(theta_deg=30.0):
    t = np.radians(theta_deg)
    return jnp.asarray([np.cos(t) * 0.0, np.sin(t), np.cos(t)],
                       jnp.float32)


@pytest.mark.smoke
def test_wire_pdf_normalized():
    wi = _wi(25.0)
    dirs = jnp.asarray(_sphere_dirs(200_000))
    v = fb.wire_v(jnp.float32(0.3))
    p = fb.wire_eval_pdf(wi, dirs, v)
    integral = float(jnp.mean(p)) * 4.0 * np.pi
    assert abs(integral - 1.0) < 0.05, integral


@pytest.mark.smoke
def test_lambertian_fiber_pdf_normalized():
    dirs = jnp.asarray(_sphere_dirs(200_000, 1))
    p = fb.lambertian_cylinder(dirs)
    integral = float(jnp.mean(p)) * 4.0 * np.pi
    assert abs(integral - 1.0) < 0.05, integral


def test_wire_sample_matches_pdf():
    """Sampled directions score the same density the pdf reports, and the
    histogram of sampled sin(theta_o) matches M."""
    wi = _wi(40.0)
    v = fb.wire_v(jnp.float32(0.25))
    key = np.random.default_rng(2)
    u = jnp.asarray(key.random((50_000, 3)), jnp.float32)
    wo, p = jax.vmap(lambda uu: fb.wire_sample(wi, v, uu[0], uu[1], uu[2]))(u)
    assert np.isfinite(np.asarray(wo)).all()
    assert (np.asarray(p) > 0).all()
    # unit vectors
    assert np.allclose(np.linalg.norm(np.asarray(wo), axis=-1), 1.0,
                       atol=1e-3)
    p2 = fb.wire_eval_pdf(wi, wo, v)
    assert np.allclose(np.asarray(p), np.asarray(p2), rtol=1e-3, atol=1e-5)


def test_hair_precompute_and_pdf():
    pre = fb.precompute_hair(fb.hair_sigma_a(0.5, 0.25), 0.3, n_quad=70)
    assert np.isfinite(pre["table"]).all() and (pre["table"] >= 0).all()
    assert np.isfinite(pre["cdf"]).all()
    hd = {k: jnp.asarray(v) for k, v in pre.items()}
    sr = jnp.float32(np.radians(2.0))
    beta = max(np.pi / 2 * 0.3, 0.04)
    vR, vTT, vTRT = (jnp.float32(beta ** 2), jnp.float32((beta / 2) ** 2),
                     jnp.float32((beta * 2) ** 2))
    wi = _wi(20.0)
    dirs = jnp.asarray(_sphere_dirs(100_000, 3))
    pdf = fb.hair_pdf(hd, wi, dirs, sr, vR, vTT, vTRT)
    integral = float(jnp.mean(pdf)) * 4.0 * np.pi
    assert abs(integral - 1.0) < 0.12, integral
    # eval is nonnegative and finite everywhere
    f = fb.hair_eval(hd, wi, dirs, sr, vR, vTT, vTRT)
    assert np.isfinite(np.asarray(f)).all()
    assert (np.asarray(f) >= 0).all()


def test_hair_sample_weight_bounded():
    """With zero absorption the single-scatter albedo (weight = eval/pdf)
    must stay <= ~1 on average (energy-conserving model)."""
    pre = fb.precompute_hair(np.zeros(3), 0.4, n_quad=70)
    hd = {k: jnp.asarray(v) for k, v in pre.items()}
    sr = jnp.float32(0.0)
    beta = max(np.pi / 2 * 0.4, 0.04)
    vR, vTT, vTRT = (jnp.float32(beta ** 2), jnp.float32((beta / 2) ** 2),
                     jnp.float32((beta * 2) ** 2))
    wi = _wi(10.0)
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.random((20_000, 4)), jnp.float32)
    wo, p = jax.vmap(lambda uu: fb.hair_sample(hd, wi, sr, vR, vTT, vTRT,
                                               uu))(u)
    f = jax.vmap(lambda w: fb.hair_eval(hd, wi, w, sr, vR, vTT, vTRT))(wo)
    w = np.asarray(f) / np.maximum(np.asarray(p)[:, None], 1e-9)
    assert np.isfinite(w).all()
    mean_albedo = w.mean(0)
    assert (mean_albedo < 1.15).all(), mean_albedo
    assert (mean_albedo > 0.3).all(), mean_albedo


def test_fiber_kinds_via_table():
    """Table-level dispatch: eval/pdf/sample for all three fiber kinds."""
    table = bs.build_table([
        {"kind": bs.ROUGH_WIRE, "albedo": (1, 1, 1), "roughness": 0.3},
        {"kind": bs.LAMBERT_FIBER, "albedo": (0.6, 0.5, 0.4)},
        {"kind": bs.HAIR, "roughness": 0.3, "p0_unused": 0},
        {"kind": bs.LAMBERT, "albedo": (0.5, 0.5, 0.5)},
    ])
    wi = _wi(30.0)
    u = jnp.asarray([0.3, 0.7, 0.4, 0.9, 0.1], jnp.float32)
    for bi in range(3):
        s = bs.sample_bsdf(table, jnp.int32(bi), wi, u)
        assert bool(s["valid"])
        assert np.isfinite(np.asarray(s["wo"])).all()
        f = bs.eval_bsdf(table, jnp.int32(bi), wi, s["wo"])
        p = bs.pdf_bsdf(table, jnp.int32(bi), wi, s["wo"])
        assert np.isfinite(np.asarray(f)).all()
        assert float(p) > 0
        # weight consistency: weight ~= f / pdf
        w = np.asarray(f) / float(p)
        assert np.allclose(w, np.asarray(s["weight"]), rtol=0.05,
                           atol=1e-3), (bi, w, np.asarray(s["weight"]))
    # lambert row unaffected by the fiber branch
    s = bs.sample_bsdf(table, jnp.int32(3), wi, u)
    assert bool(s["valid"]) and float(s["wo"][2]) > 0


def test_oriented_frame_follows_strand_tangent():
    """The shading bitangent must equal the strand tangent projected off
    the normal (ADVICE r2: Duff ONB misorients fiber cones for strands not
    axis-aligned)."""
    from tungsten_tpu.utils.vecmath import oriented_frame
    rngn = np.random.default_rng(7)
    for _ in range(20):
        n = rngn.normal(size=3)
        n /= np.linalg.norm(n)
        tg = rngn.normal(size=3)
        tg /= np.linalg.norm(tg)
        if abs(np.dot(n, tg)) > 0.95:
            continue
        t, b = oriented_frame(jnp.asarray(n, jnp.float32),
                              jnp.asarray(tg, jnp.float32))
        t, b = np.asarray(t), np.asarray(b)
        # orthonormal right-handed frame with b || projected tangent
        proj = tg - n * np.dot(n, tg)
        proj /= np.linalg.norm(proj)
        assert np.allclose(b, proj, atol=1e-5)
        assert abs(np.dot(t, n)) < 1e-5 and abs(np.dot(t, b)) < 1e-5
        assert np.allclose(np.cross(t, b), n, atol=1e-5)
    # zero tangent falls back to the Duff ONB
    n = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    t, b = oriented_frame(n, jnp.zeros(3, jnp.float32))
    assert np.isfinite(np.asarray(t)).all()
    assert abs(float(jnp.dot(t, n))) < 1e-6


def test_hair_lobe_pdf_registration():
    """pdf(phi) must integrate to ~1 with the RES-bin convention shared
    with hair_lobe_sample (ADVICE r2 low: bin mis-registration)."""
    h = fb.precompute_hair(jnp.asarray([0.2, 0.4, 0.6]), 0.3, n_quad=40)
    cdf = jnp.asarray(h["cdf"])[0]          # R lobe
    cos_td = jnp.float32(0.7)
    M = 4096
    phis = (np.arange(M) + 0.5) / M * 2.0 * np.pi
    pdfs = fb.hair_lobe_pdf(cdf, jnp.asarray(phis, jnp.float32),
                            jnp.full(M, cos_td))
    integral = float(np.mean(np.asarray(pdfs)) * 2.0 * np.pi)
    assert abs(integral - 1.0) < 1e-2, integral

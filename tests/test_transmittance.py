"""Transmittance laws: derivative identities, normalization, sampling
consistency; heterogeneous media: marched optical depth vs analytic."""
import jax
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.models import transmittance as tr

LAWS = [
    (tr.T_EXPONENTIAL, (1.3, 0, 0, 0)),
    (tr.T_ERLANG, (2.0, 0, 0, 0)),
    (tr.T_DAVIS, (1.5, 0, 0, 0)),
    (tr.T_DOUBLE_EXP, (0.7, 2.5, 0, 0)),
    (tr.T_QUADRATIC, (2.0, 0, 0, 0)),
]


def test_boundary_identities():
    for kind, p in LAWS + [(tr.T_LINEAR, (2.0, 0, 0, 0)),
                           (tr.T_PULSE, (0.5, 1.5, 2, 0))]:
        law = tr.make_law(kind, p)
        if kind != tr.T_PULSE:  # pulse ss(0)=1+1/N by construction
            assert abs(float(tr.surface_surface(law, jnp.float32(0.0)))
                       - 1.0) < 1e-5, kind
        assert abs(float(tr.medium_surface(law, jnp.float32(0.0))) - 1.0) \
            < 1e-5, kind
        sb = float(tr.sigma_bar(law))
        sm0 = float(tr.surface_medium(law, jnp.float32(0.0)))
        assert abs(sm0 - sb) / max(sb, 1e-6) < 1e-4, (kind, sm0, sb)


def test_pdf_is_negative_derivative():
    """surfaceMedium = -d surfaceSurface/dtau; mediumMedium = -d
    mediumSurface/dtau (free-flight pdf relations)."""
    taus = jnp.linspace(0.05, 1.8, 12)
    for kind, p in LAWS:
        law = tr.make_law(kind, p)
        g1 = jax.vmap(jax.grad(lambda t: tr.surface_surface(law, t)))(taus)
        sm = jax.vmap(lambda t: tr.surface_medium(law, t))(taus)
        np.testing.assert_allclose(np.asarray(-g1), np.asarray(sm),
                                   rtol=2e-3, atol=1e-4,
                                   err_msg=f"kind={kind} sm")
        g2 = jax.vmap(jax.grad(lambda t: tr.medium_surface(law, t)))(taus)
        mm = jax.vmap(lambda t: tr.medium_medium(law, t))(taus)
        np.testing.assert_allclose(np.asarray(-g2), np.asarray(mm),
                                   rtol=2e-3, atol=1e-4,
                                   err_msg=f"kind={kind} mm")


def test_sampling_matches_cdf():
    """Empirical CDF of sampled tau == 1 - surfaceSurface(tau)."""
    rng = np.random.default_rng(0)
    n = 20000
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    for kind, p in LAWS:
        law = tr.make_law(kind, p)
        taus = jax.vmap(lambda a, b: tr.sample_tau(law, a, b, True))(u1, u2)
        ts = np.asarray(taus)
        for q in (0.3, 0.8, 1.5):
            emp = (ts <= q).mean()
            ana = 1.0 - float(tr.surface_surface(law, jnp.float32(q)))
            assert abs(emp - ana) < 0.02, (kind, q, emp, ana)


def test_tabulated_law():
    ts = np.linspace(0, 3, 64).astype(np.float32)
    ff = np.exp(-ts)
    law = tr.make_law(tr.T_TABULATED, ts=ts, ff=ff, pf=ff,
                      fp=np.exp(-ts), pp=np.exp(-ts))
    v = float(tr.surface_surface(law, jnp.float32(1.0)))
    assert abs(v - np.exp(-1.0)) < 0.05


def test_hetero_exponential_tau():
    """Marched optical depth through an exponential-falloff medium matches
    the closed form along a vertical ray."""
    from tungsten_tpu.models import media as md
    from tungsten_tpu.ops import sparse_conv as sc_ops
    from tungsten_tpu.scene.parse import parse_gp

    gp = parse_gp({})
    cfg = sc_ops.SparseConvConfig.create()
    sig = 2.0
    fall = 1.5
    med = md.Medium(
        sigma_a=jnp.zeros(3), sigma_s=jnp.full(3, sig),
        density=jnp.float32(1.0), step_size=jnp.float32(0.01),
        cfg=cfg, gp=gp, hg_g=jnp.float32(0.0),
        field_params=jnp.asarray(
            np.array([0, 1, 0, fall, 0, 0, 0, 0], np.float32)),
        kind=md.MEDIUM_EXPONENTIAL)
    R = 4
    ro = jnp.tile(jnp.asarray([0.0, 0.0, 0.0]), (R, 1))
    rd = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (R, 1))
    near = jnp.zeros(R)
    far = jnp.full(R, 2.0)
    _, dtot, _ = md._density_march(med, ro, rd, near, far,
                                   jnp.full(R, 1e30))
    tau = dtot * sig
    # analytic: int_0^2 sig*exp(-fall*t) dt
    ana = sig / fall * (1.0 - np.exp(-fall * 2.0))
    np.testing.assert_allclose(np.asarray(tau), ana, rtol=1e-3)

    st = md.MediumState.make(R)
    trv = md.transmittance(med, jnp.uint32(0), ro, rd, near, far, st,
                           jnp.zeros((R, 4), jnp.uint32), jnp.zeros(R),
                           jnp.ones(R, bool))
    np.testing.assert_allclose(np.asarray(trv), np.exp(-ana), rtol=1e-3)


def test_hetero_voxel_lookup():
    from tungsten_tpu.models import media as md
    from tungsten_tpu.ops import sparse_conv as sc_ops
    from tungsten_tpu.scene.parse import parse_gp
    grid = np.zeros((4, 4, 4), np.float32)
    grid[:, :2, :] = 2.0  # dense lower half (y < 0.5)
    med = md.Medium(
        sigma_a=jnp.zeros(3), sigma_s=jnp.ones(3),
        density=jnp.float32(1.0), step_size=jnp.float32(0.01),
        cfg=sc_ops.SparseConvConfig.create(), gp=parse_gp({}),
        hg_g=jnp.float32(0.0),
        field_params=jnp.asarray(
            np.array([0, 0, 0, 0, 1, 1, 1, 0], np.float32)),
        grid=jnp.asarray(grid),
        kind=md.MEDIUM_VOXEL)
    p = jnp.asarray([[0.5, 0.1, 0.5], [0.5, 0.9, 0.5], [2.0, 0.5, 0.5]])
    rho = md.hetero_density(med, p)
    assert float(rho[0]) > 1.5       # dense half
    assert float(rho[1]) < 0.3       # sparse half
    assert float(rho[2]) == 0.0      # outside bbox


def test_homogeneous_davis_energy():
    """Homogeneous medium with a Davis law: E[weight] stays near 1 on a
    closed segment (unbiased Tr/pdf estimator)."""
    from tungsten_tpu.models import media as md
    from tungsten_tpu.ops import sparse_conv as sc_ops
    from tungsten_tpu.scene.parse import parse_gp
    from tungsten_tpu.models import transmittance as trm
    law = trm.make_law(trm.T_DAVIS, (1.5, 0, 0, 0))
    med = md.Medium(
        sigma_a=jnp.zeros(3), sigma_s=jnp.ones(3),
        density=jnp.float32(1.0), step_size=jnp.float32(0.01),
        cfg=sc_ops.SparseConvConfig.create(), gp=parse_gp({}),
        hg_g=jnp.float32(0.0), law=law, kind=md.MEDIUM_HOMOGENEOUS)
    rng = np.random.default_rng(0)
    R = 8192
    ro = jnp.zeros((R, 3))
    rd = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (R, 1))
    st = md.MediumState.make(R)
    res, _ = md.sample_distance(
        med, jnp.uint32(0), ro, rd, jnp.zeros(R), jnp.full(R, 1.0), st,
        jnp.zeros((R, 4), jnp.uint32),
        jnp.asarray(rng.uniform(size=R).astype(np.float32)),
        jnp.ones(R, bool))
    w = np.asarray(res["weight"][:, 0])
    # E[w] = P(hit)*E[Tr/pdf | hit] + P(exit)*E[Tr_s/P_s | exit] = Tr-ish;
    # for an unbiased estimator the combined mean equals 1 (albedo 1)
    assert np.isfinite(w).all()
    assert abs(w.mean() - 1.0) < 0.05, w.mean()

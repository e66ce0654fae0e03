import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.models import media as md
from tungsten_tpu.ops import sparse_conv as sc
from tungsten_tpu.ops.covariance import SquaredExponentialCov
from tungsten_tpu.ops.means import SphericalMean


def make_medium(sigma=1e-4, l=0.3, kind=md.GPIS_SPARSE_CONV, **cfg_kw):
    gp = sc.GP(mean=SphericalMean.create(center=(0, 0, 0), radius=0.5),
               cov=SquaredExponentialCov.create(sigma=sigma, l=l))
    return md.Medium(
        sigma_a=jnp.zeros(3), sigma_s=jnp.ones(3), density=jnp.float32(1.0),
        step_size=jnp.float32(0.01),
        cfg=sc.SparseConvConfig.create(ctxt=sc.CTXT_RENEWAL, **cfg_kw),
        gp=gp, hg_g=jnp.float32(0.0), kind=kind)


def rays_toward_sphere(n=4):
    ro = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (n, 1))
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    return ro, rd


PSS = jnp.tile(jnp.array([[3, 5, 0, 0]], jnp.uint32), (4, 1))


class TestSparseConvMarch:
    def test_low_noise_recovers_mean_surface(self):
        """sigma -> 0: the GPIS is the mean SDF; the march must find the
        analytic sphere intersection t = 1.5 +- step."""
        med = make_medium(sigma=1e-5)
        ro, rd = rays_toward_sphere()
        state = md.MediumState.make(4)
        res, state2 = md.sample_distance(
            med, jnp.uint32(7), ro, rd, jnp.zeros(4), jnp.full(4, 4.0),
            state, PSS, jnp.full(4, 0.5), jnp.ones(4, bool))
        assert bool(jnp.all(~res["exited"]))
        np.testing.assert_allclose(np.asarray(res["t"]), 1.5, atol=0.03)
        # gradient points back toward the ray origin (outward normal)
        assert bool(jnp.all(md.dot(res["aniso"], rd) < 0))
        assert bool(jnp.all(~res["failed"]))
        # state advanced
        assert bool(jnp.all(~state2.first_scatter))
        np.testing.assert_allclose(np.asarray(state2.last_val), 0.0,
                                   atol=1e-6)

    def test_miss_reports_exit_and_end_value(self):
        med = make_medium(sigma=1e-5)
        ro = jnp.tile(jnp.array([[0.0, 2.0, 2.0]]), (4, 1))  # passes above
        rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))
        state = md.MediumState.make(4)
        res, state2 = md.sample_distance(
            med, jnp.uint32(7), ro, rd, jnp.zeros(4), jnp.full(4, 4.0),
            state, PSS, jnp.full(4, 0.5), jnp.ones(4, bool))
        assert bool(jnp.all(res["exited"]))
        np.testing.assert_allclose(np.asarray(res["t"]), 4.0, atol=1e-5)
        # end value stored for the next segment's conditioning
        assert bool(jnp.all(state2.last_val > 0.5))

    def test_transmittance_binary(self):
        med = make_medium(sigma=1e-5)
        ro, rd = rays_toward_sphere()
        state = md.MediumState.make(4)
        tr = md.transmittance(med, jnp.uint32(7), ro, rd, jnp.zeros(4),
                              jnp.full(4, 4.0), state, PSS,
                              jnp.full(4, 0.5), jnp.ones(4, bool))
        np.testing.assert_allclose(np.asarray(tr), 0.0)
        ro2 = jnp.tile(jnp.array([[0.0, 2.0, 2.0]]), (4, 1))
        tr2 = md.transmittance(med, jnp.uint32(7), ro2, rd, jnp.zeros(4),
                               jnp.full(4, 4.0), state, PSS,
                               jnp.full(4, 0.5), jnp.ones(4, bool))
        np.testing.assert_allclose(np.asarray(tr2), 1.0)

    def test_noisy_surface_hits_scatter_around_mean(self):
        """With noise, hit distances spread around the mean crossing and the
        wrong-side-gradient guard never passes bad states through."""
        med = make_medium(sigma=0.05, l=0.2)
        R = 32
        ro = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (R, 1))
        rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (R, 1))
        pss = jnp.stack([jnp.arange(R, dtype=jnp.uint32),
                         jnp.zeros(R, jnp.uint32),
                         jnp.zeros(R, jnp.uint32),
                         jnp.zeros(R, jnp.uint32)], axis=-1)
        state = md.MediumState.make(R)
        res, _ = md.sample_distance(
            med, jnp.uint32(7), ro, rd, jnp.zeros(R), jnp.full(R, 4.0),
            state, pss, jnp.full(R, 0.5), jnp.ones(R, bool))
        hits = ~np.asarray(res["exited"])
        assert hits.mean() > 0.9
        t = np.asarray(res["t"])[hits]
        assert abs(t.mean() - 1.5) < 0.1
        assert t.std() > 0.005  # stochastic surface

    def test_differentiable_hit_distance(self):
        """IFT reattachment: d t_hit / d radius ~= -1 for a sphere mean
        (growing the sphere pulls the hit closer)."""
        def t_of_radius(r):
            gp = sc.GP(mean=SphericalMean.create(center=(0, 0, 0), radius=r),
                       cov=SquaredExponentialCov.create(sigma=1e-5, l=0.3))
            med = dataclasses.replace(make_medium(sigma=1e-5), gp=gp)
            ro, rd = rays_toward_sphere()
            state = md.MediumState.make(4)
            res, _ = md.sample_distance(
                med, jnp.uint32(7), ro, rd, jnp.zeros(4), jnp.full(4, 4.0),
                state, PSS, jnp.full(4, 0.5), jnp.ones(4, bool))
            return jnp.sum(res["t"]) / 4.0

        g = jax.grad(t_of_radius)(jnp.float32(0.5))
        np.testing.assert_allclose(float(g), -1.0, atol=0.05)


class TestWeightSpaceMarch:
    def test_low_noise_recovers_mean_surface(self):
        med = make_medium(sigma=1e-5, kind=md.GPIS_WEIGHT_SPACE)
        med = dataclasses.replace(med, basis_functions=64)
        ro, rd = rays_toward_sphere()
        state = md.MediumState.make(4)
        res, _ = md.sample_distance(
            med, jnp.uint32(7), ro, rd, jnp.zeros(4), jnp.full(4, 4.0),
            state, PSS, jnp.full(4, 0.5), jnp.ones(4, bool))
        assert bool(jnp.all(~res["exited"]))
        np.testing.assert_allclose(np.asarray(res["t"]), 1.5, atol=0.03)


class TestFunctionSpaceMarch:
    def test_low_noise_recovers_mean_surface(self):
        med = make_medium(sigma=1e-4, kind=md.GPIS_FUNCTION_SPACE)
        med = dataclasses.replace(med, sample_points=24,
                                  step_size=jnp.float32(0.0))
        ro, rd = rays_toward_sphere()
        state = md.MediumState.make(4)
        res, _ = md.sample_distance(
            med, jnp.uint32(7), ro, rd, jnp.zeros(4), jnp.full(4, 4.0),
            state, PSS, jnp.full(4, 0.5), jnp.ones(4, bool))
        assert bool(jnp.all(~res["exited"]))
        np.testing.assert_allclose(np.asarray(res["t"]), 1.5, atol=0.1)

    def test_noisy_mean_and_spread(self):
        med = make_medium(sigma=0.03, l=0.3, kind=md.GPIS_FUNCTION_SPACE)
        med = dataclasses.replace(med, sample_points=24,
                                  step_size=jnp.float32(0.0))
        R = 16
        ro = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (R, 1))
        rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (R, 1))
        pss = jnp.stack([jnp.arange(R, dtype=jnp.uint32)] +
                        [jnp.zeros(R, jnp.uint32)] * 3, axis=-1)
        state = md.MediumState.make(R)
        res, _ = md.sample_distance(
            med, jnp.uint32(9), ro, rd, jnp.zeros(R), jnp.full(R, 4.0),
            state, pss, jnp.full(R, 0.5), jnp.ones(R, bool))
        hits = ~np.asarray(res["exited"])
        assert hits.mean() > 0.85
        t = np.asarray(res["t"])[hits]
        assert abs(t.mean() - 1.5) < 0.15
        assert t.std() > 0.002


class TestGpColorEmission:
    """GP scatter color / volume emission fields
    (GaussianProcessMedium.cpp:316-317, GPFunctions.hpp:849-857)."""

    def _colored_medium(self):
        from tungsten_tpu.ops.fields import Field
        gp = sc.GP(mean=SphericalMean.create(center=(0, 0, 0), radius=0.5),
                   cov=SquaredExponentialCov.create(sigma=1e-5, l=0.3),
                   color_field=Field.constant([0.9, 0.4, 0.1],
                                              is_vector=True),
                   emission_field=Field.constant([0.0, 2.0, 0.5],
                                                 is_vector=True))
        return md.Medium(
            sigma_a=jnp.zeros(3), sigma_s=jnp.ones(3),
            density=jnp.float32(1.0), step_size=jnp.float32(0.01),
            cfg=sc.SparseConvConfig.create(ctxt=sc.CTXT_RENEWAL),
            gp=gp, hg_g=jnp.float32(0.0), kind=md.GPIS_SPARSE_CONV)

    def test_scatter_weight_carries_color_and_emission(self):
        med = self._colored_medium()
        ro, rd = rays_toward_sphere()
        state = md.MediumState.make(4)
        res, _ = md.sample_distance(
            med, jnp.uint32(7), ro, rd, jnp.zeros(4), jnp.full(4, 4.0),
            state, PSS, jnp.full(4, 0.5), jnp.ones(4, bool))
        assert bool(jnp.all(~res["exited"]))
        np.testing.assert_allclose(np.asarray(res["weight"]),
                                   np.tile([[0.9, 0.4, 0.1]], (4, 1)),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(res["emission"]),
                                   np.tile([[0.0, 2.0, 0.5]], (4, 1)),
                                   rtol=1e-5)

    def test_exit_has_no_color_or_emission(self):
        med = self._colored_medium()
        ro = jnp.tile(jnp.array([[0.0, 2.0, 2.0]]), (4, 1))
        rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))
        state = md.MediumState.make(4)
        res, _ = md.sample_distance(
            med, jnp.uint32(7), ro, rd, jnp.zeros(4), jnp.full(4, 4.0),
            state, PSS, jnp.full(4, 0.5), jnp.ones(4, bool))
        assert bool(jnp.all(res["exited"]))
        np.testing.assert_allclose(np.asarray(res["weight"]), 1.0)
        np.testing.assert_allclose(np.asarray(res["emission"]), 0.0)

    def test_gray_matches_fieldless(self):
        """A constant-1 color / 0 emission field must be bit-identical to no
        field at all."""
        med0 = make_medium(sigma=1e-5)
        from tungsten_tpu.ops.fields import Field
        med1 = dataclasses.replace(
            med0, gp=dataclasses.replace(
                med0.gp,
                color_field=Field.constant([1.0, 1.0, 1.0], is_vector=True),
                emission_field=Field.constant([0.0, 0.0, 0.0],
                                              is_vector=True)))
        ro, rd = rays_toward_sphere()
        state = md.MediumState.make(4)
        r0, _ = md.sample_distance(med0, jnp.uint32(7), ro, rd, jnp.zeros(4),
                                   jnp.full(4, 4.0), state, PSS,
                                   jnp.full(4, 0.5), jnp.ones(4, bool))
        r1, _ = md.sample_distance(med1, jnp.uint32(7), ro, rd, jnp.zeros(4),
                                   jnp.full(4, 4.0), state, PSS,
                                   jnp.full(4, 0.5), jnp.ones(4, bool))
        np.testing.assert_array_equal(np.asarray(r0["weight"]),
                                      np.asarray(r1["weight"]))
        np.testing.assert_array_equal(np.asarray(r0["t"]),
                                      np.asarray(r1["t"]))

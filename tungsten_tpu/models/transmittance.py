"""Non-exponential free-flight transmittance laws.

Re-design of src/core/transmittances/ (Exponential, Erlang, Davis,
DavisWeinstein, DoubleExponential, Linear, Quadratic, Pulse, Tabulated /
GaussianProcessTransmittance) as one branch-free law table.  The four-regime
API follows Transmittance.hpp:22-57: eval(tau, startOnSurface, endOnSurface)
dispatches to surfaceSurface / mediumSurface / mediumMedium/sigmaBar, and
free-flight sampling has surface- and medium-started variants.

All laws are gray (scalar tau) — the classic media drive them with the mean
extinction, matching how the paper's comparisons use them.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import static_field, struct

T_EXPONENTIAL = 0
T_ERLANG = 1
T_DAVIS = 2
T_DOUBLE_EXP = 3
T_LINEAR = 4
T_QUADRATIC = 5
T_PULSE = 6
T_TABULATED = 7  # GaussianProcessTransmittance / TabulatedTransmittance


@struct(meta=("kind",))
class TransmittanceLaw:
    params: jnp.ndarray   # [4]: law-specific (lambda/alpha/sigA,sigB/maxT/a,b,N)
    tab_ts: jnp.ndarray   # [K] tau grid (tabulated)
    tab_pp: jnp.ndarray   # [K] medium-medium
    tab_pf: jnp.ndarray   # [K] medium-surface
    tab_fp: jnp.ndarray   # [K] surface-medium
    tab_ff: jnp.ndarray   # [K] surface-surface
    kind: int = static_field(default=T_EXPONENTIAL)


def make_law(kind=T_EXPONENTIAL, params=(1.0, 0.0, 0.0, 0.0),
             ts=None, pp=None, pf=None, fp=None, ff=None) -> TransmittanceLaw:
    z = jnp.zeros(1, jnp.float32)
    arr = (lambda x, d: jnp.asarray(np.asarray(x, np.float32))
           if x is not None else d)
    return TransmittanceLaw(
        params=jnp.asarray(np.asarray(params, np.float32)),
        tab_ts=arr(ts, z), tab_pp=arr(pp, z), tab_pf=arr(pf, z),
        tab_fp=arr(fp, z), tab_ff=arr(ff, z), kind=kind)


def _tab_lookup(law, table, tau):
    k = law.tab_ts.shape[0]
    idx = jnp.clip((k * tau / jnp.maximum(law.tab_ts[-1], 1e-12))
                   .astype(jnp.int32), 0, k - 1)
    return table[idx]


def surface_surface(law: TransmittanceLaw, tau):
    p = law.params
    if law.kind == T_EXPONENTIAL:
        return jnp.exp(-p[0] * tau)
    if law.kind == T_ERLANG:
        lt = p[0] * tau
        return 0.5 * jnp.exp(-lt) * (2.0 + lt)
    if law.kind == T_DAVIS:
        return (1.0 + tau / p[0]) ** (-p[0])
    if law.kind == T_DOUBLE_EXP:
        return 0.5 * (jnp.exp(-p[0] * tau) + jnp.exp(-p[1] * tau))
    if law.kind == T_LINEAR:
        return 1.0 - jnp.minimum(tau / p[0], 1.0)
    if law.kind == T_QUADRATIC:
        t = jnp.minimum(tau / p[0], 1.0)
        return (1.0 - t) ** 2
    if law.kind == T_PULSE:
        a, b, n = p[0], p[1], p[2]
        idx_f = jnp.clip(n * (tau - a) / (b - a) + 0.5, 0.0, n)
        idx = jnp.floor(idx_f)
        height = (n - idx) / n
        cell = height * (idx_f - idx)
        cell = jnp.where(idx > 0,
                         cell + (idx - 0.5) - idx * (idx - 1) / (2.0 * n),
                         cell - 0.5)
        return 1.0 - (2.0 / n) * cell
    return _tab_lookup(law, law.tab_ff, tau)


def medium_surface(law: TransmittanceLaw, tau):
    p = law.params
    if law.kind == T_EXPONENTIAL:
        return jnp.exp(-p[0] * tau)
    if law.kind == T_ERLANG:
        lt = p[0] * tau
        return jnp.exp(-lt) * (1.0 + lt)
    if law.kind == T_DAVIS:
        return (1.0 + tau / p[0]) ** (-(p[0] + 1.0))
    if law.kind == T_DOUBLE_EXP:
        return ((p[0] * jnp.exp(-p[0] * tau) + p[1] * jnp.exp(-p[1] * tau))
                / (p[0] + p[1]))
    if law.kind == T_LINEAR:
        return jnp.where(tau < p[0], 1.0, 0.0)
    if law.kind == T_QUADRATIC:
        return 1.0 - jnp.minimum(tau / p[0], 1.0)
    if law.kind == T_PULSE:
        a, b, n = p[0], p[1], p[2]
        idx = jnp.clip(jnp.floor(n * (tau - a) / (b - a) + 0.5), 0.0, n)
        return 1.0 - idx / n
    return _tab_lookup(law, law.tab_pf, tau)


def surface_medium(law: TransmittanceLaw, tau):
    p = law.params
    if law.kind == T_EXPONENTIAL:
        return p[0] * jnp.exp(-p[0] * tau)
    if law.kind == T_ERLANG:
        return medium_surface(law, tau) * p[0] * 0.5
    if law.kind == T_DAVIS:
        return (1.0 + tau / p[0]) ** (-(p[0] + 1.0))
    if law.kind == T_DOUBLE_EXP:
        return 0.5 * (p[0] * jnp.exp(-p[0] * tau)
                      + p[1] * jnp.exp(-p[1] * tau))
    if law.kind == T_LINEAR:
        return jnp.where(tau < p[0], 1.0 / p[0], 0.0)
    if law.kind == T_QUADRATIC:
        return (2.0 / p[0]) * (1.0 - jnp.minimum(tau / p[0], 1.0))
    if law.kind == T_PULSE:
        return 2.0 / (p[1] - p[0]) * medium_surface(law, tau)
    return _tab_lookup(law, law.tab_fp, tau)


def medium_medium(law: TransmittanceLaw, tau):
    p = law.params
    if law.kind == T_EXPONENTIAL:
        return p[0] * jnp.exp(-p[0] * tau)
    if law.kind == T_ERLANG:
        return p[0] ** 2 * tau * jnp.exp(-p[0] * tau)
    if law.kind == T_DAVIS:
        return (1.0 + 1.0 / p[0]) * (1.0 + tau / p[0]) ** (-(p[0] + 2.0))
    if law.kind == T_DOUBLE_EXP:
        return ((p[0] ** 2 * jnp.exp(-p[0] * tau)
                 + p[1] ** 2 * jnp.exp(-p[1] * tau)) / (p[0] + p[1]))
    if law.kind == T_LINEAR:
        # Dirac at maxT: represent as a narrow box (isDirac path)
        return jnp.where(jnp.abs(tau - p[0]) < 1e-3 * p[0],
                         1.0 / (2e-3 * p[0]), 0.0)
    if law.kind == T_QUADRATIC:
        return jnp.where(tau < p[0], 1.0 / p[0], 0.0)
    if law.kind == T_PULSE:
        a, b, n = p[0], p[1], p[2]
        idx_f = jnp.clip(n * (tau - a) / (b - a), 0.0, n)
        on = jnp.abs(idx_f - jnp.floor(idx_f) - 0.5) < 1e-3
        return jnp.where(on, 1.0 / n, 0.0)
    return _tab_lookup(law, law.tab_pp, tau)


def sigma_bar(law: TransmittanceLaw):
    p = law.params
    if law.kind == T_EXPONENTIAL:
        return p[0]
    if law.kind == T_ERLANG:
        return p[0] * 0.5
    if law.kind == T_DAVIS:
        return jnp.float32(1.0)
    if law.kind == T_DOUBLE_EXP:
        return 0.5 * (p[0] + p[1])
    if law.kind == T_LINEAR:
        return 1.0 / p[0]
    if law.kind == T_QUADRATIC:
        return 2.0 / p[0]
    if law.kind == T_PULSE:
        return 2.0 / (p[1] - p[0])
    return surface_medium(law, jnp.float32(0.0))


def eval_tr(law: TransmittanceLaw, tau, start_surf: bool, end_surf: bool):
    """Transmittance.hpp:22-30."""
    if start_surf and end_surf:
        return surface_surface(law, tau)
    if not start_surf and not end_surf:
        return medium_medium(law, tau) / jnp.maximum(sigma_bar(law), 1e-12)
    return medium_surface(law, tau)


def medium_pdf(law: TransmittanceLaw, tau, start_surf: bool):
    return (surface_medium(law, tau) if start_surf
            else medium_medium(law, tau))


def surface_probability(law: TransmittanceLaw, tau, start_surf: bool):
    return (surface_surface(law, tau) if start_surf
            else medium_surface(law, tau))


def _invert_cdf(cdf_fn, u, hi0=1.0, iters=60):
    """Bisection inversion of a monotone free-flight cdf (the
    DavisWeinstein numeric-inversion pattern), fixed iteration count."""
    # grow hi until cdf(hi) > u (bounded doublings)
    def grow(_, hi):
        return jnp.where(cdf_fn(hi) < u, hi * 2.0, hi)
    hi = jax.lax.fori_loop(0, 40, grow, jnp.float32(hi0))

    def bis(_, lh):
        lo, h = lh
        mid = 0.5 * (lo + h)
        below = cdf_fn(mid) < u
        return (jnp.where(below, mid, lo), jnp.where(below, h, mid))

    lo, hi = jax.lax.fori_loop(0, iters, bis, (jnp.float32(0.0), hi))
    return 0.5 * (lo + hi)


def sample_tau(law: TransmittanceLaw, u1, u2, start_surf: bool):
    """Free-flight optical-depth sample (sampleSurface/sampleMedium)."""
    p = law.params
    if law.kind == T_EXPONENTIAL:
        return -jnp.log1p(-jnp.clip(u1, 0.0, 0.999999)) / p[0]
    if law.kind == T_ERLANG:
        e1 = -jnp.log(jnp.maximum(u1, 1e-12))
        e2 = -jnp.log(jnp.maximum(jnp.abs(2.0 * u2 - 1.0), 1e-12))
        if start_surf:
            # pdf sm = 0.5*lam*e^{-lt}(1+lt): equal mixture of Exp and
            # Erlang-2 (matches -d ss/dtau exactly)
            return jnp.where(u2 < 0.5, e1 / p[0], (e1 + e2) / p[0])
        # pdf mm = lam^2 tau e^{-lt}: Erlang-2
        return (e1 + e2) / p[0]
    if law.kind == T_DAVIS:
        ex = -1.0 / p[0] if start_surf else -1.0 / (1.0 + p[0])
        return p[0] * ((1.0 - jnp.clip(u1, 0.0, 0.999999)) ** ex - 1.0)
    if law.kind == T_DOUBLE_EXP:
        t = -jnp.log(jnp.maximum(u1, 1e-12))
        pa = 0.5 if start_surf else p[0] / (p[0] + p[1])
        return jnp.where(u2 < pa, t / p[0], t / p[1])
    if law.kind == T_LINEAR:
        return p[0] * u1 if start_surf else p[0]
    if law.kind == T_QUADRATIC:
        return (p[0] * (1.0 - jnp.sqrt(jnp.maximum(1.0 - u1, 0.0)))
                if start_surf else p[0] * u1)
    if law.kind == T_PULSE:
        a, b, n = p[0], p[1], p[2]
        if start_surf:
            # CDF of surfaceMedium is piecewise-linear; numeric inversion
            return _invert_cdf(
                lambda t: 1.0 - surface_surface(law, t), u1, hi0=b)
        k = jnp.floor(u1 * n)
        return a + (0.5 + k) / n * (b - a)
    # tabulated: inverse-CDF over the stored pdf rows
    pdf = law.tab_fp if start_surf else law.tab_pp
    cdf = jnp.cumsum(pdf)
    cdf = cdf / jnp.maximum(cdf[-1], 1e-12)
    idx = jnp.clip(jnp.searchsorted(cdf, u1), 0, law.tab_ts.shape[0] - 1)
    return law.tab_ts[idx]

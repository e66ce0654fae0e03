"""Function-space GP: exact batched conditioning via dense covariance solves.

TPU-native re-design of GaussianProcess/MultivariateNormalDistribution
(src/core/math/GaussianProcess.cpp:314-753, src/core/sampling/Gaussian.cpp:122-234).
Everything operates on fixed-size point batches so one ray segment is a single
dense (N+2)x(N+2) problem; rays are vmapped, so the chip sees batched
matmul/Cholesky — MXU work.

Derivative bookkeeping: the reference tags each row with Derivative::None or
Derivative::First + a direction (GaussianProcess.hpp:122-134).  Here a row is
(point[3], dtype in {0,1}, ddir[3]) and the covariance between rows comes from
jax.jvp of the base kernel — replacing the reference's autodiff duals
(GPFunctions.cpp:490-504) with JAX's own forward mode.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import rng as trng
from ..utils.vecmath import dot

D_NONE = 0
D_FIRST = 1


def cov_entry(cov_fn, pa, da, dira, pb, db, dirb):
    """cov between two (possibly derivative) observations.

    d/da, d/db, d2/dadb via nested jvp (CovarianceFunction::operator(),
    GPFunctions.hpp:1145-1158)."""
    def k(a, b):
        return cov_fn(a, b)

    def ka(a):
        return k(a, pb)

    v00 = k(pa, pb)
    # directional derivative wrt a
    _, v10 = jax.jvp(lambda a: k(a, pb), (pa,), (dira,))
    _, v01 = jax.jvp(lambda b: k(pa, b), (pb,), (dirb,))

    def da_fn(b):
        _, t = jax.jvp(lambda a: k(a, b), (pa,), (dira,))
        return t

    _, v11 = jax.jvp(da_fn, (pb,), (dirb,))

    da_is_first = da == D_FIRST
    db_is_first = db == D_FIRST
    return jnp.where(
        da_is_first & db_is_first, v11,
        jnp.where(da_is_first, v10, jnp.where(db_is_first, v01, v00)))


def cov_matrix(cov_fn, pts_a, dts_a, dirs_a, pts_b, dts_b, dirs_b):
    """Dense cross-covariance [Na, Nb] (cov_prior, GaussianProcess.cpp:461-498)."""
    def row(pa, da, ga):
        return jax.vmap(lambda pb, db, gb: cov_entry(
            cov_fn, pa, da, ga, pb, db, gb))(pts_b, dts_b, dirs_b)

    return jax.vmap(row)(pts_a, dts_a, dirs_a)


def mean_vector(gp, pts, dts, dirs):
    """Mean rows: value or directional derivative of the (min-)mean
    (mean_prior, GaussianProcess.cpp:395-415). Returns (mean, ids)."""
    m, ids = gp.mean_and_id(pts)
    g = gp.mean_grad_by_id(pts, ids)
    dm = dot(g, dirs)
    return jnp.where(dts == D_FIRST, dm, m), ids


def _use_eigh():
    """eigh crashes the axon TPU runtime when invoked inside vmapped
    while_loops (observed kernel faults); on accelerators the escalating
    Cholesky path below replaces it.  Trace-time switch."""
    import jax as _jax
    return _jax.default_backend() == "cpu"


_NS_ITERS = 16


def _ns_sqrt_pair(a, jitter, iters=_NS_ITERS):
    """Coupled Newton-Schulz iteration: returns (Y ~ sqrt(A)/sqrt(s),
    Z ~ sqrt(s) inv(sqrt(A)), s) for A = a + jitter*scale*I.

    Pure batched matmuls — on TPU this rides the MXU, where the XLA
    cholesky custom-call for [R, n, n] batches of small n is the FS
    bottleneck (85% of the pass, artifacts/profile_ws_r5.py on
    gpis-function-space).  Trace normalization puts the spectrum in (0, 1]
    so the iteration converges for any PSD A; the relative jitter floors
    the smallest eigenvalue exactly like the Cholesky ladder did."""
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    scale = jnp.maximum(jnp.trace(a) / n, 1e-12)
    A = a + jitter * scale * eye
    s = jnp.maximum(jnp.trace(A), 1e-12)
    Y = A / s
    Z = eye
    # HIGHEST: the TPU's default f32 matmul precision (bf16 passes) is not
    # enough for the coupled iteration — the compounded rounding skewed the
    # FS sampling root until the function-space/CSG goldens failed on TPU
    # while the CPU (eigh) tier stayed green
    P = jax.lax.Precision.HIGHEST
    for _ in range(iters):
        T = 0.5 * (3.0 * eye - jnp.matmul(Z, Y, precision=P))
        Y = jnp.matmul(Y, T, precision=P)
        Z = jnp.matmul(T, Z, precision=P)
    return Y, Z, s


def _sqrt_psd(a, jitter=1e-5):
    """Matrix square root for realization sampling: eigh on CPU, coupled
    Newton-Schulz on TPU (MultivariateNormalDistribution ctor,
    Gaussian.cpp:122-170).  Any B with B B^T = A is a valid sampling
    root — the symmetric NS root replaces the r4 Cholesky ladder, whose
    batched small-matrix factorizations dominated the FS pass on TPU.

    The jitter scale MUST track the matrix's own variance scale: r3 floored
    it at 1.0, so the escalation fallback added 1e-2 ABSOLUTE variance —
    ~3x the signal for the paper configs (sigma=0.06 -> var 3.6e-3) — and
    TPU FS renders lost most scatter events (blobs rendered dark vs the
    CPU/eigh path).  Relative jitter instead."""
    if _use_eigh():
        w, v = jnp.linalg.eigh(a)
        return v * jnp.sqrt(jnp.maximum(w, 1e-12))[None, :]
    Y, _, s = _ns_sqrt_pair(a, jitter)
    out = Y * jnp.sqrt(s)
    ok = jnp.all(jnp.isfinite(out))
    # non-finite safety net (spectrum pushed negative beyond the jitter by
    # fp cancellation): diagonal-only root keeps the sample bounded
    n = a.shape[-1]
    diag_fb = jnp.eye(n, dtype=a.dtype) \
        * jnp.sqrt(jnp.maximum(jnp.diagonal(a), 1e-12))[None, :]
    return jnp.where(ok, jnp.where(jnp.isfinite(out), out, 0.0), diag_fb)


def pseudo_inverse(a, eps_scale=1e-6):
    """Robust symmetric pseudo-inverse (GaussianProcess.cpp:656-662).
    CPU: eigendecomposition pinv (the reference's robust solver for chained
    conditioning).  TPU: escalating-jitter Cholesky inverse (ridge) — the
    conditioning matrices here keep masked rows at exact prior variance
    (FAR-row scheme), so they are positive definite up to fp noise."""
    n = a.shape[-1]
    if _use_eigh():
        w, v = jnp.linalg.eigh(a)
        eps = eps_scale * jnp.max(jnp.abs(w))
        w_inv = jnp.where(jnp.abs(w) <= eps, 0.0,
                          1.0 / jnp.where(w == 0, 1.0, w))
        return (v * w_inv[None, :]) @ v.T
    eye = jnp.eye(n, dtype=a.dtype)
    # relative jitter ladder — the r3 floor of 1.0 made the fallback ridge
    # 1e-2 ABSOLUTE, drowning small-variance conditioning systems on TPU
    # (see _sqrt_psd); two rungs since r5 (same rationale as _sqrt_psd)
    scale = jnp.maximum(jnp.trace(jnp.abs(a)) / n, 1e-12)
    c = jnp.zeros_like(a)
    ok = jnp.zeros((), bool)
    for j in (1e-5, 1e-2):
        cj = jnp.linalg.cholesky(a + j * scale * eye)
        okj = jnp.all(jnp.isfinite(cj))
        c = jnp.where(ok, c, jnp.where(okj, cj, 0.0))
        ok = ok | okj
    from jax.scipy.linalg import cho_solve
    return cho_solve((c, True), eye)


def psd_solve(a, b, eps_scale=1e-6):
    """a^+ @ b for symmetric PSD a.  CPU: eigendecomposition pseudo-inverse
    (the reference's robust solver, GaussianProcess.cpp:656-662).  TPU:
    coupled Newton-Schulz — inv(A) = Z Z / s from the same matmul-only
    iteration as _sqrt_psd (the batched-small-Cholesky custom call it
    replaces dominated the FS pass)."""
    if _use_eigh():
        return pseudo_inverse(a, eps_scale) @ b
    _, Z, s = _ns_sqrt_pair(a, 1e-5)
    P = jax.lax.Precision.HIGHEST
    inv = jnp.matmul(Z, Z, precision=P) / s
    out = jnp.matmul(inv, b, precision=P)
    ok = jnp.all(jnp.isfinite(out))
    # non-finite safety net: diagonal inverse
    dinv = 1.0 / jnp.maximum(jnp.diagonal(a), 1e-12)
    fb = dinv[:, None] * b
    return jnp.where(ok, jnp.where(jnp.isfinite(out), out, 0.0), fb)


from ..utils.pytree import struct as _struct


@_struct
class GlobalCond:
    """Precomputed global conditioning on a mesh point set
    (GaussianProcess::setConditioning, GaussianProcess.cpp:243-312):
    each unique vertex gives (value=0) and (normal-derivative=1) rows."""
    pts: jnp.ndarray      # [M,3]
    dts: jnp.ndarray      # [M]
    dirs: jnp.ndarray     # [M,3]
    values: jnp.ndarray   # [M]
    alpha: jnp.ndarray    # [M]   K11^+ (y - m1)
    k11_pinv: jnp.ndarray  # [M,M]


def build_global_cond(gp, cov_fn, verts, normals):
    """verts [V,3], normals [V,3] -> GlobalCond (loadResources,
    GaussianProcess.cpp:217-239: one None row value 0 + one First row
    value 1 per vertex)."""
    V = verts.shape[0]
    pts = jnp.concatenate([verts, verts])
    dts = jnp.concatenate([jnp.full(V, D_NONE, jnp.int32),
                           jnp.full(V, D_FIRST, jnp.int32)])
    dirs = jnp.concatenate([normals, normals])
    values = jnp.concatenate([jnp.zeros(V), jnp.ones(V)])
    k11 = cov_matrix(cov_fn, pts, dts, dirs, pts, dts, dirs)
    k11_pinv = pseudo_inverse(0.5 * (k11 + k11.T))
    m1, _ = mean_vector(gp, pts, dts, dirs)
    alpha = k11_pinv @ (values - m1)
    return GlobalCond(pts=pts, dts=dts, dirs=dirs, values=values,
                      alpha=alpha, k11_pinv=k11_pinv)


def _gc_cross(cov_fn, gc, pts, dts, dirs):
    return cov_matrix(cov_fn, gc.pts, gc.dts, gc.dirs, pts, dts, dirs)


def mean_cov_gc(gp, cov_fn, pts, dts, dirs):
    """Global-conditioned mean vector + covariance matrix for a query set
    (the GP every downstream consumer sees when conditioning data exists)."""
    m, ids = mean_vector(gp, pts, dts, dirs)
    K = cov_matrix(cov_fn, pts, dts, dirs, pts, dts, dirs)
    gc = gp.global_cond
    if gc is not None:
        k1x = _gc_cross(cov_fn, gc, pts, dts, dirs)  # [M,N]
        m = m + k1x.T @ gc.alpha
        K = K - k1x.T @ (gc.k11_pinv @ k1x)
    return m, K, ids


def conditional_mvn(gp, cov_fn, pts, dts, dirs, cond_pts, cond_dts, cond_dirs,
                    cond_vals):
    """Schur-complement conditioning (create_mvn_cond,
    GaussianProcess.cpp:664-753) on the (globally conditioned) GP.
    Returns (mean, cov_sqrt, ids)."""
    gc = gp.global_cond
    if gc is None:
        s11 = cov_matrix(cov_fn, cond_pts, cond_dts, cond_dirs,
                         cond_pts, cond_dts, cond_dirs)
        s12 = cov_matrix(cov_fn, cond_pts, cond_dts, cond_dirs,
                         pts, dts, dirs)
        m2, ids = mean_vector(gp, pts, dts, dirs)
        m1, _ = mean_vector(gp, cond_pts, cond_dts, cond_dirs)
        s22 = cov_matrix(cov_fn, pts, dts, dirs, pts, dts, dirs)
    else:
        all_pts = jnp.concatenate([cond_pts, pts])
        all_dts = jnp.concatenate([cond_dts, dts])
        all_dirs = jnp.concatenate([cond_dirs, dirs])
        m_all, K_all, ids_all = mean_cov_gc(gp, cov_fn, all_pts, all_dts,
                                            all_dirs)
        nc = cond_pts.shape[0]
        s11 = K_all[:nc, :nc]
        s12 = K_all[:nc, nc:]
        s22 = K_all[nc:, nc:]
        m1, m2 = m_all[:nc], m_all[nc:]
        ids = ids_all[nc:]
    solved = psd_solve(s11, s12).T  # [N, Nc]
    mean = m2 + solved @ (cond_vals - m1)
    s2 = s22 - solved @ s12
    return mean, _sqrt_psd(0.5 * (s2 + s2.T)), ids


def prior_mvn(gp, cov_fn, pts, dts, dirs):
    m, s, ids = mean_cov_gc(gp, cov_fn, pts, dts, dirs)
    return m, _sqrt_psd(0.5 * (s + s.T)), ids


def sample_mvn(mean, cov_sqrt, key, ctr):
    """One realization x = mean + sqrt(C) z (Gaussian.cpp:172-177)."""
    n = mean.shape[-1]
    idx = jnp.arange((n + 1) // 2, dtype=jnp.uint32)
    a, b = trng.normal2(key, ctr * jnp.uint32((n + 1) // 2) + idx)
    z = jnp.stack([a, b], axis=-1).reshape(-1)[:n]
    return mean + cov_sqrt @ z


def sample_mvn_constrained(mean, cov_sqrt, key, ctr, lo, hi, cmask,
                           max_tries=16):
    """Rejection-sampled realization under box constraints
    (MultivariateNormalDistribution::sample with Constraints,
    sampling/Gaussian.cpp:179-234).  cmask [N] bool marks constrained
    entries; lo/hi are scalars.  The reference retries up to 100000 times
    sequentially; here a fixed batch of `max_tries` candidates is drawn and
    the first passing one selected (vectorized, bounded — the last
    candidate is used when none passes, matching the reference's give-up
    branch)."""
    n = mean.shape[-1]

    def draw(i):
        return sample_mvn(mean, cov_sqrt, key,
                          ctr + jnp.uint32(1 + i) * jnp.uint32(7919))

    cands = jax.vmap(draw)(jnp.arange(max_tries, dtype=jnp.uint32))
    in_box = (cands >= lo) & (cands <= hi)
    ok = jnp.all(in_box | ~cmask[None, :], axis=-1)
    idx = jnp.argmax(ok)                      # first passing (0 if none)
    any_ok = jnp.any(ok)
    pick = jnp.where(any_ok, idx, max_tries - 1)
    return cands[pick], any_ok


def sample_truncated_normal(mean, sigma, a, key, ctr):
    """One-sided truncated normal via inverse-CDF (rand_truncated_normal,
    Gaussian.cpp:57-85): x >= a."""
    u = trng.uniform(key, ctr)
    from jax.scipy.special import erf, erfinv
    alpha = (a - mean) / jnp.maximum(sigma, 1e-12)
    phi_a = 0.5 * (1.0 + erf(alpha / jnp.sqrt(2.0)))
    uu = phi_a + u * (1.0 - phi_a)
    uu = jnp.clip(uu, 1e-7, 1.0 - 1e-7)
    return mean + sigma * jnp.sqrt(2.0) * erfinv(2.0 * uu - 1.0)


def gp_cdf(gp, cov_fn, p):
    """P(f(p) < 0) — free-flight skip criterion (GaussianProcess.cpp:776-782)."""
    from jax.scipy.special import erf
    if gp.global_cond is not None:
        mv, K, _ = mean_cov_gc(gp, cov_fn, p[None],
                               jnp.zeros(1, jnp.int32),
                               jnp.zeros((1, 3)))
        m, var = mv[0], K[0, 0]
    else:
        var = cov_fn(p, p)
        m, _ = gp.mean_and_id(p)
    return 0.5 * (1.0 + erf((0.0 - m) / jnp.sqrt(jnp.maximum(var, 1e-20))
                            / jnp.sqrt(2.0)))


def make_cov_fn(gp):
    """Base kernel over shell-embedded points (mean_and_cov embeds via
    shell_embedding, GaussianProcess.cpp:341; embedding enabled per-GP)."""
    cov = gp.cov

    def cov_fn(a, b):
        return cov.cov(a, b)

    return cov_fn

"""Function-space GPIS medium: exact batched GP conditioning along the ray.

Re-design of FunctionSpaceGaussianProcessMedium
(src/core/media/FunctionSpaceGaussianProcessMedium.cpp:58-346): each ray
segment places `sample_points` stratified points, draws one joint realization
of the GP conditioned on the carried memory (None / Renewal / Renewal+:
applyMemory, math/GaussianProcess.cpp:134-169), scans for the first sign
change, and samples a conditioned 3D gradient at the crossing
(GPRealNodeValues::sampleGrad, GaussianProcess.cpp:89-132).

TPU mapping: per-ray chunks become batched [R, N+2, N+2] dense solves via
eigh pseudo-inverse (the reference's only robust solver for chained
conditioning, GaussianProcess.cpp:692-694) — MXU work, vmapped over rays.
Chunk continuation runs under lax.while_loop with the 2-float Renewal+ carry.
Global context (unbounded append) is intentionally bounded here: out of
fixed-shape scope this round; Renewal+ matches the paper configs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import gp as gpmod
from ..ops import sparse_conv as sc
from ..utils import rng as trng
from ..utils.vecmath import dot, frame_to_world, normalize, tangent_frame

D_NONE = gpmod.D_NONE
D_FIRST = gpmod.D_FIRST


def _chunk_key(pss, scene_seed, chunk, salt=0):
    pss = pss.astype(jnp.uint32)
    k = (trng.xxhash32_4(pss[0], pss[1], pss[2], pss[3])
         + trng.xxhash32(scene_seed) + trng.xxhash32(chunk))
    if salt:
        # disjoint stream per CSG child: the two children's realizations
        # are INDEPENDENT GPs (GPSampleNodeCSG::sample samples each child
        # with its own draw, GaussianProcess.hpp:206-215)
        k = k ^ jnp.uint32(salt)
    return k


_FAR_ROW = 1.0e5  # masked conditioning rows move here (zero covariance)


def _sample_chunk_fast(med, scene_seed, ro_seg, rd, t0, dt, n, carry_val,
                       carry_grad, have_carry, pss, chunk_idx, u_offset,
                       gp=None, salt=0):
    """Renewal/Renewal+ chunk draw as ONE static-block joint solve.

    r4 ran three full conditional/prior MVN solves per chunk (carry,
    first-chunk, prior fallback) plus a separate (n+2)-row gradient solve —
    each building its own covariance with the generic 4-way derivative
    entries.  Here the derivative structure is STATIC (conditioning rows are
    [p0 value, p0 along-ray derivative]; queries are [n point values,
    end-point along-ray derivative]), so the covariance is assembled from
    value/deriv blocks with exactly the jvps needed, the three conditioning
    variants collapse into row masking of a single 2x2 system, and the carry
    derivative is drawn JOINTLY with the chunk values (equivalent in
    distribution to the reference's sample-then-conditioned-grad two-stage,
    GaussianProcess.cpp:89-132, by the Gaussian chain rule).

    Returns (ts[n], vals[n], end_deriv, ids[n]).
    """
    gp = med.gp if gp is None else gp
    cov_fn = gpmod.make_cov_fn(gp)
    use_deriv_row = med.cfg.ctxt == sc.CTXT_RENEWAL_PLUS  # static

    # stratified points (FunctionSpaceGaussianProcessMedium.cpp:114-124)
    i = jnp.arange(n, dtype=jnp.float32)
    frac = jnp.clip((i - u_offset) / (n - 1), 0.0, 1.0)
    ts = t0 + dt * 0.1 + (dt * n - dt * 0.1) * frac
    ts = ts.at[0].set(t0 + dt * 0.1).at[n - 1].set(t0 + dt * n)
    pts = ro_seg[None, :] + ts[:, None] * rd[None, :]

    key = _chunk_key(pss, scene_seed, chunk_idx, salt)
    p0 = ro_seg + t0 * rd

    P = jnp.concatenate([p0[None, :], pts])   # [n+1] value points
    D = jnp.stack([p0, pts[-1]])              # [2] deriv points (dir rd)

    def kd(a, b):
        return jax.jvp(lambda bb: cov_fn(a, bb), (b,), (rd,))[1]

    def kdd(a, b):
        return jax.jvp(lambda aa: kd(aa, b), (a,), (rd,))[1]

    K_vv = jax.vmap(lambda a: jax.vmap(lambda b: cov_fn(a, b))(P))(P)
    K_vd = jax.vmap(lambda a: jax.vmap(lambda b: kd(a, b))(D))(P)  # [n+1,2]
    K_dd = jax.vmap(lambda a: jax.vmap(lambda b: kdd(a, b))(D))(D)

    m_v, ids_all = gp.mean_and_id(P)
    g_mean = gp.mean_grad_by_id(D, gp.mean_and_id(D)[1])
    m_d = jax.vmap(lambda g: dot(g, rd))(g_mean)
    ids = ids_all[1:]

    # cond rows: [p0 value, p0 deriv]; queries: [pts values, end deriv]
    s11 = jnp.stack([jnp.stack([K_vv[0, 0], K_vd[0, 0]]),
                     jnp.stack([K_vd[0, 0], K_dd[0, 0]])])
    s12 = jnp.concatenate(
        [jnp.stack([K_vv[0, 1:], K_vd[1:, 0]]),           # [2, n]
         jnp.stack([K_vd[0, 1], K_dd[0, 1]])[:, None]], axis=1)  # [2, n+1]
    s22 = jnp.concatenate(
        [jnp.concatenate([K_vv[1:, 1:], K_vd[1:, 1:2]], axis=1),
         jnp.concatenate([K_vd[1:, 1:2].T, K_dd[1:2, 1:2]], axis=1)],
        axis=0)                                            # [n+1, n+1]
    m1 = jnp.stack([m_v[0], m_d[0]])
    m2 = jnp.concatenate([m_v[1:], m_d[1:2]])

    # no carry yet: first chunk conditions on a sampled positive start value
    # (sample_start_value, GaussianProcess.cpp:589-601); later no-carry
    # chunks fall back to the prior (both rows masked)
    first = (~have_carry) & (chunk_idx == 0)
    later = (~have_carry) & (chunk_idx > 0)
    v0 = jnp.maximum(0.0, gpmod.sample_truncated_normal(
        m_v[0], jnp.sqrt(jnp.maximum(K_vv[0, 0], 1e-20)), 0.0, key,
        jnp.uint32(7)))
    y = jnp.stack([jnp.where(first, v0, carry_val), carry_grad])
    keep = jnp.stack([~later,
                      have_carry if use_deriv_row else jnp.asarray(False)])

    scale = jnp.maximum(K_vv[0, 0], 1e-12)
    s11m = jnp.where(keep[:, None] & keep[None, :], s11,
                     jnp.eye(2) * scale)
    s12m = jnp.where(keep[:, None], s12, 0.0)
    ym = jnp.where(keep, y - m1, 0.0)
    # closed-form 2x2 solve with relative jitter
    a_ = s11m[0, 0] + 1e-6 * scale
    b_ = s11m[0, 1]
    c_ = s11m[1, 1] + 1e-6 * scale
    det = jnp.maximum(a_ * c_ - b_ * b_, 1e-20 * scale * scale)
    inv = jnp.stack([jnp.stack([c_, -b_]), jnp.stack([-b_, a_])]) / det
    solved = inv @ s12m                                   # [2, n+1]
    mean = m2 + solved.T @ ym
    s2 = s22 - s12m.T @ solved
    sqrt_cov = gpmod._sqrt_psd(0.5 * (s2 + s2.T))
    joint = gpmod.sample_mvn(mean, sqrt_cov, key, jnp.uint32(11))
    return ts, joint[:n], joint[n], ids


def _sample_chunk(med, scene_seed, ro_seg, rd, t0, dt, n, carry_val,
                  carry_grad, have_carry, pss, chunk_idx, u_offset,
                  ring=None, gp=None, salt=0):
    """Draw one conditioned realization over n points starting at t0.

    carry: (value, directional derivative) at t0 from the previous chunk
    (Renewal+ memory; Renewal passes have_carry grad masked off).  Under the
    Global context, `ring` = (pts[K,3], vals[K], dts[K], count) supplies the
    bounded conditioning-row window instead (applyMemory Global,
    GaussianProcess.cpp:165-168).
    Returns (ts[n], values[n], ids[n]).
    """
    gp = med.gp if gp is None else gp
    cov_fn = gpmod.make_cov_fn(gp)
    ctxt = med.cfg.ctxt

    # stratified points (FunctionSpaceGaussianProcessMedium.cpp:114-124)
    i = jnp.arange(n, dtype=jnp.float32)
    frac = jnp.clip((i - u_offset) / (n - 1), 0.0, 1.0)
    ts = t0 + dt * 0.1 + (dt * n - dt * 0.1) * frac
    ts = ts.at[0].set(t0 + dt * 0.1).at[n - 1].set(t0 + dt * n)
    pts = ro_seg[None, :] + ts[:, None] * rd[None, :]
    dts = jnp.full(n, D_NONE, jnp.int32)
    dirs = jnp.broadcast_to(rd, (n, 3))

    key = _chunk_key(pss, scene_seed, chunk_idx, salt)

    p0 = ro_seg + t0 * rd
    if ctxt == sc.CTXT_GLOBAL and ring is not None:
        # condition on the valid ring rows; invalid rows are moved FAR so the
        # pseudo-inverse drops them (zero covariance)
        r_pts, r_vals, r_dts, r_n = ring
        K = r_vals.shape[0]
        kidx = jnp.arange(K)
        keep = kidx < r_n
        cond_pts = jnp.where(keep[:, None], r_pts,
                             _FAR_ROW * (2.0 + kidx[:, None]).astype(
                                 jnp.float32) + ro_seg[None, :])
        cond_vals = jnp.where(keep, r_vals, 0.0)
        cond_dts = jnp.where(keep, r_dts, D_NONE)
        cond_dirs = jnp.broadcast_to(rd, (K, 3))
        mean, sqrt_cov, ids = gpmod.conditional_mvn(
            gp, cov_fn, pts, dts, dirs, cond_pts, cond_dts, cond_dirs,
            cond_vals)
        mean_p, sqrt_p, ids_p = gpmod.prior_mvn(gp, cov_fn, pts, dts, dirs)
        use_ring = r_n > 0
        mean = jnp.where(use_ring, mean, mean_p)
        sqrt_cov = jnp.where(use_ring, sqrt_cov, sqrt_p)
        ids = jnp.where(use_ring, ids, ids_p)
    elif ctxt in (sc.CTXT_RENEWAL, sc.CTXT_RENEWAL_PLUS):
        nc = 2 if ctxt == sc.CTXT_RENEWAL_PLUS else 1
        cond_pts = jnp.broadcast_to(p0, (nc, 3))
        cond_dts = jnp.asarray([D_NONE, D_FIRST][:nc], jnp.int32)
        cond_dirs = jnp.broadcast_to(rd, (nc, 3))
        cond_vals = jnp.stack([carry_val, carry_grad][:nc])
        mean, sqrt_cov, ids = gpmod.conditional_mvn(
            gp, cov_fn, pts, dts, dirs, cond_pts, cond_dts, cond_dirs,
            cond_vals)
        # no carry yet: condition the first chunk on a sampled positive
        # start value (sample_start_value, GaussianProcess.cpp:589-601)
        v0 = jnp.maximum(0.0, gpmod.sample_truncated_normal(
            gp.mean_and_id(p0)[0],
            jnp.sqrt(jnp.maximum(cov_fn(p0, p0), 1e-20)), 0.0, key,
            jnp.uint32(7)))
        mean_s, sqrt_s, ids_s = gpmod.conditional_mvn(
            gp, cov_fn, pts, dts, dirs, p0[None, :],
            jnp.asarray([D_NONE], jnp.int32), rd[None, :], v0[None])
        first = (~have_carry) & (chunk_idx == 0)
        mean = jnp.where(first, mean_s, mean)
        sqrt_cov = jnp.where(first, sqrt_s, sqrt_cov)
        ids = jnp.where(first, ids_s, ids)
        mean_p, sqrt_p, ids_p = gpmod.prior_mvn(gp, cov_fn, pts, dts, dirs)
        later = (~have_carry) & (chunk_idx > 0)
        mean = jnp.where(later, mean_p, mean)
        sqrt_cov = jnp.where(later, sqrt_p, sqrt_cov)
        ids = jnp.where(later, ids_p, ids)
    else:
        # None context: unconditioned prior, but the realization must start
        # on the outside (positive) side of the surface — box-constrained
        # rejection on sample 0 (FunctionSpaceGaussianProcessMedium.cpp's
        # Constraint {0, 0, 0, FLT_MAX}; sampler in Gaussian.cpp:179-234)
        mean, sqrt_cov, ids = gpmod.prior_mvn(gp, cov_fn, pts, dts, dirs)
        cmask = (jnp.arange(n) == 0)
        vals, _ok = gpmod.sample_mvn_constrained(
            mean, sqrt_cov, key, jnp.uint32(11), 0.0, jnp.float32(3e38),
            cmask)
        return ts, vals, ids

    vals = gpmod.sample_mvn(mean, sqrt_cov, key, jnp.uint32(11))
    return ts, vals, ids


def _find_crossing(ts, vals, skip_first):
    """First sign change; returns (crossed, idx, t_interp, v_prev, v_next)."""
    n = vals.shape[0]
    s = jnp.where(vals < 0, -1, 1)
    flips = s[1:] != s[:-1]
    if_skip = jnp.arange(n - 1) >= jnp.where(skip_first, 1, 0)
    flips = flips & if_skip
    any_flip = jnp.any(flips)
    idx = jnp.argmax(flips)  # first True
    v0, v1 = vals[idx], vals[idx + 1]
    off = v0 / jnp.where(v0 == v1, 1.0, v0 - v1)
    t = ts[idx] + (ts[idx + 1] - ts[idx]) * off
    return any_flip, idx, t, v0, v1, off


def _sample_grad_at(med, scene_seed, ro_seg, rd, ts, vals, cross_idx, t_cross,
                    off, crossed, pss, gp=None, salt=0, end_deriv=None):
    """Conditioned 3D gradient at the segment end (sampleGrad,
    GaussianProcess.cpp:89-132).

    Conditioning rows: the chunk's sample points up to the crossing, plus the
    interpolated crossing value and the along-ray derivative (makeIntersect,
    GaussianProcess.cpp:76-87).  Points past the crossing are masked by
    moving them far away (zero covariance — the pinv drops them), matching
    the reference's row truncation.

    `end_deriv`: when supplied (the fast chunk path draws it jointly with
    the chunk values), the not-crossed case conditions on it instead of
    sampling a fresh along-ray derivative — keeping the returned gradient
    consistent with the derivative already carried into the next chunk.
    r4 ran this whole solve every chunk; it now runs ONCE per ray segment,
    after the march loop.
    """
    gp = med.gp if gp is None else gp
    cov_fn = gpmod.make_cov_fn(gp)
    n = ts.shape[0]

    v_cross = vals[cross_idx] + (vals[cross_idx + 1] - vals[cross_idx]) * off
    # d/dt toward +t: (prevV - currV)/(prevT - currT) — the reference's
    # makeIntersect derivative row with dt = prevT - currT < 0
    # (GaussianProcess.cpp:83, FunctionSpaceGaussianProcessMedium.cpp:245).
    # r3 negated dt, flipping the along-ray gradient sign at EVERY crossing:
    # the wrong-side check then killed all FS scatter events and FS blobs
    # rendered near-black (found by the r4 TPU verify render; the bucketed
    # golden tolerance had hidden it).
    dt_local = ts[cross_idx] - ts[cross_idx + 1]
    dv_cross = (vals[cross_idx] - vals[cross_idx + 1]) / jnp.where(
        dt_local == 0, 1.0, dt_local)

    ip = ro_seg + jnp.where(crossed, t_cross, ts[-1])[None] * rd

    idx_all = jnp.arange(n)
    FAR = 1.0e5
    # rows after the crossing become no-ops; when not crossed, keep all rows
    keep = jnp.where(crossed, idx_all < cross_idx, jnp.ones(n, bool))
    row_pts = jnp.where(keep[:, None],
                        ro_seg[None, :] + ts[:, None] * rd[None, :],
                        ro_seg[None, :] + FAR * (2.0 + idx_all[:, None]))
    row_vals = jnp.where(keep, vals, 0.0)
    row_dts = jnp.full(n, D_NONE, jnp.int32)
    row_dirs = jnp.broadcast_to(rd, (n, 3))

    # crossing rows (value + derivative); when not crossed the value row is
    # dropped (it would duplicate the last chunk row) and the derivative row
    # carries end_deriv if available (else it is dropped too and the
    # along-ray component is sampled — reference conditions the full grad on
    # the plain chunk samples, GaussianProcess.cpp:111-127)
    have_ed = end_deriv is not None
    ed = end_deriv if have_ed else jnp.float32(0.0)
    extra_pts = jnp.stack([ip, ip])
    extra_dts = jnp.asarray([D_NONE, D_FIRST], jnp.int32)
    extra_dirs = jnp.stack([rd, rd])
    extra_vals = jnp.stack([jnp.where(crossed, v_cross, 0.0),
                            jnp.where(crossed, dv_cross, ed)])
    keep_deriv = jnp.asarray(True) if have_ed else crossed
    far_pts = ro_seg[None, :] + FAR * jnp.array([[1.002], [1.004]])
    extra_pts = jnp.where(
        jnp.stack([crossed, keep_deriv])[:, None], extra_pts, far_pts)

    cond_pts = jnp.concatenate([row_pts, extra_pts])
    cond_dts = jnp.concatenate([row_dts, extra_dts])
    cond_dirs = jnp.concatenate([row_dirs, extra_dirs])
    cond_vals = jnp.concatenate([row_vals, extra_vals])

    tg, bt = tangent_frame(rd)
    qry_pts = jnp.stack([ip, ip, ip])
    qry_dts = jnp.full(3, D_FIRST, jnp.int32)
    qry_dirs = jnp.stack([tg, bt, rd])

    mean, sqrt_cov, _ = gpmod.conditional_mvn(
        gp, cov_fn, qry_pts, qry_dts, qry_dirs, cond_pts, cond_dts, cond_dirs,
        cond_vals)
    key = _chunk_key(pss, scene_seed, jnp.uint32(0xD00D), salt)
    g = gpmod.sample_mvn(mean, sqrt_cov, key, jnp.uint32(23))
    # crossed: the along-ray derivative is pinned to the crossing derivative;
    # with a jointly-drawn end_deriv the not-crossed case is pinned too
    gz = jnp.where(crossed, dv_cross, ed if have_ed else g[2])
    grad = frame_to_world(tg, bt, rd, jnp.stack([g[0], g[1], gz]))
    return grad, v_cross, dv_cross


def _skip_space_advance(med, ro, rd, near, far):
    """Free-flight skip: advance near while P(f < 0) < skip_space
    (FunctionSpaceGaussianProcessMedium.cpp:71-90, GaussianProcess::cdf,
    GaussianProcess.cpp:776-782) — vectorized over a fixed probe block."""
    if med.skip_space <= 0.0:
        return near
    gp = med.gp
    cov_fn = gpmod.make_cov_fn(gp)
    step = jnp.where(med.step_size > 0, med.step_size, 0.01)
    S = 128
    i = jnp.arange(1, S + 1, dtype=jnp.float32)
    ts = near + i * step
    ps = ro[None, :] + ts[:, None] * rd[None, :]
    cdfs = jax.vmap(lambda p: gpmod.gp_cdf(gp, cov_fn, p))(ps)
    stop = (cdfs >= med.skip_space) | (ts >= far)
    idx = jnp.argmax(stop)  # first probe that must not be skipped
    n_skipped = jnp.where(jnp.any(stop), idx, S)
    return jnp.minimum(near + n_skipped.astype(jnp.float32) * step, far)


def _ring_push(ring, pt, val, dt_kind, enable):
    """Append one row to the bounded Global-context ring (oldest evicted)."""
    r_pts, r_vals, r_dts, r_n = ring
    K = r_vals.shape[0]
    full = r_n >= K
    r_pts2 = jnp.where(enable & full, jnp.roll(r_pts, -1, axis=0), r_pts)
    r_vals2 = jnp.where(enable & full, jnp.roll(r_vals, -1), r_vals)
    r_dts2 = jnp.where(enable & full, jnp.roll(r_dts, -1), r_dts)
    slot = jnp.minimum(r_n, K - 1)
    r_pts2 = jnp.where(enable, r_pts2.at[slot].set(pt), r_pts)
    r_vals2 = jnp.where(enable, r_vals2.at[slot].set(val), r_vals)
    r_dts2 = jnp.where(enable, r_dts2.at[slot].set(dt_kind), r_dts)
    r_n2 = jnp.where(enable, jnp.minimum(r_n + 1, K), r_n)
    return (r_pts2, r_vals2, r_dts2, r_n2)


def sample_distance_fs_one(med, scene_seed, ro, rd, near, far, first_scatter,
                           carry_val, carry_grad, have_carry, info_t, pss,
                           u_offset, active, ring_pts, ring_vals, ring_dts,
                           ring_n):
    """Single-ray chunked function-space march; designed for vmap.

    Returns dict(hit, t, grad[3], end_val, gp_id, ring_*)."""
    n = med.sample_points
    near = _skip_space_advance(med, ro, rd, near, far)
    seg_len = jnp.maximum(far - near, 1e-6)
    dt_full = seg_len / n
    dt = jnp.where((med.step_size > 0) & (med.step_size < dt_full),
                   med.step_size, dt_full)
    max_chunks = 64
    is_global = med.cfg.ctxt == sc.CTXT_GLOBAL
    is_renewal = med.cfg.ctxt in (sc.CTXT_RENEWAL, sc.CTXT_RENEWAL_PLUS)

    if is_renewal:
        # fast path: one joint solve per chunk, 3D gradient once after the
        # loop (see _sample_chunk_fast)
        def cond_f(c):
            return c["running"] & (c["chunk"] < max_chunks)

        def body_f(c):
            ts, vals, end_deriv, ids = _sample_chunk_fast(
                med, scene_seed, ro, rd, c["t0"], dt, n, c["carry_val"],
                c["carry_grad"], c["have_carry"], pss, c["chunk"], u_offset)
            skip_first = (~first_scatter) & (c["chunk"] == 0)
            crossed, idx, t_cross, _v0, _v1, off = _find_crossing(
                ts, vals, skip_first)
            v_cross = vals[idx] + (vals[idx + 1] - vals[idx]) * off
            dtl = ts[idx] - ts[idx + 1]
            dv_cross = (vals[idx] - vals[idx + 1]) / jnp.where(
                dtl == 0, 1.0, dtl)
            t_end = ts[-1]
            running = (~crossed) & (t_end < far - 1e-6)
            return {
                "t0": t_end,
                "chunk": c["chunk"] + jnp.uint32(1),
                "running": running,
                "hit": crossed,
                "t_hit": jnp.where(crossed, t_cross, far),
                "carry_val": jnp.where(crossed, v_cross, vals[-1]),
                "carry_grad": jnp.where(crossed, dv_cross, end_deriv),
                "have_carry": jnp.asarray(True),
                "gp_id": jnp.where(crossed, ids[idx], ids[-1]),
                "ts": ts, "vals": vals, "idx": idx, "off": off,
                "end_deriv": end_deriv,
            }

        init_f = {
            "t0": near, "chunk": jnp.uint32(0),
            "running": active,
            "hit": jnp.asarray(False),
            "t_hit": far,
            "carry_val": carry_val,
            "carry_grad": carry_grad,
            "have_carry": have_carry,
            "gp_id": jnp.int32(0),
            # benign spread-out init so the post-loop solve stays regular
            # for rays whose loop never ran
            "ts": near + jnp.arange(1, n + 1, dtype=jnp.float32),
            "vals": jnp.ones(n),
            "idx": jnp.int32(0), "off": jnp.float32(0.0),
            "end_deriv": jnp.float32(0.0),
        }
        out = jax.lax.while_loop(cond_f, body_f, init_f)
        grad, _vc, _dv = _sample_grad_at(
            med, scene_seed, ro, rd, out["ts"], out["vals"], out["idx"],
            out["t_hit"], out["off"], out["hit"], pss,
            end_deriv=out["end_deriv"])
        return {"hit": out["hit"] & active, "t": out["t_hit"],
                "grad": grad, "end_val": out["carry_val"],
                "gp_id": out["gp_id"],
                "ring_pts": ring_pts, "ring_vals": ring_vals,
                "ring_dts": ring_dts, "ring_n": ring_n}

    def cond(c):
        return c["running"] & (c["chunk"] < max_chunks)

    def body(c):
        t0 = c["t0"]
        ring = c["ring"]
        ts, vals, ids = _sample_chunk(
            med, scene_seed, ro, rd, t0, dt, n, c["carry_val"],
            c["carry_grad"], c["have_carry"], pss, c["chunk"], u_offset,
            ring=ring)
        skip_first = (~first_scatter) & (c["chunk"] == 0)
        crossed, idx, t_cross, v0, v1, off = _find_crossing(ts, vals,
                                                            skip_first)
        grad, v_cross, dv_cross = _sample_grad_at(
            med, scene_seed, ro, rd, ts, vals, idx, t_cross, off, crossed,
            pss)
        t_end = ts[-1]
        reached_far = t_end >= far - 1e-6
        running = (~crossed) & (~reached_far)
        if is_global:
            # bounded analog of the reference's append-everything: keep the
            # chunk end value, and on a crossing the (value, derivative)
            # rows at the intersect (applyMemory Global + makeIntersect)
            ip = ro + jnp.where(crossed, t_cross, t_end) * rd
            ring = _ring_push(ring, ro + t_end * rd, vals[-1], D_NONE,
                              ~crossed)
            ring = _ring_push(ring, ip, jnp.float32(0.0), D_NONE, crossed)
            ring = _ring_push(ring, ip, dot(grad, rd), D_FIRST, crossed)
        return {
            "t0": t_end,
            "chunk": c["chunk"] + jnp.uint32(1),
            "running": running,
            "hit": crossed,
            "t_hit": jnp.where(crossed, t_cross, far),
            "grad": grad,
            "end_val": vals[-1],
            "carry_val": jnp.where(crossed, v_cross, vals[-1]),
            "carry_grad": dot(grad, rd),
            "have_carry": jnp.asarray(True),
            "gp_id": jnp.where(crossed, ids[idx], ids[-1]),
            "ring": ring,
        }

    init = {
        "t0": near, "chunk": jnp.uint32(0),
        "running": active,
        "hit": jnp.asarray(False),
        "t_hit": far,
        "grad": jnp.zeros(3),
        "end_val": jnp.float32(0.0),
        "carry_val": carry_val,
        "carry_grad": carry_grad,
        "have_carry": have_carry,
        "gp_id": jnp.int32(0),
        "ring": (ring_pts, ring_vals, ring_dts, ring_n),
    }
    out = jax.lax.while_loop(cond, body, init)
    rp, rv, rdt, rn = out["ring"]
    return {"hit": out["hit"] & active, "t": out["t_hit"],
            "grad": out["grad"], "end_val": out["carry_val"],
            "gp_id": out["gp_id"],
            "ring_pts": rp, "ring_vals": rv, "ring_dts": rdt, "ring_n": rn}


# ---------------------------------------------------------------------------
# Two-GP CSG (union = min of realizations) — GPSampleNodeCSG semantics
# (GaussianProcess.hpp:41-95 GPRealNodeCsg, GaussianProcess.cpp:25-66)
# ---------------------------------------------------------------------------

_CSG_SALT = 0x9E3779B9


def csg_children(gp):
    """(left, right) full GPs of a CSG union node.  left strips the
    additional-mean shortcut (that path is the sparse-conv approximation,
    GPSampleNodeCSG::fromJson building _csg; the FS backend samples both
    children exactly)."""
    import dataclasses
    left = dataclasses.replace(gp, mean_additional=None, csg_right=None)
    return left, gp.csg_right


def sample_distance_fs_one_csg(med, scene_seed, ro, rd, near, far,
                               first_scatter, carry_val_l, carry_grad_l,
                               carry_val_r, carry_grad_r, have_carry,
                               info_t, pss, u_offset, active):
    """Single-ray chunked FS march over min(left, right) realizations.

    Both children are sampled INDEPENDENTLY per chunk, each conditioned on
    its OWN Renewal/Renewal+ carry (GPRealNodeCsg::applyMemory recurses into
    both children); the sign-scan runs on the pointwise min and the id of
    the attaining child is tracked (GPRealNodeCsg::flatten/perform_op).  At
    a crossing both children receive their own interpolated crossing rows
    (makeIntersect recurses) and both sample their own conditioned gradient
    (sampleGrad recurses); the returned scatter gradient is the argmin
    child's (pickId).  Global-context rings are not supported for CSG
    (caller raises).

    Returns dict(hit, t, grad[3] picked, gp_id, val_l, grad_l[3], val_r,
    grad_r[3])."""
    gp_l, gp_r = csg_children(med.gp)
    n = med.sample_points
    seg_len = jnp.maximum(far - near, 1e-6)
    dt_full = seg_len / n
    dt = jnp.where((med.step_size > 0) & (med.step_size < dt_full),
                   med.step_size, dt_full)
    max_chunks = 64

    def cond(c):
        return c["running"] & (c["chunk"] < max_chunks)

    def _interp(vals, idx, off):
        return vals[idx] + (vals[idx + 1] - vals[idx]) * off

    def _dv(ts, vals, idx):
        dtl = ts[idx] - ts[idx + 1]
        return (vals[idx] - vals[idx + 1]) / jnp.where(dtl == 0, 1.0, dtl)

    def body(c):
        t0 = c["t0"]
        ts, vals_l, ed_l, _ = _sample_chunk_fast(
            med, scene_seed, ro, rd, t0, dt, n, c["cv_l"], c["cg_l"],
            c["have_carry"], pss, c["chunk"], u_offset, gp=gp_l, salt=0)
        _ts_r, vals_r, ed_r, _ = _sample_chunk_fast(
            med, scene_seed, ro, rd, t0, dt, n, c["cv_r"], c["cg_r"],
            c["have_carry"], pss, c["chunk"], u_offset, gp=gp_r,
            salt=_CSG_SALT)
        vals = jnp.minimum(vals_l, vals_r)
        ids = jnp.where(vals_l <= vals_r, 0, 1)

        skip_first = (~first_scatter) & (c["chunk"] == 0)
        crossed, idx, t_cross, v0, v1, off = _find_crossing(ts, vals,
                                                            skip_first)
        pick = jnp.where(crossed, ids[idx], ids[-1])
        t_end = ts[-1]
        reached_far = t_end >= far - 1e-6
        running = (~crossed) & (~reached_far)
        # each child's carry: its own value at the stop point (crossing
        # interp or chunk end) + its own jointly-drawn end derivative
        # (crossing: its own interpolated crossing slope — the full 3D
        # gradients are sampled ONCE after the loop)
        return {
            "t0": t_end,
            "chunk": c["chunk"] + jnp.uint32(1),
            "running": running,
            "hit": crossed,
            "t_hit": jnp.where(crossed, t_cross, far),
            "cv_l": jnp.where(crossed, _interp(vals_l, idx, off),
                              vals_l[-1]),
            "cg_l": jnp.where(crossed, _dv(ts, vals_l, idx), ed_l),
            "cv_r": jnp.where(crossed, _interp(vals_r, idx, off),
                              vals_r[-1]),
            "cg_r": jnp.where(crossed, _dv(ts, vals_r, idx), ed_r),
            "have_carry": jnp.asarray(True),
            "gp_id": pick,
            "ts": ts, "vals_l": vals_l, "vals_r": vals_r,
            "idx": idx, "off": off, "ed_l": ed_l, "ed_r": ed_r,
        }

    init = {
        "t0": near, "chunk": jnp.uint32(0),
        "running": active,
        "hit": jnp.asarray(False),
        "t_hit": far,
        "cv_l": carry_val_l, "cg_l": carry_grad_l,
        "cv_r": carry_val_r, "cg_r": carry_grad_r,
        "have_carry": have_carry,
        "gp_id": jnp.int32(0),
        "ts": near + jnp.arange(1, n + 1, dtype=jnp.float32),
        "vals_l": jnp.ones(n), "vals_r": jnp.ones(n),
        "idx": jnp.int32(0), "off": jnp.float32(0.0),
        "ed_l": jnp.float32(0.0), "ed_r": jnp.float32(0.0),
    }
    out = jax.lax.while_loop(cond, body, init)
    # per-child 3D gradients, each conditioned on its own realization rows
    # + its own interpolated crossing rows (same offsetT for both:
    # GPRealNodeCsg::makeIntersect passes p/offsetT/dt to both children)
    grad_l, _vc, _dv_ = _sample_grad_at(
        med, scene_seed, ro, rd, out["ts"], out["vals_l"], out["idx"],
        out["t_hit"], out["off"], out["hit"], pss, gp=gp_l, salt=0,
        end_deriv=out["ed_l"])
    grad_r, _vc, _dv_ = _sample_grad_at(
        med, scene_seed, ro, rd, out["ts"], out["vals_r"], out["idx"],
        out["t_hit"], out["off"], out["hit"], pss, gp=gp_r,
        salt=_CSG_SALT, end_deriv=out["ed_r"])
    grad = jnp.where(out["gp_id"] == 0, grad_l, grad_r)
    return {"hit": out["hit"] & active, "t": out["t_hit"],
            "grad": grad, "gp_id": out["gp_id"],
            "val_l": out["cv_l"], "grad_l": grad_l,
            "val_r": out["cv_r"], "grad_r": grad_r}

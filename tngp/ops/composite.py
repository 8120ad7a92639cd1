"""Transmittance compositing over fixed-shape sample slabs, pure jnp.

Behavioral reference: torch-ngp `raymarching/src/raymarching.cu`:
  kernel_composite_rays_train_forward  (:500-577)
  kernel_composite_rays_train_backward (:601-691)

TPU-first design: the CUDA kernels walk each ray sequentially with a break at
`T < T_thresh`, and backward re-walks the ray using the closed-form gradient.
Here rays are fixed `[N, K]` slabs with a validity mask (see ops/march.py), and
the sequential transmittance product becomes an *exclusive prefix sum* in
optical depth:

  tau_i = sigma_i * dt_i * mask_i
  T_i   = exp(-cumsum_excl(tau))          # transmittance before sample i
  w_i   = T_i * (1 - exp(-tau_i))

which XLA differentiates exactly (cumsum transposes to a reversed cumsum), so
the closed-form CUDA backward falls out of autodiff for free.  Early
termination becomes a mask: samples after the first index where the *running*
transmittance drops below `T_thresh` get zero weight, matching the reference's
`break` (reference also writes no gradient past the break; masked weights give
gradients ~< T_thresh there, inside the parity tolerance).

Everything is computed in float32 regardless of input dtype, matching
nerf/renderer.py:380-382 (compositing always runs in fp32 under autocast).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def composite_weights(
    sigmas: jax.Array,  # [N, K]
    dts: jax.Array,  # [N, K]
    mask: jax.Array,  # [N, K] bool
    T_thresh: float = 1e-4,
) -> jax.Array:
    """Per-sample compositing weights `T_i * alpha_i` with early-stop masking."""
    sig = sigmas.astype(jnp.float32)
    dt = dts.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    tau = sig * dt * m  # [N, K]
    acc = jnp.cumsum(tau, axis=-1)  # inclusive
    T_before = jnp.exp(-(acc - tau))
    alpha = -jnp.expm1(-tau)
    weights = T_before * alpha * m

    # early termination: zero out samples strictly after T_after < thresh
    T_after = jnp.exp(-acc)
    stopped = jnp.cumsum((T_after < T_thresh).astype(jnp.float32), axis=-1)
    alive = (stopped - (T_after < T_thresh)) < 0.5  # exclusive: first stopper stays
    return weights * alive.astype(jnp.float32)


def composite_rays(
    sigmas: jax.Array,  # [N, K]
    rgbs: jax.Array,  # [N, K, 3]
    dts: jax.Array,  # [N, K]  marching step length at each sample
    gaps: jax.Array,  # [N, K]  real t advance (includes skipped space), for depth
    mask: jax.Array,  # [N, K]  bool sample validity
    T_thresh: float = 1e-4,
):
    """Returns (weights_sum [N], depth [N], image [N, 3], weights [N, K]).

    depth accumulates `w_i * sum_{j<=i} gap_j` like the CUDA forward
    (t += deltas[1]; d += weight * t).
    """
    weights = composite_weights(sigmas, dts, mask, T_thresh)
    m = mask.astype(jnp.float32)
    t_cum = jnp.cumsum(gaps.astype(jnp.float32) * m, axis=-1)
    weights_sum = weights.sum(axis=-1)
    depth = (weights * t_cum).sum(axis=-1)
    image = jnp.einsum("nk,nkc->nc", weights, rgbs.astype(jnp.float32))
    return weights_sum, depth, image, weights


def composite_rays_cf(
    sigmas: jax.Array,  # [N, K]
    rgbs_cf: jax.Array,  # [3, N, K] channels-first (TPU layout, see ops/hashgrid.py)
    dts: jax.Array,
    gaps: jax.Array,
    mask: jax.Array,
    T_thresh: float = 1e-4,
):
    """Channels-first twin of composite_rays; image is [N, 3] (small output)."""
    weights = composite_weights(sigmas, dts, mask, T_thresh)
    m = mask.astype(jnp.float32)
    t_cum = jnp.cumsum(gaps.astype(jnp.float32) * m, axis=-1)
    weights_sum = weights.sum(axis=-1)
    depth = (weights * t_cum).sum(axis=-1)
    image = jnp.einsum("nk,cnk->nc", weights, rgbs_cf.astype(jnp.float32))
    return weights_sum, depth, image, weights


def _segmented_cumsum(vals: jax.Array, is_start: jax.Array) -> jax.Array:
    """Per-segment inclusive prefix sum along the last axis.

    vals: [C, M]; is_start: [M] bool marking segment heads.  Uses the
    classic segmented-scan associative operator, so partial sums never
    exceed per-segment magnitude — unlike `global cumsum - base`, which
    catastrophically cancels at fp32 once the global prefix is ~1e4x the
    segment values (M~131K compacted samples across thousands of rays).
    """
    f = is_start.astype(vals.dtype)[None, :]  # [1, M]

    def combine(a, b):
        fa, va = a
        fb, vb = b
        return jnp.maximum(fa, fb), vb + va * (1.0 - fb)

    _, out = jax.lax.associative_scan(combine, (jnp.broadcast_to(f, (1, vals.shape[1])), vals), axis=1)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _ray_scatter(idx: jax.Array, vals: jax.Array, num_rows: int) -> jax.Array:
    """Deterministic out[idx[j]] += vals[j] with a gather VJP (Pallas on TPU)."""
    from ..kernels.scatter import scatter_add_auto

    return scatter_add_auto(idx, vals, num_rows)


def _ray_scatter_fwd(idx, vals, num_rows):
    return _ray_scatter(idx, vals, num_rows), idx


def _ray_scatter_bwd(num_rows, idx, g):
    return None, jnp.take(g, idx, axis=0)


_ray_scatter.defvjp(_ray_scatter_fwd, _ray_scatter_bwd)


def _suffix_segsum(vals: jax.Array, is_end: jax.Array) -> jax.Array:
    """Per-segment inclusive SUFFIX sum along the last axis ([C, M], [M])."""
    out = _segmented_cumsum(vals[:, ::-1], is_end[::-1])
    return out[:, ::-1]


def _stream_fwd_impl(n_rays, T_thresh, sigmas, rgbs_cf, dts, t_cum, rid, m, start_f):
    """Shared forward math for the stream compositor (see composite_stream)."""
    is_start = start_f > 0.5
    sig = sigmas.astype(jnp.float32) * m
    dt = dts.astype(jnp.float32)
    tau = sig * dt  # [M]
    acc = _segmented_cumsum(tau[None], is_start)[0]
    t_cum = t_cum.astype(jnp.float32)
    T_before = jnp.exp(-(acc - tau))
    alpha = -jnp.expm1(-tau)
    weights = T_before * alpha * m

    # early termination within each segment (first stopper stays)
    T_after = jnp.exp(-acc)
    stop_f = (T_after < T_thresh).astype(jnp.float32) * m
    stopped = _segmented_cumsum(stop_f[None], is_start)[0]
    alive = ((stopped - stop_f) < 0.5).astype(jnp.float32)
    weights = weights * alive

    rgb = rgbs_cf.astype(jnp.float32)
    vals = jnp.stack(
        [
            weights * rgb[0],
            weights * rgb[1],
            weights * rgb[2],
            weights,
            weights * t_cum,
        ],
        axis=1,
    )  # [M, 5]
    from ..kernels.scatter import scatter_add_auto

    out = scatter_add_auto(jnp.clip(rid, 0, n_rays - 1), vals, n_rays)  # [N, 5]
    res = (rid, m, dt, sig, t_cum, rgb, weights, T_after, alive, is_start)
    return (out[:, 3], out[:, 4], out[:, 0:3]), res


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _composite_stream_core(n_rays, T_thresh, sigmas, rgbs_cf, dts, t_cum, rid, m, start_f):
    """Stream compositor with the ANALYTIC closed-form backward.

    Autodiff of the forward's segmented `associative_scan`s transposes into
    a chain of linearized scans that costs ~12 ms in-chain at bench shapes
    (round-4 stage attribution) vs 2.3 ms forward.  The reference's CUDA
    backward (raymarching.cu:601-691) is closed-form; here it reduces to ONE
    suffix segmented sum:

      g_i     = dWs[r_i] + dD[r_i] * tcum_i + dIm[r_i, :] . rgb_i
      dtau_i  = T_after_i * m_i * alive_i * g_i - (S_i - w_i g_i),
                  S_i = suffix_segsum(w g)_i
      dsig_i  = dtau_i * dt_i,   ddt_i = dtau_i * sig_i
      drgb_ci = w_i * dIm[r_i, c],   dtcum_i = w_i * dD[r_i]
    """
    out, _ = _stream_fwd_impl(n_rays, T_thresh, sigmas, rgbs_cf, dts, t_cum, rid, m, start_f)
    return out


def _composite_stream_core_fwd(n_rays, T_thresh, sigmas, rgbs_cf, dts, t_cum, rid, m, start_f):
    out, res = _stream_fwd_impl(n_rays, T_thresh, sigmas, rgbs_cf, dts, t_cum, rid, m, start_f)
    # zero-dim dtype markers (residual pytrees must hold JAX types only)
    marks = (jnp.zeros((), sigmas.dtype), jnp.zeros((), rgbs_cf.dtype),
             jnp.zeros((), dts.dtype))
    return out, (res, marks)


def _composite_stream_core_bwd(n_rays, T_thresh, saved, cot):
    (rid, m, dt, sig, t_cum, rgb, w, T_after, alive, is_start), marks = saved
    sdt, rdt, ddt_ = (x.dtype for x in marks)
    dws, dd, dim = cot  # [N], [N], [N, 3]
    r = jnp.clip(rid, 0, n_rays - 1)
    dws_s = jnp.take(dws.astype(jnp.float32), r)
    dd_s = jnp.take(dd.astype(jnp.float32), r)
    dim_s = jnp.take(dim.astype(jnp.float32), r, axis=0).T  # [3, M]
    g = dws_s + dd_s * t_cum + (dim_s * rgb).sum(axis=0)  # [M]
    wg = w * g
    is_end = jnp.concatenate([is_start[1:], jnp.ones((1,), bool)])
    S = _suffix_segsum(wg[None], is_end)[0]
    dtau = T_after * m * alive * g - (S - wg)
    dsig = (dtau * dt * m).astype(sdt)
    d_dt = (dtau * sig).astype(ddt_)
    drgb = (w[None] * dim_s).astype(rdt)
    dtc = w * dd_s
    return (dsig, drgb, d_dt, dtc, None, jnp.zeros_like(m), jnp.zeros_like(m))


_composite_stream_core.defvjp(_composite_stream_core_fwd, _composite_stream_core_bwd)


def composite_stream(
    sigmas: jax.Array,  # [M] compacted (ray-major order)
    rgbs_cf: jax.Array,  # [3, M]
    dts: jax.Array,  # [M]
    gaps: jax.Array,  # [M] real t advance (for depth); ignored if t_cum given
    ray_id: jax.Array,  # [M] int32 nondecreasing ray of each sample
    valid: jax.Array,  # [M] bool (False = padding slot)
    n_rays: int,
    T_thresh: float = 1e-4,
    t_cum: jax.Array | None = None,  # [M] per-sample advance since ray start
):
    """Composite directly on the globally-compacted sample stream.

    Same math as composite_rays_cf but over ray-major compacted samples
    (ops/compaction.py) instead of an [N, K] slab — skipping the
    expand-to-slab gather (~8M gather indices/step at bench shapes, the
    dominant post-field cost).  Transmittance prefix sums become segmented
    scans keyed on ray boundaries; per-ray reduction is one deterministic
    scatter-add.  Backward is the analytic closed form (see
    `_composite_stream_core`), not autodiff of the scans.  Returns
    (weights_sum [N], depth [N], image [N, 3]).

    The depth accumulator needs each sample's cumulative advance since its
    ray start.  Marchers that know the ladder origin pass it directly as
    `t_cum` (= t + dt - t0, the telescoped sum of the gaps — see
    ops/march.py ladder_samples), halving the segmented-scan work; otherwise
    it is scanned from `gaps`.
    """
    m = valid.astype(jnp.float32)
    rid = ray_id.astype(jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), rid[1:] != rid[:-1]])
    if t_cum is None:
        gm = gaps.astype(jnp.float32) * m
        t_cum = _segmented_cumsum(gm[None], is_start)[0]
    else:
        t_cum = t_cum.astype(jnp.float32)
    return _composite_stream_core(
        n_rays, float(T_thresh), sigmas, rgbs_cf, dts, t_cum, rid, m,
        is_start.astype(jnp.float32),
    )


def composite_stream_ref(
    sigmas: jax.Array,
    rgbs_cf: jax.Array,
    dts: jax.Array,
    gaps: jax.Array,
    ray_id: jax.Array,
    valid: jax.Array,
    n_rays: int,
    T_thresh: float = 1e-4,
    t_cum: jax.Array | None = None,
):
    """Autodiff twin of composite_stream (same forward math, backward via
    autodiff of the segmented scans) — kept as the grad oracle for
    tests/test_composite_vjp.py."""
    m = valid.astype(jnp.float32)
    sig = sigmas.astype(jnp.float32) * m
    dt = dts.astype(jnp.float32)
    tau = sig * dt  # [M]
    rid = ray_id.astype(jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), rid[1:] != rid[:-1]]
    )

    if t_cum is None:
        # segmented inclusive sums of (tau, gap) in one scan
        seg_in = jnp.stack([tau, gaps.astype(jnp.float32) * m], axis=0)  # [2, M]
        seg = _segmented_cumsum(seg_in, is_start)
        acc, t_cum = seg[0], seg[1]
    else:
        acc = _segmented_cumsum(tau[None], is_start)[0]
        t_cum = t_cum.astype(jnp.float32)
    T_before = jnp.exp(-(acc - tau))
    alpha = -jnp.expm1(-tau)
    weights = T_before * alpha * m

    # early termination within each segment (first stopper stays)
    T_after = jnp.exp(-acc)
    stop_f = (T_after < T_thresh).astype(jnp.float32) * m
    stopped = _segmented_cumsum(stop_f[None], is_start)[0]
    alive = (stopped - stop_f) < 0.5
    weights = weights * alive.astype(jnp.float32)

    vals = jnp.stack(
        [
            weights * rgbs_cf[0].astype(jnp.float32),
            weights * rgbs_cf[1].astype(jnp.float32),
            weights * rgbs_cf[2].astype(jnp.float32),
            weights,
            weights * t_cum,
        ],
        axis=1,
    )  # [M, 5]
    out = _ray_scatter(jnp.clip(rid, 0, n_rays - 1), vals, n_rays)  # [N, 5]
    return out[:, 3], out[:, 4], out[:, 0:3]


def composite_rays_flat(
    sigmas: jax.Array,
    rgbs: jax.Array,
    dts: jax.Array,
    gaps: jax.Array,
    mask: jax.Array,
    T_thresh: float = 1e-4,
):
    """Convenience wrapper for `[N*K]`-flat sample tensors (reference-style M-flat
    layout); reshapes to the slab form internally."""
    N, K = mask.shape
    return composite_rays(
        sigmas.reshape(N, K), rgbs.reshape(N, K, 3), dts.reshape(N, K),
        gaps.reshape(N, K), mask, T_thresh,
    )

"""Ray marcher vs a scalar recurrence simulator of the CUDA train marcher
(raymarching.cu:311-480), sharing only the linear cell-index convention."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tngp.ops import march_rays, near_far_from_aabb, packbits

SQRT3 = math.sqrt(3.0)


def sim_march(o, d, t0, far, occ_fn, bound, C, H, dt_gamma, max_steps):
    """Scalar ladder-recurrence marcher: returns list of (t, dt) emitted."""
    dt_min = 2 * SQRT3 / max_steps
    dt_max = 2 * SQRT3 * (1 << (C - 1)) / H
    out = []
    t = t0
    for _ in range(max_steps):
        if t >= far:
            break
        x = np.clip(o + t * d, -bound, bound)
        dt = np.clip(t * dt_gamma, dt_min, dt_max) if dt_gamma > 0 else dt_min
        # mip level
        mx = np.max(np.abs(x))
        e_pos = math.frexp(mx)[1] if mx > 0 else -100
        mdt = dt * H * 0.5
        e_dt = math.frexp(mdt)[1] if mdt > 0 else -100
        lvl = min(max(max(e_pos, e_dt), 0), C - 1)
        mip_bound = min(2.0**lvl, bound)
        n = np.clip(0.5 * (x / mip_bound + 1) * H, 0, H - 1).astype(np.int64)
        cell = lvl * H**3 + (n[0] * H + n[1]) * H + n[2]
        if occ_fn(cell):
            out.append((t, dt))
        t = t + (np.clip(t * dt_gamma, dt_min, dt_max) if dt_gamma > 0 else dt_min)
    return out


def run_march_case(dt_gamma, seed=0, C=1, H=16, bound=1.0, max_steps=256, K=64):
    rng = np.random.default_rng(seed)
    # random occupancy grid ~30% full
    grid = (rng.uniform(size=(C * H**3,)) < 0.3).astype(np.float32)
    bitfield = np.asarray(packbits(jnp.asarray(grid), 0.5))

    N = 32
    origins = rng.uniform(-2.5, -1.5, size=(N, 3)).astype(np.float32)
    targets = rng.uniform(-0.5, 0.5, size=(N, 3)).astype(np.float32)
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    aabb = jnp.asarray([-bound] * 3 + [bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(jnp.asarray(origins), jnp.asarray(dirs), aabb, 0.05)

    res = march_rays(
        jnp.asarray(origins), jnp.asarray(dirs), nears, fars, jnp.asarray(bitfield),
        bound=bound, cascades=C, grid_size=H, dt_gamma=dt_gamma,
        max_steps=max_steps, K=K,
    )

    occ_fn = lambda cell: grid[cell] > 0.5
    for n in range(N):
        emitted = sim_march(
            origins[n], dirs[n], float(nears[n]), float(fars[n]), occ_fn,
            bound, C, H, dt_gamma, max_steps,
        )
        count = int(np.asarray(res.counts)[n])
        m = np.asarray(res.mask)[n]
        nsel = int(m.sum())
        assert count == len(emitted), f"ray {n}: count {count} vs sim {len(emitted)}"
        assert nsel == min(len(emitted), K)
        ts = np.asarray(res.ts)[n][m]
        dts = np.asarray(res.dts)[n][m]
        sim_t = np.array([t for t, _ in emitted[:nsel]])
        sim_dt = np.array([dt for _, dt in emitted[:nsel]])
        np.testing.assert_allclose(ts, sim_t, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(dts, sim_dt, rtol=1e-4, atol=1e-5)
        # gaps telescope: sum of gaps = last t_post - t0
        gaps = np.asarray(res.gaps)[n][m]
        if nsel:
            np.testing.assert_allclose(
                gaps.sum(), sim_t[-1] + sim_dt[-1] - float(nears[n]), rtol=1e-4, atol=1e-4
            )


def test_march_uniform():
    run_march_case(dt_gamma=0.0)


def test_march_adaptive():
    run_march_case(dt_gamma=1.0 / 128, max_steps=512)


def test_march_cascades():
    run_march_case(dt_gamma=1.0 / 128, C=3, bound=4.0, max_steps=512)


def test_march_empty_grid_gives_no_samples():
    H, C, bound = 16, 1, 1.0
    bitfield = jnp.zeros((C * H**3 // 8,), jnp.uint8)
    o = jnp.asarray([[-2.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    aabb = jnp.asarray([-1, -1, -1, 1, 1, 1], jnp.float32)
    nears, fars = near_far_from_aabb(o, d, aabb)
    res = march_rays(o, d, nears, fars, bitfield, bound=bound, cascades=C,
                     grid_size=H, max_steps=128, K=16)
    assert int(res.counts[0]) == 0
    assert not bool(np.asarray(res.mask).any())


def run_grouped_case(dt_gamma, seed=0, C=1, H=16, bound=1.0, max_steps=256,
                     K=128, group=8):
    """Grouped two-level march must emit the exact (t, dt) set of the scalar
    sim whenever the group budget suffices (coarse grid is conservative)."""
    rng = np.random.default_rng(seed)
    # sparse occupancy (~5%) so coarse skipping has something to skip
    grid = (rng.uniform(size=(C * H**3,)) < 0.05).astype(np.float32)
    bitfield = np.asarray(packbits(jnp.asarray(grid), 0.5))

    N = 32
    origins = rng.uniform(-2.5, -1.5, size=(N, 3)).astype(np.float32)
    targets = rng.uniform(-0.5, 0.5, size=(N, 3)).astype(np.float32)
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    aabb = jnp.asarray([-bound] * 3 + [bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(jnp.asarray(origins), jnp.asarray(dirs), aabb, 0.05)

    res = march_rays(
        jnp.asarray(origins), jnp.asarray(dirs), nears, fars, jnp.asarray(bitfield),
        bound=bound, cascades=C, grid_size=H, dt_gamma=dt_gamma,
        max_steps=max_steps, K=K, group=group,
    )

    occ_fn = lambda cell: grid[cell] > 0.5
    overflowed = 0
    for n in range(N):
        emitted = sim_march(
            origins[n], dirs[n], float(nears[n]), float(fars[n]), occ_fn,
            bound, C, H, dt_gamma, max_steps,
        )
        m = np.asarray(res.mask)[n]
        ts = np.asarray(res.ts)[n][m]
        dts = np.asarray(res.dts)[n][m]
        nt = float(np.asarray(res.next_t)[n])
        # every sim sample before next_t must appear (conservative coverage)
        sim_pre = [(t, dt) for (t, dt) in emitted if t < nt - 1e-6]
        if len(sim_pre) < len(emitted):
            overflowed += 1
        assert len(ts) == len(sim_pre), (
            f"ray {n}: grouped emitted {len(ts)} vs sim {len(sim_pre)} before next_t"
        )
        if len(sim_pre):
            np.testing.assert_allclose(
                ts, np.array([t for t, _ in sim_pre]), rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(
                dts, np.array([dt for _, dt in sim_pre]), rtol=1e-4, atol=1e-5)
        # gaps telescope within the processed window
        gaps = np.asarray(res.gaps)[n][m]
        if len(ts):
            np.testing.assert_allclose(
                gaps.sum(), ts[-1] + dts[-1] - float(nears[n]), rtol=1e-4, atol=1e-4)
    return overflowed


def test_march_grouped_uniform():
    run_grouped_case(dt_gamma=0.0)


def test_march_grouped_adaptive():
    run_grouped_case(dt_gamma=1.0 / 128, max_steps=512)


def test_march_grouped_cascades():
    run_grouped_case(dt_gamma=1.0 / 128, C=3, bound=4.0, max_steps=512)


def test_march_grouped_resume_covers_everything():
    """Iterating with next_t must eventually emit every sim sample exactly once
    even when the per-round group budget overflows."""
    rng = np.random.default_rng(3)
    C, H, bound, max_steps, K, group = 1, 16, 1.0, 256, 32, 8
    grid = (rng.uniform(size=(C * H**3,)) < 0.3).astype(np.float32)
    bitfield = jnp.asarray(np.asarray(packbits(jnp.asarray(grid), 0.5)))

    N = 16
    origins = rng.uniform(-2.5, -1.5, size=(N, 3)).astype(np.float32)
    targets = rng.uniform(-0.3, 0.3, size=(N, 3)).astype(np.float32)
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    aabb = jnp.asarray([-bound] * 3 + [bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(jnp.asarray(origins), jnp.asarray(dirs), aabb, 0.05)

    collected = [[] for _ in range(N)]
    t_cur = nears
    for _ in range(12):
        res = march_rays(
            jnp.asarray(origins), jnp.asarray(dirs), t_cur, fars, bitfield,
            bound=bound, cascades=C, grid_size=H, dt_gamma=0.0,
            max_steps=max_steps, K=K, group=group,
        )
        m = np.asarray(res.mask)
        ts = np.asarray(res.ts)
        for n in range(N):
            collected[n].extend(ts[n][m[n]].tolist())
        t_cur = res.next_t
        if bool((res.next_t >= fars).all()):
            break

    occ_fn = lambda cell: grid[cell] > 0.5
    for n in range(N):
        emitted = sim_march(
            origins[n], dirs[n], float(nears[n]), float(fars[n]), occ_fn,
            bound, C, H, 0.0, max_steps,
        )
        got = np.array(sorted(collected[n]))
        want = np.array([t for t, _ in emitted])
        assert len(got) == len(want), f"ray {n}: {len(got)} vs {len(want)}"
        if len(want):
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_march_slab_shapes_when_steps_below_budget():
    """Regression: S < K must still produce [N, K] slabs with consistent
    xyzs/dirs widths (found by the CLI smoke at max_steps=48, K_eval=64)."""
    import jax.numpy as jnp
    import numpy as np

    from tngp.ops.march import march_rays

    N, S, K = 8, 16, 32
    H = 8
    rays_o = np.zeros((N, 3), np.float32); rays_o[:, 2] = -2.0
    rays_d = np.zeros((N, 3), np.float32); rays_d[:, 2] = 1.0
    bitfield = jnp.full((H ** 3 // 8,), 255, jnp.uint8)
    res = march_rays(
        jnp.asarray(rays_o), jnp.asarray(rays_d),
        jnp.full((N,), 1.0, jnp.float32), jnp.full((N,), 3.0, jnp.float32),
        bitfield, bound=1.0, cascades=1, grid_size=H, max_steps=S, K=K,
    )
    assert res.xyzs_cf.shape == (3, N, K)
    assert res.dirs_cf.shape == (3, N, K)
    assert res.mask.shape == (N, K)
    assert int(res.mask.sum(axis=1).max()) <= S
    assert np.isfinite(np.asarray(res.ts)).all()

# ---------------------------------------------------------------------------
# slab-free dense march (march_rays_dense)
# ---------------------------------------------------------------------------


def test_march_dense_matches_slab_samples():
    """Dense [N, S] march selects exactly the same valid (t, dt) set as the
    slab path when K is large enough to hold everything."""
    from tngp.ops import march_rays_dense

    rng = np.random.default_rng(3)
    C, H, bound, max_steps = 1, 16, 1.0, 256
    grid = (rng.uniform(size=(C * H**3,)) < 0.3).astype(np.float32)
    bitfield = jnp.asarray(np.asarray(packbits(jnp.asarray(grid), 0.5)))
    N = 24
    origins = rng.uniform(-2.5, -1.5, size=(N, 3)).astype(np.float32)
    targets = rng.uniform(-0.5, 0.5, size=(N, 3)).astype(np.float32)
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    aabb = jnp.asarray([-bound] * 3 + [bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(jnp.asarray(origins), jnp.asarray(dirs), aabb, 0.05)

    slab = march_rays(
        jnp.asarray(origins), jnp.asarray(dirs), nears, fars, bitfield,
        bound=bound, cascades=C, grid_size=H, max_steps=max_steps, K=max_steps,
    )
    dense = march_rays_dense(
        jnp.asarray(origins), jnp.asarray(dirs), nears, fars, bitfield,
        bound=bound, cascades=C, grid_size=H, max_steps=max_steps,
    )
    np.testing.assert_array_equal(np.asarray(dense.counts), np.asarray(slab.counts))
    for n in range(N):
        ms, md = np.asarray(slab.mask)[n], np.asarray(dense.mask)[n]
        np.testing.assert_allclose(
            np.asarray(dense.ts)[n][md], np.asarray(slab.ts)[n][ms], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(dense.dts)[n][md], np.asarray(slab.dts)[n][ms], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(dense.gaps)[n][md], np.asarray(slab.gaps)[n][ms],
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(dense.xyzs_cf)[:, n, md], np.asarray(slab.xyzs_cf)[:, n, ms],
            rtol=1e-5, atol=1e-6,
        )


def test_render_train_dense_matches_slab():
    """render_rays_train with march_dense=True reproduces the slab path's
    image/depth when neither budget binds."""
    from tngp.models import NGPNetwork
    from tngp.render import FieldFns, RenderConfig, render_rays_train

    rng = np.random.default_rng(5)
    C, H, bound = 1, 16, 1.0
    grid = (rng.uniform(size=(C * H**3,)) < 0.4).astype(np.float32)
    bitfield = jnp.asarray(np.asarray(packbits(jnp.asarray(grid), 0.5)))
    N = 16
    origins = rng.uniform(-2.5, -1.5, size=(N, 3)).astype(np.float32)
    targets = rng.uniform(-0.3, 0.3, size=(N, 3)).astype(np.float32)
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    model = NGPNetwork(bound=bound, num_levels=4, log2_hashmap_size=12)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((8, 3)), jnp.ones((8, 3)) / np.sqrt(3.0)
    )
    field = FieldFns.from_model(model)

    base = dict(bound=bound, grid_size=H, max_steps=128, min_near=0.05)
    cfg_slab = RenderConfig(**base, K=128, compact_fraction=0.9)
    cfg_dense = RenderConfig(**base, K=128, compact_fraction=0.9, march_dense=True)
    o, d = jnp.asarray(origins), jnp.asarray(dirs)
    out_s = render_rays_train(field, params, o, d, bitfield, cfg_slab)
    out_d = render_rays_train(field, params, o, d, bitfield, cfg_dense)
    assert bool(out_s["ray_mask"].all()) and bool(out_d["ray_mask"].all())
    np.testing.assert_allclose(
        np.asarray(out_d["image"]), np.asarray(out_s["image"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_d["depth"]), np.asarray(out_s["depth"]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_d["weights_sum"]), np.asarray(out_s["weights_sum"]),
        rtol=1e-4, atol=1e-5,
    )


def test_march_stream_matches_dense():
    """march_rays_stream + ladder_samples reproduce march_rays_dense exactly
    (mask/counts bitwise; per-sample t/dt/xyz recomputed from the ladder)."""
    from tngp.ops import march_rays_dense, march_rays_stream, ladder_samples
    from tngp.ops.compaction import compact_mask_hier

    rng = np.random.default_rng(3)
    N, S = 64, 128
    kw = dict(bound=1.0, cascades=1, grid_size=32, dt_gamma=0.003, max_steps=S)
    o = jnp.asarray(np.array([0, 0, -2.2]) + rng.normal(0, 0.1, (N, 3)), jnp.float32)
    d = np.asarray(rng.uniform(-0.4, 0.4, (N, 3))) - np.asarray(o)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    occ = jnp.asarray(rng.uniform(size=(32**3,)) < 0.4, jnp.float32)
    bf = packbits(occ, 0.5)
    nears = jnp.full((N,), 0.05)
    fars = jnp.full((N,), 4.0)
    noise = jnp.asarray(rng.uniform(size=(N,)), jnp.float32)

    dense = march_rays_dense(o, d, nears, fars, bf, noise=noise, **kw)
    stream = march_rays_stream(o, d, nears, fars, bf, noise=noise, **kw)
    np.testing.assert_array_equal(np.asarray(stream.mask), np.asarray(dense.mask))
    np.testing.assert_array_equal(np.asarray(stream.counts), np.asarray(dense.counts))
    np.testing.assert_allclose(
        np.asarray(stream.next_t), np.asarray(dense.next_t), rtol=1e-6
    )

    M = 4096
    comp = compact_mask_hier(stream.mask, M)
    ray_id, x_cf, d_cf, dt, t_rel = ladder_samples(
        comp.sel, o, d, stream.t0, **kw
    )
    m_eff = int(comp.m_eff)
    sel = np.asarray(comp.sel[:m_eff])
    rr, cc = sel // S, sel % S
    np.testing.assert_array_equal(np.asarray(ray_id[:m_eff]), rr)
    np.testing.assert_allclose(
        np.asarray(x_cf[:, :m_eff]), np.asarray(dense.xyzs_cf)[:, rr, cc],
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(dt[:m_eff]), np.asarray(dense.dts)[rr, cc], rtol=1e-6
    )
    # t_rel telescopes the dense gaps: cumsum of gaps over valid rungs
    gaps = np.asarray(dense.gaps)
    mask = np.asarray(dense.mask)
    gcum = np.cumsum(gaps * mask, axis=1)
    np.testing.assert_allclose(
        np.asarray(t_rel[:m_eff]), gcum[rr, cc], rtol=1e-4, atol=1e-5
    )


def test_march_chunked_matches_stream_compaction():
    """march_rays_chunked (dilated coarse probe + candidate fine probe) selects
    exactly the same sample prefix as march_rays_stream + compact_mask_hier,
    for dt_gamma=0 and >0, single and multi cascade."""
    from tngp.ops import march_rays_stream, march_rays_chunked
    from tngp.ops.compaction import compact_mask_hier, ray_in_budget_from_counts

    rng = np.random.default_rng(7)
    for bound, cascades, dt_gamma in ((1.0, 1, 0.0), (2.0, 2, 0.004)):
        N, S = 48, 128
        kw = dict(bound=bound, cascades=cascades, grid_size=32,
                  dt_gamma=dt_gamma, max_steps=S)
        o = jnp.asarray(
            np.array([0, 0, -2.0 * bound]) + rng.normal(0, 0.1, (N, 3)),
            jnp.float32)
        d = np.asarray(rng.uniform(-0.4, 0.4, (N, 3))) * bound - np.asarray(o)
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
        occ = jnp.asarray(
            rng.uniform(size=(cascades * 32**3,)) < 0.3, jnp.float32)
        bf = packbits(occ, 0.5)
        nears = jnp.full((N,), 0.05)
        fars = jnp.full((N,), 4.0 * bound)
        noise = jnp.asarray(rng.uniform(size=(N,)), jnp.float32)
        M = 2048

        stream = march_rays_stream(o, d, nears, fars, bf, noise=noise, **kw)
        comp = compact_mask_hier(stream.mask, M, chunk_budget=N * S // 8)
        ck = march_rays_chunked(
            o, d, nears, fars, bf, M_budget=M, G=8,
            chunk_budget=N * S // 8, noise=noise, **kw)

        assert int(ck.m_eff) == int(comp.m_eff), (bound, dt_gamma)
        m = int(ck.m_eff)
        np.testing.assert_array_equal(
            np.asarray(ck.sel[:m]), np.asarray(comp.sel[:m]))
        np.testing.assert_allclose(
            np.asarray(ck.t0), np.asarray(stream.t0), rtol=1e-6)
        assert int(ck.num_points) == int(stream.counts.sum())
        rm_ref = ray_in_budget_from_counts(stream.counts, comp.m_eff)
        np.testing.assert_array_equal(
            np.asarray(ck.ray_mask), np.asarray(rm_ref))


def test_march_chunked_ladder_window_chains_to_full():
    """ladder_steps < max_steps is a WINDOW: two chained window marches
    (second resuming from the first's resume_t) select exactly the valid
    rungs a single full-ladder march selects, with identical flat
    (ray*S + rung) encodings — the eval residual rounds' cheap-march mode."""
    from tngp.ops import march_rays_chunked

    rng = np.random.default_rng(11)
    N, S, G = 32, 128, 16
    kw = dict(bound=1.0, cascades=1, grid_size=32, dt_gamma=0.0, max_steps=S)
    o = jnp.asarray(np.array([0, 0, -2.0]) + rng.normal(0, 0.1, (N, 3)),
                    jnp.float32)
    d = np.asarray(rng.uniform(-0.4, 0.4, (N, 3))) - np.asarray(o)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    occ = jnp.asarray(rng.uniform(size=(32**3,)) < 0.25, jnp.float32)
    bf = packbits(occ, 0.5)
    nears = jnp.full((N,), 0.05)
    fars = jnp.full((N,), 4.0)
    M = N * S  # unconstrained budget: selection = every valid rung

    full = march_rays_chunked(o, d, nears, fars, bf, M_budget=M, G=G, **kw)
    m_full = int(full.m_eff)
    sel_full = set(np.asarray(full.sel[:m_full]).tolist())

    w1 = march_rays_chunked(o, d, nears, fars, bf, M_budget=M, G=G,
                            ladder_steps=S // 2, **kw)
    # chain: resume each ray from the window end.  The second call's ladder
    # re-originates at resume_t (round semantics), so flat encodings differ
    # and its 128 rungs extend PAST the single full ladder's end — compare
    # per-ray sorted t values inside the range both cover.
    w2 = march_rays_chunked(o, d, w1.resume_t, fars, bf, M_budget=M, G=G,
                            **kw)
    m1, m2 = int(w1.m_eff), int(w2.m_eff)
    sel_chain = set(np.asarray(w1.sel[:m1]).tolist())
    from tngp.ops.march import SQRT3

    dt_min = 2.0 * SQRT3 / S

    def sel_ts(cm, m):
        sel = np.asarray(cm.sel[:m])
        ray, rung = sel // S, sel % S
        t0 = np.asarray(cm.t0)[ray]
        return ray, t0 + rung * dt_min

    rf, tf = sel_ts(full, m_full)
    r1, t1 = sel_ts(w1, m1)
    r2, t2 = sel_ts(w2, m2)
    rc = np.concatenate([r1, r2])
    tc = np.concatenate([t1, t2])
    t_end = np.asarray(full.t0) + (S - 1) * dt_min + 0.5 * dt_min  # per ray
    for n in range(N):
        a = np.sort(tf[rf == n])
        b_ = np.sort(tc[(rc == n) & (tc < t_end[n] - dt_min)])
        a = a[a < t_end[n] - dt_min]
        assert len(a) == len(b_), (n, len(a), len(b_))
        np.testing.assert_allclose(a, b_, atol=1e-4)
    assert sel_chain <= sel_full  # window-1 rungs share the ladder origin


def test_render_eval_chunked_matches_stream():
    """render_rays_eval with the chunked march equals the flat stream path:
    exactly under an ample eval budget, closely when residual rounds engage."""
    from tngp.render import FieldFns, RenderConfig, render_rays_eval

    def density(params, x_cf):
        return 25.0 * jnp.exp(-jnp.sum(x_cf**2, axis=0) / (2 * 0.35**2))

    field = FieldFns(
        sigma_rgb=lambda p, x_cf, d_cf: (density(p, x_cf), jax.nn.sigmoid(x_cf)),
        density=density,
    )
    rng = np.random.default_rng(11)
    N = 64
    o = jnp.asarray(np.array([0, 0, -2.4]) + rng.normal(0, 0.05, (N, 3)), jnp.float32)
    d = np.asarray(rng.uniform(-0.3, 0.3, (N, 3))) - np.asarray(o)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    occ = jnp.asarray(rng.uniform(size=(32**3,)) < 0.5, jnp.float32)
    bitfield = packbits(occ, 0.5)

    base = dict(bound=1.0, grid_size=32, max_steps=128, K=64, min_near=0.05)
    for eval_budget, tol in ((2.0, 1e-5), (0.25, 2e-2)):
        cfg_s = RenderConfig(**base, eval_budget=eval_budget, march_chunk=0)
        cfg_c = RenderConfig(**base, eval_budget=eval_budget, march_chunk=8)
        out_s = render_rays_eval(field, None, o, d, bitfield, cfg_s)
        out_c = render_rays_eval(field, None, o, d, bitfield, cfg_c)
        np.testing.assert_allclose(
            np.asarray(out_c["image"]), np.asarray(out_s["image"]),
            atol=tol, err_msg=f"eval_budget={eval_budget}",
        )
        np.testing.assert_allclose(
            np.asarray(out_c["weights_sum"]), np.asarray(out_s["weights_sum"]),
            atol=tol,
        )

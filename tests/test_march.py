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

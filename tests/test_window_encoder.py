"""Windowed hash-table encoder: spec geometry, XLA reference vs a scalar
numpy simulator, Pallas kernels (interpret mode) vs the XLA reference, and
binning invariants.

The Pallas kernels run in interpret mode on CPU here; the real-TPU execution
is exercised by bench.py / the flagship training path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tngp.kernels.window_encoder import (
    bin_samples,
    padded_size,
    window_encode_binned,
)
from tngp.ops.window_table import (
    N_TILES,
    WIN_ROWS,
    WindowSpec,
    sample_tiles,
    window_encode_ref,
    window_unview,
    window_view,
)

_P1 = 2654435761
_P2 = 805459861


def small_spec(**kw):
    kw.setdefault("num_levels", 6)
    kw.setdefault("level_dim", 2)
    kw.setdefault("base_resolution", 4)
    kw.setdefault("per_level_scale", 2.0)
    kw.setdefault("log2_hashmap_size", 15)
    return WindowSpec.create(**kw)


# ---------------------------------------------------------------------------
# spec geometry
# ---------------------------------------------------------------------------


def test_spec_geometry():
    spec = WindowSpec.create(desired_resolution=2048)  # default NGP shape
    assert spec.num_levels == 16
    # small levels dense-exact, large levels capped at 64 windows (2^19 rows)
    assert spec.level_dense(0)
    assert not spec.level_dense(15)
    assert spec.level_n_win(15) == 64
    nw = [spec.level_n_win(l) for l in range(16)]
    assert all(a <= b for a, b in zip(nw, nw[1:]))
    # parameter count within one window round-up of the reference sizing
    for l in range(16):
        ref_rows = min(2**19, spec.level_side(l) ** 3)
        assert spec.level_n_win(l) * WIN_ROWS >= ref_rows
        assert (spec.level_n_win(l) - 1) * WIN_ROWS < ref_rows
    # tile->window map balanced and monotone
    tw = spec.tile_window(5)
    assert tw.min() == 0 and tw.max() == spec.level_n_win(5) - 1
    assert (np.diff(tw) >= 0).all()


# ---------------------------------------------------------------------------
# XLA reference vs scalar numpy simulator
# ---------------------------------------------------------------------------


def _sim_encode(spec: WindowSpec, x01: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Line-by-line scalar simulator of the window semantics."""
    B = x01.shape[1]
    out = np.zeros((spec.num_levels * spec.level_dim, B), np.float32)
    for j in range(B):
        x = x01[:, j]
        ti = np.clip(np.floor(x * 4).astype(int), 0, 3)
        tile = (ti[0] * 4 + ti[1]) * 4 + ti[2]
        for l in range(spec.num_levels):
            scale = spec.level_scale(l)
            side = spec.level_side(l)
            nw = spec.level_n_win(l)
            w_id = spec.win_offsets[l] + (tile * nw) // N_TILES
            pos = x * scale + 0.5
            pg = np.floor(pos)
            fr = pos - pg
            acc = np.zeros(spec.level_dim, np.float32)
            for k in range(8):
                cc = (pg + [(k >> d) & 1 for d in range(3)]).astype(np.uint32)
                if spec.level_dense(l):
                    row = int(cc[0]) + int(cc[1]) * side + int(cc[2]) * side * side
                else:
                    h = np.uint32(cc[0]) ^ np.uint32(
                        (int(cc[1]) * _P1) & 0xFFFFFFFF
                    ) ^ np.uint32((int(cc[2]) * _P2) & 0xFFFFFFFF)
                    row = int(h & np.uint32(WIN_ROWS - 1))
                w = 1.0
                for d in range(3):
                    w *= fr[d] if (k >> d) & 1 else 1.0 - fr[d]
                acc += np.float32(w) * table[w_id * WIN_ROWS + row]
            out[l * spec.level_dim : (l + 1) * spec.level_dim, j] = acc
    return out


def test_ref_matches_scalar_sim():
    spec = small_spec()
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(3, 64)).astype(np.float32)
    table = rng.normal(size=(spec.total_rows, spec.level_dim)).astype(np.float32)
    got = np.asarray(window_encode_ref(jnp.asarray(x), jnp.asarray(table), spec))
    want = _sim_encode(spec, x, table)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# binning invariants
# ---------------------------------------------------------------------------


def test_bin_samples_invariants():
    rng = np.random.default_rng(1)
    M, block = 700, 128
    x = jnp.asarray(rng.uniform(0, 1, size=(3, M)).astype(np.float32))
    dest, perm, tob = bin_samples(x, block=block)
    dest, perm, tob = np.asarray(dest), np.asarray(perm), np.asarray(tob)
    assert perm.shape[0] == padded_size(M, block)
    # dest is a injection into [0, M_pad)
    assert len(set(dest.tolist())) == M
    assert dest.min() >= 0 and dest.max() < perm.shape[0]
    # perm inverts dest; padding slots carry the sentinel
    assert (perm[dest] == np.arange(M)).all()
    assert (np.sort(perm[perm < M]) == np.arange(M)).all()
    # blocks are tile-pure and match tob
    tiles = np.asarray(sample_tiles(x))
    for b in range(perm.shape[0] // block):
        members = perm[b * block : (b + 1) * block]
        real = members[members < M]
        if len(real):
            assert (tiles[real] == tob[b]).all(), f"block {b} not tile-pure"
    # tob nondecreasing
    assert (np.diff(tob) >= 0).all()


# ---------------------------------------------------------------------------
# Pallas kernels (interpret mode) vs XLA reference
# ---------------------------------------------------------------------------


def test_binned_forward_matches_ref():
    spec = small_spec(num_levels=4)
    rng = np.random.default_rng(2)
    M = 200
    x = jnp.asarray(rng.uniform(0, 1, size=(3, M)).astype(np.float32))
    table = jnp.asarray(
        rng.normal(size=(spec.total_rows, spec.level_dim)).astype(np.float32)
    )
    got = window_encode_binned(x, window_view(table, spec), spec, 64, True, True)
    want = window_encode_ref(x, table, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_binned_bf16_mode_matches_emulating_ref():
    """The bf16 training mode's numerics are part of the encoder SEMANTICS:
    the ref must reproduce them (emulate_bf16) so checkpoints evaluate
    identically across backends (the round-2 8 dB cross-backend eval gap —
    MXU default precision rounds f32 operands to bf16 on device)."""
    spec = small_spec(num_levels=4)
    rng = np.random.default_rng(3)
    M = 200
    x = jnp.asarray(rng.uniform(0, 1, size=(3, M)).astype(np.float32))
    table = jnp.asarray(
        rng.normal(size=(spec.total_rows, spec.level_dim)).astype(np.float32)
    )
    got = window_encode_binned(x, window_view(table, spec), spec, 64, False, True)
    want = window_encode_ref(x, table, spec, emulate_bf16=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7)
    # and the emulation is a real effect: plain f32 ref differs measurably
    plain = window_encode_ref(x, table, spec)
    assert np.abs(np.asarray(plain) - np.asarray(want)).max() > 1e-4


def test_window_view_roundtrip():
    spec = small_spec(num_levels=3)
    rng = np.random.default_rng(7)
    t = jnp.asarray(rng.normal(size=(spec.total_rows, spec.level_dim)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(window_unview(window_view(t, spec), spec)), np.asarray(t)
    )


def test_binned_backward_matches_ref_grad():
    spec = small_spec(num_levels=4)
    rng = np.random.default_rng(3)
    M = 160
    x = jnp.asarray(rng.uniform(0, 1, size=(3, M)).astype(np.float32))
    table = jnp.asarray(
        rng.normal(size=(spec.total_rows, spec.level_dim)).astype(np.float32)
    )
    gout = jnp.asarray(
        rng.normal(size=(spec.output_dim, M)).astype(np.float32)
    )

    def loss_binned(t):
        # chain through window_view so the custom-VJP table grad (window
        # layout) is transposed back to the canonical flat layout by autodiff
        return jnp.sum(
            window_encode_binned(x, window_view(t, spec), spec, 64, True, True) * gout
        )

    def loss_ref(t):
        return jnp.sum(window_encode_ref(x, t, spec) * gout)

    g_binned = jax.grad(loss_binned)(table)
    g_ref = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(
        np.asarray(g_binned), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )


def test_binned_input_grads_match_ref():
    """input_grads=True: d(loss)/d(x01) from the binned path's
    derivative-weight forward passes == XLA autodiff through the reference
    (the gridencoder.cu dy_dx semantics, :196-241)."""
    spec = small_spec(num_levels=4)
    rng = np.random.default_rng(7)
    M = 160
    x = jnp.asarray(rng.uniform(0.01, 0.99, size=(3, M)).astype(np.float32))
    table = jnp.asarray(
        rng.normal(size=(spec.total_rows, spec.level_dim)).astype(np.float32)
    )
    gout = jnp.asarray(rng.normal(size=(spec.output_dim, M)).astype(np.float32))

    def loss_binned(xq, t):
        return jnp.sum(
            window_encode_binned(
                xq, window_view(t, spec), spec, 64, True, True, False, True
            ) * gout
        )

    def loss_ref(xq, t):
        return jnp.sum(window_encode_ref(xq, t, spec) * gout)

    gx_b, gt_b = jax.grad(loss_binned, argnums=(0, 1))(x, table)
    gx_r, gt_r = jax.grad(loss_ref, argnums=(0, 1))(x, table)
    # table grads unchanged by the input-grads option
    np.testing.assert_allclose(np.asarray(gt_b), np.asarray(gt_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_b), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)


def test_binned_input_grads_smoothstep():
    """Smoothstep interpolation adds the 6f(1-f) chain factor to the
    derivative weights."""
    spec = small_spec(num_levels=3, interpolation="smoothstep")
    rng = np.random.default_rng(11)
    M = 96
    x = jnp.asarray(rng.uniform(0.01, 0.99, size=(3, M)).astype(np.float32))
    table = jnp.asarray(
        rng.normal(size=(spec.total_rows, spec.level_dim)).astype(np.float32)
    )
    gout = jnp.asarray(rng.normal(size=(spec.output_dim, M)).astype(np.float32))

    gx_b = jax.grad(
        lambda xq: jnp.sum(
            window_encode_binned(
                xq, window_view(table, spec), spec, 64, True, True, False, True
            ) * gout
        )
    )(x)
    gx_r = jax.grad(
        lambda xq: jnp.sum(window_encode_ref(xq, table, spec) * gout)
    )(x)
    np.testing.assert_allclose(np.asarray(gx_b), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)


def test_ngp_model_with_window_backend():
    """NGPNetwork(encoding='hashgrid_window') trains end-to-end on CPU (ref
    path) — forward finite, table grads flow."""
    from tngp.models import NGPNetwork

    model = NGPNetwork(bound=1.0, encoding="hashgrid_window", num_levels=4,
                       log2_hashmap_size=14)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (32, 3), minval=-1, maxval=1)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    params = model.init(key, x, d)
    sigma, rgb = model.apply(params, x, d)
    assert sigma.shape == (32,) and rgb.shape == (32, 3)
    assert np.isfinite(np.asarray(sigma)).all()

    def loss(p):
        s, r = model.apply(p, x, d)
        return jnp.mean((r - 0.5) ** 2) + jnp.mean(s**2) * 1e-4

    g = jax.grad(loss)(params)
    emb = g["params"]["encoder"]["embeddings"]
    assert float(jnp.abs(emb).sum()) > 0
    assert all(
        np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g)
    )


def test_binned_concentrated_samples():
    """All samples in one tile (worst-case block occupancy) still correct."""
    spec = small_spec(num_levels=3)
    rng = np.random.default_rng(4)
    M = 300
    x = jnp.asarray(rng.uniform(0.8, 0.99, size=(3, M)).astype(np.float32))
    table = jnp.asarray(
        rng.normal(size=(spec.total_rows, spec.level_dim)).astype(np.float32)
    )
    got = window_encode_binned(x, window_view(table, spec), spec, 64, True, True)
    want = window_encode_ref(x, table, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_binned_swap_select_parity():
    """swap_select (lane-contract matmul + 64-row hi select) must reproduce
    the default kernel orientation exactly — forward and table gradient."""
    spec = small_spec(num_levels=4)
    rng = np.random.default_rng(11)
    M = 200
    x = jnp.asarray(rng.uniform(0, 1, size=(3, M)).astype(np.float32))
    table = jnp.asarray(
        rng.normal(size=(spec.total_rows, spec.level_dim)).astype(np.float32)
    )
    base = window_encode_binned(x, window_view(table, spec), spec, 64, True, True)
    swap = window_encode_binned(
        x, window_view(table, spec), spec, 64, True, True, True
    )
    np.testing.assert_allclose(np.asarray(swap), np.asarray(base), rtol=1e-6,
                               atol=1e-7)

    gout = jnp.asarray(rng.normal(size=(spec.output_dim, M)).astype(np.float32))

    def loss(t, sw):
        return jnp.sum(
            window_encode_binned(x, window_view(t, spec), spec, 64, True, True, sw)
            * gout
        )

    g_base = jax.grad(lambda t: loss(t, False))(table)
    g_swap = jax.grad(lambda t: loss(t, True))(table)
    np.testing.assert_allclose(np.asarray(g_swap), np.asarray(g_base),
                               rtol=1e-5, atol=1e-6)


def test_bin_dest_pallas_matches_xla():
    """The MXU bin-rank kernel (triangular-matmul cumsum + histogram) must
    reproduce bin_dest exactly, including non-multiple-of-512 sample counts
    and empty tiles."""
    from tngp.kernels.window_encoder import bin_dest, bin_dest_pallas

    rng = np.random.default_rng(23)
    for M in (100, 512, 1337, 5000):
        x = jnp.asarray(rng.uniform(0, 1, size=(3, M)).astype(np.float32))
        # concentrate into a few tiles so some tiles are empty
        if M == 5000:
            x = x * 0.3
        d0, t0 = bin_dest(x, block=64)
        d1, t1 = bin_dest_pallas(x, block=64, interpret=True)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0), err_msg=f"M={M}")
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0), err_msg=f"M={M}")

"""On-device window-encoder parity: Mosaic kernel vs the pure-XLA reference.

The CPU suite can only run the Pallas kernels in interpret mode, and Mosaic
is known to diverge from interpret (see kernels/window_encoder.py NOTE on the
bf16 accumulator).  This script runs the REAL compiled kernel against
`window_encode_ref` on the same device with (a) the trained hard-scene table
(a row-mapping deviation is glaring there) and (b) a fresh random table, and
reports per-level deviation stats.  Motivated by an 8 dB gap between the
on-TPU eval of the hard-scene checkpoint (48.6 dB) and faithful CPU
re-renders (40.2 dB) — if the device forward deviates, training adapted to
it and checkpoints are not portable across backends.

    python scripts/check_device_parity.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tngp.kernels.window_encoder import window_encode_binned  # noqa: E402
from tngp.models import NGPNetwork  # noqa: E402
from tngp.ops.window_table import window_encode_ref, window_unview  # noqa: E402


def report(tag, f_dev, f_ref, L, C):
    """Returns the overall frac(rel>5%) for pass/fail aggregation."""
    d = np.abs(np.asarray(f_dev) - np.asarray(f_ref))
    s = np.abs(np.asarray(f_ref)) + 1e-7
    rel = d / s
    print(f"[{tag}] overall: mean_abs {d.mean():.3e} max_abs {d.max():.3e} "
          f"frac(rel>5%) {(rel > 0.05).mean():.4f}")
    overall = float((rel > 0.05).mean())
    worst = []
    for l in range(L):
        dl = d[l * C : (l + 1) * C]
        rl = rel[l * C : (l + 1) * C]
        worst.append((float((rl > 0.05).mean()), l, float(dl.max())))
    for frac, l, mx in sorted(worst, reverse=True)[:4]:
        print(f"[{tag}]   level {l}: frac(rel>5%) {frac:.4f} max_abs {mx:.3e}")
    return overall


def int_mul_probe():
    """Micro-test: Mosaic int32 wrapping multiply vs XLA (the in-kernel hash
    depends on exact mod-2^32 products of cell coords with large primes)."""
    from functools import partial

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tngp.kernels.window_encoder import _P1_I32, _P2_I32

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = (x * _P1_I32) ^ (x * _P2_I32)

    x = jnp.arange(1 << 13, dtype=jnp.int32).reshape(8, -1)  # cc range
    got = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    want = (x * _P1_I32) ^ (x * _P2_I32)
    bad = int(jnp.sum(got != want))
    print(f"[int-mul probe] mismatches: {bad}/{x.size}")
    if bad:
        idx = np.argwhere(np.asarray(got != want))[:4]
        for ij in idx:
            i, j = int(ij[0]), int(ij[1])
            print(f"  x={int(x[i, j])} got={int(got[i, j])} want={int(want[i, j])}")
    return bad


def row_mapping_probe(spec, n=8192):
    """Dump the (level -> window row) mapping the kernel actually reads.

    Value-codes every window as value[lane, hi] = lane + 128*hi (same both
    channels) and probes positions whose interpolation collapses to (almost)
    a single corner, so each level's output feature IS the row index it read
    (up to ~0.1 interpolation noise; rounded).  Compares device vs ref."""
    NW = spec.win_offsets[-1]
    lane = jnp.arange(128, dtype=jnp.float32)[:, None]
    hi = jnp.arange(64, dtype=jnp.float32)[None, :]
    code = lane + 128.0 * hi  # [128, 64], max 8191 (exact f32)
    tab = jnp.broadcast_to(code, (NW, spec.level_dim, 128, 64))

    k = jax.random.PRNGKey(11)
    x01 = jax.random.uniform(k, (3, n), minval=1e-4, maxval=1 - 1e-4)
    f_dev = jax.jit(
        lambda t, x: window_encode_binned(x, t, spec, 512, True, False, False)
    )(tab, x01)
    f_ref = jax.jit(
        lambda t, x: window_encode_ref(x, window_unview(t, spec), spec)
    )(tab, x01)
    L, C = spec.num_levels, spec.level_dim
    dev_rows = np.asarray(f_dev).reshape(L, C, n)[:, 0]
    ref_rows = np.asarray(f_ref).reshape(L, C, n)[:, 0]
    # interpolation mixes 8 corner codes; identical mixing on both sides
    # makes even non-integer outputs comparable — report |diff| > 0.5 rows
    worst = 0.0
    for l in range(L):
        d = np.abs(dev_rows[l] - ref_rows[l])
        frac = float((d > 0.5).mean())
        worst = max(worst, frac)
        print(f"[row map] level {l:2d}: mismatch frac {frac:.4f} "
              f"max |d| {d.max():.1f}")
        if frac > 0:
            j = int(np.argmax(d))
            print(f"    e.g. x01={np.asarray(x01)[:, j]} dev={dev_rows[l][j]:.2f} "
                  f"ref={ref_rows[l][j]:.2f}")
    return worst


def bwd_probe(spec, tab, x01):
    """Compiled backward kernel vs the ref VJP (f32 matmuls: any deviation is
    a bug, not rounding).  window_unview is linear, so the ref grad comes
    back in window layout and the two grads compare elementwise."""
    c = jnp.arange(x01.shape[1] * spec.num_levels * spec.level_dim,
                   dtype=jnp.float32)
    cot = (c.reshape(spec.num_levels * spec.level_dim, -1) % 7.0) - 3.0

    def loss_dev(t, x):
        return jnp.vdot(window_encode_binned(x, t, spec, 512, True, False,
                                             False), cot)

    def loss_ref(t, x):
        return jnp.vdot(window_encode_ref(x, window_unview(t, spec), spec),
                        cot)

    g_dev = np.asarray(jax.jit(jax.grad(loss_dev))(tab, x01))
    g_ref = np.asarray(jax.jit(jax.grad(loss_ref))(tab, x01))
    d = np.abs(g_dev - g_ref)
    s = np.abs(g_ref) + 1e-6
    frac = float((d / s > 0.05).mean())
    print(f"[bwd grad] mean_abs {d.mean():.3e} max_abs {d.max():.3e} "
          f"frac(rel>5%) {frac:.4f}")
    return frac


def input_grad_probe(spec, tab, x01):
    """Compiled input-gradient path (derivative-weight fwd passes, the D-NeRF
    deform backprop) vs the ref's XLA autodiff, f32 kernels."""
    c = jnp.arange(x01.shape[1] * spec.num_levels * spec.level_dim,
                   dtype=jnp.float32)
    cot = (c.reshape(spec.num_levels * spec.level_dim, -1) % 5.0) - 2.0

    def loss_dev(x):
        return jnp.vdot(
            window_encode_binned(x, tab, spec, 512, True, False, False, True),
            cot)

    def loss_ref(x):
        return jnp.vdot(window_encode_ref(x, window_unview(tab, spec), spec),
                        cot)

    gx_dev = np.asarray(jax.jit(jax.grad(loss_dev))(x01))
    gx_ref = np.asarray(jax.jit(jax.grad(loss_ref))(x01))
    d = np.abs(gx_dev - gx_ref)
    s = np.abs(gx_ref) + 1e-4
    frac = float((d / s > 0.05).mean())
    print(f"[input grad] mean_abs {d.mean():.3e} max_abs {d.max():.3e} "
          f"frac(rel>5%) {frac:.4f}")
    return frac


def main():
    dev = jax.default_backend()
    print(f"# backend: {dev}")
    try:
        int_mul_probe()
    except Exception as e:
        print(f"[int-mul probe] failed: {type(e).__name__}: {e}")
    model = NGPNetwork(bound=1.0, compute_dtype=jnp.bfloat16,
                       encoding="hashgrid_window")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((8, 3)),
                        jnp.ones((8, 3)) / np.sqrt(3))
    spec = model.bind(params).encoder.spec
    L, C = spec.num_levels, spec.level_dim

    tabs = {"random": jax.random.normal(
        jax.random.PRNGKey(2), params["params"]["encoder"]["embeddings"].shape
    ) * 1e-2}
    import glob

    cands = sorted(glob.glob("/tmp/hard_*/checkpoints/*.npz"),
                   key=os.path.getmtime)
    ckpt = cands[-1] if cands else ""
    if ckpt:
        print(f"# trained table: {ckpt}")
        from flax import serialization

        with open(ckpt, "rb") as f:
            raw = serialization.msgpack_restore(f.read())  # template-free
        want_shape = params["params"]["encoder"]["embeddings"].shape
        try:
            tab = jnp.asarray(raw["ema"]["params"]["encoder"]["embeddings"])
            if tab.shape != want_shape:
                # e.g. a golden-encoding A/B checkpoint ([rows, C] table) —
                # window_encode_binned would crash on it outside any guard
                print(f"# trained table skipped: shape {tab.shape} != "
                      f"window layout {want_shape} (non-window encoding?)")
            else:
                tabs["trained"] = tab
        except Exception as e:
            print(f"# trained table unavailable ({type(e).__name__}: {e})")

    k = jax.random.PRNGKey(3)
    x01 = jax.random.uniform(k, (3, 65536))
    # structured probes: points straddling tile boundaries (1/4-grid planes)
    xb = jnp.linspace(0.249999, 0.250001, 1024)
    x01 = jnp.concatenate(
        [x01, jnp.stack([xb, jnp.full_like(xb, 0.6), jnp.full_like(xb, 0.3)])],
        axis=1,
    )

    fail = 0.0
    for tag, tab in tabs.items():
        for mxu_f32 in (False, True):
            f_dev = jax.jit(
                lambda t, x: window_encode_binned(x, t, spec, 512, mxu_f32,
                                                  False, False)
            )(tab, x01)
            # the ref emulates the kernel's operand rounding per mode, so
            # BOTH rows gate: any deviation is a mapping/precision bug
            f_ref = jax.jit(
                lambda t, x: window_encode_ref(
                    x, window_unview(t, spec), spec,
                    emulate_bf16=not mxu_f32)
            )(tab, x01)
            frac = report(f"{tag} mxu_f32={mxu_f32}", f_dev, f_ref, L, C)
            fail = max(fail, frac)
    try:
        fail = max(fail, row_mapping_probe(spec))
    except Exception as e:
        print(f"[row map] failed: {type(e).__name__}: {e}")
    try:
        fail = max(fail, bwd_probe(spec, tabs["random"], x01))
    except Exception as e:
        print(f"[bwd grad] failed: {type(e).__name__}: {e}")
    try:
        fail = max(fail, input_grad_probe(spec, tabs["random"], x01))
    except Exception as e:
        print(f"[input grad] failed: {type(e).__name__}: {e}")
    print(f"# PARITY {'FAIL' if fail > 1e-4 else 'OK'} (worst frac {fail:.4f})")
    return 1 if fail > 1e-4 else 0


if __name__ == "__main__":
    sys.exit(main())

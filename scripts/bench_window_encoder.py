"""Microbench: binned window encoder vs the golden hash encoder on the chip.

Run on the real TPU (no other TPU process!):
    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/bench_window_encoder.py

Benchmark hygiene (CLAUDE.md): iterations are chained through a data
dependency (the axon tunnel memoizes identical-input executions) and the full
result is returned and blocked on.
"""

import time

import jax
import jax.numpy as jnp

from tngp.kernels.window_encoder import bin_samples, window_encode_binned
from tngp.ops.hashgrid import HashGridSpec, hash_encode_cf_vjp
from tngp.ops.window_table import WindowSpec

M = 131072
ITERS = 10


def timeit(fn, *args, iters=ITERS, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    for _ in range(iters - 1):
        out = fn(*args[:-1], out[1] if isinstance(out, tuple) else args[-1])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.uniform(k1, (3, M))

    wspec = WindowSpec.create(desired_resolution=2048)
    gspec = HashGridSpec.create(desired_resolution=2048)
    wtab = wspec.init_table_win(k2)  # window-layout parameter (kernel native)
    gtab = gspec.init_table(k3)
    print(f"window table rows: {wspec.total_rows}  golden rows: {gspec.total_params}")

    # --- binning alone ------------------------------------------------------
    @jax.jit
    def bin_step(x, salt):
        xs = (x + salt * 1e-6) % 1.0
        dest, perm, tob = bin_samples(xs)
        return dest.sum() + perm.sum() + tob.sum(), salt + 1.0

    t = timeit(bin_step, x, jnp.float32(0.0))
    print(f"bin_samples:            {t*1e3:8.2f} ms")

    for name, mxu_f32 in (("f32", True), ("bf16", False)):
        @jax.jit
        def fwd_step(x, salt):
            xs = (x + salt * 1e-6) % 1.0
            out = window_encode_binned(xs, wtab, wspec, 512, mxu_f32, False)
            return out, salt + 1.0

        t = timeit(fwd_step, x, jnp.float32(0.0))
        print(f"binned fwd   ({name}):    {t*1e3:8.2f} ms  "
              f"({M/t/1e6:.1f} M samples/s)")

        @jax.jit
        def fb_step(x, salt):
            xs = (x + salt * 1e-6) % 1.0

            def loss(tab):
                out = window_encode_binned(xs, tab, wspec, 512, mxu_f32, False)
                return jnp.sum(out * (xs[0] + salt)[None, :])

            l, g = jax.value_and_grad(loss)(wtab)
            return l + g.sum(), salt + 1.0

        t = timeit(fb_step, x, jnp.float32(0.0))
        print(f"binned fwd+bwd ({name}):  {t*1e3:8.2f} ms  "
              f"({M/t/1e6:.1f} M samples/s)")

    # --- swap_select orientation A/B (TNGP_WIN_SWAP candidate default) ------
    # The input POSITIONS chain through the previous output (not just a salt:
    # a round-5 axon result-cache layer served salt-chained repeats in 40 us)
    def timeit_x(fn, x0, iters=ITERS, warmup=2):
        x = x0
        for _ in range(warmup):
            out, x = fn(x)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            out, x = fn(x)
        jax.block_until_ready((out, x))
        return (time.perf_counter() - t0) / iters

    for swap in (False, True):
        @jax.jit
        def fwd_sw(x):
            out = window_encode_binned(x, wtab, wspec, 512, False, False, swap)
            xn = (x + out[0, 0] * 1e-6 + 1e-3) % 1.0
            return out, xn

        t = timeit_x(fwd_sw, x)
        print(f"binned fwd bf16 swap={int(swap)}: {t*1e3:8.2f} ms  "
              f"({M/t/1e6:.1f} M samples/s)")

        @jax.jit
        def fb_sw(x):
            def loss(tab):
                out = window_encode_binned(x, tab, wspec, 512, False, False,
                                           swap)
                return jnp.sum(out * x[0][None, :])

            l, g = jax.value_and_grad(loss)(wtab)
            xn = (x + l * 1e-9 + 1e-3) % 1.0
            return l + g.sum(), xn

        t = timeit_x(fb_sw, x)
        print(f"binned f+b bf16 swap={int(swap)}: {t*1e3:8.2f} ms  "
              f"({M/t/1e6:.1f} M samples/s)")

    # --- golden (round-1) encoder for comparison ----------------------------
    @jax.jit
    def gfwd_step(x, salt):
        xs = (x + salt * 1e-6) % 1.0
        out = hash_encode_cf_vjp(xs, gtab, gspec)
        return out, salt + 1.0

    t = timeit(gfwd_step, x, jnp.float32(0.0), iters=3)
    print(f"golden fwd:             {t*1e3:8.2f} ms")

    @jax.jit
    def gfb_step(x, salt):
        xs = (x + salt * 1e-6) % 1.0

        def loss(tab):
            out = hash_encode_cf_vjp(xs, tab, gspec)
            return jnp.sum(out * (xs[0] + salt)[None, :])

        l, g = jax.value_and_grad(loss)(gtab)
        return l + g.sum(), salt + 1.0

    t = timeit(gfb_step, x, jnp.float32(0.0), iters=3)
    print(f"golden fwd+bwd:         {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()

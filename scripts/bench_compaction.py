"""Microbench: global-compaction and bitfield-probe variants on the chip.

The round-2 step breakdown (PERF.md) charges ~18 ms to the compaction
search (jnp.nonzero over 2M flags) and ~13 ms to the occupancy probe
(XLA gather of 2M byte indices).  This script measures the candidate
replacements:

  compaction:
    A. flat jnp.nonzero(size=M) over [N*S] (current)
    B. hierarchical: chunk-any (G rungs) -> nonzero over N*S/G chunk flags
       -> expand -> nonzero over CB*G candidate flags (exact prefix
       semantics, see notes in ops/compaction.py)
    C. components: flat cumsum, row cumsum, gathers at each index count
  probe:
    D. byte-gather probe (current bitfield_probe)
    E. int32-word gather (same index count, 4x payload)
    F. probe on a pre-expanded [cells] bool table (no bit unpack)

Chained salts + full-result blocking per CLAUDE.md benchmarking traps.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N, S = 4096, 512
M = N * S  # 2M flags
M_BUDGET = 131072
ITERS = 20


def timeit(fn, iters=ITERS, warmup=3):
    salt = jnp.int32(0)
    for _ in range(warmup):
        out, salt = fn(salt)
    jax.block_until_ready((out, salt))
    t0 = time.perf_counter()
    for _ in range(iters):
        out, salt = fn(salt)
    jax.block_until_ready((out, salt))
    return (time.perf_counter() - t0) / iters


def make_mask(key, live_frac=0.28, run_len=8):
    """Clustered validity like a real march: runs of occupied rungs."""
    k1, k2 = jax.random.split(key)
    n_runs = S // run_len
    run_live = jax.random.uniform(k1, (N, n_runs)) < live_frac
    return jnp.repeat(run_live, run_len, axis=1)


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    base_mask = make_mask(key)
    print(
        f"mask: [{N},{S}] live={float(base_mask.mean()):.3f} "
        f"(~{float(base_mask.sum()):.0f} valid vs budget {M_BUDGET})",
        flush=True,
    )

    def fresh_mask(salt):
        # flip a few bits so runs aren't served from the result cache
        r = jax.random.bernoulli(
            jax.random.fold_in(jax.random.PRNGKey(9), salt), 0.001, (N, S)
        )
        return jnp.logical_xor(base_mask, r)

    # --- A: flat nonzero ----------------------------------------------------
    @jax.jit
    def a_flat_nonzero(salt):
        m = fresh_mask(salt).reshape(-1)
        (sel,) = jnp.nonzero(m, size=M_BUDGET, fill_value=M - 1)
        return sel, salt + 1

    print(f"A flat nonzero 2M->131K:      {timeit(a_flat_nonzero)*1e3:8.2f} ms", flush=True)

    # --- B: hierarchical chunk nonzero ---------------------------------------
    for G, CB in ((8, 49152), (16, 24576), (4, 65536)):
        NC = M // G

        @jax.jit
        def b_hier(salt, G=G, CB=CB, NC=NC):
            m = fresh_mask(salt)
            flags = m.reshape(NC, G)
            chunk_any = flags.any(axis=1)
            (csel,) = jnp.nonzero(chunk_any, size=CB, fill_value=NC - 1)
            cand = jnp.take(flags, csel, axis=0)  # [CB, G] row gather
            (s2,) = jnp.nonzero(cand.reshape(-1), size=M_BUDGET, fill_value=CB * G - 1)
            sel = csel[s2 // G] * G + (s2 % G).astype(jnp.int32)
            return sel, salt + 1

        print(f"B hier G={G:2d} CB={CB}:      {timeit(b_hier)*1e3:8.2f} ms", flush=True)

    # --- C: components --------------------------------------------------------
    @jax.jit
    def c_flat_cumsum(salt):
        m = fresh_mask(salt).reshape(-1)
        return jnp.cumsum(m.astype(jnp.int32)), salt + 1

    print(f"C flat cumsum 2M:             {timeit(c_flat_cumsum)*1e3:8.2f} ms", flush=True)

    @jax.jit
    def c_row_cumsum(salt):
        m = fresh_mask(salt)
        r = jnp.cumsum(m.astype(jnp.int32), axis=-1)
        return r, salt + 1

    print(f"C row cumsum [4096,512]:      {timeit(c_row_cumsum)*1e3:8.2f} ms", flush=True)

    src = jax.random.normal(jax.random.PRNGKey(3), (M,))

    for idx_count in (49152, 131072, 262144):
        @jax.jit
        def c_gather(salt, idx_count=idx_count):
            idx = (
                jax.random.randint(
                    jax.random.fold_in(jax.random.PRNGKey(5), salt), (idx_count,), 0, M
                )
            )
            return jnp.take(src, idx), salt + 1

        print(f"C gather {idx_count} idx from 2M:  {timeit(c_gather)*1e3:8.2f} ms", flush=True)

    # row gather [CB, G] rows
    rows = src.reshape(-1, 8)

    @jax.jit
    def c_row_gather(salt):
        idx = jax.random.randint(
            jax.random.fold_in(jax.random.PRNGKey(6), salt), (49152,), 0, rows.shape[0]
        )
        return jnp.take(rows, idx, axis=0), salt + 1

    print(f"C row-gather 49K x8 lanes:    {timeit(c_row_gather)*1e3:8.2f} ms", flush=True)

    # --- D/E/F: probe variants ------------------------------------------------
    H3 = 128 ** 3
    bitfield = jax.random.randint(
        jax.random.PRNGKey(7), (H3 // 8,), 0, 256, dtype=jnp.int32
    ).astype(jnp.uint8)

    @jax.jit
    def d_byte_probe(salt):
        cell = jax.random.randint(
            jax.random.fold_in(jax.random.PRNGKey(8), salt), (M,), 0, H3
        )
        byte = jnp.take(bitfield, cell >> 3)
        return (byte >> (cell & 7).astype(jnp.uint8)) & 1, salt + 1

    print(f"D byte probe 2M idx:          {timeit(d_byte_probe)*1e3:8.2f} ms", flush=True)

    words = jax.lax.bitcast_convert_type(
        bitfield.reshape(-1, 4), jnp.int32
    ).reshape(-1)

    @jax.jit
    def e_word_probe(salt):
        cell = jax.random.randint(
            jax.random.fold_in(jax.random.PRNGKey(8), salt), (M,), 0, H3
        )
        w = jnp.take(words, cell >> 5)
        return (w >> (cell & 31)) & 1, salt + 1

    print(f"E word probe 2M idx:          {timeit(e_word_probe)*1e3:8.2f} ms", flush=True)

    dense = jax.random.bernoulli(jax.random.PRNGKey(11), 0.3, (H3,))

    @jax.jit
    def f_bool_probe(salt):
        cell = jax.random.randint(
            jax.random.fold_in(jax.random.PRNGKey(8), salt), (M,), 0, H3
        )
        return jnp.take(dense, cell), salt + 1

    print(f"F bool probe 2M idx:          {timeit(f_bool_probe)*1e3:8.2f} ms", flush=True)

    # probe at reduced index counts (chunk-level probing)
    for idx_count in (M // 2, M // 4):
        @jax.jit
        def d_fewer(salt, idx_count=idx_count):
            cell = jax.random.randint(
                jax.random.fold_in(jax.random.PRNGKey(8), salt), (idx_count,), 0, H3
            )
            byte = jnp.take(bitfield, cell >> 3)
            return (byte >> (cell & 7).astype(jnp.uint8)) & 1, salt + 1

        print(f"D byte probe {idx_count} idx:     {timeit(d_fewer)*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""On-device parity for the index-chunked Pallas scatter (kernels/scatter.py
_scatter_window / _one_chunk_acc): Mosaic allocates the whole index operand
in SMEM, so streams past ~2^17 indices run several accumulate-aliased calls.
Device-only failure modes (CLAUDE.md) mean this MUST be validated on the real
chip before any training run can hit the chunked path (overdrive budget tier
M=262144, ray batches >= 16K, big eval chunks).

    python scripts/check_scatter_chunks.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tngp.kernels.scatter import scatter_add  # noqa: E402


def main():
    print(f"# backend: {jax.default_backend()}")
    fail = False
    # cases straddle the 2^17 index-chunk boundary, the 2^17 row-window
    # boundary, and the N=32768-ray shapes that used to fail compile
    for M, rows in [(131072, 65536), (262144, 65536), (270336, 131072),
                    (524288, 262144), (1048576, 131072)]:
        k1, k2 = jax.random.split(jax.random.PRNGKey(M), 2)
        idx = jax.random.randint(k1, (M,), 0, rows, dtype=jnp.int32)
        vals = jax.random.normal(k2, (M, 4), jnp.float32)
        t0 = time.time()
        try:
            out = jax.jit(scatter_add, static_argnames="num_rows")(
                idx, vals, num_rows=rows)
            out = np.asarray(out)
        except Exception as e:
            print(f"[M={M:>8} rows={rows:>7}] FAILED: {type(e).__name__}: {e}")
            fail = True
            continue
        dt = time.time() - t0
        ref = np.zeros((rows, 4), np.float32)
        np.add.at(ref, np.asarray(idx), np.asarray(vals))
        d = np.abs(out - ref)
        ok = d.max() < 1e-3  # f32 accumulation-order noise only
        print(f"[M={M:>8} rows={rows:>7}] max_abs {d.max():.2e} "
              f"({'OK' if ok else 'MISMATCH'}, first call {dt:.1f}s)")
        fail |= not ok
    print("RESULT:", "FAIL" if fail else "PASS")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())

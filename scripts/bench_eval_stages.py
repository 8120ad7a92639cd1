"""Stage-level on-chip profile of the eval first pass + residual round.

Round-5: the policy sweep (scripts/sweep_eval.py) showed the eval wall is
march + compaction glue, not the field query.  This times each stage of
_eval_stream_pass and a tier-65536 residual round in isolation, plus
microbenches of the suspected glue (jnp.nonzero over ~1M-flag masks,
the payload scatter) so optimization is measurement-driven.

    python scripts/bench_eval_stages.py
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
if os.environ.get("TNGP_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TNGP_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tngp.data.provider import NeRFDataset
from tngp.data.rays import full_image_rays
from tngp.models import NGPNetwork
from tngp.render import RenderConfig
from tngp.render.renderer import FieldFns, _bucketed_stream_query, dilated_chunk_grid
from tngp.train import Trainer
from tngp.utils.config import TrainConfig
from tngp.ops.march import march_rays_chunked
from tngp.ops import near_far_from_aabb


def timeit(fn, *args, n=8, warm=2, **kw):
    for _ in range(warm):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
        # chain-block each iter: identical-input repeats can be served from
        # the axon result cache if we only block once (CLAUDE.md)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    z = np.load(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "hard_256.npz"))
    poses, intr, images = z["poses"], z["intrinsics"], z["images"]
    H, W = images.shape[1:3]
    ds = NeRFDataset(poses=poses, intrinsics=intr, H=H, W=W,
                     images=images.astype(np.float32))
    model = NGPNetwork(bound=1.0, compute_dtype=jnp.bfloat16,
                       encoding="hashgrid_window")
    cfg = RenderConfig(bound=1.0, grid_size=128, max_steps=512, K=128,
                       min_near=0.05, compact_fraction=0.25,
                       density_thresh=10.0, march_dense=True,
                       eval_budget=0.0625)
    tc = TrainConfig(name="hard_base", workspace="/tmp/hard_base",
                     use_checkpoint="latest")
    trainer = Trainer(model, ds, cfg, tc)
    assert trainer.global_step > 0
    params = trainer.ema_params
    field = trainer.field
    bitfield = trainer.grid.bitfield
    dgrid = trainer._dgrid_fn(bitfield)

    R = 800
    s = R / float(H)
    intr_r = jnp.asarray(np.asarray(intr) * np.array([s, s, s, s], np.float32))
    o_f, d_f = full_image_rays(jnp.asarray(poses[1]), intr_r, R, R)

    N = 16384
    o, d = o_f[:N], d_f[:N]  # top rows: mix of sky + object
    oc, dc = o_f[300 * R:300 * R + N], d_f[300 * R:300 * R + N]  # center rows
    nears, fars = jax.jit(near_far_from_aabb, static_argnums=())(
        o, d, cfg.aabb, cfg.min_near)
    nearsc, farsc = jax.jit(near_far_from_aabb)(oc, dc, cfg.aabb, cfg.min_near)

    S = cfg.max_steps
    M = 131072  # 16384 * 8 (eval_budget 0.0625)

    march = lambda o_, d_, t_, f_, Mb: march_rays_chunked(
        o_, d_, t_, f_, bitfield, bound=cfg.bound, cascades=cfg.cascades,
        grid_size=cfg.grid_size, dt_gamma=cfg.dt_gamma, max_steps=S,
        M_budget=Mb, G=cfg.march_chunk, dilated_grid=dgrid)

    t = timeit(march, oc, dc, nearsc, farsc, M)
    print(f"march_chunked N=16384 M=131072 (center): {t*1e3:8.2f} ms")
    t = timeit(march, o, d, nears, fars, M)
    print(f"march_chunked N=16384 M=131072 (top):    {t*1e3:8.2f} ms")

    cm = march(oc, dc, nearsc, farsc, M)
    m_eff = int(cm.m_eff)
    print(f"  m_eff (center chunk) = {m_eff}")

    q = jax.jit(lambda sel, sv, o_, d_, t0: _bucketed_stream_query(
        field, params, sel, sv, o_, d_, t0, N, cfg))
    t = timeit(q, cm.sel, cm.sel_valid, oc, dc, cm.t0)
    print(f"bucketed_query M=131072 (m_eff={m_eff}):  {t*1e3:8.2f} ms")

    # round shapes: na=65536, k=8 -> m=524288
    na, k = 65536, 8
    o_r, d_r = o_f[:na], d_f[:na]
    nr, fr_ = jax.jit(near_far_from_aabb)(o_r, d_r, cfg.aabb, cfg.min_near)
    t = timeit(march, o_r, d_r, nr, fr_, na * k)
    print(f"march_chunked N=65536 M=524288 (round):  {t*1e3:8.2f} ms")
    cmr = march(o_r, d_r, nr, fr_, na * k)
    qr = jax.jit(lambda sel, sv, t0: _bucketed_stream_query(
        field, params, sel, sv, o_r, d_r, t0, na, cfg))
    t = timeit(qr, cmr.sel, cmr.sel_valid, cmr.t0)
    print(f"bucketed_query M=524288 (m_eff={int(cmr.m_eff)}): {t*1e3:8.2f} ms")

    # ---- glue microbenches -------------------------------------------------
    key = jax.random.PRNGKey(0)
    for NM, CB in ((16384 * 64, 3 * 131072 // 8), (65536 * 64, 3 * 524288 // 8)):
        mask = jax.random.uniform(key, (NM,)) < 0.06
        CB = -(-CB // 128) * 128
        nz = jax.jit(lambda m: jnp.nonzero(m, size=CB, fill_value=NM - 1)[0],
                     static_argnums=())
        t = timeit(nz, mask)
        print(f"nonzero([{NM}], size={CB}):            {t*1e3:8.2f} ms")
        cs = jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32)))
        t = timeit(cs, mask)
        print(f"cumsum([{NM}]):                        {t*1e3:8.2f} ms")

        def bsearch(m):
            arank = jnp.cumsum(m.astype(jnp.int32))
            want = jnp.arange(1, CB + 1, dtype=jnp.int32)
            lo = jnp.zeros((CB,), jnp.int32)
            hi = jnp.full((CB,), NM, jnp.int32)
            for _ in range(max(1, NM.bit_length())):
                mid = (lo + hi) >> 1
                r = jnp.take(arank, jnp.minimum(mid, NM - 1))
                go = r < want
                lo = jnp.where(go, mid + 1, lo)
                hi = jnp.where(go, hi, mid)
            return lo

        t = timeit(jax.jit(bsearch), mask)
        print(f"bsearch-compact([{NM}] -> {CB}):       {t*1e3:8.2f} ms")

    from tngp.kernels.scatter import scatter_add
    for Ms in (131072, 524288):
        from tngp.kernels.window_encoder import padded_size
        Mp = padded_size(Ms, 512)
        idx = jax.random.permutation(key, Mp)[:Ms].astype(jnp.int32)
        vals = jax.random.normal(key, (Ms, 4), jnp.float32)
        t = timeit(lambda i, v: scatter_add(i, v, Mp), idx, vals)
        print(f"payload scatter M={Ms} -> {Mp}:        {t*1e3:8.2f} ms")

    print("done")


if __name__ == "__main__":
    main()

"""Device-shape compile gate: AOT-compile every shipped program shape.

Round-4 postmortem (VERDICT r4, missing #1): the eval800 bench section died
in Mosaic compilation on the driver's machine because bench.py's default
eval chunk (16384) had never been compile-tested on device — the
window-encoder's scalar-prefetch operand lane-pads to NB*512 B of SMEM and
overflowed the 1 MB envelope at M_pad = 1,605,632.  Interpret-mode tests
cannot catch device-only lowering failures (CLAUDE.md lists three classes);
this gate closes the remaining hole: a shape that ships in bench.py /
bench_eval.py / the trainer tiers but is only ever compiled by the driver.

Compiles (no execution — `jit(f).lower(*ShapeDtypeStruct).compile()`):
  1. bench.py train step (value_and_grad) at every budget tier M, incl. the
     trainer's overdrive tier (131072 -> 262144).
  2. FrameRenderer program set (first pass, all four tier loops, finalize)
     at eval chunks 8192 AND 16384, for both the bench blob cfg and the
     bench_eval hard-scene cfg.
  3. render_rays_eval chunked path at chunk 4096 (bench sanity section).
  4. D-NeRF-style window encode with input_grads=True fwd+bwd at train M.
  5. Partial + full density-grid update (Pallas set-scatter / CDF descent).

Run on the real chip (~first run compiles, later runs hit the persistent
cache).  Exit 0 = every (program, shape) compiled; nonzero lists failures.

    python scripts/compile_gate.py [--quick]
"""

import argparse
import dataclasses
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("TNGP_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TNGP_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tngp.models import NGPNetwork  # noqa: E402
from tngp.render import (  # noqa: E402
    FieldFns,
    RenderConfig,
    dilated_chunk_grid,
    render_rays_eval,
    render_rays_train,
)

N_RAYS = 4096  # bench.py train batch

FAILURES = []
OKS = []


def gate(name, fn, *sds):
    t0 = time.time()
    try:
        jax.jit(fn).lower(*sds).compile()
        dt = time.time() - t0
        OKS.append(name)
        print(f"OK   {name}  ({dt:.1f}s)", flush=True)
    except Exception as e:
        msg = f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
        FAILURES.append((name, msg))
        print(f"FAIL {name}  ({time.time()-t0:.1f}s)\n     {msg}", flush=True)
        if os.environ.get("TNGP_GATE_TRACE"):
            traceback.print_exc()


def sds(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def param_sds(model):
    return jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((8, 3)), jnp.ones((8, 3)) / 1.733),
        jax.random.PRNGKey(0),
    )


def grid_sds(cfg):
    cells = cfg.cascades * cfg.grid_size**3
    bf = sds((cells // 8,), jnp.uint8)
    dg = jax.eval_shape(lambda b: dilated_chunk_grid(b, cfg), bf)
    return bf, dg


def gate_train_tiers(model, cfg):
    """bench.py's per-tier train step: loss -> value_and_grad (march +
    encoder fwd/bwd + compositor VJP + scatters at each budget M)."""
    import optax

    field = FieldFns.from_model(model)
    p_s = param_sds(model)
    bf_s, dg_s = grid_sds(cfg)
    tx = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
    o_s = jax.eval_shape(tx.init, p_s)
    fracs = [cfg.compact_fraction / 4, cfg.compact_fraction / 2,
             cfg.compact_fraction, cfg.compact_fraction * 2]  # + overdrive
    for f in fracs:
        cfg_t = dataclasses.replace(cfg, compact_fraction=f)
        M = max(128, -(-int(N_RAYS * cfg.K * f) // 128) * 128)

        def step(p, o, k, bitfield, dgrid, cfg_t=cfg_t):
            def loss_fn(p):
                out = render_rays_train(
                    field, p, jnp.zeros((N_RAYS, 3)),
                    jnp.ones((N_RAYS, 3)) / 1.733, bitfield, cfg_t,
                    key=k, dilated_grid=dgrid,
                )
                return jnp.mean(out["image"]), out["num_points"]

            (l, npts), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
            upd, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, upd), o2, l, npts

        gate(f"train_step M={M}", step, p_s, o_s,
             sds((2,), jnp.uint32), bf_s, dg_s)


def gate_frame_renderer(model, cfg, chunks, n_frame, tag):
    """FrameRenderer program set at every tier (the round-4 failure class)."""
    from tngp.render.frame_eval import FrameRenderer

    field = FieldFns.from_model(model)
    p_s = param_sds(model)
    bf_s, dg_s = grid_sds(cfg)
    for chunk in chunks:
        fr = FrameRenderer(field, cfg, chunk=chunk)
        quantum = 65536 if (n_frame >= 65536 and 65536 % chunk == 0) else chunk
        n_pad = n_frame + (-n_frame) % quantum
        o_c = sds((chunk, 3))
        gate(f"{tag} first_pass chunk={chunk}", fr._first_pass,
             p_s, o_c, o_c, bf_s, dg_s)
        o_f = sds((n_pad, 3))
        r_f = sds((n_pad,))
        i_f = sds((n_pad, 3))
        for ti in range(len(fr.tiers)):
            gate(
                f"{tag} tier_loop na={fr.tiers[ti]} chunk={chunk}",
                lambda p, bf, dg, o, d, rt, ws, dep, im, fa, na, cap, ti=ti:
                    fr._run_tier(ti, p, bf, dg, o, d, rt, ws, dep, im, fa,
                                 na, cap),
                p_s, bf_s, dg_s, o_f, o_f, r_f, r_f, r_f, i_f, r_f,
                sds((), jnp.int32), sds((), jnp.int32),
            )
        gate(f"{tag} finalize chunk={chunk}", fr._finalize,
             p_s, o_f, o_f, r_f, r_f, i_f, r_f, r_f, sds((), jnp.float32))


def gate_eval_chunked(model, cfg):
    field = FieldFns.from_model(model)
    p_s = param_sds(model)
    bf_s, dg_s = grid_sds(cfg)
    gate(
        "render_rays_eval chunk=4096",
        lambda p, o, d, bf, dg: render_rays_eval(
            field, p, o, d, bf, cfg, dilated_grid=dg)["image"],
        p_s, sds((4096, 3)), sds((4096, 3)), bf_s, dg_s,
    )


def gate_window_input_grads(cfg):
    """D-NeRF deform-backprop path: window encode with input_grads, fwd+bwd
    at the train tier M (three derivative-weight passes in the VJP)."""
    from tngp.kernels.window_encoder import window_encode_binned
    from tngp.ops.window_table import WindowSpec

    spec = WindowSpec.create(num_levels=16, level_dim=2,
                             log2_hashmap_size=19, base_resolution=16,
                             desired_resolution=2048)
    tab_s = jax.eval_shape(
        lambda k: spec.init_table_win(k, jnp.float32), jax.random.PRNGKey(0))
    M = 131072

    def f(x, tab):
        def loss(x, tab):
            return jnp.sum(window_encode_binned(
                x, tab, spec, 512, False, False, False, True))

        return jax.value_and_grad(loss, argnums=(0, 1))(x, tab)

    gate(f"window_encode input_grads M={M}", f, sds((3, M)), tab_s)


def gate_grid_update(model, cfg):
    from tngp.render import create, update_density_grid

    field = FieldFns.from_model(model)
    p_s = param_sds(model)
    g_s = jax.eval_shape(lambda: create(cfg.cascades, cfg.grid_size))
    for full in (True, False):
        gate(
            f"grid_update full={full}",
            lambda g, p, k, full=full: update_density_grid(
                g, p, k, density_fn=field.density, bound=cfg.bound,
                grid_size=cfg.grid_size, density_thresh=cfg.density_thresh,
                full=full),
            g_s, p_s, sds((2,), jnp.uint32),
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="only the round-4 failure class (frame renderer)")
    args = ap.parse_args()
    t0 = time.time()
    print(f"backend: {jax.default_backend()}", flush=True)

    model = NGPNetwork(bound=1.0, compute_dtype=jnp.bfloat16,
                       encoding="hashgrid_window")
    # bench.py train/eval cfg (blob scene)
    cfg_bench = RenderConfig(bound=1.0, grid_size=128, max_steps=512, K=128,
                             min_near=0.05, compact_fraction=0.25,
                             density_thresh=1.0, march_dense=True,
                             march_group=16)
    # bench_eval.py cfg (trained hard scene)
    cfg_eval = RenderConfig(bound=1.0, grid_size=128, max_steps=512, K=128,
                            min_near=0.05, compact_fraction=0.25,
                            density_thresh=10.0, march_dense=True)

    gate_frame_renderer(model, cfg_bench, (8192, 16384), 800 * 800, "bench")
    if not args.quick:
        if cfg_eval != cfg_bench:
            gate_frame_renderer(model, cfg_eval, (8192, 16384), 800 * 800,
                                "hard")
        gate_train_tiers(model, cfg_bench)
        gate_eval_chunked(model, cfg_bench)
        gate_window_input_grads(cfg_bench)
        gate_grid_update(model, cfg_bench)

    print(f"\n{len(OKS)} OK, {len(FAILURES)} FAIL  ({time.time()-t0:.0f}s)")
    for name, msg in FAILURES:
        print(f"  FAIL {name}: {msg}")
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()

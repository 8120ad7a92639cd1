"""Multi-device sharding: data-parallel rays + model-parallel hash table on the
8-device CPU mesh; gradients must match the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tngp.models import NGPNetwork
from tngp.ops import packbits
from tngp.parallel import make_mesh, ray_sharding, replicated, shard_params
from tngp.render import FieldFns, RenderConfig, render_rays_train


def setup(n_model):
    mesh = make_mesh(n_data=8 // n_model, n_model=n_model)
    model = NGPNetwork(bound=1.0, num_levels=4, log2_hashmap_size=12)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)) / np.sqrt(3.0))
    field = FieldFns.from_model(model)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=64, K=16, min_near=0.05)
    bf = packbits(jnp.ones((16**3,), jnp.float32), 0.5)

    rng = np.random.default_rng(0)
    N = 64
    o = np.tile(np.array([0.0, 0.0, -2.0], np.float32), (N, 1))
    tgt = rng.uniform(-0.3, 0.3, (N, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    gt = rng.uniform(0, 1, (N, 3)).astype(np.float32)

    def loss_fn(p, o, d, gt, bf):
        out = render_rays_train(field, p, o, d, bf, cfg)
        return jnp.mean((out["image"] - gt) ** 2)

    return mesh, model, params, loss_fn, (jnp.asarray(o), jnp.asarray(d), jnp.asarray(gt), bf)


def test_dp_tp_grads_match_single_device():
    mesh, model, params, loss_fn, (o, d, gt, bf) = setup(n_model=2)

    # single device reference
    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params, o, d, gt, bf)

    # sharded: rays on data, table rows on model
    sp = shard_params(params, mesh, shard_table=True)
    rs = ray_sharding(mesh)
    o_s = jax.device_put(o, rs)
    d_s = jax.device_put(d, rs)
    gt_s = jax.device_put(gt, rs)
    bf_s = jax.device_put(bf, replicated(mesh))

    with mesh:
        loss_s, grads_s = jax.jit(jax.value_and_grad(loss_fn))(sp, o_s, d_s, gt_s, bf_s)
        jax.block_until_ready(loss_s)

    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves(grads_ref)
    flat_s = jax.tree_util.tree_leaves(grads_s)
    for a, b in zip(flat_r, flat_s):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6)

    # the table really is sharded over 'model'
    table = None
    for path, leaf in jax.tree_util.tree_leaves_with_path(sp):
        if "embeddings" in str(path):
            table = leaf
    assert table is not None
    assert table.sharding.spec == P("model", None)


def test_window_encoder_dp_shard_map(monkeypatch):
    """The binned window encoder (the TPU hot path) under a ('data','model')
    mesh via shard_map: per-shard Pallas programs (interpret mode on CPU),
    replicated window table, pmean'd grads == single-device grads."""
    monkeypatch.setenv("TNGP_WIN_FORCE_BINNED", "1")
    from tngp.parallel import data_parallel_value_and_grad

    mesh = make_mesh(n_data=4, n_model=2)
    model = NGPNetwork(bound=1.0, num_levels=4, log2_hashmap_size=12,
                       encoding="hashgrid_window")
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((8, 3)), jnp.ones((8, 3)) / np.sqrt(3.0))
    field = FieldFns.from_model(model)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=32, K=16,
                       min_near=0.05, march_dense=True, compact_fraction=0.5)
    bf = packbits(jnp.ones((16**3,), jnp.float32), 0.5)

    rng = np.random.default_rng(1)
    N = 32  # 8 rays/shard over data=4
    o = np.tile(np.array([0.0, 0.0, -2.0], np.float32), (N, 1))
    tgt = rng.uniform(-0.3, 0.3, (N, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    gt = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    o, d, gt = jnp.asarray(o), jnp.asarray(d), jnp.asarray(gt)

    def loss_fn(p, o, d, gt, bf):
        out = render_rays_train(field, p, o, d, bf, cfg)
        return jnp.mean((out["image"] - gt) ** 2)

    # single-device reference at the PER-SHARD budget (M scales with local N,
    # so compare shard-by-shard: evaluate the same loss on each 8-ray shard
    # and average — that is exactly what the shard_map computes)
    losses, grads = [], []
    for s in range(4):
        l, g = jax.value_and_grad(loss_fn)(
            p_ := params, o[s * 8:(s + 1) * 8], d[s * 8:(s + 1) * 8],
            gt[s * 8:(s + 1) * 8], bf)
        losses.append(float(l))
        grads.append(g)
    loss_ref = np.mean(losses)
    grads_ref = jax.tree_util.tree_map(
        lambda *xs: sum(np.asarray(x) for x in xs) / 4.0, *grads)

    sharded = data_parallel_value_and_grad(loss_fn, mesh, n_batch_args=3)
    sp = shard_params(params, mesh, shard_table=True)  # window table replicates
    rs = ray_sharding(mesh)
    with mesh:
        loss_s, grads_s = jax.jit(sharded)(
            sp, jax.device_put(o, rs), jax.device_put(d, rs),
            jax.device_put(gt, rs), jax.device_put(bf, replicated(mesh)))
        jax.block_until_ready(loss_s)

    # the 4-D window table must have stayed replicated
    for path, leaf in jax.tree_util.tree_leaves_with_path(sp):
        if "embeddings" in str(path):
            assert leaf.ndim == 4
            assert leaf.sharding.spec == P()

    np.testing.assert_allclose(float(loss_s), loss_ref, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads_ref),
                    jax.tree_util.tree_leaves(grads_s)):
        # atol 1e-5: the bf16-emulating path leaves accumulation-order noise
        # on near-zero table grads (shard-sum vs single-pass ordering)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_pure_dp_8way():
    mesh, model, params, loss_fn, (o, d, gt, bf) = setup(n_model=1)
    sp = shard_params(params, mesh, shard_table=False)
    o_s = jax.device_put(o, ray_sharding(mesh))
    d_s = jax.device_put(d, ray_sharding(mesh))
    gt_s = jax.device_put(gt, ray_sharding(mesh))
    with mesh:
        loss_s = jax.jit(loss_fn)(sp, o_s, d_s, gt_s, bf)
        jax.block_until_ready(loss_s)
    loss_ref = loss_fn(params, o, d, gt, bf)
    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-5)

"""Encoder modules + factory with torch-ngp `get_encoder` parity.

Behavioral reference: `encoding.py:45-103` (name -> encoder mapping and
default hyperparameters), `gridencoder/grid.py:754` (GridEncoder module),
`shencoder/sphere_harmonics.py` (SHEncoder), `encoding.py:5-43` (FreqEncoder).

The Minkowski point-cloud encoder family (`hashgrid_minkowski*`, fork-only,
depends on MinkowskiEngine sparse convolutions) is an explicit non-goal; the
factory raises with a clear message for those names.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import HashGridSpec, freq_encode, hash_encode, sh_encode
from ..ops.hashgrid import hash_encode_cf_vjp
from ..ops.sh import sh_encode_cf
from ..ops.window_table import WindowSpec, window_encode_ref, window_unview


class GridEncoder(nn.Module):
    """Multiresolution hash/tiled grid encoder (param table `embeddings`).

    `__call__` is batch-first `[..., D]`; `cf` is the channels-first hot path
    (`[D, B]` -> `[L*C, B]`, batch on the TPU lane axis).
    """

    spec: HashGridSpec
    param_dtype: jnp.dtype = jnp.float32

    @property
    def output_dim(self) -> int:
        return self.spec.output_dim

    def setup(self):
        self.embeddings = self.param(
            "embeddings", lambda key: self.spec.init_table(key, self.param_dtype)
        )

    def __call__(self, x: jax.Array, bound: float = 1.0) -> jax.Array:
        # inputs in [-bound, bound] -> [0, 1] (grid.py:807)
        x01 = (x + bound) / (2.0 * bound)
        return hash_encode(x01, self.embeddings, self.spec)

    def cf(self, x_cf: jax.Array, bound: float = 1.0) -> jax.Array:
        x01 = (x_cf + bound) / (2.0 * bound)
        # custom-VJP path: Pallas scatter-add table gradient on TPU
        return hash_encode_cf_vjp(x01, self.embeddings, self.spec)


class WindowGridEncoder(nn.Module):
    """Multiresolution grid encoder over the TPU windowed table layout
    (ops/window_table.py).  Same role as GridEncoder but parameterized for the
    binned Pallas MXU path (kernels/window_encoder.py) — the round-2 answer to
    the reference's gridencoder.cu hot loop.

    On TPU `cf` runs the binned Pallas kernels; elsewhere the pure-XLA
    reference (identical semantics, XLA-autodiff gradients).

    The parameter lives in the transposed window layout [n_windows, C, 128,
    64] (`WindowSpec.init_table_win`) — the kernels' native operand format —
    so the per-step tile-major fat-table build is a pure row gather rather
    than a 50 MB transpose.
    """

    spec: WindowSpec
    param_dtype: jnp.dtype = jnp.float32
    block: int = 512
    mxu_f32: bool = False  # bf16 matmuls by default on the hot path
    # backprop into positions (3 derivative-weight fwd passes in the VJP) —
    # required when the encoder input is itself a network output, e.g.
    # D-NeRF's canonical encode at x+Δx (dnerf/network.py:123-165)
    input_grads: bool = False
    # contract the one-hot matmuls over lanes (K=128), reduce over the 64 hi
    # rows, and ride both channels on one [128,128]-operand matmul — on-chip
    # fwd 13.88 -> 10.52 ms (-24%) at M=131072, and BIT-IDENTICAL to the
    # hi-contract orientation on device (fwd AND grad max-abs-diff 0.0,
    # round-5 parity run), so flipping is not a numerics-bearing change
    swap_select: bool = True

    @property
    def output_dim(self) -> int:
        return self.spec.output_dim

    def setup(self):
        self.embeddings = self.param(
            "embeddings", lambda key: self.spec.init_table_win(key, self.param_dtype)
        )

    def __call__(self, x: jax.Array, bound: float = 1.0) -> jax.Array:
        prefix = x.shape[:-1]
        out = self.cf(x.reshape(-1, 3).T, bound=bound)
        return out.T.reshape(*prefix, self.output_dim)

    def cf(self, x_cf: jax.Array, bound: float = 1.0) -> jax.Array:
        import os

        x01 = (x_cf + bound) / (2.0 * bound)
        on_tpu = jax.default_backend() == "tpu"
        # TNGP_WIN_FORCE_BINNED=1 runs the binned path in interpret mode off
        # TPU — lets the CPU mesh tests / dryrun exercise the actual hot-path
        # program (binning, window DMA indexing, custom VJP) under shard_map
        if on_tpu or os.environ.get("TNGP_WIN_FORCE_BINNED"):
            from ..kernels.window_encoder import window_encode_binned

            return window_encode_binned(
                x01, self.embeddings, self.spec, self.block, self.mxu_f32,
                not on_tpu, self.swap_select, self.input_grads,
            )
        # off-TPU fallback reproduces the device kernel's numerics so
        # checkpoints are portable across backends (see window_encode_ref)
        return window_encode_ref(
            x01, window_unview(self.embeddings, self.spec), self.spec,
            emulate_bf16=not self.mxu_f32,
        )


class SHEncoder(nn.Module):
    degree: int = 4

    @property
    def output_dim(self) -> int:
        return self.degree**2

    def __call__(self, d: jax.Array) -> jax.Array:
        return sh_encode(d, self.degree)

    def cf(self, d_cf: jax.Array) -> jax.Array:
        return sh_encode_cf(d_cf, self.degree)


class FreqEncoder(nn.Module):
    degree: int = 6  # == multires; bands 2^0 .. 2^(degree-1)
    input_dim: int = 3

    @property
    def output_dim(self) -> int:
        return self.input_dim * (1 + 2 * self.degree)

    def __call__(self, x: jax.Array) -> jax.Array:
        return freq_encode(x, self.degree)


class IdentityEncoder(nn.Module):
    input_dim: int = 3

    @property
    def output_dim(self) -> int:
        return self.input_dim

    def __call__(self, x: jax.Array) -> jax.Array:
        return x


def get_encoder(
    encoding: str,
    input_dim: int = 3,
    multires: int = 6,
    degree: int = 4,
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: int = 2048,
    align_corners: bool = False,
    interpolation: str = "linear",
    input_grad: bool = True,
    **kwargs,
) -> Tuple[nn.Module, int]:
    """Name -> (module, output_dim), mirroring encoding.py:45-103."""
    if encoding in (None, "None", "none"):
        enc = IdentityEncoder(input_dim=input_dim)
        return enc, input_dim
    if encoding == "frequency":
        enc = FreqEncoder(degree=multires, input_dim=input_dim)
        return enc, enc.output_dim
    if encoding in ("sphere_harmonics", "spherical_harmonics", "sh"):
        enc = SHEncoder(degree=degree)
        return enc, enc.output_dim
    if encoding == "hashgrid_window":
        # TPU windowed-table layout (binned Pallas MXU path); 3-D only
        if input_dim != 3:
            raise ValueError("hashgrid_window supports input_dim=3 only")
        wspec = WindowSpec.create(
            num_levels=num_levels,
            level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            align_corners=align_corners,
            interpolation=interpolation,
        )
        import os

        enc = WindowGridEncoder(
            spec=wspec,
            # kernel-orientation knob (see WindowGridEncoder.swap_select) —
            # default ON after the round-5 device A/B (-24% fwd) + bit-exact
            # parity; TNGP_WIN_SWAP=0 reverts to the hi-contract orientation
            swap_select=os.environ.get("TNGP_WIN_SWAP", "1") == "1",
            # true-f32 MXU passes (Precision.HIGHEST, 3.5-4x slower) — the
            # bf16-vs-f32 training-quality A/B knob (PERF.md round 2c)
            mxu_f32=bool(kwargs.get("mxu_f32", False))
            or os.environ.get("TNGP_MXU_F32", "0") == "1",
            # position backprop (D-NeRF deform path); harmless elsewhere but
            # costs 3 extra fwd passes in the VJP, so callers opt in
            input_grads=bool(kwargs.get("input_grads", False)),
        )
        return enc, wspec.output_dim
    if encoding in ("hashgrid", "tiledgrid"):
        spec = HashGridSpec.create(
            input_dim=input_dim,
            num_levels=num_levels,
            level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            gridtype="hash" if encoding == "hashgrid" else "tiled",
            align_corners=align_corners,
            interpolation=interpolation,
            input_grad=input_grad,
        )
        enc = GridEncoder(spec=spec)
        return enc, spec.output_dim
    if "minkowski" in str(encoding) or encoding in ("hashgrid_geo", "ash"):
        raise NotImplementedError(
            f"encoder '{encoding}' is a fork-experimental point-cloud encoder "
            "(MinkowskiEngine-based) and an explicit non-goal of the TPU build; "
            "see SURVEY.md §7 step 9."
        )
    raise ValueError(f"unknown encoding: {encoding}")

"""Typed experiment configuration.

Replaces the reference's argparse-kwargs-soup (`**vars(self.opt)` passed
wholesale into render, nerf/utils.py:528 — see SURVEY.md §5.6) with explicit
dataclasses.  Flag names keep parity with main_nerf.py so the CLIs map 1:1.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class TrainConfig:
    name: str = "ngp"
    workspace: str = "workspace"
    seed: int = 0
    iters: int = 30000  # total training steps (main_nerf.py:14)
    lr: float = 1e-2
    num_rays: int = 4096
    eval_interval: int = 50  # epochs
    max_keep_ckpt: int = 2
    ema_decay: float = 0.95
    update_extra_interval: int = 16  # density grid update cadence (steps)
    error_map: bool = False
    patch_size: int = 1
    color_space: str = "srgb"  # 'srgb' | 'linear'
    bf16: bool = True  # the TPU analogue of --fp16 (no GradScaler needed)
    use_checkpoint: str = "latest"  # 'latest' | 'scratch' | path
    steps_per_epoch: Optional[int] = None  # default: number of train frames
    # CLIP-guided GT-free training (nerf/utils.py:431-434,485-499):
    # every `rand_pose`-th step renders a random orbit pose and minimizes
    # -cos_sim(CLIP(image), CLIP(text)); <= 0 disables.
    rand_pose: int = -1
    clip_text: Optional[str] = None
    clip_model_path: str = "openai/clip-vit-base-patch16"
    # non-empty: capture a jax.profiler trace of the FIRST epoch into this
    # directory (TensorBoard/Perfetto-viewable; SURVEY §5.1)
    profile_dir: str = ""
    # adapt the global sample budget to measured demand — the TPU analogue of
    # the reference's running mean_count allocation (raymarching.py:200-232):
    # a small ladder of precompiled budget tiers (fractions of the configured
    # compact_fraction); the trainer moves down when demand leaves headroom
    # and back up when rays start getting budget-dropped.  Grid-marching NGP
    # trainer only (march_dense path).
    adaptive_budget: bool = True
    # let the tier ladder extend ABOVE the configured compact_fraction (to
    # 2x, capped at 0.9) when rays are being budget-dropped — reference
    # parity: mean_count grows with demand, which is what makes --error_map
    # GAIN quality there (readme.md:212) instead of dropping half the rays
    adaptive_overdrive: bool = True

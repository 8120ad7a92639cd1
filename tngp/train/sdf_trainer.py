"""SDF trainer — the simpler standalone trainer for the SDF workload.

Behavioral reference: torch-ngp `sdf/utils.py:83-562`:
  * train_step = mape(pred, gt) on host-sampled batches (:217-227)
  * Adam(0.9, 0.99, eps 1e-15), StepLR(step_size=10 epochs, gamma=0.1)
    (main_sdf.py:54-56)
  * EMA per *step* (:349-350 — unlike the NeRF trainer's per-epoch EMA)
  * save_mesh: density field on a grid (block-wise) -> marching cubes -> mesh
    export (:235-261); here marching tetrahedra via the native lib.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.sdf import SDFDataset
from ..native import marching_tetrahedra, save_obj, save_ply
from ..ops import mape_loss
from ..utils.config import TrainConfig
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .ema import ema_init, ema_update


class SDFTrainer:
    def __init__(
        self,
        model,
        dataset: SDFDataset,
        tc: TrainConfig,
        valid_dataset: Optional[SDFDataset] = None,
        lr: float = 1e-4,
    ):
        self.model = model
        self.dataset = dataset
        self.valid_dataset = valid_dataset
        self.tc = tc
        self.key = jax.random.PRNGKey(tc.seed)

        self.key, init_key = jax.random.split(self.key)
        self.params = model.init(init_key, jnp.zeros((8, 3)))

        # StepLR(10 epochs, 0.1): epoch = dataset.size steps
        steps_per_epoch = dataset.size
        self.tx = optax.adam(
            optax.exponential_decay(
                lr, transition_steps=10 * steps_per_epoch, decay_rate=0.1,
                staircase=True,
            ),
            b1=0.9, b2=0.99, eps=1e-15,
        )
        self.opt_state = self.tx.init(self.params)
        self.ema_params = ema_init(self.params)

        self.epoch = 0
        self.global_step = 0
        self.stats = {"loss": [], "valid_loss": []}
        os.makedirs(tc.workspace, exist_ok=True)
        self.log_path = os.path.join(tc.workspace, f"log_{tc.name}.txt")
        self._step = self._build_step()

        if tc.use_checkpoint == "latest":
            ckpt = latest_checkpoint(tc.workspace, tc.name)
            if ckpt:
                self.load_checkpoint(ckpt)

    def log(self, msg):
        print(msg, flush=True)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")

    def _build_step(self):
        model, tx, ema_decay = self.model, self.tx, self.tc.ema_decay

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, opt_state, ema_params, points_cf, sdfs):
            def loss_fn(p):
                pred = model.apply(p, points_cf, method=type(model).cf)  # [1, B]
                return mape_loss(pred[0], sdfs)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema_params = ema_update(ema_params, params, ema_decay)  # per step
            return params, opt_state, ema_params, loss

        return step

    def train_one_epoch(self):
        t0 = time.time()
        losses = []
        for _ in range(self.dataset.size):
            pts, sdfs = self.dataset.sample(self.global_step)
            self.params, self.opt_state, self.ema_params, loss = self._step(
                self.params, self.opt_state, self.ema_params,
                jnp.asarray(pts.T), jnp.asarray(sdfs[:, 0]),
            )
            self.global_step += 1
            # on-device accumulation: a float() per step serializes dispatch
            losses.append(loss)
        avg = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
        self.stats["loss"].append(avg)
        self.log(
            f"[sdf epoch {self.epoch}] loss={avg:.6f} "
            f"{self.dataset.size/(time.time()-t0):.1f} it/s"
        )
        return avg

    def evaluate(self) -> float:
        ds = self.valid_dataset or self.dataset
        pts, sdfs = ds.sample(10_000_000 + self.epoch)
        pred = self.model.apply(self.ema_params, jnp.asarray(pts.T), method=type(self.model).cf)
        loss = float(mape_loss(pred[0], jnp.asarray(sdfs[:, 0])))
        self.stats["valid_loss"].append(loss)
        self.log(f"[sdf eval epoch {self.epoch}] mape={loss:.6f}")
        return loss

    def train(self, max_epochs: int):
        for _ in range(self.epoch, max_epochs):
            self.epoch += 1
            self.train_one_epoch()
            if self.epoch % self.tc.eval_interval == 0:
                self.evaluate()
            self.save_checkpoint()

    def save_mesh(self, path: Optional[str] = None, resolution: int = 512,
                  chunk: int = 2**18):
        """Extract the zero level set (negated: network is positive outside)."""
        path = path or os.path.join(self.tc.workspace, "results", "mesh.ply")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        g = np.linspace(-1, 1, resolution, dtype=np.float32)

        @jax.jit
        def q(p_cf):
            return self.model.apply(self.ema_params, p_cf, method=type(self.model).cf)[0]

        field = np.empty((resolution,) * 3, np.float32)
        for i in range(resolution):
            X, Y, Z = np.meshgrid(g[i : i + 1], g, g, indexing="ij")
            pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=0)
            vals = []
            for s in range(0, pts.shape[1], chunk):
                vals.append(np.asarray(q(jnp.asarray(pts[:, s : s + chunk]))))
            field[i] = np.concatenate(vals).reshape(resolution, resolution)
        verts, faces = marching_tetrahedra(-field, 0.0)  # positive inside
        verts = verts / (resolution - 1) * 2 - 1
        if path.endswith(".obj"):
            save_obj(path, verts, faces)
        else:
            save_ply(path, verts, faces)
        self.log(f"[save_mesh] {path}: {len(verts)} verts, {len(faces)} faces")
        return path

    def _payload(self):
        return {"params": self.params, "opt_state": self.opt_state, "ema": self.ema_params}

    def save_checkpoint(self, best: bool = False):
        save_checkpoint(
            self.tc.workspace, self.tc.name, self.epoch, self.global_step,
            self._payload(), max_keep=self.tc.max_keep_ckpt, best=best,
        )

    def load_checkpoint(self, path: str):
        payload, meta = load_checkpoint(path, self._payload())
        self.params = payload["params"]
        self.opt_state = payload["opt_state"]
        self.ema_params = payload["ema"]
        self.epoch = meta.get("epoch", 0)
        self.global_step = meta.get("global_step", 0)
        self.log(f"[load_checkpoint] {path}")

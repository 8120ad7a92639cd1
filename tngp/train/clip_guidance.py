"""CLIP text-image guidance for GT-free training.

Behavioral reference: torch-ngp `nerf/clip_utils.py:11-64` (CLIPLoss over
ViT-B/16) hooked into the trainer when `--rand_pose > 0` and `--clip_text` is
set (nerf/utils.py:431-434, 485-499): every `rand_pose`-th batch renders a
random orbit pose and minimizes negative cosine similarity between the CLIP
image embedding of the render and the text embedding.

TPU-first: the reference backprops through torch CLIP; here the image tower
must be a *JAX* function so the whole clip step (render -> embed -> loss ->
grads) stays one jitted XLA program.  Two embedders:

  * `FlaxCLIPEmbedder` — transformers' FlaxCLIPModel (differentiable); needs a
    local snapshot of a CLIP checkpoint (no egress in this environment).
  * `StubEmbedder` — a deterministic random-feature embedder used by tests and
    as an explicit opt-in; exercises the identical training plumbing.

The torch-based `CLIPLoss` (non-differentiable scorer) is kept for eval-time
similarity reporting parity with clip_utils.py.
"""

from __future__ import annotations

import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np

# CLIP pixel normalization constants (clip_utils.py:30-31)
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class StubEmbedder:
    """Deterministic differentiable stand-in for CLIP (tests / no-weights).

    Image tower: resize to 32x32, normalize, project patches with a fixed
    seeded random matrix, mean-pool, l2-normalize.  Text tower: seeded random
    unit vector from the sha256 of the text.  Not semantically meaningful, but
    gradient-compatible and stable across processes.
    """

    embed_dim = 64
    resolution = 32

    def embed_images(self, images: jax.Array) -> jax.Array:
        """[B, H, W, 3] in [0,1] -> [B, D] l2-normalized (differentiable)."""
        B = images.shape[0]
        r = self.resolution
        x = jax.image.resize(images, (B, r, r, 3), "bilinear")
        x = (x - _CLIP_MEAN) / _CLIP_STD
        proj = jax.random.normal(
            jax.random.PRNGKey(0), (r * r * 3, self.embed_dim), jnp.float32
        ) / np.sqrt(r * r * 3)
        feats = x.reshape(B, -1) @ proj
        return feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)

    def embed_text(self, text: str) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:4], "little")
        v = np.random.default_rng(seed).normal(size=(self.embed_dim,)).astype(np.float32)
        return v / (np.linalg.norm(v) + 1e-8)


class FlaxCLIPEmbedder:
    """Differentiable CLIP towers via transformers FlaxCLIPModel.

    Requires a local checkpoint directory (no egress); raises with a clear
    message otherwise, matching the plumbing-in-place contract.
    """

    def __init__(self, model_path: str = "openai/clip-vit-base-patch16"):
        try:
            from transformers import AutoTokenizer, FlaxCLIPModel

            local = os.path.isdir(model_path)
            self.model = FlaxCLIPModel.from_pretrained(model_path, local_files_only=local)
            self.tokenizer = AutoTokenizer.from_pretrained(model_path, local_files_only=local)
        except Exception as e:
            raise RuntimeError(
                "CLIP guidance needs a local snapshot of a CLIP checkpoint "
                f"(tried '{model_path}'): {e}. Point --clip_model_path at a "
                "local HuggingFace CLIP directory, or use the stub embedder."
            ) from e
        self.embed_dim = int(self.model.config.projection_dim)
        self.resolution = int(self.model.config.vision_config.image_size)

    def embed_images(self, images: jax.Array) -> jax.Array:
        """[B, H, W, 3] in [0,1] -> [B, D] l2-normalized (differentiable)."""
        r = self.resolution
        x = jax.image.resize(images, (images.shape[0], r, r, 3), "bilinear")
        x = (x - _CLIP_MEAN) / _CLIP_STD
        x = x.transpose(0, 3, 1, 2)  # NCHW pixel_values
        feats = self.model.get_image_features(pixel_values=x)
        return feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)

    def embed_text(self, text: str) -> np.ndarray:
        inputs = self.tokenizer([text], return_tensors="np", padding=True)
        feats = self.model.get_text_features(**inputs)
        feats = np.asarray(feats)[0]
        return feats / (np.linalg.norm(feats) + 1e-8)


def make_embedder(kind: str = "auto", model_path: str = "openai/clip-vit-base-patch16"):
    """'flax' | 'stub' | 'auto' (flax if weights resolve, else error like the
    reference; tests pass 'stub' explicitly)."""
    if kind == "stub":
        return StubEmbedder()
    return FlaxCLIPEmbedder(model_path)


class CLIPLoss:
    """Torch-side (non-differentiable) CLIP similarity scorer, kept for
    eval parity with nerf/clip_utils.py:11-64."""

    def __init__(self, model_path: str = "openai/clip-vit-base-patch16"):
        try:
            from transformers import CLIPModel, CLIPProcessor

            local = os.path.isdir(model_path)
            self.model = CLIPModel.from_pretrained(model_path, local_files_only=local)
            self.processor = CLIPProcessor.from_pretrained(model_path, local_files_only=local)
        except Exception as e:  # no weights in the image, no egress
            raise RuntimeError(
                "CLIP guidance needs a local snapshot of a CLIP checkpoint "
                f"(tried '{model_path}'): {e}. Point model_path at a local "
                "HuggingFace CLIP directory."
            ) from e
        self.text_features = None

    def prepare_text(self, texts):
        import torch

        inputs = self.processor(text=texts, return_tensors="pt", padding=True)
        with torch.no_grad():
            feats = self.model.get_text_features(**inputs)
        self.text_features = feats / feats.norm(dim=-1, keepdim=True)

    def __call__(self, images_np):
        """images_np: [B, H, W, 3] float in [0,1] -> negative mean cosine sim."""
        import numpy as np
        import torch

        assert self.text_features is not None, "call prepare_text first"
        x = torch.from_numpy(np.asarray(images_np)).permute(0, 3, 1, 2).float()
        x = torch.nn.functional.interpolate(x, (224, 224), mode="bilinear")
        mean = torch.tensor([0.48145466, 0.4578275, 0.40821073]).view(1, 3, 1, 1)
        std = torch.tensor([0.26862954, 0.26130258, 0.27577711]).view(1, 3, 1, 1)
        with torch.no_grad():
            feats = self.model.get_image_features(pixel_values=(x - mean) / std)
        feats = feats / feats.norm(dim=-1, keepdim=True)
        sim = (feats @ self.text_features.T).mean()
        return -float(sim)

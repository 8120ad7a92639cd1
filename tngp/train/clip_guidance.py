"""CLIP text-image guidance for GT-free training.

Behavioral reference: torch-ngp `nerf/clip_utils.py:11-64` (CLIPLoss over
ViT-B/16) hooked into the trainer when `--rand_pose >= 0` and `--clip_text` is
set (nerf/utils.py:431-434, 485-499): render random orbit poses and minimize
negative cosine similarity between CLIP image and text embeddings.

This environment has no network egress and no bundled CLIP weights; the loss
builds only when a local HuggingFace snapshot of `openai/clip-vit-base-patch16`
(or compatible) is available at `model_path`, and raises a clear error
otherwise — the training plumbing is in place either way.
"""

from __future__ import annotations

import os


class CLIPLoss:
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

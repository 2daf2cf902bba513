"""Validation metrics: PSNR + SSIM (own implementation — no skimage in
this image) and validation-image dumps.

Parity targets: reference network/metrics.py (compute_psnr :14-27 on
uint8 images; skimage structural_similarity win_size=11, uniform
windows, data_range=255, channel-averaged).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np
import cv2


def color_map_backward(rgb: np.ndarray) -> np.ndarray:
    return np.clip(rgb * 255, 0, 255).astype(np.uint8)


def compute_psnr(img_gt: np.ndarray, img_pr: np.ndarray) -> float:
    """uint8 PSNR (reference metrics.py:14-27)."""
    a = img_gt.reshape(-1, 3).astype(np.float32)
    b = img_pr.reshape(-1, 3).astype(np.float32)
    mse = np.mean(np.mean((a - b) ** 2, 0))
    return float(10 * np.log10(255 * 255 / mse))


def compute_ssim(img_gt: np.ndarray, img_pr: np.ndarray,
                 win_size: int = 11, data_range: float = 255.0) -> float:
    """SSIM with uniform windows, matching skimage.structural_similarity
    defaults (gaussian_weights=False) at win_size=11, channel-averaged."""
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    # skimage uses unbiased covariance normalization (N/(N-1))
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)

    def channel_ssim(x, y):
        x = x.astype(np.float64)
        y = y.astype(np.float64)
        filt = lambda a: cv2.blur(a, (win_size, win_size),
                                  borderType=cv2.BORDER_REFLECT)
        ux, uy = filt(x), filt(y)
        uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        A1 = 2 * ux * uy + C1
        A2 = 2 * vxy + C2
        B1 = ux ** 2 + uy ** 2 + C1
        B2 = vx + vy + C2
        S = (A1 * A2) / (B1 * B2)
        # skimage crops the filter margin before averaging
        pad = (win_size - 1) // 2
        return S[pad:-pad, pad:-pad].mean()

    return float(np.mean([channel_ssim(img_gt[..., c], img_pr[..., c])
                          for c in range(img_gt.shape[-1])]))


class PSNR_SSIM:
    """(reference metrics.py:30-79)"""
    default_cfg = {"eval_margin_ratio": 1.0}

    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = {**self.default_cfg, **cfg}

    def __call__(self, data_pr, data_gt, step, **kwargs):
        h, w = data_gt["que_shape"]
        gt = color_map_backward(
            np.asarray(data_pr["pixel_colors_gt"]).reshape(h, w, 3))

        margin_h = int(h * (1 - self.cfg["eval_margin_ratio"])) // 2
        margin_w = int(w * (1 - self.cfg["eval_margin_ratio"])) // 2

        def crop(img):
            return img[margin_h:h - margin_h, margin_w:w - margin_w]

        gt_c = crop(gt)
        outputs = {}
        for suffix in ("nr", "dr", "nr_fine", "dr_fine"):
            key = f"pixel_colors_{suffix}"
            if key not in data_pr:
                continue
            pr = color_map_backward(
                np.asarray(data_pr[key]).reshape(h, w, 3))
            pr_c = crop(pr)
            outputs[f"psnr_{suffix}"] = np.asarray(
                [compute_psnr(gt_c, pr_c)], np.float32)
            outputs[f"ssim_{suffix}"] = np.asarray(
                [compute_ssim(gt_c, pr_c)], np.float32)
        return outputs


class VisualizeImage:
    """Dump side-by-side gt/pred validation images
    (reference metrics.py:81-109)."""

    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg

    def __call__(self, data_pr, data_gt, step, *, data_index=0,
                 model_name="model", output_root="data/vis_val", **kwargs):
        h, w = data_gt["que_shape"]
        imgs = []
        for key in ("pixel_colors_gt", "pixel_colors_nr", "pixel_colors_dr",
                    "pixel_colors_nr_fine", "pixel_colors_dr_fine"):
            if key in data_pr:
                imgs.append(color_map_backward(
                    np.asarray(data_pr[key]).reshape(h, w, 3)))
        out = np.concatenate(imgs, axis=1)
        os.makedirs(f"{output_root}/{model_name}", exist_ok=True)
        ext = "png" if (h <= 64 and w <= 64) else "jpg"
        cv2.imwrite(
            f"{output_root}/{model_name}/step-{step}-index-{data_index}.{ext}",
            out[:, :, ::-1])
        return {}


name2metrics = {
    "psnr_ssim": PSNR_SSIM,
    "vis_img": VisualizeImage,
}


def psnr_nr(results):
    return np.mean(results["psnr_nr"])


def psnr_nr_fine(results):
    return np.mean(results["psnr_nr_fine"])


name2key_metrics = {
    "psnr_nr": psnr_nr,
    "psnr_nr_fine": psnr_nr_fine,
}

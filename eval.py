"""Offline metric computation over rendered vs GT image directories.

Parity: reference eval.py (PSNR/SSIM/LPIPS over {k}-nr_fine.jpg vs
gt/{k}.jpg, printing per-image lines then means). This image has no
skimage/tensorflow/lpips packages: PSNR/SSIM use neuray_tpu.train.metrics
(same definitions); LPIPS(VGG) runs only if torchvision VGG weights are
available locally (zero-egress box), otherwise reports nan.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import cv2

from neuray_tpu.train.metrics import compute_psnr, compute_ssim


class LpipsVgg:
    """LPIPS(VGG) if pretrained weights are reachable; else disabled."""

    def __init__(self):
        self.ok = False
        try:
            import torch
            import torchvision
            weights_env = os.environ.get("TORCH_HOME", None)
            self.model = torchvision.models.vgg16(weights="DEFAULT").features
            self.model.eval()
            self.torch = torch
            self.ok = True
        except Exception:
            self.ok = False

    def __call__(self, img0, img1):
        if not self.ok:
            return float("nan")
        torch = self.torch
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

        def prep(x):
            t = torch.from_numpy(
                x.astype(np.float32) / 255).permute(2, 0, 1)[None]
            return (t - mean) / std

        layers = {3, 8, 15, 22, 29}
        with torch.no_grad():
            d = 0.0
            f0, f1 = prep(img0), prep(img1)
            for i, layer in enumerate(self.model):
                f0, f1 = layer(f0), layer(f1)
                if i in layers:
                    n0 = f0 / (f0.norm(dim=1, keepdim=True) + 1e-10)
                    n1 = f1 / (f1.norm(dim=1, keepdim=True) + 1e-10)
                    d += ((n0 - n1) ** 2).mean().item()
        return d


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir_pr", type=str, required=True)
    parser.add_argument("--dir_gt", type=str, required=True)
    parser.add_argument("--suffix", type=str, default="nr_fine")
    flags = parser.parse_args()

    lpips_fn = LpipsVgg()
    psnrs, ssims, lpipss = [], [], []
    ks = sorted(int(fn.split(".")[0])
                for fn in os.listdir(flags.dir_gt) if fn.endswith(".jpg"))
    for k in ks:
        pr_fn = f"{flags.dir_pr}/{k}-{flags.suffix}.jpg"
        gt_fn = f"{flags.dir_gt}/{k}.jpg"
        if not os.path.exists(pr_fn):
            continue
        pr = cv2.imread(pr_fn)[:, :, ::-1]
        gt = cv2.imread(gt_fn)[:, :, ::-1]
        psnrs.append(compute_psnr(gt, pr))
        ssims.append(compute_ssim(gt, pr))
        lpipss.append(lpips_fn(gt, pr))
        print(f"{k} psnr {psnrs[-1]:.3f} ssim {ssims[-1]:.4f} "
              f"lpips {lpipss[-1]:.4f}", flush=True)

    print(f"psnr {np.mean(psnrs):.4f}")
    print(f"ssim {np.mean(ssims):.4f}")
    print(f"lpips {np.mean(lpipss):.4f}")


if __name__ == "__main__":
    main()

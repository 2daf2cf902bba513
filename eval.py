"""Offline metric computation over rendered vs GT image directories.

Parity: reference eval.py (PSNR/SSIM/LPIPS(VGG) over {k}-nr_fine.jpg vs
gt/{k}.jpg :31-43, printing per-image lines then means). PSNR/SSIM use
neuray_tpu.train.metrics (same formulas as the reference's
tf.image.psnr/ssim). LPIPS is the TRUE metric — VGG16 features,
unit-normalized per channel, squared difference weighted by the LEARNED
per-channel linear weights, spatially averaged (reference eval.py:16,
lpips.LPIPS(net='vgg')) — and needs two local weight files on this
zero-egress image:

  * VGG16 backbone: $TORCH_HOME/hub/checkpoints/vgg16-397923af.pth or
    $NEURAY_VGG16_WEIGHTS
  * LPIPS v0.1 vgg lin weights: data/lpips_vgg.pth or
    $NEURAY_LPIPS_WEIGHTS (the ~7KB file shipped as
    lpips/weights/v0.1/vgg.pth)

Without them eval REFUSES to print an LPIPS number (explicit "LPIPS
unavailable" instead of a silent nan).
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import cv2

from neuray_tpu.train.metrics import compute_psnr, compute_ssim

# VGG16 conv layer plan: (out_channels, n_convs) per block; LPIPS taps
# the last relu of each block.
_VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
# input scaling used by LPIPS (published constants of the metric)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _find_weight_file(env_key, candidates):
    path = os.environ.get(env_key)
    if path and os.path.exists(path):
        return path
    for c in candidates:
        if os.path.exists(c):
            return c
    return None


class LpipsVgg:
    """True LPIPS(VGG, v0.1) from local weight files, or disabled with
    an explicit reason."""

    def __init__(self):
        self.ok = False
        torch_home = os.environ.get(
            "TORCH_HOME", os.path.expanduser("~/.cache/torch"))
        vgg_fn = _find_weight_file("NEURAY_VGG16_WEIGHTS", [
            f"{torch_home}/hub/checkpoints/vgg16-397923af.pth",
            "data/vgg16-397923af.pth"])
        lin_fn = _find_weight_file("NEURAY_LPIPS_WEIGHTS", [
            "data/lpips_vgg.pth", "data/lpips/vgg.pth"])
        if vgg_fn is None or lin_fn is None:
            missing = []
            if vgg_fn is None:
                missing.append("VGG16 backbone (set NEURAY_VGG16_WEIGHTS)")
            if lin_fn is None:
                missing.append("LPIPS lin weights (set NEURAY_LPIPS_WEIGHTS)")
            self.reason = "missing local weight files: " + "; ".join(missing)
            return
        try:
            import torch
            import torch.nn as nn
        except ImportError as e:
            self.reason = f"torch unavailable: {e}"
            return

        self.torch = torch
        # rebuild torchvision's vgg16().features layer stack so the
        # published state dict loads by key
        layers, in_ch = [], 3
        for out_ch, n_convs in _VGG_BLOCKS:
            for _ in range(n_convs):
                layers += [nn.Conv2d(in_ch, out_ch, 3, padding=1),
                           nn.ReLU(inplace=True)]
                in_ch = out_ch
            layers.append(nn.MaxPool2d(2, 2))
        self.features = nn.Sequential(*layers)
        sd = torch.load(vgg_fn, map_location="cpu", weights_only=True)
        feat_sd = {k[len("features."):]: v for k, v in sd.items()
                   if k.startswith("features.")}
        self.features.load_state_dict(feat_sd)
        self.features.eval()

        # learned per-channel lin weights (a 1x1 conv per tapped layer)
        lin_sd = torch.load(lin_fn, map_location="cpu", weights_only=True)
        self.lins = []
        for i in range(len(_VGG_BLOCKS)):
            w = lin_sd[f"lin{i}.model.1.weight"]  # [1, C, 1, 1]
            self.lins.append(w.float())
        # indices of the relu outputs LPIPS taps (last relu per block)
        idx, pos = [], -1
        for _, n_convs in _VGG_BLOCKS:
            pos += 2 * n_convs
            idx.append(pos)
            pos += 1  # the pool
        self.tap_idx = set(idx)
        self.ok = True
        self.reason = None

    def __call__(self, img0, img1):
        if not self.ok:
            raise RuntimeError(f"LPIPS unavailable: {self.reason}")
        torch = self.torch
        shift = torch.from_numpy(_SHIFT).view(1, 3, 1, 1)
        scale = torch.from_numpy(_SCALE).view(1, 3, 1, 1)

        def prep(x):
            t = torch.from_numpy(
                x.astype(np.float32) / 255).permute(2, 0, 1)[None]
            t = t * 2 - 1  # [-1, 1] as lpips.im2tensor
            return (t - shift) / scale

        with torch.no_grad():
            f0, f1 = prep(img0), prep(img1)
            d, li = 0.0, 0
            for i, layer in enumerate(self.features):
                f0, f1 = layer(f0), layer(f1)
                if i in self.tap_idx:
                    n0 = f0 / (f0.norm(dim=1, keepdim=True) + 1e-10)
                    n1 = f1 / (f1.norm(dim=1, keepdim=True) + 1e-10)
                    diff = (n0 - n1) ** 2
                    w = self.lins[li]
                    d += (diff * w).sum(1, keepdim=True).mean().item()
                    li += 1
        return d


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir_pr", type=str, required=True)
    parser.add_argument("--dir_gt", type=str, required=True)
    parser.add_argument("--suffix", type=str, default="nr_fine")
    flags = parser.parse_args()

    lpips_fn = LpipsVgg()
    if not lpips_fn.ok:
        print(f"LPIPS unavailable: {lpips_fn.reason}", flush=True)

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
        line = f"{k} psnr {psnrs[-1]:.3f} ssim {ssims[-1]:.4f}"
        if lpips_fn.ok:
            lpipss.append(lpips_fn(gt, pr))
            line += f" lpips {lpipss[-1]:.4f}"
        print(line, flush=True)

    print(f"psnr {np.mean(psnrs):.4f}")
    print(f"ssim {np.mean(ssims):.4f}")
    if lpips_fn.ok:
        print(f"lpips {np.mean(lpipss):.4f}")
    else:
        print("lpips unavailable (see reason above)")


if __name__ == "__main__":
    main()

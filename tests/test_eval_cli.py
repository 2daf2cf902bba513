"""eval.py CLI: PSNR/SSIM means over a render dir, explicit
LPIPS-unavailable behavior, and the LpipsVgg metric plumbing with
fabricated weight files (reference eval.py:16-43 semantics)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _write_pair(tmp, n=3, size=24):
    import cv2
    pr_dir = tmp / "pr"
    gt_dir = tmp / "gt"
    pr_dir.mkdir()
    gt_dir.mkdir()
    rng = np.random.RandomState(0)
    for k in range(n):
        gt = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        pr = np.clip(gt.astype(np.int16)
                     + rng.randint(-12, 12, gt.shape), 0, 255).astype(
                         np.uint8)
        cv2.imwrite(str(gt_dir / f"{k}.jpg"), gt[:, :, ::-1])
        cv2.imwrite(str(pr_dir / f"{k}-nr_fine.jpg"), pr[:, :, ::-1])
    return pr_dir, gt_dir


def test_eval_cli_reports_means_and_refuses_lpips(tmp_path):
    pr_dir, gt_dir = _write_pair(tmp_path)
    env = dict(os.environ)
    env.pop("NEURAY_VGG16_WEIGHTS", None)
    env.pop("NEURAY_LPIPS_WEIGHTS", None)
    env["TORCH_HOME"] = str(tmp_path / "nothing")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "eval.py"),
         "--dir_pr", str(pr_dir), "--dir_gt", str(gt_dir)],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=300)
    assert out.returncode == 0, out.stderr
    # loud refusal, never a silent nan (VERDICT r1 weak item 4)
    assert "LPIPS unavailable" in out.stdout
    assert "nan" not in out.stdout
    lines = out.stdout.splitlines()
    # per-image lines + final "psnr <mean>" / "ssim <mean>" summaries
    assert sum(ln.startswith("0 psnr") for ln in lines) == 1, out.stdout
    psnr_mean = [ln for ln in lines if ln.startswith("psnr ")]
    ssim_mean = [ln for ln in lines if ln.startswith("ssim ")]
    assert psnr_mean and ssim_mean, out.stdout
    assert float(psnr_mean[0].split()[1]) > 20  # small uniform noise
    assert "lpips unavailable" in out.stdout


@pytest.fixture()
def fake_weights(tmp_path):
    """Random-weight VGG16 + lin files with the REAL state-dict keys, so
    the LPIPS plumbing (taps, normalization, lin weighting) runs."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    from eval import _VGG_BLOCKS

    torch.manual_seed(0)
    layers, in_ch = [], 3
    for out_ch, n_convs in _VGG_BLOCKS:
        for _ in range(n_convs):
            layers += [nn.Conv2d(in_ch, out_ch, 3, padding=1),
                       nn.ReLU(inplace=True)]
            in_ch = out_ch
        layers.append(nn.MaxPool2d(2, 2))
    feats = nn.Sequential(*layers)
    vgg_fn = tmp_path / "vgg16.pth"
    torch.save({f"features.{k}": v for k, v in
                feats.state_dict().items()}, vgg_fn)

    lin_fn = tmp_path / "lpips_vgg.pth"
    lin_sd = {f"lin{i}.model.1.weight":
              torch.rand(1, ch, 1, 1) for i, (ch, _) in
              enumerate(_VGG_BLOCKS)}
    torch.save(lin_sd, lin_fn)
    return str(vgg_fn), str(lin_fn)


def test_lpips_metric_properties(fake_weights, monkeypatch):
    vgg_fn, lin_fn = fake_weights
    monkeypatch.setenv("NEURAY_VGG16_WEIGHTS", vgg_fn)
    monkeypatch.setenv("NEURAY_LPIPS_WEIGHTS", lin_fn)
    from eval import LpipsVgg

    metric = LpipsVgg()
    assert metric.ok, metric.reason
    rng = np.random.RandomState(1)
    a = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    b = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    assert metric(a, a) == pytest.approx(0.0, abs=1e-9)
    dab, dba = metric(a, b), metric(b, a)
    assert dab > 0
    assert dab == pytest.approx(dba, rel=1e-6)

"""Convert the reference's bundled MVSNet checkpoint (mvsnet_pl.ckpt,
pytorch-lightning format) into flax params for models/mvsnet.MVSNet.

Key layout (verified against the bundled ckpt):
  model.feature.convN.{conv.weight, bn.{weight,bias,running_mean,
  running_var}}, model.feature.feature.{weight,bias},
  model.cost_regularization.convN.{...} with deconvs convN.{0.weight,
  1.*} (Sequential of ConvTranspose3d + ABN) and prob.{weight,bias}.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _conv2d(w):
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def _conv3d(w):
    return np.transpose(np.asarray(w, np.float32), (2, 3, 4, 1, 0))


def _deconv3d(w):
    # torch ConvTranspose3d [in, out, k, k, k] -> flax transpose_kernel
    # layout [k, k, k, out, in]
    return np.transpose(np.asarray(w, np.float32), (2, 3, 4, 1, 0))


def _bn(sd, key):
    return {"scale": np.asarray(sd[f"{key}.weight"], np.float32),
            "bias": np.asarray(sd[f"{key}.bias"], np.float32),
            "mean": np.asarray(sd[f"{key}.running_mean"], np.float32),
            "var": np.asarray(sd[f"{key}.running_var"], np.float32)}


def load_mvsnet_ckpt(path: str) -> Dict[str, Any]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k[6:] if k.startswith("model.") else k: v.numpy()
          for k, v in sd.items()}
    return convert_mvsnet_state_dict(sd)


def convert_mvsnet_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    def conv_bn_2d(key):
        return {"conv": {"kernel": _conv2d(sd[f"{key}.conv.weight"])},
                "bn": _bn(sd, f"{key}.bn")}

    def conv_bn_3d(key):
        return {"conv": {"kernel": _conv3d(sd[f"{key}.conv.weight"])},
                "bn": _bn(sd, f"{key}.bn")}

    def deconv_bn(key):
        return {"conv": {"kernel": _deconv3d(sd[f"{key}.0.weight"])},
                "bn": _bn(sd, f"{key}.1")}

    feature = {f"conv{i}": conv_bn_2d(f"feature.conv{i}")
               for i in range(7)}
    feature["feature"] = {
        "kernel": _conv2d(sd["feature.feature.weight"]),
        "bias": np.asarray(sd["feature.feature.bias"], np.float32)}

    cr = "cost_regularization"
    cost = {f"conv{i}": conv_bn_3d(f"{cr}.conv{i}")
            for i in (0, 1, 2, 3, 4, 5, 6)}
    cost.update({f"conv{i}": deconv_bn(f"{cr}.conv{i}")
                 for i in (7, 9, 11)})
    cost["prob"] = {"kernel": _conv3d(sd[f"{cr}.prob.weight"]),
                    "bias": np.asarray(sd[f"{cr}.prob.bias"], np.float32)}

    return {"feature": feature, "cost_regularization": cost}

"""Convert a reference NeuRay PyTorch checkpoint (model_best.pth from
liuyuan-pal/NeuRay training) into an orbax checkpoint that render.py /
run_training.py can load.

Usage:
    python tools/convert_reference_ckpt.py \
        --torch_ckpt data/model/neuray_gen_depth/model_best.pth \
        --cfg configs/gen/neuray_gen_depth.yaml \
        --out data/model/neuray_gen_depth/ckpt_best
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch_ckpt", required=True)
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--out", required=True)
    flags = parser.parse_args()

    import torch
    from neuray_tpu.utils.config import load_cfg
    from neuray_tpu.utils.torch_convert import convert_gen_state_dict
    import orbax.checkpoint as ocp

    cfg = load_cfg(flags.cfg)
    ckpt = torch.load(flags.torch_ckpt, map_location="cpu",
                      weights_only=False)
    sd = ckpt.get("network_state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}

    dd = cfg.get("dist_decoder_cfg", {}) or {}
    fdd = cfg.get("fine_dist_decoder_cfg", {}) or {}
    params = convert_gen_state_dict(
        sd,
        use_hierarchical=cfg.get("use_hierarchical_sampling", False),
        use_vis=dd.get("use_vis", True),
        fine_use_vis=fdd.get("use_vis", dd.get("use_vis", True)),
        init_net_type=cfg.get("init_net_type", "depth"))

    if cfg.get("init_net_type") == "cost_volume":
        from neuray_tpu.utils.mvsnet_convert import convert_mvsnet_state_dict
        mv_sd = {k[len("init_net.mvsnet."):]: v for k, v in sd.items()
                 if k.startswith("init_net.mvsnet.")}
        params["params"].setdefault("init_net", {})["mvsnet"] = \
            convert_mvsnet_state_dict(mv_sd)

    state = {"step": np.asarray(ckpt.get("step", 0)),
             "best_metric": np.asarray(0.0, np.float32),
             "params": params}
    ocp.PyTreeCheckpointer().save(os.path.abspath(flags.out), state,
                                  force=True)
    print(f"wrote {flags.out}")


if __name__ == "__main__":
    main()

"""Training CLI (parity: reference run_training.py)."""
import argparse

from neuray_tpu.utils.config import load_cfg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str,
                        default="configs/train/gen/neuray_gen_depth_train.yaml")
    flags = parser.parse_args()
    cfg = load_cfg(flags.cfg)
    if (cfg.get("network") == "neuray_ft"
            or cfg.get("train_dataset_type") == "ft"):
        from neuray_tpu.train.ft_trainer import FtTrainer
        FtTrainer(cfg).run()
    else:
        from neuray_tpu.train.trainer import Trainer
        Trainer(cfg).run()


if __name__ == "__main__":
    main()

"""Finetuning trainer: drives FtRenderer with the render+consistency
losses (parity: reference Trainer on configs/train/ft/*.yaml with
FinetuningRendererDataset + ExpDecayLRRayFeats — here ray_feats are just
part of the FT param pytree, so one optimizer covers both).
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict

import numpy as np
import jax
import optax

from neuray_tpu.models.ft import FtRenderer, make_ft_render_fn
from neuray_tpu.train.losses import build_losses
from neuray_tpu.train.metrics import (
    name2metrics, name2key_metrics, color_map_backward)
from neuray_tpu.train.lr import name2lr_manager
from neuray_tpu.train.trainer import Logger


class FtTrainer:
    default_cfg = {
        "name": "neuray_ft_model",
        "total_step": 200000,
        "train_log_step": 20,
        "val_interval": 5000,
        "save_interval": 5000,
        "lr_type": "exp_decay",
        "lr_cfg": {"lr_init": 1.0e-4, "decay_step": 100000,
                   "decay_rate": 0.5},
        "loss": ["render", "consist"],
        "val_metric": ["psnr_ssim"],
        "key_metric_name": "psnr_nr",
        "output_root": "data/model",
    }

    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = {**self.default_cfg, **cfg}
        self.model_dir = f'{self.cfg["output_root"]}/{self.cfg["name"]}'
        os.makedirs(self.model_dir, exist_ok=True)
        self.logger = Logger(self.model_dir)

        self.ft = FtRenderer(self.cfg)
        schedule = name2lr_manager[self.cfg["lr_type"]](self.cfg["lr_cfg"])
        self.optimizer = optax.adam(learning_rate=schedule)
        self.loss_fn = build_losses(self.cfg)
        self.val_metrics = [name2metrics[m](self.cfg)
                            for m in self.cfg["val_metric"]]
        self.key_metric = name2key_metrics[self.cfg["key_metric_name"]]
        import orbax.checkpoint as ocp
        self.ckptr = ocp.PyTreeCheckpointer()

    def _save(self, step, params, best_metric, path="ckpt"):
        self.ckptr.save(
            os.path.abspath(f"{self.model_dir}/{path}"),
            {"step": np.asarray(step),
             "best_metric": np.asarray(best_metric, np.float32),
             "params": jax.device_get(params)}, force=True)

    def run(self):
        cfg = self.cfg
        params = self.ft.init_params()
        opt_state = self.optimizer.init(params)
        # multi-chip: shard the FT ray batch over the mesh (the batch
        # is one scene, so rays are the natural axis; losses/grads
        # psum — models/ft.py make_sharded_train_step). Non-divisible
        # ray counts are padded up to the device count with 0-weight
        # rays, so the sharded path is always taken on >1 device.
        n_dev = cfg.get("n_devices") or len(jax.devices())
        self._dp = n_dev > 1
        if self._dp:
            from neuray_tpu.parallel.sharding import make_mesh
            mesh = make_mesh(n_dev)
            step_fn = self.ft.make_sharded_train_step(
                self.optimizer, mesh)
            rn = self.ft.cfg["train_ray_num"]
            pad = (-rn) % n_dev
            note = (f" (ray batch {rn} padded +{pad} to split evenly; "
                    "pad rays weighted out of the loss)" if pad else "")
            print(f"ft training ray-sharded over {n_dev} devices{note}",
                  flush=True)
        else:
            step_fn = self.ft.make_train_step(
                self.optimizer, self.loss_fn)
        render_fn = make_ft_render_fn(self.ft)

        restored_path = os.path.abspath(f"{self.model_dir}/ckpt")
        step, best_metric = 0, -1e9
        if os.path.exists(restored_path):
            restored = self.ckptr.restore(restored_path)
            params = restored["params"]
            step = int(restored["step"])
            best_metric = float(restored["best_metric"])
            print(f"resumed from step {step}", flush=True)

        if (step == 0 and self.cfg.get("validate_initialization", True)
                and self.cfg.get("use_validation", True)):
            self.validate(params, render_fn, 0)

        rng_np = np.random.RandomState(1234 + step)
        rng = jax.random.PRNGKey(7 + step)
        train_results: Dict[str, list] = {}
        t0 = time.time()
        replicated = False  # sharded step keeps state pmap-replicated

        def host(tree):
            if not replicated:
                return tree
            from neuray_tpu.parallel.sharding import unreplicate
            return unreplicate(tree)

        while step < cfg["total_step"]:
            que_i, ref_idx = self.ft.sample_train_indices(rng_np)
            que = self.ft._build_que_train(ref_idx, que_i, rng_np)
            rng, sub = jax.random.split(rng)
            params, opt_state, metrics = step_fn(
                params, opt_state, np.asarray(ref_idx), que,
                np.asarray(que_i), sub)
            replicated = self._dp
            metrics = host(metrics)
            step += 1
            for k, v in metrics.items():
                train_results.setdefault(k, []).append(v)

            if step % cfg["train_log_step"] == 0:
                logs = {k: float(np.mean([np.asarray(x) for x in v]))
                        for k, v in train_results.items()}
                logs["steps_per_sec"] = cfg["train_log_step"] / (
                    time.time() - t0)
                self.logger.log(logs, "train", step, verbose=True)
                train_results, t0 = {}, time.time()

            if step % cfg["val_interval"] == 0:
                val = self.validate(host(params), render_fn, step)
                if val is not None and val > best_metric:
                    best_metric = val
                    self._save(step, host(params), best_metric,
                               "ckpt_best")
                t0 = time.time()

            if step % cfg["save_interval"] == 0:
                self._save(step, host(params), best_metric)
        self._save(step, host(params), best_metric)
        return host(params)

    def validate(self, params, render_fn, step):
        results: Dict[str, list] = {}
        for vi in range(len(self.ft.val_ids)):
            out, gt, (h, w) = self.ft.validate_view(params, render_fn, vi)
            out = dict(out)
            out["pixel_colors_gt"] = gt.reshape(1, -1, 3)
            for metric in self.val_metrics:
                res = metric(out, {"que_shape": (h, w)}, step,
                             data_index=vi, model_name=self.cfg["name"],
                             output_root=f"{self.model_dir}/vis_val")
                for k, v in res.items():
                    results.setdefault(k, []).append(v)
        if not results:
            return None
        logs = {k: float(np.mean(np.concatenate(v)))
                for k, v in results.items()}
        self.logger.log(logs, "val", step, verbose=True)
        return self.key_metric(
            {k: np.concatenate(v) for k, v in results.items()})

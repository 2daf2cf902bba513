"""Step-based training loop with checkpoint/resume, periodic validation,
best-model selection, and logging.

Parity: reference train/trainer.py (default_cfg :21-35, run loop
:94-166, resume :168-178, save :180-187) and train/train_valid.py
(ValidationEvaluator). TPU-native differences:
  * optax adam with the exp-decay schedule, one jitted train step per
    input-shape bucket (static shapes; a handful of buckets in practice);
  * scene-level data parallelism over a device mesh when >1 device is
    visible (the reference raises NotImplementedError for multi-GPU);
  * a background prefetch thread replaces the torch DataLoader workers;
  * checkpoints via orbax (train state = params + opt state + step).
"""
from __future__ import annotations

import os
import threading
import time
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp
import optax

from neuray_tpu.models.renderer import NeurayRenderer, RenderConfig
from neuray_tpu.parallel.sharding import (
    make_mesh, make_dp_train_step, make_sharded_render_fn, unreplicate)
from neuray_tpu.train.losses import build_losses
from neuray_tpu.train.metrics import name2metrics, name2key_metrics
from neuray_tpu.train.lr import name2lr_manager
from neuray_tpu.data.train_dataset import name2dataset


def shape_signature(sample) -> tuple:
    return tuple(
        (path, tuple(leaf.shape))
        for path, leaf in
        jax.tree_util.tree_flatten_with_path(sample)[0]
        if hasattr(leaf, "shape"))


class Prefetcher:
    """Background sample producer (replaces the reference's 8 torch
    DataLoader workers, reference trainer.py:34-44).

    ``workers`` threads call dataset[i] concurrently — image decode /
    resize (cv2, numpy) release the GIL, so N threads scale sample
    production on multi-core TPU hosts (GIL-release fraction of the
    decode path measured on this box: tools/bench_input_pipeline.py
    --gil, recorded in docs/ARCHITECTURE.md). Samples are delivered IN
    ORDER regardless of worker count (a heap-free reorder buffer keyed
    by index), so the training stream is worker-count independent; the
    dataset's per-__getitem__ rng objects make concurrent production
    deterministic per index.

    ``processes > 0`` forks that many OS worker processes instead
    (fork start method — the dataset is inherited, not pickled; each
    sample rides a pipe back as numpy arrays), sidestepping the GIL
    entirely for datasets whose __getitem__ holds it — the analog of
    the reference's torch DataLoader num_workers (reference
    trainer.py:34-44). Same in-order delivery."""

    def __init__(self, dataset, maxsize: int = 8, workers: int = 1,
                 processes: int = 0):
        self.dataset = dataset
        self.maxsize = max(maxsize, workers, processes)
        self.stop = threading.Event()
        self._cond = threading.Condition()
        self._next_produce = 0
        self._next_deliver = 0
        self._buf: dict = {}
        self._procs = []
        if processes > 0:
            import multiprocessing as mp
            ctx = mp.get_context("fork")
            self._task_q = ctx.Queue()
            self._res_q = ctx.Queue()
            n = len(dataset)
            for _ in range(processes):
                p = ctx.Process(
                    target=_prefetch_proc_worker,
                    args=(dataset, n, self._task_q, self._res_q),
                    daemon=True)
                p.start()
                self._procs.append(p)
            # seed the pipeline, then a collector thread refills one
            # task per result so at most ``maxsize`` are in flight
            for _ in range(self.maxsize):
                self._task_q.put(self._next_produce)
                self._next_produce += 1
            self.threads = [threading.Thread(target=self._collect,
                                             daemon=True)]
        else:
            self.threads = [
                threading.Thread(target=self._run, daemon=True)
                for _ in range(max(1, workers))]
        for t in self.threads:
            t.start()

    def _collect(self):
        while not self.stop.is_set():
            try:
                idx, sample = self._res_q.get(timeout=0.5)
            except Exception:
                continue
            with self._cond:
                self._buf[idx] = sample
                self._task_q.put(self._next_produce)
                self._next_produce += 1
                self._cond.notify_all()

    def _run(self):
        n = len(self.dataset)
        while not self.stop.is_set():
            with self._cond:
                while (self._next_produce - self._next_deliver
                       >= self.maxsize):
                    if self.stop.is_set():
                        return
                    self._cond.wait(0.5)
                idx = self._next_produce
                self._next_produce += 1
            sample = self.dataset[idx % n]
            with self._cond:
                self._buf[idx] = sample
                self._cond.notify_all()

    def next(self):
        with self._cond:
            while self._next_deliver not in self._buf:
                self._cond.wait(0.5)
            sample = self._buf.pop(self._next_deliver)
            self._next_deliver += 1
            self._cond.notify_all()
            return sample

    def close(self):
        self.stop.set()
        with self._cond:
            self._cond.notify_all()
        # bounded join: an un-joined worker torn down inside native
        # code (cv2 decode) at interpreter exit can abort the process
        for t in self.threads:
            t.join(timeout=2.0)
        for p in self._procs:
            p.terminate()
            p.join(timeout=2.0)


def _prefetch_proc_worker(dataset, n, task_q, res_q):
    """Fork-mode producer: pull an index, push (idx, dataset[idx % n])."""
    while True:
        idx = task_q.get()
        if idx is None:
            return
        res_q.put((idx, dataset[idx % n]))


class Logger:
    """Scalar logging to txt files (+ tensorboardX when available).
    (reference train/train_tools.py:93-108)."""

    def __init__(self, model_dir: str):
        os.makedirs(model_dir, exist_ok=True)
        self.model_dir = model_dir
        try:
            from tensorboardX import SummaryWriter
            self.writer = SummaryWriter(logdir=f"{model_dir}/tb")
        except Exception:
            self.writer = None

    def log(self, data: Dict[str, float], prefix: str, step: int,
            verbose: bool = False):
        msg = f"{prefix} step {step} " + " ".join(
            f"{k} {float(v):.5f}" for k, v in data.items())
        with open(f"{self.model_dir}/{prefix}.txt", "a") as f:
            f.write(msg + "\n")
        if self.writer is not None:
            for k, v in data.items():
                self.writer.add_scalar(f"{prefix}/{k}", float(v), step)
        if verbose:
            print(msg, flush=True)


class Trainer:
    default_cfg = {
        "name": "neuray_tpu_model",
        "total_step": 400000,
        "train_log_step": 20,
        "val_interval": 10000,
        "save_interval": 500,
        "lr_type": "exp_decay",
        "lr_cfg": {"lr_init": 1.0e-4, "decay_step": 100000,
                   "decay_rate": 0.5},
        "loss": ["render"],
        "val_metric": ["psnr_ssim"],
        "key_metric_name": "psnr_nr",
        "train_dataset_type": "gen",
        "train_dataset_cfg": {},
        "val_set_list": [],
        "output_root": "data/model",
        "n_devices": None,  # None = all visible
        "worker_num": 8,    # prefetch threads (reference trainer.py:34)
    }

    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = {**self.default_cfg, **cfg}
        self.model_dir = f'{self.cfg["output_root"]}/{self.cfg["name"]}'
        os.makedirs(self.model_dir, exist_ok=True)
        self.logger = Logger(self.model_dir)

        self.render_cfg = RenderConfig.from_cfg(self.cfg)
        self.renderer = NeurayRenderer(self.render_cfg)

        n_dev = self.cfg["n_devices"] or len(jax.devices())
        self.mesh = make_mesh(n_dev)
        self.n_dev = n_dev

        schedule = name2lr_manager[self.cfg["lr_type"]](self.cfg["lr_cfg"])
        self.optimizer = optax.adam(learning_rate=schedule)
        self.loss_fn = build_losses(self.cfg)
        self._step_fns: Dict[tuple, Any] = {}

        self.train_dataset = name2dataset[self.cfg["train_dataset_type"]](
            self.cfg.get("train_dataset_cfg", {}), True)
        self.val_metrics = [name2metrics[m](self.cfg)
                            for m in self.cfg["val_metric"]]
        self.key_metric = name2key_metrics[self.cfg["key_metric_name"]]

        import orbax.checkpoint as ocp
        self.ckptr = ocp.PyTreeCheckpointer()

    # ---------------- state ----------------

    def _init_state(self, sample):
        batch_elem = jax.tree.map(jnp.asarray, _strip(sample))
        params = self.renderer.init(
            {"params": jax.random.PRNGKey(0),
             "sample": jax.random.PRNGKey(1)},
            batch_elem["ref"], batch_elem["que"], True,
            batch_elem.get("depth_loss_coords"))
        opt_state = self.optimizer.init(params)
        return params, opt_state

    def _save(self, step, params, opt_state, best_metric, path="ckpt",
              replicated=False):
        if replicated:
            params = unreplicate(params)
            opt_state = unreplicate(opt_state)
        state = {"step": np.asarray(step),
                 "best_metric": np.asarray(best_metric, np.float32),
                 "params": jax.device_get(params),
                 "opt_state": jax.device_get(opt_state)}
        self.ckptr.save(os.path.abspath(f"{self.model_dir}/{path}"),
                        state, force=True)

    def _load(self, path="ckpt"):
        full = os.path.abspath(f"{self.model_dir}/{path}")
        if not os.path.exists(full):
            return None
        return self.ckptr.restore(full)

    # ---------------- steps ----------------

    def _get_step_fn(self):
        key = self.mesh.shape_tuple
        if key not in self._step_fns:
            self._step_fns[key] = make_dp_train_step(
                self.renderer, self.optimizer, self.loss_fn, self.mesh)
        return self._step_fns[key]

    def _collect_batch(self, prefetcher, buckets):
        """Group samples into same-shape batches of size n_devices and
        start their (async) host->device transfer in pmap layout.

        device_put with a sharding returns immediately; issuing the
        NEXT batch's transfer while the current step computes overlaps
        the host link (the axon tunnel moves ~20MB/s, so this matters
        enormously on this box)."""
        sharding = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(self.mesh.axis_names[0]))
        while True:
            sample = _strip(prefetcher.next())
            sig = shape_signature(sample)
            buckets.setdefault(sig, []).append(sample)
            if len(buckets[sig]) >= self.n_dev:
                samples = buckets.pop(sig)
                return jax.tree.map(
                    lambda *xs: jax.device_put(
                        np.stack([np.asarray(x) for x in xs]), sharding),
                    *samples)

    # ---------------- main loop ----------------

    def run(self):
        cfg = self.cfg
        prefetcher = Prefetcher(self.train_dataset,
                                workers=self.cfg["worker_num"],
                                processes=self.cfg.get("worker_processes",
                                                       0))
        first = self.train_dataset[0]

        restored = self._load()
        if restored is not None:
            params = restored["params"]
            _, opt_state = self._init_state(first)
            opt_state = _restore_opt_state(
                opt_state, restored,
                strict=not self.cfg.get("resume_reset_opt", False))
            step = int(restored["step"])
            best_metric = float(restored["best_metric"])
            print(f"resumed from step {step}", flush=True)
        else:
            params, opt_state = self._init_state(first)
            step, best_metric = 0, -1e9

        step_fn = self._get_step_fn()
        rng = jax.random.PRNGKey(7)
        buckets: Dict[tuple, list] = {}
        train_results: Dict[str, list] = {}
        t0 = time.time()

        replicated = False
        next_batch = self._collect_batch(prefetcher, buckets)
        while step < cfg["total_step"]:
            batch = next_batch
            rng, sub = jax.random.split(rng)
            params, opt_state, metrics = step_fn(
                params, opt_state, batch, sub)
            replicated = True  # DpTrainStep keeps state pmap-replicated
            # stage the next batch's transfer while this step computes
            next_batch = self._collect_batch(prefetcher, buckets)
            step += 1

            for k, v in metrics.items():
                train_results.setdefault(k, []).append(v)

            if step % cfg["train_log_step"] == 0:
                logs = {k: float(np.mean([np.asarray(x) for x in v]))
                        for k, v in train_results.items()}
                logs["steps_per_sec"] = cfg["train_log_step"] / (
                    time.time() - t0)
                self.logger.log(logs, "train", step, verbose=True)
                train_results = {}
                t0 = time.time()

            if step % cfg["val_interval"] == 0 or step == cfg["total_step"]:
                val_metric = self.validate(
                    unreplicate(params) if replicated else params, step)
                if val_metric is not None and val_metric > best_metric:
                    best_metric = val_metric
                    self._save(step, params, opt_state, best_metric,
                               "ckpt_best", replicated=replicated)
                t0 = time.time()

            if step % cfg["save_interval"] == 0:
                self._save(step, params, opt_state, best_metric,
                           replicated=replicated)

        self._save(step, params, opt_state, best_metric,
                   replicated=replicated)
        prefetcher.close()
        return unreplicate(params) if replicated else params

    # ---------------- validation ----------------

    def validate(self, params, step):
        """(reference train/train_valid.py:16-44)

        Val datasets and the sharded render fn are built once and cached
        (this 1-core host pays real disk/compile time for each rebuild).
        """
        if not hasattr(self, "_val_cache"):
            self._val_cache = {}
            self._val_render_fn = make_sharded_render_fn(
                self.renderer, self.mesh,
                keep_keys=("pixel_colors_nr", "pixel_colors_nr_fine",
                           "pixel_colors_dr", "pixel_colors_dr_fine"))
        key_vals = []
        for val_set in self.cfg["val_set_list"]:
            name = val_set["name"]
            if name not in self._val_cache:
                self._val_cache[name] = name2dataset[val_set["type"]](
                    {**val_set.get("cfg", {})}, False)
            dataset = self._val_cache[name]
            results: Dict[str, list] = {}
            render_fn = self._val_render_fn
            t0 = time.time()
            for i in range(len(dataset)):
                sample = _strip(dataset[i])
                ref = jax.tree.map(jnp.asarray, sample["ref"])
                que = {k: jnp.asarray(v)
                       for k, v in sample["que"].items() if k != "imgs"}
                outputs = render_fn(params, ref, que)
                h, w = sample["que"]["imgs"].shape[1:3]
                outputs = dict(outputs)
                outputs["pixel_colors_gt"] = (
                    sample["que"]["imgs"].reshape(1, -1, 3))
                data_gt = {"que_shape": (h, w)}
                for metric in self.val_metrics:
                    out = metric(outputs, data_gt, step, data_index=i,
                                 model_name=f'{self.cfg["name"]}-{name}',
                                 output_root=f"{self.model_dir}/vis_val")
                    for k, v in out.items():
                        results.setdefault(k, []).append(v)
            logs = {k: float(np.mean(np.concatenate(v)))
                    for k, v in results.items()}
            logs["eval_time"] = time.time() - t0
            self.logger.log(logs, f"val-{name}", step, verbose=True)
            if results:
                key_vals.append(self.key_metric(
                    {k: np.concatenate(v) for k, v in results.items()}))
        return key_vals[-1] if key_vals else None


def _strip(sample):
    """Drop non-array fields that can't cross the jit boundary."""
    return {k: v for k, v in sample.items() if k != "scene_name"}


def _restore_opt_state(template_state, restored, strict: bool = True):
    """Restore opt state into the template structure.

    A structure mismatch (e.g. the param tree changed since the
    checkpoint was written) would silently reset Adam moments if we
    just returned the fresh template — that corrupts a resumed run
    while claiming "resumed from step N". Raise by default; callers
    may pass strict=False to accept a loud reset.
    """
    if "opt_state" not in restored:
        return template_state
    flat_t, treedef = jax.tree.flatten(template_state)
    flat_r = jax.tree.leaves(restored["opt_state"])
    if len(flat_t) != len(flat_r) or any(
            getattr(t, "shape", None) != getattr(r, "shape", None)
            for t, r in zip(flat_t, flat_r)):
        msg = (f"checkpoint opt_state does not match the current "
               f"optimizer structure ({len(flat_r)} vs {len(flat_t)} "
               f"leaves / shape mismatch); resuming would silently "
               f"reset Adam moments")
        if strict:
            raise ValueError(
                msg + ". Pass resume_reset_opt=True to accept a fresh "
                      "optimizer state.")
        print(f"WARNING: {msg}; using a FRESH optimizer state.",
              flush=True)
        return template_state
    return jax.tree.unflatten(treedef, flat_r)

"""Host input-pipeline throughput for generalization training.

Fabricates GSO-format scenes (the heaviest mixture member: 512x512
rgb/mask/16-bit-depth PNGs per view, reference dataset/database.py:600)
under a temp DATA_ROOT, then times GeneralRendererDataset sample
production — each sample decodes ~9 full views, runs the depth/range
augmentation suite, and samples 512 rays — single-thread and through
the Prefetcher at several worker counts (train/trainer.py:44; the
reference overlaps this with 8 DataLoader workers, reference
train/trainer.py:34-44).

Pure-host benchmark: forces the CPU jax platform and never touches the
device. Prints one JSON line per configuration.

Usage: python tools/bench_input_pipeline.py [--views 250] [--scenes 1]
       [--samples 16]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import cv2
import numpy as np


def look_at_pose(center):
    center = np.asarray(center, np.float64)
    z = -center / np.linalg.norm(center)
    x = np.cross(z, [0.0, 0.0, 1.0])
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], 0)
    return np.concatenate([R, (-R @ center)[:, None]], 1)


def fabricate_gso_scene(root, name, views, rng):
    scene = os.path.join(root, "google_scanned_objects", name)
    for sub in ("rgb", "mask", "depth", "intrinsics", "pose"):
        os.makedirs(os.path.join(scene, sub), exist_ok=True)
    K44 = np.eye(4)
    K44[:3, :3] = [[512.0, 0, 256], [0, 512.0, 256], [0, 0, 1]]
    # textured-but-compressible content: PNG decode cost sits between
    # the flat-image best case and the white-noise worst case
    ys, xs = np.mgrid[0:512, 0:512]
    base = np.stack([(xs // 8 % 32) * 8, (ys // 8 % 32) * 8,
                     ((xs + ys) // 16 % 32) * 8], -1).astype(np.uint8)
    for i in range(views):
        ang = 2 * np.pi * i / views
        center = np.asarray([np.cos(ang), np.sin(ang), 0.5]) * 1.4
        pose = look_at_pose(center)
        c2w = np.eye(4)
        c2w[:3, :3] = pose[:, :3].T
        c2w[:3, 3] = center
        np.savetxt(os.path.join(scene, "pose", f"{i:06}.txt"),
                   c2w.reshape(-1))
        np.savetxt(os.path.join(scene, "intrinsics", f"{i:06}.txt"),
                   K44.reshape(-1))
        img = base + rng.randint(0, 32, (512, 512, 3)).astype(np.uint8)
        mask = np.zeros((512, 512), np.uint8)
        mask[100:400, 100:400] = 255
        depth_mm = 1000 + (rng.rand(512, 512) * 1500).astype(np.uint16)
        cv2.imwrite(os.path.join(scene, "rgb", f"{i:06}.png"), img)
        cv2.imwrite(os.path.join(scene, "mask", f"{i:06}.png"), mask)
        cv2.imwrite(os.path.join(scene, "depth", f"{i:06}.png"), depth_mm)


def main():
    parser = argparse.ArgumentParser()
    # GSO databases hardcode 250 views (train_databases.py:102,
    # reference parity) — the scene must ship all of them
    parser.add_argument("--views", type=int, default=250)
    parser.add_argument("--scenes", type=int, default=1)
    parser.add_argument("--samples", type=int, default=16)
    parser.add_argument("--gil", action="store_true",
                        help="estimate the GIL-released fraction of "
                             "the decode/resize path (spinner-thread "
                             "method; see ARCHITECTURE.md)")
    flags = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    tmp = tempfile.mkdtemp(prefix="neuray_pipe_bench_")
    rng = np.random.RandomState(0)
    for s in range(flags.scenes):
        fabricate_gso_scene(tmp, f"obj{s}", flags.views, rng)

    from neuray_tpu.data import database as D
    D.DATA_ROOT = tmp
    from neuray_tpu.data.train_dataset import GeneralRendererDataset
    from neuray_tpu.train.trainer import Prefetcher

    ds = GeneralRendererDataset(
        {"train_database_types": ["gso"],
         "type2sample_weights": {"gso": 1},
         "resolution_type": "hr"}, is_train=True)

    # single-thread: per-sample cost (fresh database object per sample
    # => PNG decode of ~9+1 views is paid every sample, as in training)
    ds[0]  # warmup (imports, cv2 thread pool)
    t0 = time.perf_counter()
    for i in range(flags.samples):
        ds[i + 1]
    dt = time.perf_counter() - t0
    per = dt / flags.samples
    print(json.dumps({"mode": "single_thread",
                      "sample_s": round(per, 4),
                      "samples_per_s": round(1 / per, 3)}), flush=True)

    def drain(pf, tag):
        try:
            # drain the whole prefilled queue first, or the timed drain
            # starts with maxsize free samples and overstates the rate
            for _ in range(pf.maxsize + 1):
                pf.next()
            t0 = time.perf_counter()
            for _ in range(flags.samples):
                pf.next()
            dt = time.perf_counter() - t0
        finally:
            pf.close()
        per = dt / flags.samples
        print(json.dumps({"mode": tag,
                          "sample_s": round(per, 4),
                          "samples_per_s": round(1 / per, 3)}),
              flush=True)

    for workers in (1, 2, 4):
        drain(Prefetcher(ds, maxsize=8, workers=workers),
              f"prefetcher_w{workers}")

    # fork-based workers: the GIL-free analog of torch DataLoader
    # num_workers (on this 1-core box the rate cannot exceed the
    # single-thread rate minus pipe overhead; the row demonstrates the
    # path works and bounds its IPC cost — scaling needs real cores)
    for procs in (1, 2, 4):
        drain(Prefetcher(ds, maxsize=8, processes=procs),
              f"prefetcher_p{procs}")

    if flags.gil:
        # GIL-release profile of dataset[i]: a background spinner
        # thread counts while the main thread produces samples. If the
        # decode/resize path held the GIL the spinner would make ~no
        # progress during production; the ratio of its in-production
        # rate to its idle rate (x2, since on 1 core a released GIL
        # still shares the core ~50/50) estimates the fraction of the
        # sample wall time that RELEASES the GIL — the quantity thread
        # scaling on a real multi-core host depends on.
        import threading
        counter = {"n": 0, "stop": False}

        def spin():
            while not counter["stop"]:
                counter["n"] += 1

        t = threading.Thread(target=spin, daemon=True)
        t.start()
        time.sleep(1.0)
        idle0 = counter["n"]
        time.sleep(2.0)
        idle_rate = (counter["n"] - idle0) / 2.0
        n0 = counter["n"]
        t0 = time.perf_counter()
        for i in range(flags.samples):
            ds[i + 1]
        dt = time.perf_counter() - t0
        busy_rate = (counter["n"] - n0) / dt
        counter["stop"] = True
        t.join(timeout=1.0)
        released = min(1.0, 2.0 * busy_rate / max(idle_rate, 1.0))
        print(json.dumps({"mode": "gil_profile",
                          "spinner_idle_per_s": round(idle_rate, 0),
                          "spinner_busy_per_s": round(busy_rate, 0),
                          "est_gil_released_frac": round(released, 3)}),
              flush=True)


if __name__ == "__main__":
    main()

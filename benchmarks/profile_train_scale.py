"""Sharded ArcFace at production identity counts (VERDICT r2 #7 bench half).

Runs the dp×tp train step at C = 100k..1M classes on an 8-virtual-device
CPU mesh (no TPU needed — this measures sharding correctness + memory math
+ step viability at scale, not chip speed; the single-chip MFU point lives
in profile_train.py). Prints per-device classifier+momentum bytes asserted
against the analytic budget in ARCHITECTURE.md.

Usage: python benchmarks/profile_train_scale.py [--classes 100000 1000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--classes", type=int, nargs="+",
                   default=[100_000, 500_000, 1_000_000])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=5)
    args = p.parse_args()

    from frp_tpu.parallel.mesh import make_mesh
    from frp_tpu.train.arcface import ArcFaceTrainer

    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(0)
    print(f"mesh {dict(mesh.shape)} on {len(jax.devices())} CPU devices")
    print(f"{'C':>10} {'cls+mom/dev':>12} {'ms/step':>9} {'loss0':>8}")
    for C in args.classes:
        trainer = ArcFaceTrainer(num_classes=C, mesh=mesh, learning_rate=0.05)
        w = trainer.state["params"]["classifier"]
        n_model = mesh.shape["model"]
        per_dev = w.addressable_shards[0].data.nbytes * 2  # weight + momentum
        expect = 2 * 4 * w.shape[0] * (w.shape[1] // n_model)
        assert per_dev == expect, (per_dev, expect)
        images = rng.integers(0, 255, (args.batch, 112, 112, 3), dtype=np.uint8)
        labels = rng.integers(0, C, (args.batch,)).astype(np.int32)
        m0 = trainer.train_step(images, labels)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            trainer.train_step(images, labels, sync=False)
        trainer.flush_metrics()
        jax.block_until_ready(trainer.state["params"]["classifier"])
        dt = (time.perf_counter() - t0) / args.steps
        print(f"{C:>10} {per_dev / 1e6:>10.1f}MB {dt * 1e3:>9.1f} "
              f"{m0['loss']:>8.2f}")


if __name__ == "__main__":
    main()

"""ArcFace training throughput on the chip (the reference has NO training of
any kind — SURVEY.md §2.2; this measures the capability this rebuild adds).

Measures sustained train-step time for the MobileFaceNet + ArcFace head at
several batch sizes (112x112 crops, 512 identities), single chip. On a mesh
the same step shards batch over 'data' and the classifier over 'model'
(frp_tpu/train/arcface.py make_train_step); multi-chip correctness is
exercised in tests/ and __graft_entry__.dryrun_multichip.

Run on the TPU host: python benchmarks/profile_train.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from frp_tpu.train.arcface import ArcFaceTrainer

    num_classes = 512
    rng = np.random.default_rng(0)
    print(f"{'batch':>6} {'mode':>14} {'ms/step':>9} {'imgs/s':>9}")
    for batch in (32, 64, 128, 256):
        trainer = ArcFaceTrainer(num_classes=num_classes)
        images_f32 = rng.integers(0, 255, (batch, 112, 112, 3)).astype(np.float32)
        images_u8 = images_f32.astype(np.uint8)
        labels = rng.integers(0, num_classes, (batch,)).astype(np.int32)
        steps = 30
        # (a) naive: f32 upload + metric fetch every step
        trainer.train_step(images_f32, labels)  # compile
        t0 = time.perf_counter()
        for _ in range(steps):
            trainer.train_step(images_f32, labels)
        jax.block_until_ready(trainer.state["params"])
        dt = (time.perf_counter() - t0) / steps
        print(f"{batch:>6} {'f32+sync':>14} {dt*1e3:>9.1f} {batch/dt:>9.0f}")
        # (b) pipelined: uint8 upload, metrics drained once at the end
        trainer.train_step(images_u8, labels)  # compile uint8 variant
        t0 = time.perf_counter()
        for _ in range(steps):
            trainer.train_step(images_u8, labels, sync=False)
        trainer.flush_metrics()
        jax.block_until_ready(trainer.state["params"])
        dt = (time.perf_counter() - t0) / steps
        # train-step MFU (VERDICT r2 #4): XLA cost analysis of the compiled
        # step vs the v5e bf16 peak
        from frp_tpu.utils.flops import PEAK_FLOPS_BF16, compiled_flops, mfu

        import jax.numpy as jnp

        fl = compiled_flops(
            trainer._step, trainer.state, jnp.asarray(images_u8),
            jnp.asarray(labels), float(trainer.margin),
        )
        m = mfu(fl, dt) if fl else 0.0
        print(
            f"{batch:>6} {'u8+pipelined':>14} {dt*1e3:>9.1f} {batch/dt:>9.0f}"
            f"   mfu={m:.3f}" + (f" ({fl/1e9:.1f} GF/step)" if fl else "")
        )


if __name__ == "__main__":
    main()

"""Microbench on the real chip: XLA detection-head path vs the fused Pallas
kernel, plus the crop/warp stage — numbers for ARCHITECTURE.md's kernel
table. Also asserts XLA==Pallas equality ON DEVICE (the CPU tests run the
kernel in interpreter mode; this is the real lowering).

Run: python benchmarks/micro_pallas.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit(fn, n=50, warmup=3):
    import jax

    for _ in range(warmup):
        r = fn()
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    return (time.perf_counter() - t0) / n * 1000


def main():
    import jax
    import jax.numpy as jnp

    from frp_tpu.ops.anchors import generate_anchors
    from frp_tpu.ops.align import similarity_transform, warp_crops_batched, ARCFACE_TEMPLATE_112
    from frp_tpu.ops.decode import decode_boxes, decode_landmarks
    from frp_tpu.ops.detection_pallas import fused_detection_head
    from frp_tpu.ops.nms import nms_padded_batched

    det, b, m, k = 640, 8, 16, 256
    rng = np.random.default_rng(0)
    priors = jax.device_put(generate_anchors(det))
    a = priors.shape[0]
    print(f"anchors: {a}, batch {b}, K {k}, M {m}", flush=True)

    loc = jax.device_put(rng.normal(0, 0.4, size=(b, a, 4)).astype(np.float32))
    ldm = jax.device_put(rng.normal(0, 0.4, size=(b, a, 10)).astype(np.float32))
    scores_h = rng.uniform(0, 0.25, size=(b, a)).astype(np.float32)
    for i in range(b):
        hot = rng.choice(a, size=24, replace=False)
        scores_h[i, hot] = rng.uniform(0.5, 1.0, size=24)
    scores = jax.device_put(scores_h)
    kw = dict(pre_topk=k, max_out=m, conf_thresh=0.5, iou_thresh=0.4)

    def xla_path():
        bx = decode_boxes(loc, priors, float(det))
        lp = decode_landmarks(ldm, priors, float(det))
        return nms_padded_batched(bx, scores, lp, **kw)

    def fused_path():
        return fused_detection_head(loc, ldm, scores, priors,
                                    image_size=float(det), **kw)

    ref = jax.device_get(xla_path())
    got = jax.device_get(fused_path())
    np.testing.assert_array_equal(got["valid"], ref["valid"])
    v = ref["valid"]
    np.testing.assert_allclose(got["boxes"][v], ref["boxes"][v], rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(got["scores"][v], ref["scores"][v], rtol=1e-5, atol=1e-5)
    print("ON-DEVICE EQUALITY OK", flush=True)

    t_xla = timeit(xla_path)
    t_fused = timeit(fused_path)
    print(f"head post-processing XLA (decode-all + topk + IoU + Pallas-suppress + "
          f"topk-select): {t_xla:.3f} ms/batch", flush=True)
    print(f"head post-processing FUSED Pallas (topk + one kernel): "
          f"{t_fused:.3f} ms/batch", flush=True)

    # --- crop/warp stage: XLA gather formulation ---
    frames = jax.device_put(
        rng.integers(0, 255, size=(b, det, det, 3)).astype(np.float32)
    )
    # face-like landmark geometry: scaled/shifted copies of the alignment
    # template (random 5-point clouds fit degenerate similarity transforms
    # whose inverses blow up coordinates -> the gather slow path)
    tmpl = np.asarray(ARCFACE_TEMPLATE_112, np.float32)  # [5, 2]
    scale = rng.uniform(0.4, 1.6, size=(b, m, 1, 1)).astype(np.float32)
    shift = rng.uniform(60, 500, size=(b, m, 1, 2)).astype(np.float32)
    ldm_px = tmpl[None, None] * scale + shift
    mats = similarity_transform(jnp.asarray(ldm_px), jnp.asarray(ARCFACE_TEMPLATE_112))
    mats = jax.device_put(np.asarray(mats))
    warp = jax.jit(lambda f, mt: warp_crops_batched(f, mt, out_size=112))

    t_warp = timeit(lambda: warp(frames, mats))
    bytes_crops = b * m * 112 * 112 * 3 * 4
    print(f"warp/crop stage XLA gather: {t_warp:.3f} ms/batch "
          f"({bytes_crops / t_warp * 1e3 / 1e9:.1f} GB/s effective output)", flush=True)


def warp_pallas_bench():
    """Separate entry: Pallas VMEM-resident warp vs XLA HBM gather."""
    import jax
    import jax.numpy as jnp

    from frp_tpu.ops.align import (
        ARCFACE_TEMPLATE_112,
        similarity_transform,
        warp_crops_batched,
    )
    from frp_tpu.ops.align_pallas import warp_crops_batched_pallas

    det, b, m = 640, 8, 16
    rng = np.random.default_rng(0)
    # smooth frames for the equality check: the two-pass kernel computes the
    # SAME sample coordinates with a different f32 association, so floor()
    # can flip at near-integer coordinates (a one-pixel tie). On images that
    # is sub-pixel noise; on white-noise frames it reads as a huge value
    # diff. Box-blur makes value error track coordinate error.
    f = rng.normal(128, 60, size=(b, det, det, 3)).astype(np.float32)
    for _ in range(3):
        f = (np.roll(f, 1, 1) + f + np.roll(f, -1, 1)) / 3
        f = (np.roll(f, 1, 2) + f + np.roll(f, -1, 2)) / 3
    frames = jax.device_put(f)
    tmpl = np.asarray(ARCFACE_TEMPLATE_112, np.float32)
    scale = rng.uniform(0.4, 1.6, size=(b, m, 1, 1)).astype(np.float32)
    shift = rng.uniform(60, 500, size=(b, m, 1, 2)).astype(np.float32)
    ldm_px = tmpl[None, None] * scale + shift
    mats = jax.device_put(np.asarray(
        similarity_transform(jnp.asarray(ldm_px), jnp.asarray(tmpl))))

    xla = jax.jit(lambda f, mt: warp_crops_batched(f, mt, out_size=112))
    pls = jax.jit(lambda f, mt: warp_crops_batched_pallas(f, mt, out_size=112))

    ref = np.asarray(jax.device_get(xla(frames, mats)))
    got = np.asarray(jax.device_get(pls(frames, mats)))
    err = np.abs(ref - got)
    print(f"warp equality: max {float(err.max()):.3f}  mean {float(err.mean()):.4f} "
          "(smooth frames; see comment)", flush=True)
    assert float(err.mean()) < 0.5 and float(err.max()) < 30.0, (
        err.max(), err.mean())

    print(f"warp XLA HBM-gather:   {timeit(lambda: xla(frames, mats)):.3f} ms/batch", flush=True)
    print(f"warp Pallas VMEM-tap:  {timeit(lambda: pls(frames, mats)):.3f} ms/batch", flush=True)


if __name__ == "__main__":
    if "--warp" in sys.argv:
        warp_pallas_bench()
    else:
        main()

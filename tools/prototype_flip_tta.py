"""Prototype: test-time flip averaging on the e2e serving path.

Hypothesis: synthetic identities are bilaterally symmetric
(train/synthetic.py make_identity — eye spacing / mouth are centered), so a
horizontally mirrored face is the SAME identity at mirrored yaw. Averaging
the embedding of a scene with the embedding of its mirrored scene should
denoise pose — the nuisance that dominates the tier-2 e2e gap
(BASELINE.md hard-tier table; reference decision path
backend/app/routes/camera.py:232-256 is e2e the same way).

Measures, per tier, on the SAME scenes (only those detected in both
orientations): baseline vs flip-averaged TPR@0.6 / FPR@0.6 / AUC. Purely
diagnostic — writes benchmarks/flip_tta_profile.json, changes no serving
code. Run AFTER the chip is free (one TPU process at a time).

Usage: python tools/prototype_flip_tta.py [--arch iresnet18] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEED = 9300  # match tiered_eval's held-out range


def embed_indexed(engine, scenes):
    """Like train.pairs.embed_scenes but returns {scene_idx: unit_embedding}
    so the two orientations can be joined per scene."""
    from frp_tpu.engine.batching import build_batch_i420

    out_map = {}
    bsz = 8
    for i in range(0, len(scenes), bsz):
        chunk = scenes[i : i + bsz]
        batch, _meta = build_batch_i420(
            {j: f for j, f in enumerate(chunk)}, engine.cfg.det_size, slots=bsz
        )
        out = engine.process_frames(batch, fmt="yuv420")
        for j in range(len(chunk)):
            valid = out["valid"][j]
            if not valid.any():
                continue
            k = int(np.argmax(np.where(valid, out["scores"][j], -1.0)))
            emb = out["embeddings"][j, k] / engine.distance_scale  # unit
            out_map[i + j] = np.asarray(emb, np.float64)
    return out_map


def metrics(embs, labels, scale):
    from frp_tpu.train.pairs import pair_distances, threshold_metrics

    e = np.asarray(embs, np.float64)
    e = e / np.linalg.norm(e, axis=1, keepdims=True) * scale
    same, diff = pair_distances(e, np.asarray(labels, np.int64))
    return threshold_metrics(same, diff)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="iresnet18")
    p.add_argument("--identities", type=int, default=20)
    p.add_argument("--variants", type=int, default=4)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (slow; chip-free runs only)")
    p.add_argument("--out", default="benchmarks/flip_tta_profile.json")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from frp_tpu.config import load_config
    from frp_tpu.engine.pipeline import RecognitionEngine
    from frp_tpu.train.pairs import build_scene_set

    eng = RecognitionEngine(load_config(
        det_size=640, max_faces_per_frame=16, embedder_arch=args.arch,
    ))
    scale = float(eng.distance_scale)
    result = {"arch": args.arch, "identities": args.identities,
              "variants": args.variants, "seed": SEED, "tiers": {}}
    for tier in (0, 1, 2, 3):
        scenes, labels = build_scene_set(
            args.identities, args.variants, SEED, difficulty=tier
        )
        base = embed_indexed(eng, scenes)
        flipped = embed_indexed(eng, [np.ascontiguousarray(s[:, ::-1])
                                      for s in scenes])
        common = sorted(set(base) & set(flipped))
        labs = [labels[i] for i in common]
        e_base = [base[i] for i in common]
        e_avg = [base[i] + flipped[i] for i in common]  # renormalized below
        row = {
            "scenes": len(scenes),
            "detected_base": len(base),
            "detected_flipped": len(flipped),
            "common": len(common),
            "baseline": metrics(e_base, labs, scale),
            "flip_avg": metrics(e_avg, labs, scale),
        }
        result["tiers"][str(tier)] = row
        b, f = row["baseline"], row["flip_avg"]
        print(f"tier {tier}: common={len(common)}/{len(scenes)}  "
              f"base tpr@0.6={b.get('tpr@0.6')} auc={b.get('auc')}  ->  "
              f"flip tpr@0.6={f.get('tpr@0.6')} auc={f.get('auc')}",
              flush=True)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Difficulty-tiered detector recall + threshold-transfer ROC (VERDICT r2 #2).

For each nuisance tier of the widened synthetic domain (train/synthetic.py
TIERS: 0 = near-frontal/clean, 1 = moderate pose/occlusion/light,
2 = hard: yaw to +-60 deg, 30% occlusion, backlight, motion blur):

* detector recall on one-face 1080p scenes through the full serving path;
* end-to-end ROC (detect -> align -> warp -> embed distances) at the
  reference's 0.4/0.6 decision constants;
* crop-level ROC on aligned 112-crops with alignment jitter.

Writes weights/tiered_eval.json (quoted by BASELINE.md; drift-checked by
tests) and prints the markdown table. Identities are held out from the
training range (seeds >= 9000 vs 0..63).

Usage: python tools/tiered_eval.py [--out weights/tiered_eval.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEED = 9300  # disjoint from training (0..63), calibration (9000..), parity (9500..)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None,
                   help="default: weights/tiered_eval.json (mobilefacenet) "
                        "or weights/tiered_eval_{arch}.json")
    p.add_argument("--identities", type=int, default=20)
    p.add_argument("--variants", type=int, default=4)
    p.add_argument("--arch", default="mobilefacenet")
    p.add_argument("--flip", action="store_true",
                   help="evaluate the flip-TTA embedding mode "
                        "(EMBED_FLIP_TTA; requires the mode-keyed "
                        "calibration_{arch}_flip.json)")
    args = p.parse_args()
    if args.out is None:
        suffix = "_flip" if args.flip else ""
        args.out = ("weights/tiered_eval%s.json" % suffix
                    if args.arch == "mobilefacenet" and not args.flip
                    else f"weights/tiered_eval_{args.arch}{suffix}.json")

    from frp_tpu.config import load_config
    from frp_tpu.engine.pipeline import RecognitionEngine
    from frp_tpu.train.pairs import (
        build_pair_crops,
        build_scene_set,
        embed_crops,
        embed_scenes,
        jitter_crop,
        pair_distances,
        threshold_metrics,
    )

    eng = RecognitionEngine(load_config(
        det_size=640, max_faces_per_frame=16, embedder_arch=args.arch,
        embed_flip_tta=args.flip,
    ))
    rng = np.random.default_rng(SEED)
    import jax

    from frp_tpu.engine.batching import _resize_interp

    from frp_tpu.utils.fingerprint import weights_fingerprint

    emb_file = eng.weights_loaded.get("embedder")
    out: dict = {"seed": SEED, "identities": args.identities,
                 "variants": args.variants, "arch": args.arch,
                 "flip_tta": bool(args.flip),
                 # provenance: the numbers depend on the backend's numerics
                 # and the serving decimation kernel in effect — and on the
                 # exact weights (sha256 ties this artifact to the npz the
                 # way calibration_{arch}.json is tied; ADVICE r4)
                 "backend": jax.default_backend(),
                 "resize_interp": _resize_interp(),
                 "weights_file": os.path.basename(emb_file) if emb_file else None,
                 "weights_sha256": weights_fingerprint(emb_file) if emb_file else None,
                 "detector_sha256": (weights_fingerprint(
                     eng.weights_loaded["detector"])
                     if eng.weights_loaded.get("detector") else None),
                 "tiers": {}}
    for tier in (0, 1, 2, 3):
        scenes, slabels = build_scene_set(
            args.identities, args.variants, SEED, difficulty=tier
        )
        emb_e2e, lab_e2e = embed_scenes(eng, scenes, slabels)
        recall = len(lab_e2e) / len(slabels)
        tier_out: dict = {"detector_recall": round(recall, 4),
                          "scenes": len(slabels), "detected": len(lab_e2e)}
        # e2e ROC needs enough detected identity pairs
        try:
            same, diff = pair_distances(emb_e2e, lab_e2e)
            tier_out["e2e"] = threshold_metrics(same, diff)
        except ValueError as e:
            tier_out["e2e"] = {"error": str(e)}
        crops, clabels = build_pair_crops(
            args.identities, args.variants, SEED, difficulty=tier
        )
        crops = np.stack([jitter_crop(c, rng) for c in crops])
        csame, cdiff = pair_distances(
            embed_crops(crops, arch=args.arch, flip=args.flip), clabels)
        tier_out["crop"] = threshold_metrics(csame, cdiff)
        out["tiers"][str(tier)] = tier_out
        print(f"tier {tier}: recall={recall:.3f} "
              f"e2e tpr@0.6={tier_out['e2e'].get('tpr@0.6')} "
              f"fpr@0.6={tier_out['e2e'].get('fpr@0.6')}")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {args.out}\n")

    # markdown table for BASELINE.md
    print("| Tier | Detector recall | e2e TPR@0.6 | e2e FPR@0.6 | "
          "e2e AUC | crop TPR@0.6 | crop FPR@0.6 |")
    print("|---|---|---|---|---|---|---|")
    names = {0: "0 easy (round-2 domain)", 1: "1 moderate", 2: "2 hard",
             3: "3 compressed (tier-1 pose + JPEG/noise)"}
    for tier in (0, 1, 2, 3):
        t = out["tiers"][str(tier)]
        e, c = t["e2e"], t["crop"]
        print(f"| {names[tier]} | {t['detector_recall']:.3f} | "
              f"{e.get('tpr@0.6', float('nan')):.3f} | "
              f"{e.get('fpr@0.6', float('nan')):.3f} | "
              f"{e.get('auc', float('nan')):.4f} | "
              f"{c['tpr@0.6']:.3f} | {c['fpr@0.6']:.3f} |")


if __name__ == "__main__":
    main()

"""Calibrate the embedder's distance scale to the reference's band geometry.

The reference's decision constants (0.6 accept / 0.4 high-confidence /
<0.3 duplicate, ``face_service.py:352-364,395-443,486-506``) assume dlib's
distance distribution. Any other embedder separates identities on its own
scale; this tool measures that scale on a labeled pair set of held-out
procedural identities and derives ONE multiplicative constant s such that
the raw distance where the false-accept rate is 1% lands at 0.6 — the
reference's accept threshold is exactly such a low-FPR operating point for
dlib (its confidence sigmoid then centers near 0.5,
face_service.py:497-506). The engine multiplies embeddings by s at the
embed stage, so every downstream euclidean distance (gallery match, dup
check, clustering, kNN) inherits reference geometry.

Writes weights/calibration.json; prints the ROC table (BASELINE.md carries
it). Re-run after training new embedder weights, or against real enrollment
data in production.

Usage: python tools/calibrate_embedder.py [--out weights/calibration.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CALIB_SEED = 9000  # calibration identities; tests use a DISJOINT range


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None,
                   help="default: weights/calibration.json (mobilefacenet) "
                        "or weights/calibration_{arch}.json")
    p.add_argument("--identities", type=int, default=24)
    p.add_argument("--variants", type=int, default=6)
    p.add_argument("--arch", default="mobilefacenet",
                   help="embedder family to calibrate (engine loads the "
                        "arch-keyed calibration file for it)")
    p.add_argument("--flip", action="store_true",
                   help="calibrate the flip-TTA embedding mode "
                        "(EMBED_FLIP_TTA); writes the mode-keyed "
                        "calibration_{arch}_flip.json the engine requires")
    args = p.parse_args()
    if args.out is None:
        suffix = "_flip" if args.flip else ""
        args.out = ("weights/calibration%s.json" % suffix
                    if args.arch == "mobilefacenet" and not args.flip
                    else f"weights/calibration_{args.arch}{suffix}.json")

    from frp_tpu.config import load_config
    from frp_tpu.engine.pipeline import RecognitionEngine
    from frp_tpu.train.pairs import (
        build_pair_crops,
        build_scene_set,
        eer_sweep,
        embed_crops,
        embed_scenes,
        pair_distances,
        threshold_metrics,
    )

    # END-TO-END calibration: distances through detect -> landmark align ->
    # warp -> embed, exactly the serving path. Crop-level numbers are also
    # reported but the shipped scale comes from the end-to-end populations
    # (crop-level calibration measured ~2x optimistic: alignment noise).
    # allow_stale_calibration: this tool measures RAW distances and exists
    # precisely to replace a stale scale — it must be able to build an
    # engine the serving path would (correctly) refuse to start
    eng = RecognitionEngine(load_config(
        det_size=640, max_faces_per_frame=16, embedder_arch=args.arch,
        embed_flip_tta=args.flip,
    ), allow_stale_calibration=True)
    # calibrate on the widened "mix" domain (synthetic.TIER_MIX) — the scale
    # must center EER for the traffic the platform actually serves, easy and
    # hard tiers together (tools/tiered_eval.py then reports per-tier ROC)
    scenes, slabels = build_scene_set(
        args.identities, args.variants, CALIB_SEED, difficulty="mix"
    )
    emb_e2e, lab_e2e = embed_scenes(eng, scenes, slabels, apply_calibration=False)
    same, diff = pair_distances(emb_e2e, lab_e2e)

    # The reference's 0.6 accept threshold on dlib is a LOW-FPR operating
    # point (~1% false accepts on standard benchmarks), not the EER center —
    # so the scale maps the raw distance where FPR = 1% onto 0.6. (The old
    # EER-to-0.5 mapping is faithful only when separation is near-perfect:
    # on the widened nuisance domain it drags the bulk of the
    # different-identity tail under 0.6.) EER is still reported.
    tau_eer, _eer = eer_sweep(same, diff)
    tau_fpr = float(np.quantile(diff, 0.01))
    scale = 0.6 / tau_fpr

    crops, clabels = build_pair_crops(
        args.identities, 4, CALIB_SEED, difficulty="mix"
    )
    emb_crop = embed_crops(crops, apply_calibration=False, arch=args.arch,
                           flip=args.flip)
    csame, cdiff = pair_distances(emb_crop, clabels)

    import jax

    from frp_tpu.engine.batching import _resize_interp

    # fingerprint the weights this scale was measured on — the engine
    # refuses to apply a calibration whose sha256 does not match the loaded
    # embedder file (ADVICE r4: round 4 shipped retrained weights under the
    # previous weights' calibration and every distance band drifted)
    from frp_tpu.utils.fingerprint import weights_fingerprint

    emb_file = eng.weights_loaded.get("embedder")
    det_file = eng.weights_loaded.get("detector")
    payload = {
        "distance_scale": round(scale, 6),
        "arch": args.arch,
        "flip_tta": bool(args.flip),
        "weights_file": os.path.basename(emb_file) if emb_file else None,
        "weights_sha256": weights_fingerprint(emb_file) if emb_file else None,
        "detector_sha256": weights_fingerprint(det_file) if det_file else None,
        # provenance: numbers depend on backend numerics + decimation kernel
        "backend": jax.default_backend(),
        "resize_interp": _resize_interp(),
        "fpr1_threshold_raw": round(tau_fpr, 4),
        "eer_threshold_raw": round(tau_eer, 4),
        "calib_seed": CALIB_SEED,
        "identities": args.identities,
        "variants": args.variants,
        "detected_scenes": f"{len(lab_e2e)}/{len(slabels)}",
        "metrics_e2e_raw": threshold_metrics(same, diff),
        "metrics_e2e_calibrated": threshold_metrics(same * scale, diff * scale),
        "metrics_crop_calibrated": threshold_metrics(csame * scale, cdiff * scale),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()

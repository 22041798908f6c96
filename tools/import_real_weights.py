"""One-command real-weights onramp (VERDICT r4 #6).

The shipped npz weights are synthetic-bootstrap; production deployments
drop in real pretrained exports (e.g. InsightFace RetinaFace + an ArcFace
embedder — the models the reference rides through onnxruntime,
reference deepfake_utils.py:39-54). The import machinery, calibration, and
tiered eval are all arch-keyed; this script is the end-to-end flow in one
command:

    python tools/import_real_weights.py \
        --detector scrfd.onnx --embedder w600k.onnx [--spoof m3.onnx] \
        [--arch iresnet18]

Per model: (1) VALIDATE — the ONNX graph imports structurally into our
init tree (graph-aware node-order walk, models/params.py) and a forward
pass runs clean on the CPU backend; (2) INSTALL — copy into weights/ under
the engine's priority candidate names (retinaface.onnx / embedder.onnx /
spoof.onnx — ONNX wins over the bootstrap npz, engine/pipeline.py
_load_weights); (3) RE-MEASURE — run tools/calibrate_embedder.py +
tools/tiered_eval.py (and tools/eval_spoof.py when the spoof head changed)
as subprocesses so the distance scale and the quoted accuracy tables are
re-derived for the real weights (the engine refuses to serve a stale
same-arch calibration — fingerprint check in _load_calibration).

--dry-run validates only (no copy, no eval) — exercised in CI against
genuine torch.onnx exports (tests/test_import_real_weights.py).

Validation runs on the CPU backend on purpose: the parent must not hold
the TPU while its calibration subprocess waits for the chip (one process
at a time — CLAUDE.md gotcha #12).
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INSTALL_NAME = {"detector": "retinaface.onnx", "embedder": "embedder.onnx",
                "spoof": "spoof.onnx"}


def _validate(model: str, path: str, arch: str) -> None:
    """Structural import + forward smoke; raises on any mismatch."""
    import copy

    import jax
    import numpy as np

    from frp_tpu.models.params import import_onnx_graph, import_onnx_weights, load_onnx_graph

    graph = load_onnx_graph(path)
    if graph is None:
        raise SystemExit(f"{model}: {path} is unreadable or empty")

    if model == "detector":
        from frp_tpu.models.retinaface import init_retinaface, retinaface_forward

        tree, fwd, shape = init_retinaface(0), retinaface_forward, (1, 128, 128, 3)
    elif model == "embedder":
        if arch.startswith("iresnet"):
            from frp_tpu.models.iresnet import init_iresnet, iresnet_forward

            tree = init_iresnet(0, variant=arch, embed_dim=128)
            fwd, shape = iresnet_forward, (1, 112, 112, 3)
        else:
            from frp_tpu.models.mobilefacenet import (
                init_mobilefacenet,
                mobilefacenet_forward,
            )

            tree = init_mobilefacenet(0, embed_dim=128)
            fwd, shape = mobilefacenet_forward, (1, 112, 112, 3)
    else:
        from frp_tpu.models.mobilenetv3 import (
            init_mobilenetv3_small,
            mobilenetv3_forward,
        )

        tree = init_mobilenetv3_small(0, num_classes=2)
        fwd, shape = mobilenetv3_forward, (1, 112, 112, 3)

    new = copy.deepcopy(tree)  # deepcopy: tree_map would sort dict keys and
    # break the construction-order walk the structural importer matches by
    try:
        if graph["nodes"]:
            import_onnx_graph(new, graph)
        else:
            import_onnx_weights(new, graph["initializers"])
    except (ValueError, KeyError) as e:
        raise SystemExit(
            f"{model}: {os.path.basename(path)} does not match the "
            f"{arch if model == 'embedder' else model} structure: {e}")
    ref = jax.tree_util.tree_leaves_with_path(tree)
    got = jax.tree_util.tree_leaves_with_path(new)
    bad = [str(pa) for (pa, a), (pb, b) in zip(ref, got)
           if pa != pb or np.shape(a) != np.shape(b)]
    if len(ref) != len(got) or bad:
        raise SystemExit(f"{model}: structure mismatch after import "
                         f"({len(bad)} leaves differ; first: {bad[:3]})")
    out = fwd(new, np.zeros(shape, np.float32))
    leaves = jax.tree_util.tree_leaves(out)
    if not all(bool(np.isfinite(np.asarray(v)).all()) for v in leaves):
        raise SystemExit(f"{model}: forward pass produced non-finite values")
    print(f"  {model}: imported {os.path.basename(path)} "
          f"({len(got)} param leaves, forward OK)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--detector", help="RetinaFace-family ONNX export")
    p.add_argument("--embedder", help="face-embedder ONNX export (128-d)")
    p.add_argument("--spoof", help="MobileNetV3-Small 2-class ONNX export")
    p.add_argument("--arch", default="mobilefacenet",
                   help="embedder family the export matches structurally "
                        "(mobilefacenet | iresnet18 | ...). Also set "
                        "EMBEDDER_ARCH for serving.")
    p.add_argument("--dry-run", action="store_true",
                   help="validate only; no install, no re-measurement")
    p.add_argument("--skip-eval", action="store_true",
                   help="install without re-measuring (the engine will "
                        "refuse stale calibration — run the tools later)")
    args = p.parse_args()

    provided = {m: getattr(args, m) for m in INSTALL_NAME if getattr(args, m)}
    if not provided:
        p.error("provide at least one of --detector/--embedder/--spoof")

    # validation must never hold the chip (subprocesses below need it)
    import jax

    jax.config.update("jax_platforms", "cpu")

    print("validating on the CPU backend:")
    for model, path in provided.items():
        _validate(model, path, args.arch)
    if args.dry_run:
        print("dry run: validation passed; nothing installed")
        return

    wd = os.path.join(REPO, "weights")
    for model, path in provided.items():
        dst = os.path.join(wd, INSTALL_NAME[model])
        shutil.copyfile(path, dst)
        print(f"installed {dst}")

    if args.skip_eval:
        print("skipped re-measurement (--skip-eval); before serving run:\n"
              f"  python tools/calibrate_embedder.py --arch {args.arch}\n"
              f"  python tools/tiered_eval.py --arch {args.arch}")
        return

    # re-measure in subprocesses (they own the TPU one at a time)
    runs = []
    py = sys.executable  # not "python": python3-only hosts, venvs
    if "embedder" in provided or "detector" in provided:
        runs += [[py, "tools/calibrate_embedder.py", "--arch", args.arch],
                 [py, "tools/tiered_eval.py", "--arch", args.arch]]
    if "spoof" in provided:
        runs.append([py, "tools/eval_spoof.py"])
    for cmd in runs:
        print("running:", " ".join(cmd), flush=True)
        subprocess.run(cmd, cwd=REPO, check=True)

    print(
        "\nDone. Expected artifact diff: weights/*.onnx installed, "
        "calibration{_arch}.json + tiered_eval{_arch}.json (and "
        "spoof_eval.json if --spoof) re-measured with new weights_sha256 "
        "fields. Re-quote BASELINE.md's accuracy tables from the fresh "
        "artifacts (tests/test_docs_numbers.py enforces agreement), and "
        f"serve with EMBEDDER_ARCH={args.arch}."
    )


if __name__ == "__main__":
    main()

"""Migrate a round-2 RetinaFace checkpoint to the round-3 convention.

Round 3 fixed the FPN merge-conv convention so the param-list order equals
the execution order (p2's merge first — required for execution-order ONNX
import, `frp_tpu/models/retinaface.py`). Old checkpoints stored the convs
under ``fpn_merge/`` with [1] executing before [0]; the engine's path-aware
structure check now rejects them loudly. This tool converts in place:
swap merge 0 <-> 1, rename ``fpn_merge/`` -> ``fpn_td/``.

Usage: python tools/migrate_retinaface_npz.py weights/retinaface.npz
"""

from __future__ import annotations

import os
import sys

import numpy as np


def migrate(path: str) -> int:
    with np.load(path) as d:
        flat = {k: d[k] for k in d.files}
    if any(k.startswith("fpn_td/") for k in flat):
        print(f"{path}: already migrated (fpn_td/ present)")
        return 0

    def convert(key: str) -> str:
        if key.startswith("fpn_merge/0/"):
            return "fpn_td/1/" + key[len("fpn_merge/0/"):]
        if key.startswith("fpn_merge/1/"):
            return "fpn_td/0/" + key[len("fpn_merge/1/"):]
        return key

    new = {convert(k): v for k, v in flat.items()}
    changed = sum(1 for k in flat if convert(k) != k)
    if not changed:
        print(f"{path}: no fpn_merge keys found — not a RetinaFace "
              "checkpoint or already converted")
        return 1
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **new)
    os.replace(tmp, path)
    print(f"{path}: migrated {changed} keys (swap 0<->1, fpn_merge -> fpn_td)")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(max(migrate(p) for p in sys.argv[1:]))

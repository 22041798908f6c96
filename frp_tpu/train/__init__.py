"""Training: ArcFace embedder training, sharded over a (data, model) mesh.

The reference has no training loop at all (SURVEY.md section 5 checkpoint
note) — its FL clients upload externally-produced weights. This module is the
missing producer: local ArcFace training for the MobileFaceNet embedder whose
deltas feed the FedAvg service, with the classifier matrix tensor-parallel
over the mesh 'model' axis and the batch data-parallel over 'data'.
"""

from frp_tpu.train.arcface import (
    ArcFaceTrainer,
    arcface_logits,
    init_train_state,
    make_train_step,
)

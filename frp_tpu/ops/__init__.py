"""Pure, jit-friendly math ops — the foundation of the device pipeline.

Everything here is stateless, shape-static, and differentiable where it makes
sense. No I/O, no host state (SURVEY.md section 7 layer 1).
"""

from frp_tpu.ops.anchors import generate_anchors, RETINAFACE_CFG
from frp_tpu.ops.decode import decode_boxes, decode_landmarks
from frp_tpu.ops.nms import iou_matrix, nms_padded
from frp_tpu.ops.align import (
    ARCFACE_TEMPLATE_112,
    similarity_transform,
    invert_similarity,
    warp_crops,
)
from frp_tpu.ops.matching import (
    l2_normalize,
    pairwise_euclidean,
    gallery_match,
    confidence_level,
    calibrate_confidence,
    find_k_nearest,
)
from frp_tpu.ops.quality import assess_quality_batch
from frp_tpu.ops.fedavg import fedavg_combine, validate_client_update

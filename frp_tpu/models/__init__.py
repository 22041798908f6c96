"""Networks as pure functions over param pytrees (no framework classes).

Replaces the reference's native model zoo (SURVEY.md section 2.3): dlib's HOG
detector + ResNet embedder (``face_service.py:156,179``), InsightFace's ONNX
RetinaFace (``deepfake_utils.py:39-54``), and torchvision's MobileNetV3-Small
spoof classifier (``deepfake_utils.py:58-88``) — all re-designed as
NHWC/bfloat16 JAX graphs that XLA tiles onto the MXU.
"""

from frp_tpu.models.retinaface import init_retinaface, retinaface_forward
from frp_tpu.models.mobilefacenet import init_mobilefacenet, mobilefacenet_forward
from frp_tpu.models.mobilenetv3 import init_mobilenetv3_small, mobilenetv3_forward
from frp_tpu.models.params import save_params, load_params, count_params

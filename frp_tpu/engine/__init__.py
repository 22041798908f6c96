"""The device-resident inference engine: one jitted graph from raw frames to
match results, sharded over the mesh, fed by a host-side prefetcher."""

from frp_tpu.engine.pipeline import RecognitionEngine, build_pipeline
from frp_tpu.engine.gallery import DeviceGallery

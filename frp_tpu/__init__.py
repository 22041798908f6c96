"""frp_tpu — TPU-native multi-camera face recognition platform.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``achiever04/face-recognition-platform`` (reference mounted read-only at
/root/reference). The AI core is one device-resident graph —
detect -> align -> embed -> spoof -> match — batched over multi-camera frame
streams and sharded over a ``jax.sharding.Mesh``; the host side provides the
stream orchestrator, services (tracking, alerts, federated aggregation) and a
self-contained FastAPI-compatible HTTP + Socket.IO edge reproducing the
reference route contracts (see SURVEY.md section 2.1).

Layout:
    ops/       pure math: anchors, box/landmark decode, NMS, 5-pt alignment,
               gallery matching, quality metrics, image ops, FedAvg tree math
    models/    networks as pure functions over param pytrees: RetinaFace,
               MobileFaceNet embedder, MobileNetV3-Small spoof classifier
    engine/    the fused jitted pipeline + mesh sharding + host prefetch
    parallel/  mesh construction, sharded FedAvg, collectives helpers
    platform/  host services: gallery store, tracking, alerts, async jobs
    api/       asyncio HTTP/1.1 + WebSocket/Socket.IO edge and all routes
    train/     ArcFace training step (dp x tp sharded) for FL client updates
    utils/     document store, crypto, logging/audit, thumbnail cache
"""

__version__ = "0.1.0"

"""Typed configuration for the platform, backed by environment variables.

The reference scatters ~60 ``os.getenv`` calls across modules (reference
``backend/.env``, ``backend/app/services/face_service.py:43-48``,
``alert_service.py:47-67``, ``thumbnail_cache.py:29-36``, ``state.py:117-125``).
We keep the same env-var *names* for drop-in compatibility but back them with
one frozen dataclass constructed once (SURVEY.md section 5 "Config / flag
system" rebuild note).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields


def _get(name: str, default, cast=None):
    raw = os.getenv(name)
    if raw is None:
        return default
    cast = cast or type(default)
    if cast is bool:
        return raw.strip().lower() in ("1", "true", "yes", "on")
    try:
        return cast(raw)
    except (TypeError, ValueError):
        return default


@dataclass(frozen=True)
class Config:
    # --- face recognition core (reference face_service.py:43-48) ---
    face_tolerance: float = 0.6          # FACE_TOLERANCE — match decision threshold
    face_model: str = "retinaface"       # FACE_MODEL (reference default "hog")
    face_batch_workers: int = 4          # FACE_BATCH_WORKERS
    encode_cache_ttl: float = 300.0      # FACE_CACHE_TTL seconds
    encode_cache_size: int = 256         # FACE_CACHE_SIZE
    min_face_quality: float = 50.0       # MIN_FACE_QUALITY upload gate (face.py:221-238)
    embed_dim: int = 128                 # EMBED_DIM — dlib-compatible 128-d default
    embedder_arch: str = "mobilefacenet"  # EMBEDDER_ARCH: mobilefacenet | iresnet18/34/50/100

    # --- detector (reference deepfake_utils.py:41-48) ---
    det_size: int = 640                  # DET_SIZE square detector input
    det_conf_threshold: float = 0.5      # DET_CONF_THRESHOLD
    det_nms_threshold: float = 0.4       # DET_NMS_THRESHOLD (IoU)
    det_nms_iom_threshold: float = 0.5   # DET_NMS_IOM_THRESHOLD int/min-area; <=0 off
    max_faces_per_frame: int = 16        # MAX_FACES padded detection slots
    pre_nms_topk: int = 256              # PRE_NMS_TOPK candidates kept before NMS

    # --- engine / TPU ---
    mesh_data_axis: str = "data"
    mesh_model_axis: str = "model"
    frames_per_batch: int = 8            # FRAMES_PER_BATCH device batch (streams x frames)
    compute_dtype: str = "bfloat16"      # COMPUTE_DTYPE for conv/matmul activations
    donate_frames: bool = True

    # --- cameras (reference main.py:75-81, camera.py) ---
    frame_skip: int = 1                  # FRAME_SKIP
    camera_scan_interval: float = 1.0    # CAMERA_SCAN_INTERVAL
    # temporal-delta frame transfer (engine.submit_encoded): ship only
    # changed blocks of the I420 batch between scans — bit-exact, falls
    # back to raw keyframes automatically (engine/batching.DeltaEncoder)
    delta_transfer: bool = True          # FRP_DELTA_TRANSFER
    camera_health_interval: float = 30.0 # HEALTH_CHECK_INTERVAL (health_checks.py)

    # --- alerts (reference alert_service.py:47-67) ---
    alert_cooldown: float = 30.0         # ALERT_COOLDOWN seconds per target
    email_cooldown: float = 60.0         # EMAIL_COOLDOWN
    sms_cooldown: float = 60.0           # SMS_COOLDOWN
    notify_workers: int = 4              # NOTIFY_WORKERS semaphore bound
    smtp_host: str = ""                  # SMTP_HOST
    smtp_port: int = 587                 # SMTP_PORT
    smtp_user: str = ""                  # SMTP_USER
    smtp_password: str = ""              # SMTP_PASSWORD
    alert_email_to: str = ""             # ALERT_EMAIL_TO
    twilio_sid: str = ""                 # TWILIO_SID
    twilio_token: str = ""               # TWILIO_TOKEN
    twilio_from: str = ""                # TWILIO_FROM
    alert_sms_to: str = ""               # ALERT_SMS_TO

    # --- tracking (reference tracking_service.py) ---
    detection_cooldown: float = 10.0     # DETECTION_COOLDOWN per (person, camera)
    loiter_minutes: float = 15.0         # LOITER_MINUTES suspicious dwell
    speed_limit_kmh: float = 10.0        # SPEED_LIMIT_KMH anomaly threshold

    # --- deepfake (reference deepfake.py:63-65) ---
    deepfake_max_frames: int = 20        # DEEPFAKE_MAX_FRAMES per video
    deepfake_threshold: float = 0.5      # DEEPFAKE_THRESHOLD mean fake prob
    deepfake_cache_ttl: float = 1800.0   # DEEPFAKE_CACHE_TTL (30 min dedup)

    # --- storage / persistence ---
    data_dir: str = "data"               # DATA_DIR
    mongo_uri: str = ""                  # MONGO_URI ("" -> embedded document store)
    redis_url: str = ""                  # REDIS_URL ("" -> in-proc cache only)
    snapshot_cache_mb: int = 200         # SNAPSHOT_CACHE_MB disk quota
    snapshot_ttl: float = 30.0           # SNAPSHOT_TTL in-proc LRU TTL
    upload_max_mb: int = 10              # UPLOAD_MAX_MB (face.py:138-150)

    # --- federated learning (reference federated.py) ---
    fl_min_clients: int = 2              # FL_MIN_CLIENTS aggregation gate
    fl_history_limit: int = 100          # FL_HISTORY_LIMIT bounded history

    # --- logging (reference logger.py) ---
    enable_logging: bool = True          # ENABLE_LOGGING
    log_json: bool = False               # LOG_JSON
    log_dir: str = "logs"                # LOG_DIR

    # --- async jobs (reference async_task_manager.py) ---
    async_max_workers: int = 1           # ASYNC_MAX_WORKERS
    job_retention: float = 3600.0        # JOB_RETENTION_SECONDS

    # --- models ---
    model_idle_unload_seconds: float = 600.0  # MODEL_IDLE_UNLOAD_SECONDS (main.py:206-222)
    weights_dir: str = "weights"         # WEIGHTS_DIR

    extra: dict = field(default_factory=dict)


_ENV_MAP = {
    "face_tolerance": ("FACE_TOLERANCE", float),
    "face_model": ("FACE_MODEL", str),
    "face_batch_workers": ("FACE_BATCH_WORKERS", int),
    "encode_cache_ttl": ("FACE_CACHE_TTL", float),
    "encode_cache_size": ("FACE_CACHE_SIZE", int),
    "min_face_quality": ("MIN_FACE_QUALITY", float),
    "embed_dim": ("EMBED_DIM", int),
    "embedder_arch": ("EMBEDDER_ARCH", str),
    "det_size": ("DET_SIZE", int),
    "det_conf_threshold": ("DET_CONF_THRESHOLD", float),
    "det_nms_threshold": ("DET_NMS_THRESHOLD", float),
    "det_nms_iom_threshold": ("DET_NMS_IOM_THRESHOLD", float),
    "max_faces_per_frame": ("MAX_FACES", int),
    "pre_nms_topk": ("PRE_NMS_TOPK", int),
    "frames_per_batch": ("FRAMES_PER_BATCH", int),
    "compute_dtype": ("COMPUTE_DTYPE", str),
    "frame_skip": ("FRAME_SKIP", int),
    "camera_scan_interval": ("CAMERA_SCAN_INTERVAL", float),
    "delta_transfer": ("FRP_DELTA_TRANSFER", bool),
    "camera_health_interval": ("HEALTH_CHECK_INTERVAL", float),
    "alert_cooldown": ("ALERT_COOLDOWN", float),
    "email_cooldown": ("EMAIL_COOLDOWN", float),
    "sms_cooldown": ("SMS_COOLDOWN", float),
    "notify_workers": ("NOTIFY_WORKERS", int),
    "smtp_host": ("SMTP_HOST", str),
    "smtp_port": ("SMTP_PORT", int),
    "smtp_user": ("SMTP_USER", str),
    "smtp_password": ("SMTP_PASSWORD", str),
    "alert_email_to": ("ALERT_EMAIL_TO", str),
    "twilio_sid": ("TWILIO_SID", str),
    "twilio_token": ("TWILIO_TOKEN", str),
    "twilio_from": ("TWILIO_FROM", str),
    "alert_sms_to": ("ALERT_SMS_TO", str),
    "detection_cooldown": ("DETECTION_COOLDOWN", float),
    "loiter_minutes": ("LOITER_MINUTES", float),
    "speed_limit_kmh": ("SPEED_LIMIT_KMH", float),
    "deepfake_max_frames": ("DEEPFAKE_MAX_FRAMES", int),
    "deepfake_threshold": ("DEEPFAKE_THRESHOLD", float),
    "deepfake_cache_ttl": ("DEEPFAKE_CACHE_TTL", float),
    "data_dir": ("DATA_DIR", str),
    "mongo_uri": ("MONGO_URI", str),
    "redis_url": ("REDIS_URL", str),
    "snapshot_cache_mb": ("SNAPSHOT_CACHE_MB", int),
    "snapshot_ttl": ("SNAPSHOT_TTL", float),
    "upload_max_mb": ("UPLOAD_MAX_MB", int),
    "fl_min_clients": ("FL_MIN_CLIENTS", int),
    "fl_history_limit": ("FL_HISTORY_LIMIT", int),
    "enable_logging": ("ENABLE_LOGGING", bool),
    "log_json": ("LOG_JSON", bool),
    "log_dir": ("LOG_DIR", str),
    "async_max_workers": ("ASYNC_MAX_WORKERS", int),
    "job_retention": ("JOB_RETENTION_SECONDS", float),
    "model_idle_unload_seconds": ("MODEL_IDLE_UNLOAD_SECONDS", float),
    "weights_dir": ("WEIGHTS_DIR", str),
}


def load_config(**overrides) -> Config:
    """Build a Config from the environment, with keyword overrides winning."""
    defaults = Config()
    values = {}
    for f in fields(Config):
        if f.name == "extra":
            continue
        env = _ENV_MAP.get(f.name)
        base = getattr(defaults, f.name)
        values[f.name] = _get(env[0], base, env[1]) if env else base
    values.update(overrides)
    return Config(**values)


_config: Config | None = None


def get_config() -> Config:
    global _config
    if _config is None:
        _config = load_config()
    return _config


def set_config(cfg: Config) -> None:
    global _config
    _config = cfg

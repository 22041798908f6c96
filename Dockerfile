# TPU-native face recognition platform.
# Assumes a base image with jax[tpu] matching the target TPU generation
# (e.g. a Cloud TPU VM image); nothing else is required beyond this repo —
# the HTTP/Socket.IO edge and the document store are self-contained.
FROM python:3.12-slim

WORKDIR /app
RUN apt-get update && apt-get install -y --no-install-recommends \
        libgl1 libglib2.0-0 && rm -rf /var/lib/apt/lists/*

# core deps; jax[tpu] must match the deployment's TPU runtime
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    numpy opencv-python-headless pillow cryptography optax orbax-checkpoint pydantic

COPY frp_tpu /app/frp_tpu
COPY tools /app/tools
COPY frontend /app/frontend
COPY native /app/native
COPY weights /app/weights

ENV PYTHONPATH=/app \
    DATA_DIR=/data \
    LOG_DIR=/data/logs \
    PORT=8000

VOLUME ["/data"]
EXPOSE 8000
CMD ["python", "-m", "frp_tpu.api.main", "--scan-interval", "1.0"]

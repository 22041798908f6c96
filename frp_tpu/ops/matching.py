"""Gallery matching: one L2-normalized matmul replaces the reference's numpy
broadcast (``backend/app/services/face_service.py:409-411``), plus the exact
distance->confidence calibration formulas
(``face_service.py:486-506``: bands <0.4 high / <0.6 medium / else low;
sigmoid score 100/(1+exp(-12*(clip(1-d,0,1)-0.5)))).

Distance convention: the reference uses dlib's euclidean ``face_distance`` on
128-d embeddings with a 0.6 accept threshold. Our embeddings are L2-normalized,
so euclidean distance d = sqrt(2 - 2*cos) in [0, 2] and the whole gallery scan
is a single MXU matmul [B, D] @ [D, N] — the faiss the reference never wired up
(``requirements.txt:44``) is unnecessary: exact top-k on-device beats ANN at
gallery sizes 1e2..1e6.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=True), eps))


def pairwise_euclidean(queries: jnp.ndarray, gallery: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distances via the matmul identity. [B, D] x [N, D] -> [B, N].

    ||q - g||^2 = ||q||^2 + ||g||^2 - 2 q.g — one dot_general on the MXU.
    """
    q2 = jnp.sum(queries * queries, axis=-1, keepdims=True)  # [B, 1]
    g2 = jnp.sum(gallery * gallery, axis=-1)  # [N]
    qg = jnp.dot(queries, gallery.T, preferred_element_type=jnp.float32)
    d2 = q2 + g2[None, :] - 2.0 * qg
    return jnp.sqrt(jnp.maximum(d2, 0.0))


_CHUNK = 1024
_CHUNK_MIN_N = 16384


def _exact_topk(neg: jnp.ndarray, k: int):
    """EXACT top-k over the gallery axis, two-stage above _CHUNK_MIN_N.

    lax.top_k over a [B, 2^20] row is the bottleneck of million-identity
    galleries (measured: 335 ms/batch at N=1M, benchmarks/profile_gallery.py).
    Split the axis into chunks, take top-k per chunk, then top-k over the
    (N/chunk)*k survivors — exact, because each global top-k element is by
    definition in the top-k of its own chunk.
    """
    b, n = neg.shape
    if n < _CHUNK_MIN_N or n % _CHUNK != 0 or k > _CHUNK:
        return jax.lax.top_k(neg, k)
    chunks = n // _CHUNK
    neg_c, idx_c = jax.lax.top_k(neg.reshape(b, chunks, _CHUNK), k)
    base = (jnp.arange(chunks, dtype=idx_c.dtype) * _CHUNK)[None, :, None]
    cand_neg = neg_c.reshape(b, chunks * k)
    cand_idx = (idx_c + base).reshape(b, chunks * k)
    top_neg, sel = jax.lax.top_k(cand_neg, k)
    return top_neg, jnp.take_along_axis(cand_idx, sel, axis=1)


@partial(jax.jit, static_argnames=("top_k",))
def gallery_match(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    gallery_valid: jnp.ndarray,
    tolerance: float = 0.6,
    top_k: int = 5,
):
    """Match query embeddings against the padded device gallery.

    Args:
        queries: [B, D] embeddings (any scale; distance is plain euclidean to
            keep reference semantics — pass normalized embeddings for cosine).
        gallery: [N, D] gallery matrix (padded rows are zeros).
        gallery_valid: [N] bool mask for live gallery rows.
        tolerance: accept threshold (reference FACE_TOLERANCE=0.6).
    Returns dict:
        distances [B, N], best_idx [B], best_distance [B], is_match [B],
        topk_idx [B, K], topk_distance [B, K].
    """
    big = jnp.float32(1e6)
    dist = pairwise_euclidean(queries, gallery)
    dist = jnp.where(gallery_valid[None, :], dist, big)
    k = min(top_k, gallery.shape[0])
    neg_top, top_idx = _exact_topk(-dist, k)
    best_idx = top_idx[:, 0]
    best_distance = -neg_top[:, 0]
    return {
        "distances": dist,
        "best_idx": best_idx,
        "best_distance": best_distance,
        "is_match": best_distance <= tolerance,
        "topk_idx": top_idx,
        "topk_distance": -neg_top,
    }


# ---------------------------------------------------------------------------
# Host-side calibration helpers (exact reference formulas; cheap scalar math)
# ---------------------------------------------------------------------------

def confidence_level(distance: float) -> str:
    """Reference ``face_service.py:486-492``."""
    if distance < 0.4:
        return "high"
    if distance < 0.6:
        return "medium"
    return "low"


def calibrate_confidence(distance: float) -> float:
    """Reference ``face_service.py:497-506``: sigmoid k=12 centered at 0.5."""
    x = max(0.0, min(1.0, 1.0 - float(distance)))
    return round(float(100.0 / (1.0 + np.exp(-12.0 * (x - 0.5)))), 2)


def find_k_nearest(distances: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k smallest distances, ascending (reference
    ``face_service.py:590-612`` argpartition+sort semantics)."""
    k = min(k, len(distances))
    if k <= 0:
        return np.array([], dtype=np.int64)
    idx = np.argpartition(distances, k - 1)[:k]
    return idx[np.argsort(distances[idx])]

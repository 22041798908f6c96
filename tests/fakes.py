"""Shared test doubles: a deterministic engine so API/platform tests run
without device compiles."""

import numpy as np

from frp_tpu.engine.gallery import DeviceGallery


class FakeMetrics:
    def as_dict(self):
        return {"total_batches": 0}


class FakeCfg:
    det_size = 64
    frames_per_batch = 4


class FakeEngine:
    """One deterministic face per non-black image; embedding derived from the
    image's mean so identical images produce identical embeddings."""

    preferred_fmt = "rgb"

    def __init__(self, dim=128):
        self.gallery = DeviceGallery(embed_dim=dim)
        self.metrics = FakeMetrics()
        self.cfg = FakeCfg()

    def _embed(self, image):
        rng = np.random.default_rng(int(np.asarray(image, np.int64).sum()) % 2**31)
        emb = rng.normal(size=self.gallery.embed_dim).astype(np.float32)
        return emb / np.linalg.norm(emb)

    def encode_image(self, image):
        if np.asarray(image).max() == 0:  # black image -> "no face"
            return []
        return [
            {
                "embedding": self._embed(image),
                "box": np.array([10.0, 10.0, 50.0, 50.0]),
                "landmarks": np.zeros((5, 2)),
                "score": 0.93,
                "quality": 80.0,
                "fake_prob": 0.12,
            }
        ]

    def process_frames(self, frames, tolerance=None, fmt="rgb"):
        frames = np.asarray(frames)
        if frames.ndim == 3:
            frames = frames[None]
        b = frames.shape[0]
        m = 4
        tol = 0.6 if tolerance is None else tolerance
        out = {
            "boxes": np.zeros((b, m, 4), np.float32),
            "scores": np.zeros((b, m), np.float32),
            "landmarks": np.zeros((b, m, 10), np.float32),
            "valid": np.zeros((b, m), bool),
            "count": np.zeros((b,), np.int32),
            "embeddings": np.zeros((b, m, self.gallery.embed_dim), np.float32),
            "best_idx": np.zeros((b, m), np.int32),
            "best_distance": np.full((b, m), np.inf, np.float32),
            "is_match": np.zeros((b, m), bool),
            "topk_idx": np.zeros((b, m, 5), np.int32),
            "topk_distance": np.full((b, m, 5), np.inf, np.float32),
            "fake_prob": np.zeros((b, m), np.float32),
            "quality": np.zeros((b, m), np.float32),
            "processing_time": 0.001,
        }
        mat, names = self.gallery.host_arrays()
        for i in range(b):
            faces = self.encode_image(frames[i])
            out["count"][i] = len(faces)
            for j, face in enumerate(faces[:m]):
                out["valid"][i, j] = True
                out["boxes"][i, j] = face["box"]
                out["scores"][i, j] = face["score"]
                out["embeddings"][i, j] = face["embedding"]
                out["fake_prob"][i, j] = face["fake_prob"]
                out["quality"][i, j] = face["quality"]
                if len(names):
                    d = np.linalg.norm(mat - face["embedding"][None], axis=1)
                    k = int(np.argmin(d))
                    out["best_idx"][i, j] = k
                    out["best_distance"][i, j] = d[k]
                    out["is_match"][i, j] = d[k] <= tol
        return out

    def warmup(self, *a, **k):
        pass

"""FLOPs/MFU accounting (utils/flops.py, VERDICT r2 next #4)."""

import numpy as np
import pytest

from frp_tpu.utils.flops import (
    PEAK_FLOPS_BF16,
    compiled_flops,
    conv_flops,
    dense_flops,
    engine_stage_flops,
    mfu,
)


def test_compiled_flops_matches_analytic_matmul():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a, b: a @ b)
    a = jnp.zeros((128, 256), jnp.float32)
    b = jnp.zeros((256, 64), jnp.float32)
    got = compiled_flops(f, a, b)
    assert got is not None
    # XLA prices a matmul at 2*m*n*k
    assert got == pytest.approx(2 * 128 * 256 * 64, rel=0.01)


def test_engine_stage_flops_and_mfu():
    from frp_tpu.config import load_config
    from frp_tpu.engine.pipeline import RecognitionEngine

    eng = RecognitionEngine(
        load_config(det_size=128, max_faces_per_frame=4, pre_nms_topk=64),
        seed=0,
    )
    eng.gallery.add("a", np.random.default_rng(0).normal(size=128))
    fl = engine_stage_flops(eng, batch=2)
    assert fl["total"] and fl["total"] > 1e8  # two embedder+spoof passes
    assert fl["embed"] > fl["detect"] > 0  # embed dominates at det 128
    # duty-cycle math: the total at 1 ms device time is a small fraction of
    # peak — and mfu() must be linear in time
    m1 = mfu(fl["total"], 1e-3)
    assert 0 < m1 < 1
    assert mfu(fl["total"], 2e-3) == pytest.approx(m1 / 2)
    assert mfu(None, 1.0) == 0.0


def test_analytic_helpers():
    assert conv_flops((56, 56), 3, 3, 64, 64) == 2 * 56 * 56 * 9 * 64 * 64
    assert conv_flops((56, 56), 3, 3, 64, 64, groups=64) == 2 * 56 * 56 * 9 * 64
    assert dense_flops(512, 128) == 2 * 512 * 128
    assert PEAK_FLOPS_BF16 == 197e12

"""Model-FLOPs accounting for MFU reporting (VERDICT r2 next #4).

Primary path: XLA's own cost model — ``jitted.lower(*args).compile()
.cost_analysis()['flops']`` — which prices exactly the compiled HLO the
device runs (fusion included). Fallback: an analytic conv/dense walker for
environments where cost_analysis is unavailable.

MFU here is model-FLOPs utilization against the chip's dense bf16 peak
(PEAK_FLOPS_BF16); the serving pipeline is wire-bound by design (BASELINE.md
"Where the time goes"), so the honest numbers are
  * mfu_device  — FLOPs / device-execution-time / peak: how well the compute
    itself maps onto the MXU while the chip is actually running;
  * mfu_serving — FLOPs / wall-time / peak: the end-to-end duty cycle, which
    is dominated by the host<->device link in this deployment.
"""

from __future__ import annotations

import numpy as np

# TPU v5e (v5 litepod) chip: 197 TFLOP/s dense bf16.
PEAK_FLOPS_BF16 = 197e12


def compiled_flops(jitted_fn, *args, **kwargs) -> float | None:
    """FLOPs of the compiled executable for these argument shapes, from
    XLA's cost analysis. None when the backend doesn't report it."""
    try:
        lowered = jitted_fn.lower(*args, **kwargs)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returned [dict]
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def conv_flops(out_hw, kh, kw, cin, cout, groups: int = 1) -> float:
    """Multiply-accumulates x2 for one conv layer."""
    oh, ow = out_hw
    return 2.0 * oh * ow * kh * kw * (cin // groups) * cout


def dense_flops(cin, cout) -> float:
    return 2.0 * cin * cout


def engine_stage_flops(engine, batch: int, occupancy: int | None = None) -> dict:
    """FLOPs per dispatch of each device stage of a RecognitionEngine at the
    given frame-batch size, via XLA cost analysis on the stage executables'
    production shapes. Returns {stage: flops|None, 'total': float|None}.

    ``occupancy``: measured valid faces per batch. When the embed stage uses
    valid-slot compaction (engine/pipeline.py embed_compact_rungs), XLA's
    cost analysis sums ALL lax.switch branches — not what executes — so the
    embed figure is instead taken from an uncompacted build scaled by
    rung(occupancy)/n, the flops the selected branch actually runs."""
    import jax
    import jax.numpy as jnp

    from frp_tpu.engine.pipeline import embed_compact_rungs

    cfg = engine.cfg
    s = cfg.det_size
    m = cfg.max_faces_per_frame
    out: dict = {}
    params = engine.params
    try:
        frames = jnp.zeros((batch, s, s, 3), jnp.uint8)
        out["detect"] = compiled_flops(
            engine._stages["detect"], params["detector"], frames, engine._priors
        )
        dets = {
            "boxes": jnp.zeros((batch, m, 4), jnp.float32),
            "scores": jnp.zeros((batch, m), jnp.float32),
            "landmarks": jnp.zeros((batch, m, 10), jnp.float32),
            "valid": jnp.zeros((batch, m), bool),
            "count": jnp.zeros((batch,), jnp.int32),
        }
        out["crop"] = compiled_flops(engine._stages["crop"], frames, dets)
        gal, gal_valid, _names = engine.gallery.device_view()
        emb_params = {"embedder": params["embedder"], "spoof": params["spoof"]}
        crops = jnp.zeros((batch, m, 112, 112, 3), jnp.float32)
        n = batch * m
        rungs = embed_compact_rungs(n)
        embed_fn = engine._stages["embed"]
        frac = 1.0
        if rungs:
            from frp_tpu.engine.pipeline import build_stages

            plain = _plain_embed_stage(engine, build_stages)
            if plain is not None:
                embed_fn = plain
                if occupancy is not None:
                    k = next((r for r in rungs if occupancy <= r), n)
                    frac = k / n
        embed = compiled_flops(
            embed_fn, emb_params, crops, dets["valid"], engine.distance_scale
        )
        out["embed"] = embed * frac if embed else embed
        emb_flat = jnp.zeros((batch * m, cfg.embed_dim), jnp.float32)
        out["match"] = compiled_flops(
            engine._stages["match"], emb_flat, dets["valid"], gal, gal_valid,
            jnp.float32(cfg.face_tolerance),
        )
    except Exception:
        pass
    known = [v for v in out.values() if v]
    out["total"] = float(sum(known)) if known else None
    return out


def _plain_embed_stage(engine, build_stages):
    """An uncompacted embed stage matching the engine's config, for cost
    analysis only (never dispatched)."""
    import os

    prev = os.environ.get("FRP_EMBED_COMPACT")
    os.environ["FRP_EMBED_COMPACT"] = "0"
    try:
        return build_stages(
            det_size=engine.cfg.det_size,
            max_faces=engine.cfg.max_faces_per_frame,
            with_spoof=engine.with_spoof,
            compute_dtype=engine.cfg.compute_dtype,
            embedder_forward=engine._embedder_forward,
            flip_tta=getattr(engine.cfg, "embed_flip_tta", False),
        )["embed"]
    except Exception:
        return None
    finally:
        if prev is None:
            del os.environ["FRP_EMBED_COMPACT"]
        else:
            os.environ["FRP_EMBED_COMPACT"] = prev


def mfu(flops_per_step: float, seconds_per_step: float,
        peak: float = PEAK_FLOPS_BF16) -> float:
    """Model-FLOPs utilization in [0, 1]."""
    if not flops_per_step or seconds_per_step <= 0:
        return 0.0
    return float(flops_per_step) / seconds_per_step / peak

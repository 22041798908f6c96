"""Measure all five BASELINE.json configs on the attached TPU and write
benchmarks/RESULTS.md.

Configs (BASELINE.json "configs"):
  1. single still image: detect -> embed -> match vs 100-face gallery
  2. single 720p camera stream: real-time recognition + watchlist alerts
  3. 4x1080p streams with cross-camera tracking identity association
  4. batched spoof classification alongside recognition
  5. FedAvg round: aggregate client weight updates

Usage: python benchmarks/run_all.py [--out benchmarks/RESULTS.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_engine(det_size=640):
    from frp_tpu.config import load_config
    from frp_tpu.engine.pipeline import RecognitionEngine

    cfg = load_config(det_size=det_size, max_faces_per_frame=16)
    eng = RecognitionEngine(cfg)
    rng = np.random.default_rng(0)
    for i in range(100):
        eng.gallery.add(f"person_{i}", rng.normal(size=cfg.embed_dim))
    return eng


def scene(h, w, faces, rng):
    from frp_tpu.train.synthetic import render_face

    rgb = rng.integers(20, 110, size=(h, w, 3), dtype=np.uint8)
    cols = max(1, int(np.ceil(np.sqrt(faces * w / h))))
    rows = max(1, int(np.ceil(faces / cols)))
    k = 0
    for gy in range(rows):
        for gx in range(cols):
            if k >= faces:
                break
            size = min(h / rows, w / cols) * float(rng.uniform(0.55, 0.8))
            cx = (gx + 0.5) * w / cols + float(rng.uniform(-10, 10))
            cy = (gy + 0.5) * h / rows + float(rng.uniform(-10, 10))
            render_face(rgb, cx, cy, size, rng)
            k += 1
    return np.ascontiguousarray(rgb[..., ::-1])  # BGR


def prep(frames, size):
    from frp_tpu.engine.batching import active_rows_for, build_batch_i420

    rows = active_rows_for([f.shape[:2] for f in frames], size)
    return build_batch_i420(
        {i: f for i, f in enumerate(frames)}, size, active_rows=rows
    )


def pipelined(eng, batch, n=30, depth=6, group=3):
    """Packed submissions, grouped drains (one host sync per `group`
    batches) — the tuned serving loop; see bench.py module docstring.
    Timer starts before the prefill so all counted work is inside the timed
    region (advisor r3 accounting fix), and the divisor is batches actually
    processed (done can overshoot n when group does not divide it)."""
    t0 = time.perf_counter()
    handles = [eng.submit(batch, fmt="yuv420") for _ in range(depth)]
    done = 0
    while done < n:
        for _ in range(group):
            handles.append(eng.submit(batch, fmt="yuv420"))
        eng.fetch_many(handles[:group])
        del handles[:group]
        done += group
    eng.fetch_many(handles)
    return (time.perf_counter() - t0) / (done + depth)


def headline_attempts(n: int) -> list[dict]:
    """Run bench.py --once in n fresh subprocesses (fresh relay draw each)
    and return their JSON results — the ONE run set both the best and the
    median quoted anywhere in the docs must come from (VERDICT r2 #8)."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results: list[dict] = []
    failed = 0
    # same scan-ticks-per-submission plan as bench.py's driver attempts
    # (BENCH_ATTEMPT_TICKS default): the consistent 2-tick config first,
    # then the host-lottery 3-tick draws; recorded per attempt below
    ticks_plan = [t.strip() for t in os.getenv(
        "BENCH_ATTEMPT_TICKS", "2,3,3").split(",")]
    for k in range(n):
        if k:
            # the relay needs ~a minute to re-admit a new process after the
            # previous one exits (CLAUDE.md gotcha #2/#15) — launching the
            # next attempt instantly risks an 800+ s wedged chip-wait
            time.sleep(float(os.getenv("BENCH_RECOVERY_SLEEP_S", "45")))
        env = dict(os.environ)
        if "BENCH_TICKS" not in os.environ:
            env["BENCH_TICKS"] = ticks_plan[min(k, len(ticks_plan) - 1)]
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(root, "bench.py"), "--once"],
                capture_output=True, text=True, timeout=1200, env=env,
            )
        except subprocess.TimeoutExpired:
            # a hung attempt (cold compile + wedged relay) must not abort
            # the whole measurement run
            print(f"headline attempt {k + 1}/{n}: timed out, skipped",
                  file=sys.stderr)
            failed += 1
            continue
        got = None
        for line in reversed(proc.stdout.strip().splitlines()):
            if line.startswith("{"):
                got = json.loads(line)
                break
        if got is None:
            print(f"headline attempt {k + 1}/{n}: no result "
                  f"(rc={proc.returncode}); stderr tail: "
                  f"{proc.stderr[-300:]}", file=sys.stderr)
            failed += 1
            continue
        results.append(got)
    for r in results:
        r["_attempts_failed"] = failed  # recorded into canonical honestly
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="benchmarks/RESULTS.md")
    p.add_argument("--canonical", default="benchmarks/canonical.json")
    p.add_argument("--bench-attempts", type=int, default=4,
                   help="headline bench.py runs for canonical.json (0 skips)")
    args = p.parse_args()
    rng = np.random.default_rng(0)
    results = []
    canonical: dict = {"date": time.strftime("%Y-%m-%d"), "configs": {}}

    # Headline attempts run FIRST, before this process touches the TPU:
    # the chip admits one process at a time, so the bench.py subprocesses
    # must each grab and release it while the parent has not initialized
    # a backend yet.
    attempts = headline_attempts(args.bench_attempts) if args.bench_attempts else []

    eng = build_engine()

    # --- config 1: single still image, blocking latency ---
    img = scene(480, 640, 1, rng)
    batch, _ = prep([img], eng.cfg.det_size)
    eng.process_frames(batch, fmt="yuv420")  # compile
    lats = []
    for _ in range(15):
        t0 = time.perf_counter()
        out = eng.process_frames(batch, fmt="yuv420")
        lats.append(time.perf_counter() - t0)
    p50 = sorted(lats)[len(lats) // 2] * 1000
    results.append(
        ("1. single still image (detect+embed+match, 100-face gallery)",
         f"p50 latency {p50:.1f} ms, faces found {int(out['count'].sum())}")
    )
    canonical["configs"]["still_image"] = {
        "p50_ms": round(p50, 1), "best_ms": round(min(lats) * 1000, 1)
    }

    # --- config 2: single 720p stream (depth 8 / group 4: the B=1 sweet
    # spot measured in benchmarks/profile_b1.py; ~8-frame pipeline latency) ---
    frame720 = scene(720, 1280, 3, rng)
    b720, _ = prep([frame720], eng.cfg.det_size)
    eng.process_frames(b720, fmt="yuv420")
    runs = [pipelined(eng, b720, n=60, depth=8, group=4) for _ in range(3)]
    per, per_med = min(runs), sorted(runs)[1]
    results.append(
        ("2. single 720p stream (real-time recognition)",
         f"{1 / per:.1f} fps sustained best / {1 / per_med:.1f} fps median "
         f"({per * 1000:.1f} ms/frame pipelined, depth 8, ~{8 * per * 1000:.0f} ms "
         "pipeline latency)")
    )
    canonical["configs"]["stream_720p"] = {
        "fps_best": round(1 / per, 1), "fps_median": round(1 / per_med, 1)
    }

    # --- config 3: 4x1080p streams + tracking ---
    from frp_tpu.platform.tracking import TrackingService

    frames4 = [scene(1080, 1920, 12, rng) for _ in range(4)]
    b4, meta4 = prep(frames4, eng.cfg.det_size)
    out4 = eng.process_frames(b4, fmt="yuv420")
    faces4 = int(out4["count"].sum())
    runs4 = [pipelined(eng, b4) for _ in range(3)]
    per4, per4_med = min(runs4), sorted(runs4)[1]
    # host tracking cost for the batch's matches
    tracking = TrackingService(
        {i: {"name": f"c{i}", "geo": (18.5 + i * 0.01, 73.8)} for i in range(4)},
        cooldown_seconds=0.0,
    )
    t0 = time.perf_counter()
    for i in range(4):
        for j in range(out4["valid"].shape[1]):
            if out4["valid"][i, j]:
                tracking.record_detection(f"p{j}", i, float(out4["best_distance"][i, j]))
    track_ms = (time.perf_counter() - t0) * 1000
    results.append(
        ("3. 4x1080p streams + cross-camera tracking",
         f"{4 / per4:.1f} fps aggregate best / {4 / per4_med:.1f} median, "
         f"{faces4 / per4:.0f} faces/s, "
         f"host tracking {track_ms:.1f} ms per {faces4}-face batch")
    )
    canonical["configs"]["streams_4x1080p"] = {
        "fps_best": round(4 / per4, 1), "fps_median": round(4 / per4_med, 1),
        "faces_per_sec_best": round(faces4 / per4, 0),
    }

    # --- config 4: co-batched spoof classification ---
    # spoof rides the same dispatch; isolate by comparing with_spoof on/off
    eng_nospoof = None
    try:
        from frp_tpu.config import load_config
        from frp_tpu.engine.pipeline import RecognitionEngine

        cfg2 = load_config(det_size=640, max_faces_per_frame=16)
        eng_nospoof = RecognitionEngine(cfg2, with_spoof=False)
        eng_nospoof.process_frames(b4, fmt="yuv420")
        per_ns = min(pipelined(eng_nospoof, b4) for _ in range(2))
        overhead = (per4 - per_ns) * 1000
        results.append(
            ("4. co-batched spoof classification",
             f"{faces4 / per4:.0f} crops/s classified alongside recognition; "
             f"marginal cost {overhead:+.1f} ms/batch vs recognition-only")
        )
    except Exception as e:
        results.append(("4. co-batched spoof classification", f"skipped: {e}"))

    # --- gallery at 1M identities (VERDICT r4 #5: the scale story goes
    # canonical) — same 4x1080p serving protocol as config 3, with the
    # gallery bulk-hydrated to 1,000,000 identities. The reference's numpy
    # broadcast path (face_service.py:409-411) was measured at ~175 s/batch
    # at this N; the device matmul + chunked exact top-k should hold the
    # config-3 rate (BASELINE.md gallery table measured the match op flat
    # to N=1M — this measures the full serving loop).
    try:
        n_target = 1_000_000
        extra = n_target - len(eng.gallery)
        mat = rng.standard_normal((extra, eng.cfg.embed_dim), dtype=np.float32)
        t0 = time.perf_counter()
        eng.gallery.load_matrix([f"id_{i}" for i in range(extra)], mat)
        hydrate_s = time.perf_counter() - t0
        eng.process_frames(b4, fmt="yuv420")  # compile at 1M capacity + upload
        runs1m = [pipelined(eng, b4) for _ in range(3)]
        per1m, per1m_med = min(runs1m), sorted(runs1m)[1]
        results.append(
            ("3b. same 4x1080p serving, 1M-identity gallery",
             f"{faces4 / per1m:.0f} faces/s best / {faces4 / per1m_med:.0f} "
             f"median ({per1m * 1000:.1f} ms/batch vs {per4 * 1000:.1f} at "
             f"N=100; hydrate {hydrate_s:.1f}s host-side)")
        )
        canonical["configs"]["gallery_1m"] = {
            "identities": n_target,
            "faces_per_sec_best": round(faces4 / per1m, 0),
            "faces_per_sec_median": round(faces4 / per1m_med, 0),
            "ms_per_batch_best": round(per1m * 1000, 1),
            "ms_per_batch_n100_best": round(per4 * 1000, 1),
            "slowdown_vs_n100": round(per1m / per4, 2),
        }
        # restore the 100-identity gallery for any later sections
        # (removal at 1M would be 1M swap-removes; rebuild instead)
        eng.gallery.clear()
        rng_g = np.random.default_rng(0)
        for i in range(100):
            eng.gallery.add(f"person_{i}", rng_g.normal(size=eng.cfg.embed_dim))
    except Exception as e:
        results.append(("3b. 1M-identity gallery", f"skipped: {e}"))

    # --- ArcFace train-step MFU (VERDICT r4 #5: the one-off
    # profile_train.py table becomes a dated, drift-protected canonical
    # row) — batch 128, uint8 upload, metrics drained at the end ---
    try:
        import jax
        import jax.numpy as jnp

        from frp_tpu.train.arcface import ArcFaceTrainer
        from frp_tpu.utils.flops import PEAK_FLOPS_BF16, compiled_flops, mfu

        trainer = ArcFaceTrainer(num_classes=512)
        tb = 128
        rng3 = np.random.default_rng(2)
        imgs = rng3.integers(0, 255, (tb, 112, 112, 3)).astype(np.uint8)
        labels = rng3.integers(0, 512, (tb,)).astype(np.int32)
        trainer.train_step(imgs, labels)  # compile
        steps = 20
        t0 = time.perf_counter()
        for _ in range(steps):
            trainer.train_step(imgs, labels, sync=False)
        trainer.flush_metrics()
        jax.block_until_ready(trainer.state["params"])
        step_s = (time.perf_counter() - t0) / steps
        # the step takes the round-4 traced margin scalar as arg 4
        fl = compiled_flops(trainer._step, trainer.state, jnp.asarray(imgs),
                            jnp.asarray(labels), float(trainer.margin))
        train_mfu = mfu(fl, step_s) if fl else None
        results.append(
            ("train: ArcFace MobileFaceNet step (batch 128, 512 ids)",
             f"{step_s * 1000:.1f} ms/step, {tb / step_s:.0f} imgs/s, "
             + (f"MFU {train_mfu:.3f} ({fl / 1e9:.1f} GFLOP/step vs "
                f"{PEAK_FLOPS_BF16 / 1e12:.0f} TFLOP/s bf16 peak)"
                if fl else "MFU n/a (no cost analysis)"))
        )
        canonical["train_mfu"] = {
            "batch": tb, "ms_per_step": round(step_s * 1000, 1),
            "imgs_per_sec": round(tb / step_s, 0),
            "mfu": round(train_mfu, 4) if train_mfu else None,
            "gflop_per_step": round(fl / 1e9, 1) if fl else None,
        }
    except Exception as e:
        results.append(("train: ArcFace step MFU", f"skipped: {e}"))

    # --- config 5: FedAvg round ---
    from frp_tpu.ops.fedavg import fedavg_combine, resolve_weights

    k, layers = 8, 40
    rng2 = np.random.default_rng(1)
    updates = {
        f"c{i}": {f"layer_{j}": rng2.normal(size=(256, 128)).astype(np.float64)
                  for j in range(layers)}
        for i in range(k)
    }
    w = resolve_weights(list(updates))
    t0 = time.perf_counter()
    fedavg_combine(updates, w)
    fed_ms = (time.perf_counter() - t0) * 1000
    params_m = k * layers * 256 * 128 / 1e6
    results.append(
        ("5. FedAvg round (8 clients x 1.3M params)",
         f"{fed_ms:.1f} ms host combine ({params_m:.1f}M param-updates); "
         "mesh-psum path verified equal in tests")
    )
    canonical["configs"]["fedavg"] = {"combine_ms": round(fed_ms, 1)}

    # --- headline: best + median from ONE bench.py run set (measured
    # above, before the parent claimed the chip) ---
    if attempts:
        vals = sorted(a["value"] for a in attempts)
        med = vals[len(vals) // 2] if len(vals) % 2 else (
            (vals[len(vals) // 2 - 1] + vals[len(vals) // 2]) / 2)
        best = max(attempts, key=lambda a: a["value"])
        canonical["headline"] = {
            "faces_per_sec_best": round(max(vals), 1),
            "faces_per_sec_median": round(med, 1),
            "vs_baseline_best": round(max(vals) / 33.3, 1),
            "vs_baseline_median": round(med / 33.3, 1),
            "attempts": len(attempts),
            "attempts_failed": attempts[0].get("_attempts_failed", 0),
            "values": [round(v, 1) for v in vals],
            # run order, so each value's submission config is auditable
            "attempts_run_order": [
                {"value": round(a["value"], 1),
                 "ticks": a["detail"].get("ticks_per_submission")}
                for a in attempts],
            "p50_detection_to_alert_ms_best_run": best["detail"].get(
                "p50_detection_to_alert_ms"),
            "mfu_device_best_run": best["detail"].get("mfu_device"),
            "mfu_serving_best_run": best["detail"].get("mfu_serving"),
            "wire_compression_best_run": best["detail"].get(
                "wire_compression_ratio"),
        }
        results.append(
            ("headline (bench.py, 8x1080p, same run set)",
             f"best {max(vals):.0f} / median {med:.0f} faces/s = "
             f"{max(vals) / 33.3:.1f}x / {med / 33.3:.1f}x baseline "
             f"({len(attempts)} attempts)")
        )
    with open(args.canonical, "w") as f:
        json.dump(canonical, f, indent=1)
    print(f"wrote {args.canonical}")

    lines = [
        "# BASELINE.json config measurements",
        "",
        f"TPU v5e single chip via serving relay; {time.strftime('%Y-%m-%d')}.",
        "Protocol: active-rows I420 transfer (device pads the letterbox);",
        "packed [B,M,22] results; pipeline depth 6 /",
        "fetch group 3 for multi-stream, depth 8 / group 4 for single-stream;",
        "scenes rendered with faces so every stage processes real detections.",
        "best + median of 3 runs reported where streaming.",
        "",
        "| Config | Result |",
        "|---|---|",
    ]
    for name, val in results:
        lines.append(f"| {name} | {val} |")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()

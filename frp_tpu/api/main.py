"""App assembly: build the context, mount all routes, run the server.

Reference counterpart ``backend/app/main.py``: CORS, Socket.IO wrapping,
hardcoded camera bootstrap, router mounting, startup/shutdown lifecycle with
a model-idle-cleanup loop. Differences: nothing happens at import time; the
async-search router is mounted (the reference forgets it, main.py:90-100);
and a background scan loop can drive the batched pipeline continuously so
alerts/tracking stay live even when no client polls /camera/alerts.
"""

from __future__ import annotations

import asyncio
import os

from frp_tpu.api.http import HTTPServer, Request, Router, json_response
from frp_tpu.api.routes import (
    alerts as alerts_routes,
    async_tasks as async_routes,
    camera as camera_routes,
    dashboard as dashboard_routes,
    deepfake as deepfake_routes,
    face as face_routes,
    federated as federated_routes,
    frontend as frontend_routes,
    snapshot as snapshot_routes,
)
from frp_tpu.api.socketio import SocketIOServer
from frp_tpu.platform.context import AppContext
from frp_tpu.platform.state import memory_info
from frp_tpu.utils.logger import get_logger

logger = get_logger("frp.api.main")


def build_app(ctx: AppContext | None = None, **ctx_kwargs):
    """Returns (router, sio, ctx) with every route registered."""
    ctx = ctx or AppContext(**ctx_kwargs)
    router = Router()
    sio = SocketIOServer(event_hub=ctx.events)

    @router.get("/")
    async def root(request: Request):
        return json_response(
            {
                "message": "FastAPI backend is running",  # reference main.py:105
                "service": "face-recognition-platform (TPU-native)",
                "status": "running",
                "gallery_size": len(ctx.engine.gallery),
                "cameras": len(ctx.cameras.ids()),
                "storage_backend": ctx.db_backend,
                "socketio_clients": sio.client_count,
            }
        )

    @router.get("/camera/status")
    async def camera_status(request: Request):
        """Reference main.py:103-124 status endpoint."""
        cams = ctx.cameras.all()
        return json_response(
            {
                # the reference envelope the React app consumes
                # (main.py:108-124, App.jsx:67/214-222: entry.state === "ok"):
                "status": {
                    str(c.id): {
                        "state": "ok" if c.healthy else "error",
                        "name": c.name,
                        "geo": list(c.geo) if c.geo else None,
                    }
                    for c in cams
                },
                # extensions
                "total": len(cams),
                "active": [c.id for c in cams if c.healthy],
                "cameras": {str(c.id): c.info() for c in cams},
                "memory": memory_info(),
            }
        )

    @router.post("/debug/trace/start")
    async def trace_start(request: Request):
        label = request.query.get("label", "trace")
        return json_response(ctx.tracer.start(label))

    @router.post("/debug/trace/stop")
    async def trace_stop(request: Request):
        return json_response(ctx.tracer.stop())

    @router.get("/debug/timers")
    async def timers(request: Request):
        return json_response(
            {"stages": ctx.timers.summary(), "engine": ctx.engine.metrics.as_dict()}
        )

    @router.get("/debug/delta")
    async def delta_stats(request: Request):
        """Temporal-delta transfer health: keyframe/delta/desync counters so
        an operator can see encoder/engine desync (stale reconstructions are
        otherwise invisible — the pipeline happily serves them)."""
        return json_response(
            dict(getattr(ctx.engine, "delta_stats",
                         {"keyframes": 0, "deltas": 0, "desyncs": 0}))
        )

    @router.get("/debug/memory")
    async def memory(request: Request):
        return json_response(memory_info())

    camera_routes.register(router, ctx)
    face_routes.register(router, ctx)
    federated_routes.register(router, ctx)
    deepfake_routes.register(router, ctx)
    alerts_routes.register(router, ctx)
    snapshot_routes.register(router, ctx)
    async_routes.register(router, ctx)  # mounted (reference forgets this)
    dashboard_routes.register(router, ctx)
    frontend_routes.register(router, ctx)
    return router, sio, ctx


async def serve(
    host: str = "0.0.0.0",
    port: int = 8000,
    ctx: AppContext | None = None,
    scan_interval: float | None = None,
    warmup: bool = True,
):
    router, sio, ctx = build_app(ctx)
    server = HTTPServer(router, ws_handler=sio.handle_upgrade,
                        allowed_origins=ctx.cfg.frontend_origins)
    ctx.startup()
    if warmup:
        try:
            # two shape sets get used in production: B=1 RGB (enrollment /
            # compare uploads) and the multi-camera active-rows I420 scan.
            # Compile exactly those — a B=n RGB warmup would compile a third
            # program set nothing dispatches (remote compile is 5-40 s each,
            # CLAUDE.md gotcha 9). The scan warmup runs dry: no tracking
            # records, alerts, DB writes, or socket events.
            await asyncio.to_thread(ctx.engine.warmup, 1)
            await asyncio.to_thread(
                ctx.run_scan, ctx.cfg.face_tolerance, ctx.cfg.frame_skip, 10,
                True,
            )
            # the dry scan only compiles the raw-keyframe path; each delta
            # capacity rung would otherwise compile lazily on its first live
            # hit (5-40 s remote compile) while holding the scan mutex —
            # stalling the scan loop and /camera/alerts (advisor r3)
            if getattr(ctx.cfg, "delta_transfer", False) and hasattr(
                ctx.engine, "precompile_delta_rungs"
            ):
                rungs = await asyncio.to_thread(ctx.engine.precompile_delta_rungs)
                logger.info("delta-transfer rungs precompiled: %d", rungs)
        except Exception:
            logger.exception("engine warmup failed (continuing)")

    stop = asyncio.Event()
    tasks = []

    async def model_cleanup_loop():
        # reference main.py:206-222
        while not stop.is_set():
            await asyncio.sleep(ctx.cfg.model_idle_unload_seconds)
            unloaded = ctx.models.cleanup_idle_models()
            if unloaded:
                logger.info("unloaded idle models: %s", unloaded)

    async def scan_loop():
        interval = scan_interval or ctx.cfg.camera_scan_interval
        while not stop.is_set():
            try:
                await asyncio.to_thread(
                    ctx.run_scan, ctx.cfg.face_tolerance, ctx.cfg.frame_skip, 10
                )
            except Exception:
                logger.exception("scan loop iteration failed")
            await asyncio.sleep(interval)

    tasks.append(asyncio.create_task(model_cleanup_loop()))
    if scan_interval is not None:
        tasks.append(asyncio.create_task(scan_loop()))

    await server.start(host, port)
    logger.info("platform ready on %s:%d (storage=%s)", host, port, ctx.db_backend)
    try:
        await stop.wait()
    finally:
        for t in tasks:
            t.cancel()
        await server.stop()
        ctx.shutdown()


def main():
    import argparse

    p = argparse.ArgumentParser(description="TPU-native face recognition platform")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=int(os.getenv("PORT", 8000)))
    p.add_argument(
        "--scan-interval",
        type=float,
        default=None,
        help="run the background multi-camera scan loop at this period (s)",
    )
    p.add_argument("--no-warmup", action="store_true")
    p.add_argument(
        "--mesh",
        choices=["auto", "off"],
        default=os.getenv("FRP_MESH", "off"),
        help="auto: bring up jax.distributed (multi-host env/auto-detect, "
        "no-op single-host) and shard the scan batch over all devices. "
        "Requires the camera count to be divisible by the device count.",
    )
    args = p.parse_args()

    ctx = None
    if args.mesh == "auto":
        from frp_tpu.parallel.mesh import distributed_initialize, make_global_mesh

        dist = distributed_initialize()  # SURVEY 2.4 DCN path; no-op solo
        import jax

        if len(jax.devices()) > 1:
            mesh = make_global_mesh()
            logger.info(
                "serving over a %d-device mesh (distributed: %s)",
                mesh.devices.size, dist,
            )
            ctx = AppContext(mesh=mesh)

    asyncio.run(
        serve(
            args.host,
            args.port,
            ctx=ctx,
            scan_interval=args.scan_interval,
            warmup=not args.no_warmup,
        )
    )


if __name__ == "__main__":
    main()

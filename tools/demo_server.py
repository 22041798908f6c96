"""Run the full platform on the CPU backend — for browser demos and frontend
interop checks on machines without (or while something else owns) the TPU.

    python tools/demo_server.py --port 8010 --scan-interval 2

Forces the CPU backend via jax.config (the TPU plugin's sitecustomize imports
jax at interpreter start, so env vars are too late — CLAUDE.md gotcha #1),
then serves exactly what `python -m frp_tpu.api.main` serves: every route,
the Socket.IO edge, the background scan loop over the synthetic cameras.
"""

from __future__ import annotations

import argparse
import asyncio
import os
import sys

# runnable as `python tools/demo_server.py` without an installed package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8010)
    p.add_argument("--scan-interval", type=float, default=2.0)
    p.add_argument("--no-scan", action="store_true")
    args = p.parse_args()

    from frp_tpu.api.main import serve

    asyncio.run(
        serve(
            args.host,
            args.port,
            scan_interval=None if args.no_scan else args.scan_interval,
        )
    )


if __name__ == "__main__":
    main()

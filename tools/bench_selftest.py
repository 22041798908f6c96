"""bench.py end-to-end self-test on the CPU backend (no chip needed).

Runs the REAL bench.main() — engine build, scene+sprite motion, banded
letterbox caches, hinted delta encode, pipelined windows, partial-JSON
machinery, MFU accounting — at tiny shapes so a code break in the bench
producer surfaces here instead of as an empty driver scoreboard
(BENCH_r03 was rc=1 for exactly that class of reason). faces/s is 0 at
det 128 (1080p faces letterbox below the detector's trained pixel range);
the CONTRACT is: rc=0 and one valid JSON line with the detail fields.

Usage: python tools/bench_selftest.py   (~3 min with a warm compile cache)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

os.environ.update(
    BENCH_DET_SIZE="128", BENCH_DEPTH="4", BENCH_GROUP="2",
    BENCH_WINDOW="8", BENCH_WINDOWS="2", BENCH_BUDGET_S="600",
)

import runpy

sys.argv = [os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py"), "--once"]
runpy.run_path(sys.argv[0], run_name="__main__")

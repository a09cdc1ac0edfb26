"""Profile the realtime VI scenario in isolation: runs bench.py's
_vi_throughput_scenario with stage timing + optional compile logging.

Usage: python scripts/diag_vi.py [--frames 60]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    args = ap.parse_args()

    import jax

    if jax.default_backend() != "cpu":
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import bench

    bench._vi_throughput_scenario(n_frames=args.frames)


if __name__ == "__main__":
    main()

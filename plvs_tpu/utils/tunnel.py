"""Remote-accelerator link management.

Through a tunneled TPU client, each process draws connections from a pool
whose workers are either fast (~0.1 ms RTT, >400 MB/s bulk) or slow (~25 ms
RTT, ~15 MB/s bulk) — measured; the draw is per-process and RTT and bulk
bandwidth are INDEPENDENT draws. A slow bulk link caps the whole pipeline at
~12 fps regardless of kernel speed (0.9 MB/frame upload at 12 MB/s = 75 ms).
``ensure_fast_link`` probes both and re-execs the process for a fresh draw
when either is slow. No-op on locally attached backends (probes pass).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_ENV = "PLVS_TUNNEL_TRIES"


def probe_link(reps: int = 10):
    """Returns (rtt_ms, bulk_mb_s) of the current device link.

    CRITICAL: every probe call uses a FRESH input value. The tunnel dedups
    identical (executable, inputs) executions and serves the cached result
    in ~0.1 ms, so a same-input probe always looks fast — while real
    (non-deduped) awaits on a slow worker draw cost ~26 ms flat, and the
    execution does not even start until awaited (measured)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a, s: (a * s).sum())
    x = jnp.ones((256,))
    f(x, 1.0).block_until_ready()  # connection warm-up + compile
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        f(x, float(2.0 + i)).block_until_ready()
        ts.append(time.perf_counter() - t0)
    rtt_ms = sorted(ts)[len(ts) // 2] * 1e3

    g = jax.jit(lambda a, s: (a * s).sum())
    buf = np.random.randint(0, 2 ** 31, 1 << 18, dtype=np.uint32)  # 1 MB
    g(jnp.asarray(buf), 1.0).block_until_ready()
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        g(jnp.asarray(buf + np.uint32(i)), float(i)).block_until_ready()
        ts.append(time.perf_counter() - t0)
    bulk_s = sorted(ts)[len(ts) // 2]
    bulk_mb_s = (buf.nbytes / 1e6) / max(bulk_s, 1e-9)

    # the pattern that actually goes slow on bad draws (scalar-chain RTT
    # can look fast while this sits at ~26 ms flat): an exec over
    # pre-uploaded DEVICE-RESIDENT arrays returning an ARRAY, awaited
    h = jax.jit(lambda a: (a[:, None] * a[None, :]))
    ins = [jnp.asarray(np.random.rand(512).astype(np.float32) + i)
           for i in range(reps)]
    h(ins[0]).block_until_ready()
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        h(ins[i]).block_until_ready()
        ts.append(time.perf_counter() - t0)
    exec_ms = sorted(ts)[len(ts) // 2] * 1e3
    return max(rtt_ms, exec_ms), bulk_mb_s


def ensure_fast_link(max_retries: int = 8, rtt_threshold_ms: float = 5.0,
                     bulk_threshold_mb_s: float = 100.0,
                     verbose: bool = True) -> tuple[float, float]:
    """Probe RTT + bulk bandwidth; re-exec this process for a fresh
    connection draw when either is below par. Returns (rtt_ms, bulk_mb_s)
    of the accepted link. Only the transport is retried — never work."""
    tries = int(os.environ.get(_ENV, "0"))
    rtt_ms, bulk = probe_link()
    if verbose:
        print(f"tunnel link: RTT {rtt_ms:.2f} ms, bulk {bulk:.0f} MB/s "
              f"(try {tries})", file=sys.stderr)
    if (rtt_ms > rtt_threshold_ms or bulk < bulk_threshold_mb_s) \
            and tries < max_retries:
        os.environ[_ENV] = str(tries + 1)
        sys.stderr.flush()
        os.execv(sys.executable, [sys.executable] + sys.argv)
    return rtt_ms, bulk

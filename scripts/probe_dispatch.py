"""Probe: per-dispatch economics through the TPU tunnel.

Questions this answers (round-4 throughput design):
  1. What does ONE awaited execution chain cost flat (fresh inputs)?
  2. G separate dispatches + one fetch  VS  one lax.scan'ed dispatch over a
     stacked input: how much does collapsing the group save?
  3. Does arr.copy_to_host_async() let host work overlap the fetch?
All probes use fresh input content every call (the tunnel dedups identical
(executable, input) pairs).
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

REPS = 8


def med(ts):
    return sorted(ts)[len(ts) // 2] * 1e3


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)

    # a "frame-scale" program: some matmul + elementwise work, ~1 MB input
    def body(row):
        x = row.reshape(512, 512)
        for _ in range(4):
            x = jnp.tanh(x @ x * 1e-3 + x)
        return x.sum(), x[:, 0]

    f1 = jax.jit(lambda row: body(row))
    G = 4

    def scanned(rows):
        def step(c, r):
            s, v = body(r)
            return c, (s, v)
        _, out = jax.lax.scan(step, 0, rows)
        return out

    fG = jax.jit(scanned)

    rng = np.random.default_rng(0)
    rows = [rng.standard_normal((REPS, G, 512 * 512), dtype=np.float32)
            for _ in range(1)][0]

    # warm up compiles
    f1(jnp.asarray(rows[0, 0]))[0].block_until_ready()
    fG(jnp.asarray(rows[0]))[0].block_until_ready()

    # 1) single awaited chain, fresh input
    ts = []
    for i in range(REPS):
        x = jnp.asarray(rows[i, 0])
        t0 = time.perf_counter()
        s, v = f1(x)
        jax.device_get((s, v))
        ts.append(time.perf_counter() - t0)
    print(f"single dispatch awaited: {med(ts):.2f} ms")

    # 2a) G separate dispatches, one fetch
    ts = []
    for i in range(REPS):
        xs = [jnp.asarray(rows[i, g]) for g in range(G)]
        t0 = time.perf_counter()
        outs = [f1(x) for x in xs]
        jax.device_get(outs)
        ts.append(time.perf_counter() - t0)
    print(f"G={G} separate dispatches + 1 fetch: {med(ts):.2f} ms")

    # 2b) ONE scanned dispatch over stacked rows
    ts = []
    for i in range(REPS):
        x = jnp.asarray(rows[i])
        t0 = time.perf_counter()
        out = fG(x)
        jax.device_get(out)
        ts.append(time.perf_counter() - t0)
    print(f"G={G} one scanned dispatch: {med(ts):.2f} ms")

    # 3) async copy overlap: dispatch, start async copy, do host work, fetch
    ts_sync, ts_async = [], []
    host_ms = 60.0

    def host_work(ms):
        t_end = time.perf_counter() + ms / 1e3
        s = 0
        while time.perf_counter() < t_end:
            s += 1
        return s

    for i in range(REPS):
        x = jnp.asarray(rows[i])
        t0 = time.perf_counter()
        out = fG(x)
        host_work(host_ms)
        jax.device_get(out)
        ts_sync.append(time.perf_counter() - t0)
    for i in range(REPS):
        x = jnp.asarray(rows[(i + 3) % REPS] * 1.7)
        t0 = time.perf_counter()
        out = fG(x)
        try:
            for leaf in jax.tree.leaves(out):
                leaf.copy_to_host_async()
        except Exception as e:
            print("copy_to_host_async unavailable:", e)
            break
        host_work(host_ms)
        jax.device_get(out)
        ts_async.append(time.perf_counter() - t0)
    print(f"dispatch + {host_ms:.0f}ms host work + fetch (no async): "
          f"{med(ts_sync):.2f} ms")
    if ts_async:
        print(f"dispatch + async-copy + {host_ms:.0f}ms host work + fetch: "
              f"{med(ts_async):.2f} ms")

    # 4) tiny chain flat cost (dispatch overhead floor)
    g = jax.jit(lambda a, s: (a * s).sum())
    x = jnp.ones((256,))
    g(x, 1.0).block_until_ready()
    ts = []
    for i in range(REPS):
        t0 = time.perf_counter()
        g(x, float(i + 2)).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"tiny chain awaited: {med(ts):.2f} ms")


if __name__ == "__main__":
    main()

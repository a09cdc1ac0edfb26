"""Phase-level DEVICE-TIME profile of the 30 Hz per-frame programs.

Chained-iteration timing (dedup-proof: the carry varies per rep) for each
phase of frame build + line extraction + the fused whole-frame program.
Run on the real TPU: `python scripts/profile_phases.py`.
"""
import os
import time
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from plvs_tpu.geometry import cameras
from plvs_tpu.slam import frame as frame_mod
from plvs_tpu.features import lines as lines_mod
from plvs_tpu.features import pyramid as pyr_mod
from plvs_tpu.features import fast as fast_mod
from plvs_tpu.features import orb as orb_mod

W, H = 640, 480
NF, NL = 1024, 8


def chain(step, c0=0.0, iters=8, reps=5):
    @jax.jit
    def chained(c):
        return jax.lax.fori_loop(0, iters, lambda _, cc: step(cc), c)

    jax.block_until_ready(chained(jnp.float32(c0)))
    ts = []
    for r in range(reps):
        c = jnp.float32(c0 + 1e-6 * (r + 1))
        t0 = time.perf_counter()
        jax.block_until_ready(chained(c))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / iters * 1e3


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    from plvs_tpu.utils.tunnel import ensure_fast_link
    ensure_fast_link(max_retries=5)

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    d = jnp.asarray(np.full((H, W), 2.5, np.float32))
    cam = cameras.pinhole(520.9, 521.0, W / 2, H / 2, width=W, height=H,
                          bf=40.0)

    rows = []

    def add(name, ms):
        rows.append((name, ms))
        print(f"{name:35s} {ms:8.2f} ms", flush=True)

    def leaves(tree):
        # depend on EVERY output — a single-element carry lets XLA DCE
        # whole stages (e.g. descriptor samplers) out of the measurement
        s = jnp.float32(0.0)
        for leaf in jax.tree.leaves(tree):
            s = s + jnp.sum(leaf).astype(jnp.float32) * 1e-12
        return s

    # -- frame build total + phases --------------------------------------
    add("frame_build_rgbd(all-outputs)", chain(
        lambda c: c + leaves(frame_mod.build_frame_rgbd(
            g + c, d, cam, NF, NL, 1.2))))
    add("frame_build_rgbd(xy-only/DCE)", chain(
        lambda c: c + frame_mod.build_frame_rgbd(
            g + c, d, cam, NF, NL, 1.2).kp.xy[0, 0] * 1e-9))

    add("pyramid_stack", chain(
        lambda c: c + pyr_mod.build_pyramid_stack(
            g + c, NL, 1.2)[0, 0, 0] * 1e-9))

    per = orb_mod.features_per_level(NF, NL, 1.2)
    shapes = pyr_mod.level_shapes(H, W, NL, 1.2)

    def fast_step(c):
        stack = pyr_mod.build_pyramid_stack(g + c, NL, 1.2)
        xyL, scoreL, validL = fast_mod.detect_batched(
            stack, shapes, [max(n, 1) for n in per], 20.0, 7.0,
            border=orb_mod.HALF + 1, cell=16)
        return c + xyL[0, 0, 0] * 1e-9
    add("pyramid+fast", chain(fast_step))

    add("orb_extract_full(all-outputs)", chain(
        lambda c: c + leaves(orb_mod.extract(g + c, NF, NL, 1.2))))
    kp_no_desc = lambda c: orb_mod.extract(g + c, NF, NL, 1.2)
    add("orb_extract_no_desc(DCE)", chain(
        lambda c: c + leaves(kp_no_desc(c)._replace(
            desc=jnp.zeros((1,), jnp.uint32)))))

    # -- line extraction total + phases ----------------------------------
    add("lines_total(extract_lines)", chain(
        lambda c: c + lines_mod.extract_lines(
            g + c, 128).sp[0, 0] * 1e-9))
    add("lines_detect_only", chain(
        lambda c: c + lines_mod.detect_lines(
            g + c, 128).sp[0, 0] * 1e-9))
    add("lines_detect_iters8", chain(
        lambda c: c + lines_mod.detect_lines(
            g + c, 128, n_iters=8).sp[0, 0] * 1e-9))

    kl0 = lines_mod.detect_lines(g, 128)

    def merge_step(c):
        kl = kl0._replace(sp=kl0.sp + c)
        return c + lines_mod.merge_collinear(kl).sp[0, 0] * 1e-9
    add("lines_merge_collinear", chain(merge_step))

    def lbd_step(c):
        return c + lines_mod.lbd_descriptors(g + c, kl0)[0, 0].astype(
            jnp.float32) * 1e-9
    add("lines_lbd", chain(lbd_step))

    # stereo depth assoc etc: build_frame_lines total
    add("build_frame_lines", chain(
        lambda c: c + frame_mod.build_frame_lines(
            g + c, d, cam, 128).kl.sp[0, 0] * 1e-9))

    print("----", flush=True)
    for n, m in rows:
        print(f"{n}\t{m:.2f}")


if __name__ == "__main__":
    main()

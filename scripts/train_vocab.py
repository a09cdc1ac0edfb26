"""Train and ship ORB vocabularies (10k-word default, 100k-word product).

The reference ships a ~1M-leaf ORBvoc trained offline on real imagery
(reference: src/System.cc:158-196 loads Vocabulary/ORBvoc.bin|txt). This
framework ships two trees trained on ORB descriptors extracted from
procedurally generated scenes (blob, line, mixed and multi-scale 1/f
textures):

- voc_10k.npz  (k=10, depth=4): small, used by the test suite,
- voc_100k.npz (k=10, depth=5): the product tree — discriminative on
  maps of hundreds of keyframes (gated by tests/test_place_recognition's
  large-map recall test).

Run:  JAX_PLATFORMS=cpu python scripts/train_vocab.py [--words 100000]
Out:  plvs_tpu/vocab/data/voc_{10k,100k}.npz
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# force host CPU: the sandbox preregisters a remote-TPU PJRT plugin that
# ignores JAX_PLATFORMS; config.update wins when applied before backend init
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def gather_descriptors(n_images: int = 160, feats: int = 1024) -> np.ndarray:
    import jax.numpy as jnp

    from plvs_tpu.features import orb
    from plvs_tpu.geometry import cameras
    from plvs_tpu.io import synthetic

    cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320, height=240,
                          bf=24.0)
    out = []
    rng = np.random.default_rng(0)
    for i in range(n_images):
        seed = int(rng.integers(1 << 30))
        r = np.random.default_rng(seed)
        kind = i % 4
        if kind == 0:
            tex = synthetic.make_texture(1024, r)
        elif kind == 1:
            tex = synthetic.make_line_texture(1024, r)
        elif kind == 2:
            # mixed: lines over blobs
            tex = 0.5 * synthetic.make_texture(1024, r) \
                + 0.5 * synthetic.make_line_texture(1024, r)
        else:
            # band-limited noise (natural-image-like 1/f spectrum)
            white = r.normal(size=(1024, 1024)).astype(np.float32)
            f = np.fft.rfft2(white)
            fy = np.fft.fftfreq(1024)[:, None]
            fx = np.fft.rfftfreq(1024)[None, :]
            f = f / np.maximum(np.hypot(fy, fx), 1e-3)
            tex = np.fft.irfft2(f)
            tex = 127 + 80 * tex / np.abs(tex).max()
        scene = synthetic.SyntheticRGBD(cam, wall_z=float(r.uniform(2, 5)),
                                        texture=np.clip(tex, 0, 255),
                                        tex_scale=float(r.uniform(150, 400)))
        R = np.eye(3, dtype=np.float32)
        t = np.array([r.uniform(-0.3, 0.3), r.uniform(-0.3, 0.3), 0],
                     np.float32)
        gray, _ = scene.render(R, t)
        kp = orb.extract(jnp.asarray(gray, jnp.float32), feats, 4, 1.2)
        desc = np.asarray(kp.desc)[np.asarray(kp.mask)]
        out.append(desc.astype(np.uint32))
        if (i + 1) % 20 == 0:
            print(f"  {i + 1}/{n_images} images, "
                  f"{sum(len(d) for d in out)} descriptors", flush=True)
    return np.concatenate(out)


def main():
    from plvs_tpu.vocab import bow

    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=10_000,
                    choices=(10_000, 100_000))
    ap.add_argument("--images", type=int, default=0,
                    help="descriptor-source image count (0 = per-size default)")
    args = ap.parse_args()
    depth = 4 if args.words == 10_000 else 5
    n_images = args.images or (160 if args.words == 10_000 else 520)
    name = "voc_10k.npz" if args.words == 10_000 else "voc_100k.npz"

    t0 = time.time()
    print(f"extracting descriptors from {n_images} images ...", flush=True)
    desc = gather_descriptors(n_images)
    print(f"{len(desc)} descriptors in {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    print(f"training k=10 depth={depth} vocabulary ...", flush=True)
    voc = bow.train(desc, k=10, depth=depth, seed=0)
    print(f"trained in {time.time() - t0:.0f}s; {voc.n_words} words",
          flush=True)

    out = os.path.join(os.path.dirname(__file__), "..", "plvs_tpu", "vocab",
                       "data", name)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    voc.save(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()

"""Measure the VAE decode + device->host transfer tail on the real chip.

Compares, at the bench geometry (512x512, 27 latents -> 105 frames):
  A) monolithic: decode_video -> on-device uint8 -> one big np.asarray
  B) segmented overlap: decode_video_segmented(out_uint8=True) — every
     segment enqueued up front, host pulls segment k while device decodes k+1

This is NEXT.md item 5 ("overlap transfer with decode").  The transfer rides
the dev RPC tunnel here (~15 MB/s); on production hosts it is PCIe, so the
*ratio* matters more than the absolute seconds.

Usage: python scripts/bench_decode_overlap.py [--latents 27] [--size 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from stableavatar_tpu.config import VAEConfig
from stableavatar_tpu.models.vae import (
    decode_video,
    decode_video_segmented,
    init_vae,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--latents", type=int, default=27)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    cfg = VAEConfig()
    lh = lw = args.size // cfg.spatial_compression_ratio
    print(f"devices: {jax.devices()}")
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "astype") else x,
        init_vae(jax.random.PRNGKey(0), cfg),
    )
    rng = np.random.default_rng(0)
    z = jnp.asarray(
        rng.standard_normal((1, cfg.z_dim, args.latents, lh, lw)), jnp.bfloat16
    )
    n_frames = 1 + 4 * (args.latents - 1)
    nbytes = n_frames * args.size * args.size * 3
    print(f"{args.latents} latents -> {n_frames} frames @{args.size}^2 "
          f"({nbytes/1e6:.0f} MB uint8)")

    def run_mono():
        frames = decode_video(params, z, cfg)
        u8 = jnp.clip(
            jnp.round((frames.astype(jnp.float32) / 2.0 + 0.5) * 255.0), 0, 255
        ).astype(jnp.uint8)
        return np.asarray(u8)

    def run_seg():
        segs = decode_video_segmented(params, z, cfg, out_uint8=True)
        return np.concatenate([np.asarray(s) for s in segs], axis=2)

    # warm both (compile)
    a = run_mono()
    b = run_seg()
    d = np.abs(a.astype(np.int32) - b.astype(np.int32))
    # bf16 eps (2^-8) ~ one uint8 step, and the jitted segmented program
    # fuses differently than the eager monolithic path — a few LSB expected
    print(f"u8 diff: max={d.max()} mean={d.mean():.4f} "
          f">1LSB frac={(d > 1).mean():.2e}")

    for name, fn in (("monolithic", run_mono), ("segmented", run_seg)):
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:11s} decode+transfer: {best:7.2f} s "
              f"({n_frames/best:6.2f} fps end-to-end) all={['%.2f' % t for t in ts]}")


if __name__ == "__main__":
    main()

"""Causal 3D VAE: streaming parity against an independent torch oracle, plus
shape and roundtrip sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stableavatar_tpu.config import VAEConfig
from stableavatar_tpu.models.vae import (
    decode_video,
    encode_video,
    init_vae,
)

torch = pytest.importorskip("torch")

TINY = VAEConfig(
    dim=4,
    z_dim=2,
    dim_mult=(1, 2, 2),
    num_res_blocks=1,
    temporal_downsample=(False, True),
    temporal_compression_ratio=2,
    spatial_compression_ratio=4,
    latent_mean=(0.1, -0.2),
    latent_std=(1.5, 0.8),
)


@pytest.fixture(scope="module")
def setup():
    params = init_vae(jax.random.PRNGKey(0), TINY)
    from tests.vae_torch_oracle import Oracle

    params_np = jax.tree.map(np.asarray, params)
    return params, Oracle(params_np, TINY)


def test_encode_matches_oracle(setup):
    params, oracle = setup
    rng = np.random.default_rng(0)
    video = rng.standard_normal((1, 3, 9, 16, 16)).astype(np.float32)  # 1+4*2 frames

    with torch.no_grad():
        want = oracle.encode(torch.from_numpy(video)).numpy()

    got = np.asarray(encode_video(params, jnp.asarray(video), TINY))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_decode_matches_oracle(setup):
    params, oracle = setup
    rng = np.random.default_rng(1)
    # latent: 9 frames -> 1 + 2*2 = 5 latent frames at 2x temporal compression
    z = rng.standard_normal((1, 2, 5, 4, 4)).astype(np.float32)

    with torch.no_grad():
        want = oracle.decode(torch.from_numpy(z)).numpy()

    got = np.asarray(decode_video(params, jnp.asarray(z), TINY))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_encode_decode_shapes(setup):
    params, _ = setup
    video = jnp.zeros((1, 3, 9, 16, 16))
    z = encode_video(params, video, TINY)
    assert z.shape == (1, 2, 5, 4, 4)
    out = decode_video(params, z, TINY)
    assert out.shape == (1, 3, 9, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_single_frame_image(setup):
    """1-frame input (reference image path) must work: T = 1+4*0."""
    params, oracle = setup
    rng = np.random.default_rng(2)
    video = rng.standard_normal((1, 3, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = oracle.encode(torch.from_numpy(video)).numpy()
    got = np.asarray(encode_video(params, jnp.asarray(video), TINY))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_decode_grouping_invariance(setup):
    """Multi-frame-per-step decode must equal frame-by-frame decode (the
    2-frame causal cache makes chunk boundaries invisible)."""
    from stableavatar_tpu.models.vae import decode_chunks

    params, _ = setup
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((1, 6, 4, 4, 2)).astype(np.float32))

    ref = decode_chunks(params, z, TINY, frames_per_step=1)
    for g in (2, 3, 4):
        got = decode_chunks(params, z, TINY, frames_per_step=g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_encode_grouping_invariance(setup):
    """Grouped encode chunks must equal chunk-by-chunk encode."""
    from stableavatar_tpu.models.vae import encode_chunks

    params, _ = setup
    rng = np.random.default_rng(4)
    video = jnp.asarray(rng.standard_normal((1, 17, 16, 16, 3)).astype(np.float32))

    mu_ref, lv_ref = encode_chunks(params, video, TINY, chunks_per_step=1)
    for g in (2, 3, 4):
        mu, lv = encode_chunks(params, video, TINY, chunks_per_step=g)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), rtol=1e-4, atol=1e-5)


def test_decode_segmented_matches_monolithic(setup):
    """Segmented streaming decode (`decode_video_segmented`) must concatenate
    to exactly `decode_video` — the conv caches carried across segments make
    segment boundaries invisible; also checks the on-device uint8 path."""
    from stableavatar_tpu.models.vae import decode_video, decode_video_segmented

    params, _ = setup
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.standard_normal((1, 2, 7, 4, 4)).astype(np.float32))

    ref = np.asarray(decode_video(params, z, TINY, frames_per_step=2))
    for seg in (1, 2, 3, 7, 10):
        segs = decode_video_segmented(
            params, z, TINY, segment_latents=seg, frames_per_step=2
        )
        got = np.concatenate([np.asarray(s) for s in segs], axis=2)
        # jit-vs-eager fusion rounding only (same tolerance as grouping test)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    ref_u8 = np.clip(
        np.round((ref.astype(np.float32) / 2.0 + 0.5) * 255.0), 0, 255
    ).astype(np.uint8)
    segs_u8 = decode_video_segmented(
        params, z, TINY, segment_latents=3, frames_per_step=2, out_uint8=True
    )
    got_u8 = np.concatenate([np.asarray(s) for s in segs_u8], axis=2)
    assert got_u8.dtype == np.uint8
    # float rounding at segment boundaries can differ by 1 LSB at most
    assert np.abs(got_u8.astype(np.int32) - ref_u8.astype(np.int32)).max() <= 1

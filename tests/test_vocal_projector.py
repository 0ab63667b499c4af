"""Vocal projector: window-split math vs the reference formulas, shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stableavatar_tpu.config import WAN_1_3B, DiTConfig
from stableavatar_tpu.models.vocal_projector import (
    apply_vocal_projector,
    init_vocal_projector,
    split_audio_sequence,
    split_windows,
    window_plan,
)

torch = pytest.importorskip("torch")


def _reference_split(input_tensor, pos_idx_ranges, expand_length=0):
    """Faithful numpy port of reference `split_tensor_with_padding`
    (`wan/models/vocal_projector_fantasy.py:81-131`) used as test oracle."""
    import torch.nn.functional as F

    pos_idx_ranges = [[r[0] - expand_length, r[1] + expand_length] for r in pos_idx_ranges]
    sub_sequences = []
    seq_len = input_tensor.size(1)
    max_valid_idx = seq_len - 1
    k_lens_list = []
    for start, end in pos_idx_ranges:
        pad_front = max(-start, 0)
        pad_back = max(end - max_valid_idx, 0)
        valid_start = max(start, 0)
        valid_end = min(end, max_valid_idx)
        if valid_start <= valid_end:
            valid_part = input_tensor[:, valid_start : valid_end + 1, :]
        else:
            valid_part = input_tensor.new_zeros((1, 0, input_tensor.size(2)))
        padded = F.pad(valid_part, (0, 0, 0, pad_back + pad_front, 0, 0))
        k_lens_list.append(padded.size(-2) - pad_back - pad_front)
        sub_sequences.append(padded)
    return torch.stack(sub_sequences, dim=1), torch.tensor(k_lens_list)


@pytest.mark.parametrize("audio_len,num_frames", [(134, 81), (173, 81), (101, 81), (81, 81), (105, 81)])
def test_split_windows_matches_reference(audio_len, num_frames):
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((1, audio_len, 4)).astype(np.float32)

    ranges = split_audio_sequence(audio_len, num_frames)
    want, want_klens = _reference_split(torch.from_numpy(audio), ranges, expand_length=4)

    got, got_klens = split_windows(jnp.asarray(audio), num_frames, expand=4)

    assert got.shape == tuple(want.shape), (got.shape, tuple(want.shape))
    np.testing.assert_array_equal(np.asarray(got_klens), want_klens.numpy())
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-6, atol=1e-6)


def test_split_windows_frame_count():
    _, _, k_lens, _ = window_plan(134, 81)
    assert k_lens.shape[0] == 21  # (81-1)//4 + 1 latent frames


def test_vocal_projector_shapes():
    cfg = DiTConfig(
        dim=64, ffn_dim=128, num_heads=4, num_layers=2,
        audio_proj_dim=64, vocal_num_heads=4,
    )
    key = jax.random.PRNGKey(0)
    params = init_vocal_projector(key, cfg)

    b, f = 1, 21
    tokens_per_frame = 16
    audio = jax.random.normal(key, (b, 134, cfg.audio_in_dim))
    latents = jax.random.normal(key, (b, f * tokens_per_frame, cfg.dim))
    e0 = jax.random.normal(key, (b, 6, cfg.audio_proj_dim))
    e = jax.random.normal(key, (b, cfg.audio_proj_dim))

    ctx, k_lens = apply_vocal_projector(params, cfg, audio, latents, e0, e, 81)
    assert ctx.shape[0] == b and ctx.shape[1] == f
    assert ctx.shape[3] == cfg.audio_proj_dim
    assert k_lens.shape == (f,)
    assert np.isfinite(np.asarray(ctx)).all()


def test_vocal_projector_14b_proj_variant():
    cfg = DiTConfig(
        dim=64, ffn_dim=128, num_heads=4, num_layers=2,
        audio_proj_dim=64, audio_proj_hidden=32, vocal_num_heads=4,
    )
    key = jax.random.PRNGKey(1)
    params = init_vocal_projector(key, cfg)
    assert "fc1" in params["proj"] and "norm1" in params["proj"]

    audio = jax.random.normal(key, (1, 134, cfg.audio_in_dim))
    latents = jax.random.normal(key, (1, 21 * 16, cfg.dim))
    e0 = jax.random.normal(key, (1, 6, cfg.audio_proj_dim))
    e = jax.random.normal(key, (1, cfg.audio_proj_dim))
    ctx, _ = apply_vocal_projector(params, cfg, audio, latents, e0, e, 81)
    assert np.isfinite(np.asarray(ctx)).all()

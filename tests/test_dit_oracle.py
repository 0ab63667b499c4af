"""Full DiT forward parity against an independent torch oracle (tiny dims,
nonzero vocal branch weights so every path is exercised)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stableavatar_tpu.config import DiTConfig
from stableavatar_tpu.models.dit import dit_forward, init_dit

torch = pytest.importorskip("torch")

CFG = DiTConfig(
    dim=48,
    ffn_dim=96,
    freq_dim=32,
    text_dim=40,
    num_heads=4,
    num_layers=2,
    text_len=12,
    clip_tokens=7,
    clip_dim=24,
    audio_in_dim=16,
    audio_proj_dim=48,
    vocal_num_heads=4,
)


def test_dit_forward_matches_torch_oracle():
    key = jax.random.PRNGKey(0)
    params = init_dit(key, CFG)
    # make the zero-init vocal branch nonzero so it's actually tested
    kb = jax.random.split(key, 2)
    params["blocks"]["cross_attn"]["k_vocal"]["w"] = (
        jax.random.normal(kb[0], params["blocks"]["cross_attn"]["k_vocal"]["w"].shape) * 0.1
    )
    params["blocks"]["cross_attn"]["v_vocal"]["w"] = (
        jax.random.normal(kb[1], params["blocks"]["cross_attn"]["v_vocal"]["w"].shape) * 0.1
    )

    rng = np.random.default_rng(0)
    b, f, h, w = 2, 3, 8, 8
    x = rng.standard_normal((b, 16, f, h, w)).astype(np.float32)
    t = np.array([100.0, 700.0], dtype=np.float32)
    text = rng.standard_normal((b, CFG.text_len, CFG.text_dim)).astype(np.float32)
    clip_fea = rng.standard_normal((b, CFG.clip_tokens, CFG.clip_dim)).astype(np.float32)
    y = rng.standard_normal((b, 20, f, h, w)).astype(np.float32)
    vocal = rng.standard_normal((b, 20, CFG.audio_in_dim)).astype(np.float32)

    got = dit_forward(
        params, CFG,
        jnp.asarray(x), jnp.asarray(t), jnp.asarray(text), jnp.asarray(clip_fea),
        jnp.asarray(y), jnp.asarray(vocal), video_sample_n_frames=9,
    )

    from tests.dit_torch_oracle import DiTOracle

    oracle = DiTOracle(params, CFG)
    with torch.no_grad():
        want = oracle.forward(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(text),
            torch.from_numpy(clip_fea), torch.from_numpy(y),
            torch.from_numpy(vocal), 9,
        ).numpy()

    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=5e-3)

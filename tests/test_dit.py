"""DiT backbone: shapes, patch-embed equivalence with Conv3d, zero-init audio
branch neutrality, CFG tiling path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stableavatar_tpu.config import DiTConfig
from stableavatar_tpu.models.dit import (
    dit_forward,
    init_dit,
    patchify,
    unpatchify,
)
from stableavatar_tpu.models.vocal_projector import apply_linear

torch = pytest.importorskip("torch")

TINY = DiTConfig(
    dim=48,
    ffn_dim=96,
    freq_dim=32,
    text_dim=64,
    num_heads=4,
    num_layers=2,
    text_len=16,
    clip_tokens=9,
    clip_dim=40,
    audio_proj_dim=48,
    vocal_num_heads=4,
)


def _tiny_inputs(key, b=1, f=3, h=8, w=8):
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (b, 16, f, h, w))
    t = jnp.full((b,), 500.0)
    text = jax.random.normal(ks[1], (b, TINY.text_len, TINY.text_dim))
    clip = jax.random.normal(ks[2], (b, TINY.clip_tokens, TINY.clip_dim))
    y = jax.random.normal(ks[3], (b, 20, f, h, w))
    audio = jax.random.normal(ks[4], (b, 20, TINY.audio_in_dim))
    return x, t, text, clip, y, audio


def test_dit_forward_shape():
    key = jax.random.PRNGKey(0)
    params = init_dit(key, TINY)
    x, t, text, clip, y, audio = _tiny_inputs(key)
    out = dit_forward(params, TINY, x, t, text, clip, y, audio, video_sample_n_frames=9)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_dit_zero_init_audio_branch_is_neutral():
    """k_vocal/v_vocal are zero-init -> output must not depend on audio."""
    key = jax.random.PRNGKey(1)
    params = init_dit(key, TINY)
    x, t, text, clip, y, audio = _tiny_inputs(key)
    out1 = dit_forward(params, TINY, x, t, text, clip, y, audio, video_sample_n_frames=9)
    out2 = dit_forward(params, TINY, x, t, text, clip, y, audio * 100.0, video_sample_n_frames=9)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-5)


def test_dit_cfg_tile_path():
    key = jax.random.PRNGKey(2)
    params = init_dit(key, TINY)
    x, t, text, clip, y, audio = _tiny_inputs(key, b=3)
    out = dit_forward(
        params, TINY, x, t, text, clip, y, audio,
        video_sample_n_frames=9, vocal_cfg_tile=True,
    )
    assert out.shape == x.shape


def test_patchify_matches_conv3d():
    """Patch embedding as reshape+matmul == Conv3d(kernel=stride=patch)."""
    rng = np.random.default_rng(0)
    b, c, f, h, w = 2, 5, 3, 8, 6
    patch = (1, 2, 2)
    dim = 7
    x = rng.standard_normal((b, c, f, h, w)).astype(np.float32)
    wt = rng.standard_normal((dim, c, *patch)).astype(np.float32)
    bias = rng.standard_normal(dim).astype(np.float32)

    conv = torch.nn.Conv3d(c, dim, kernel_size=patch, stride=patch)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(wt))
        conv.bias.copy_(torch.from_numpy(bias))
    want = conv(torch.from_numpy(x)).detach()  # [b, dim, f, h/2, w/2]
    want = want.flatten(2).transpose(1, 2).numpy()  # [b, L, dim]

    p = {"w": jnp.asarray(wt.reshape(dim, -1).T), "b": jnp.asarray(bias)}
    got = apply_linear(p, patchify(jnp.asarray(x), patch))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_unpatchify_roundtrip():
    rng = np.random.default_rng(1)
    b, cdim, f, h, w = 1, 16, 3, 4, 4
    patch = (1, 2, 2)
    vid = rng.standard_normal((b, cdim, f, h * 2, w * 2)).astype(np.float32)

    # patchify emits channel-major patches (C, pt, ph, pw) to match the Conv3d
    # weight layout; unpatchify consumes the head's (pt, ph, pw, C) layout
    # (reference einsum 'fhwpqrc->cfphqwr', :1161-1184) — transpose between.
    tokens = patchify(jnp.asarray(vid), patch)  # [b, L, c*pt*ph*pw]
    L = tokens.shape[1]
    pt, ph, pw = patch
    tokens = tokens.reshape(b, L, cdim, pt * ph * pw).transpose(0, 1, 3, 2).reshape(b, L, -1)
    back = unpatchify(tokens, (f, h, w), patch, cdim)
    np.testing.assert_allclose(np.asarray(back), vid, rtol=1e-6)


def test_clip_level_modeling_equivalent_to_global_attention():
    """Clip-level mode: single global vocal pass must equal the per-frame
    grouping with identical (broadcast) kv — attention is per-query."""
    key = jax.random.PRNGKey(3)
    params = init_dit(key, TINY)
    x, t, text, clip, y, audio = _tiny_inputs(key)
    out_clip = dit_forward(
        params, TINY, x, t, text, clip, y, audio,
        video_sample_n_frames=9, is_clip_level_modeling=True,
    )
    assert out_clip.shape == x.shape
    assert np.isfinite(np.asarray(out_clip)).all()


def test_wan_14b_shapes_compile():
    """WAN_14B config is shape-consistent end to end (eval_shape: no FLOPs,
    no memory — validates the 14B wiring incl. the 2-stage vocal proj)."""
    from stableavatar_tpu.config import WAN_14B

    def build_and_run():
        key = jax.random.PRNGKey(0)
        params = init_dit(key, WAN_14B)
        b, f, h, w = 1, 21, 8, 8
        x = jnp.zeros((b, 16, f, h, w))
        t = jnp.zeros((b,))
        text = jnp.zeros((b, WAN_14B.text_len, WAN_14B.text_dim))
        clip = jnp.zeros((b, WAN_14B.clip_tokens, WAN_14B.clip_dim))
        y = jnp.zeros((b, 20, f, h, w))
        audio = jnp.zeros((b, 167, WAN_14B.audio_in_dim))
        return dit_forward(params, WAN_14B, x, t, text, clip, y, audio)

    out = jax.eval_shape(build_and_run)
    assert out.shape == (1, 16, 21, 8, 8)

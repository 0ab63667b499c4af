"""Host-streamed (sequential-offload) DiT forward == in-memory forward.

The streamed path (`models/streaming.py`) exists to run 14B on a 16 GB
chip (reference `sequential_cpu_offload`, `inference.py:513-524`); its
correctness contract is exact agreement with the in-memory `dit_forward`
— same prologue/block/head functions, only the weight residency differs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stableavatar_tpu.config import DiTConfig
from stableavatar_tpu.models.dit import cast_params, dit_forward, init_dit
from stableavatar_tpu.models.streaming import StreamedDiT, split_streaming_params

TINY = DiTConfig(
    dim=48,
    ffn_dim=96,
    freq_dim=32,
    text_dim=64,
    num_heads=4,
    num_layers=3,
    text_len=16,
    clip_tokens=9,
    clip_dim=40,
    audio_proj_dim=48,
    vocal_num_heads=4,
)


def _inputs(key, b=3, f=3, h=8, w=8):
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (b, 16, f, h, w), jnp.float32)
    t = jnp.full((b,), 500.0)
    text = jax.random.normal(ks[1], (b, TINY.text_len, TINY.text_dim))
    clip = jax.random.normal(ks[2], (b, TINY.clip_tokens, TINY.clip_dim))
    y = jax.random.normal(ks[3], (b, 20, f, h, w))
    audio = jax.random.normal(ks[4], (1, 20, TINY.audio_in_dim))
    return x, t, text, clip, y, audio


def test_split_streaming_params_partition():
    params = init_dit(jax.random.PRNGKey(0), TINY)
    resident, host_blocks = split_streaming_params(params)
    assert "blocks" not in resident
    assert len(host_blocks) == TINY.num_layers
    # per-layer leaves are host numpy with the layer axis stripped
    w0 = host_blocks[0]["self_attn"]["q"]["w"]
    assert isinstance(w0, np.ndarray)
    assert w0.shape == (TINY.dim, TINY.dim)


@pytest.mark.parametrize("return_residual", [False, True])
def test_streamed_equals_in_memory(return_residual):
    key = jax.random.PRNGKey(1)
    params = init_dit(key, TINY)  # f32: tight comparison
    x, t, text, clip, y, audio = _inputs(jax.random.PRNGKey(2))

    ref = dit_forward(
        params, TINY, x, t, text, clip, y, audio,
        video_sample_n_frames=9, vocal_cfg_tile=True,
        return_residual=return_residual,
    )
    sdit = StreamedDiT(params, TINY)
    out = sdit(
        x, t, text, clip, y, audio,
        video_sample_n_frames=9, vocal_cfg_tile=True,
        return_residual=return_residual,
    )
    if return_residual:
        ref, ref_res = ref
        out, out_res = out
        np.testing.assert_allclose(
            np.asarray(out_res), np.asarray(ref_res), rtol=1e-5, atol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_streamed_equals_in_memory_fastpath():
    """Streaming composes with the prepared fast path (int8-stored weights
    halve the per-layer H2D traffic)."""
    from stableavatar_tpu.utils.fastpath import prepare_fast_params

    key = jax.random.PRNGKey(3)
    params = cast_params(init_dit(key, TINY), jnp.bfloat16)
    prepared = prepare_fast_params(params, TINY, quant="store")
    x, t, text, clip, y, audio = _inputs(jax.random.PRNGKey(4))
    x = x.astype(jnp.bfloat16)

    ref = dit_forward(
        prepared, TINY, x, t, text, clip, y, audio,
        video_sample_n_frames=9, vocal_cfg_tile=True, rope_split=True,
    )
    sdit = StreamedDiT(prepared, TINY, rope_split=True)
    out = sdit(
        x, t, text, clip, y, audio,
        video_sample_n_frames=9, vocal_cfg_tile=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_streamed_pipeline_matches_in_memory():
    """generate_long with models.streamed_dit set == the jitted-sweep path
    (euler, multiple windows with overlap blending)."""
    from stableavatar_tpu.pipelines.long import generate_long
    from tests.test_pipeline import make_tiny_models

    models = make_tiny_models()
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(18 * 640).astype(np.float32) * 0.1
    ref_image = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)

    kwargs = dict(
        ref_image=ref_image, vocal_waveform=wav, prompt="a person talking",
        num_inference_steps=2, clip_length=9, overlap_window_length=1,
        seed=7, output_type="latent",
    )
    ref = generate_long(models, **kwargs)

    models.streamed_dit = StreamedDiT(
        models.dit_params, models.dit_cfg,
        rope_split=models.rope_split, attn_quant=models.attn_quant,
        honor_vocal_k_lens=models.honor_vocal_k_lens,
    )
    out = generate_long(models, **kwargs)
    np.testing.assert_allclose(
        np.asarray(out.latents), np.asarray(ref.latents), rtol=3e-2, atol=3e-2
    )


def test_streamed_pipeline_rejects_unsupported_modes():
    from stableavatar_tpu.pipelines.long import generate_long
    from tests.test_pipeline import make_tiny_models

    models = make_tiny_models()
    models.streamed_dit = StreamedDiT(models.dit_params, models.dit_cfg)
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(18 * 640).astype(np.float32)
    ref_image = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    with pytest.raises(ValueError, match="sequential"):
        generate_long(
            models, ref_image=ref_image, vocal_waveform=wav,
            prompt="x", num_inference_steps=2, clip_length=9,
            overlap_window_length=1, scheduler="unipc",
        )


def test_plan_windows_rejects_oversized_overlap():
    """overlap >= window would never terminate (reference `:784` advances by
    frames_per_batch - overlap); we raise instead."""
    from stableavatar_tpu.pipelines.long import plan_windows

    with pytest.raises(ValueError, match="overlap"):
        plan_windows(10, 3, 15)

"""Fast-path numerics: split-pair rope permutation, fused-rope flash kernel,
int8 attention quant, W8A8 linears, prepared-params DiT forward parity."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stableavatar_tpu.ops.attention import attention
from stableavatar_tpu.ops.rope import (
    pack_split,
    rope_apply,
    rope_apply_split,
    rope_freqs_3d,
    split_pair_permutation,
)


def _interp(fa):
    orig = fa.pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    return mock.patch.object(fa.pl, "pallas_call", interp_call)


def test_split_permutation_preserves_attention():
    """Joint q/k channel permutation + split rope == interleaved rope, as
    attention inputs (logits invariant under joint head-dim permutation)."""
    rng = np.random.default_rng(0)
    b, l, n, d = 2, 48, 2, 24
    grid = (4, 4, 3)
    q = rng.standard_normal((b, l, n, d)).astype(np.float32)
    k = rng.standard_normal((b, l, n, d)).astype(np.float32)
    v = jnp.asarray(rng.standard_normal((b, l, n, d)).astype(np.float32))

    freqs = rope_freqs_3d(grid, d)
    q_ref = rope_apply(jnp.asarray(q), freqs)
    k_ref = rope_apply(jnp.asarray(k), freqs)
    want = attention(q_ref.astype(v.dtype), k_ref.astype(v.dtype), v, backend="xla")

    perm = split_pair_permutation(d, n)
    # the permutation is defined over flattened head channels [n*d]
    qp = q.reshape(b, l, n * d)[..., perm].reshape(b, l, n, d)
    kp = k.reshape(b, l, n * d)[..., perm].reshape(b, l, n, d)
    packed = pack_split(freqs)
    got = attention(
        jnp.asarray(qp), jnp.asarray(kp), v, backend="xla", rope=packed
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_kernel_fused_rope_matches_xla():
    """Pallas kernel with in-kernel rope == XLA attention with out-of-kernel
    split rope (interpret mode)."""
    from stableavatar_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(1)
    b, l, n, d = 2, 256, 2, 64
    q = jnp.asarray(rng.standard_normal((b, l, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, n, d)).astype(np.float32))
    freqs = rope_freqs_3d((4, 8, 8), d)
    packed = pack_split(freqs)

    with _interp(fa):
        got = fa.flash_attention(q, k, v, rope=packed, block_q=128, block_k=128)

    qr = rope_apply_split(q, packed).astype(q.dtype)
    kr = rope_apply_split(k, packed).astype(k.dtype)
    want = attention(qr, kr, v, backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_flash_kernel_fused_rope_backward():
    """VJP through the fused-rope kernel == VJP through out-of-kernel rope +
    XLA attention (the rotation is orthogonal, inverted on dq/dk)."""
    from stableavatar_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(2)
    b, l, n, d = 1, 256, 2, 64
    q = jnp.asarray(rng.standard_normal((b, l, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, n, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, l, n, d)).astype(np.float32))
    freqs = rope_freqs_3d((4, 8, 8), d)
    packed = pack_split(freqs)

    with _interp(fa):
        def f(q, k, v):
            return fa.flash_attention(q, k, v, rope=packed, block_q=128, block_k=128)

        out, vjp = jax.vjp(f, q, k, v)
        dq, dk, dv = vjp(g)

    def f_ref(q, k, v):
        qr = rope_apply_split(q, packed)
        kr = rope_apply_split(k, packed)
        return jax.nn.dot_product_attention(qr, kr, v, implementation="xla")

    out_r, vjp_r = jax.vjp(f_ref, q, k, v)
    dq_r, dk_r, dv_r = vjp_r(g)

    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("quant", ["qk", "qkpv"])
def test_flash_kernel_int8_quant_accuracy(quant):
    """int8 QK (and PV) attention vs full precision: per-token/per-channel
    dynamic scales keep relative error small (interpret mode)."""
    from stableavatar_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(3)
    b, lq, lk, n, d = 2, 256, 384, 2, 64
    q = jnp.asarray(rng.standard_normal((b, lq, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, lk, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, lk, n, d)).astype(np.float32))
    k_lens = jnp.array([300, 384], dtype=jnp.int32)

    with _interp(fa):
        got = fa.flash_attention(
            q, k, v, k_lens=k_lens, quant=quant, block_q=128, block_k=128
        )
    want = attention(q, k, v, k_lens=k_lens, backend="xla")

    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    rel = np.linalg.norm(g - w) / np.linalg.norm(w)
    # per-(batch,head)-slab scales on raw gaussians (the worst case — the
    # DiT q/k are RMS-normalized before the kernel) stay under ~2%
    assert rel < (0.02 if quant == "qk" else 0.03), rel
    # and per-element errors are bounded
    assert np.max(np.abs(g - w)) < 0.3


@pytest.mark.parametrize("quant", ["qk", "qkv"])
def test_flash_kernel_static_max_matches_online(quant):
    """Static-bound softmax (STATIC_MAX lever) == online-max int8 kernel:
    softmax is shift-invariant for any bound >= rowmax, so the two paths
    must agree to float rounding; k_lens masking and LSE must also hold."""
    from stableavatar_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(5)
    b, lq, lk, n, d = 2, 256, 384, 2, 64
    q = jnp.asarray(rng.standard_normal((b, lq, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, lk, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, lk, n, d)).astype(np.float32))
    k_lens = jnp.array([300, 384], dtype=jnp.int32)

    with _interp(fa):
        got = fa.flash_attention(
            q, k, v, k_lens=k_lens, quant=quant, block_q=128, block_k=128,
            static_max=True,
        )
        want = fa.flash_attention(
            q, k, v, k_lens=k_lens, quant=quant, block_q=128, block_k=128,
            static_max=False,
        )
        got_o, got_lse = fa.flash_attention_with_stats(
            q, k, v, k_lens=k_lens, quant=quant, block_q=128, block_k=128,
            static_max=True,
        )
        _, want_lse = fa.flash_attention_with_stats(
            q, k, v, k_lens=k_lens, quant=quant, block_q=128, block_k=128,
            static_max=False,
        )
    g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
    np.testing.assert_allclose(g, w, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(got_o, np.float32), g, rtol=2e-3, atol=2e-3
    )
    # LSE contract (backward / ring-merge input) is bound-independent
    np.testing.assert_allclose(
        np.asarray(got_lse, np.float32), np.asarray(want_lse, np.float32),
        rtol=1e-4, atol=1e-4,
    )


def test_flash_kernel_int8_quant_with_rope():
    """rope fusion composes with int8 quant."""
    from stableavatar_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(4)
    b, l, n, d = 1, 256, 2, 64
    q = jnp.asarray(rng.standard_normal((b, l, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, n, d)).astype(np.float32))
    packed = pack_split(rope_freqs_3d((4, 8, 8), d))

    with _interp(fa):
        got = fa.flash_attention(
            q, k, v, rope=packed, quant="qkpv", block_q=128, block_k=128
        )
    qr = rope_apply_split(q, packed).astype(q.dtype)
    kr = rope_apply_split(k, packed).astype(k.dtype)
    want = attention(qr, kr, v, backend="xla")
    g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
    assert np.linalg.norm(g - w) / np.linalg.norm(w) < 0.04


def test_w8a8_linear_accuracy():
    from stableavatar_tpu.models.vocal_projector import apply_linear
    from stableavatar_tpu.utils.quantization import quantize_weight_for_compute

    rng = np.random.default_rng(5)
    din, dout = 96, 160
    w = rng.standard_normal((din, dout)).astype(np.float32) * 0.05
    b = rng.standard_normal((dout,)).astype(np.float32) * 0.01
    x = jnp.asarray(rng.standard_normal((4, 32, din)).astype(np.float32))

    p = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    want = np.asarray(apply_linear(p, x))
    p8 = {"w8": quantize_weight_for_compute(p["w"]), "b": p["b"]}
    got = np.asarray(apply_linear(p8, x))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.01, rel


def test_w8a8_stacked_weights_scan_sliceable():
    """Stacked [layers, d_in, d_out] weights quantize per layer and slice
    correctly under scan-style indexing."""
    from stableavatar_tpu.utils.quantization import (
        int8_linear,
        quantize_weight_for_compute,
    )

    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.standard_normal((3, 16, 24)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((5, 16)).astype(np.float32))
    w8 = quantize_weight_for_compute(w)
    for i in range(3):
        sliced = {"q": w8["q"][i], "s": w8["s"][i]}
        got = np.asarray(int8_linear(x, sliced))
        want = np.asarray(x @ w[i])
        assert np.linalg.norm(got - want) / np.linalg.norm(want) < 0.02


def _tiny_cfg():
    from stableavatar_tpu.config import DiTConfig

    return DiTConfig(
        dim=64, ffn_dim=128, num_heads=4, num_layers=2,
        audio_proj_dim=64, vocal_num_heads=4,
    )


def _tiny_inputs(cfg, rng):
    b, f, lh, lw = 2, 5, 4, 4
    la = 40
    x = jnp.asarray(rng.standard_normal((b, 16, f, lh, lw)).astype(np.float32))
    t = jnp.full((b,), 500.0, jnp.float32)
    text = jnp.asarray(
        rng.standard_normal((b, cfg.text_len, cfg.text_dim)).astype(np.float32)
    )
    clip_fea = jnp.asarray(
        rng.standard_normal((b, cfg.clip_tokens, cfg.clip_dim)).astype(np.float32)
    )
    y = jnp.asarray(rng.standard_normal((b, 20, f, lh, lw)).astype(np.float32))
    vocal = jnp.asarray(
        rng.standard_normal((b, la, cfg.audio_in_dim)).astype(np.float32)
    )
    return x, t, text, clip_fea, y, vocal


def _densify(params):
    """Replace the zero-init head/vocal weights (init parity with the
    reference) by random values so forward outputs are nonzero and every
    branch is numerically exercised."""
    for name, key, scale in [
        (("head", "head"), 10, 0.05),
        (("blocks", "cross_attn", "k_vocal"), 11, 0.1),
        (("blocks", "cross_attn", "v_vocal"), 12, 0.1),
    ]:
        node = params
        for part in name:
            node = node[part]
        node["w"] = jax.random.normal(jax.random.PRNGKey(key), node["w"].shape) * scale
    return params


def test_prepared_params_rope_split_forward_parity():
    """prepare_fast_params(quant=False) + rope_split=True == vanilla forward
    (exact up to fp reassociation)."""
    from stableavatar_tpu.models.dit import dit_forward, init_dit
    from stableavatar_tpu.utils.fastpath import prepare_fast_params

    cfg = _tiny_cfg()
    rng = np.random.default_rng(7)
    params = _densify(init_dit(jax.random.PRNGKey(0), cfg))
    inputs = _tiny_inputs(cfg, rng)

    want = dit_forward(params, cfg, *inputs, video_sample_n_frames=17)
    fast = prepare_fast_params(params, cfg, quant=False)
    got = dit_forward(fast, cfg, *inputs, video_sample_n_frames=17, rope_split=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_prepared_params_quant_forward_close():
    """Full fast path (rope_split + W8A8 linears) stays close to the bf16
    reference forward on random weights."""
    from stableavatar_tpu.models.dit import dit_forward, init_dit
    from stableavatar_tpu.utils.fastpath import prepare_fast_params

    cfg = _tiny_cfg()
    rng = np.random.default_rng(8)
    params = _densify(init_dit(jax.random.PRNGKey(3), cfg))
    inputs = _tiny_inputs(cfg, rng)

    want = np.asarray(dit_forward(params, cfg, *inputs, video_sample_n_frames=17))
    fast = prepare_fast_params(params, cfg, quant=True)
    got = np.asarray(
        dit_forward(fast, cfg, *inputs, video_sample_n_frames=17, rope_split=True)
    )
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.03, rel


def test_prepared_params_store_quant_forward_close():
    """quant='store' (the model_cpu_offload_and_qfloat8 memory mode): int8
    weight STORAGE with bf16 compute.  Structure carries dequant-dispatch
    'w' dicts (no W8A8 'w8' leaves) and the forward tracks the bf16
    reference more tightly than W8A8 (weight-rounding error only), matching
    the reference's fp8-storage-with-autocast semantics
    (wan/utils/fp8_optimization.py:28-56)."""
    from stableavatar_tpu.models.dit import dit_forward, init_dit
    from stableavatar_tpu.utils.fastpath import prepare_fast_params

    cfg = _tiny_cfg()
    rng = np.random.default_rng(9)
    params = _densify(init_dit(jax.random.PRNGKey(5), cfg))
    inputs = _tiny_inputs(cfg, rng)

    stored = prepare_fast_params(params, cfg, quant="store")
    ffn = stored["blocks"]["ffn"]["fc1"]
    assert "w8" not in ffn and isinstance(ffn["w"], dict)
    assert ffn["w"]["q"].dtype == jnp.int8

    want = np.asarray(dit_forward(params, cfg, *inputs, video_sample_n_frames=17))
    got = np.asarray(
        dit_forward(stored, cfg, *inputs, video_sample_n_frames=17, rope_split=True)
    )
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.015, rel


def test_generate_long_fast_path_close_to_baseline():
    """The whole long pipeline with prepared params (rope_split + W8A8)
    stays close to the bf16 pipeline — catches fast-path wiring bugs in the
    jitted sweep step."""
    from tests.test_pipeline import tiny_models  # noqa: F401 (fixture import)
    import pytest

    pytest.importorskip("numpy")
    from stableavatar_tpu.pipelines.long import generate_long
    from stableavatar_tpu.utils.fastpath import prepare_fast_params

    # build tiny models directly (fixture is module-scoped elsewhere)
    from tests.test_pipeline import (
        CLIP_E2E, DIT_E2E, T5_E2E, VAE_E2E, W2V_E2E,
    )
    from stableavatar_tpu.models.clip import init_clip_visual
    from stableavatar_tpu.models.dit import init_dit
    from stableavatar_tpu.models.t5 import init_t5
    from stableavatar_tpu.models.vae import init_vae
    from stableavatar_tpu.models.wav2vec import init_wav2vec2
    from stableavatar_tpu.pipelines.common import WanModels

    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    base = dict(
        vae_params=init_vae(ks[1], VAE_E2E), vae_cfg=VAE_E2E,
        t5_params=init_t5(ks[2], T5_E2E), t5_cfg=T5_E2E,
        clip_params=init_clip_visual(ks[3], CLIP_E2E), clip_cfg=CLIP_E2E,
        wav2vec_params=init_wav2vec2(ks[4], W2V_E2E), wav2vec_cfg=W2V_E2E,
    )
    dit_params = init_dit(ks[0], DIT_E2E)
    dit_params["head"]["head"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(9),
                          dit_params["head"]["head"]["w"].shape) * 0.05
    )

    rng = np.random.default_rng(2)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    wav = rng.standard_normal(14 * 640).astype(np.float32) * 0.1
    text_ctx = jnp.asarray(
        rng.standard_normal((3, DIT_E2E.text_len, DIT_E2E.text_dim)), jnp.float32
    )
    kw = dict(ref_image=ref, vocal_waveform=wav, text_ctx=text_ctx,
              num_inference_steps=2, clip_length=9, overlap_window_length=1,
              seed=3, output_type="latent")

    models = WanModels(dit_params=dit_params, dit_cfg=DIT_E2E, **base)
    want = np.asarray(generate_long(models, **kw).latents, np.float32)

    fast = WanModels(
        dit_params=prepare_fast_params(dit_params, DIT_E2E, quant=True),
        dit_cfg=DIT_E2E, rope_split=True, attn_quant="qk", **base,
    )
    got = np.asarray(generate_long(fast, **kw).latents, np.float32)

    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.05, rel

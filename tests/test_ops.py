"""Unit tests for core ops: norms, embeddings, RoPE, attention.

Golden values come from tiny torch-CPU replicas of the reference formulas
(reference file:line cited per test) — not from the reference repo itself.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stableavatar_tpu.ops import (
    attention,
    layer_norm,
    rms_norm,
    rope_apply,
    rope_freqs_3d,
    sinusoidal_embedding_1d,
)
from stableavatar_tpu.ops.norms import t5_rms_norm

torch = pytest.importorskip("torch")


def test_rms_norm_matches_torch():
    # WanRMSNorm: x * rsqrt(mean(x^2) + eps) * weight  (ref :326-342)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    eps = 1e-5

    tx = torch.from_numpy(x)
    expected = (tx * torch.rsqrt(tx.pow(2).mean(-1, keepdim=True) + eps)) * torch.from_numpy(w)

    got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=eps)
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 7, 12)).astype(np.float32)
    w = rng.standard_normal(12).astype(np.float32)
    b = rng.standard_normal(12).astype(np.float32)

    expected = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (12,), torch.from_numpy(w), torch.from_numpy(b), eps=1e-6
    ).numpy()
    got = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)

    # affine-free variant (WanLayerNorm default, ref :345-355)
    expected = torch.nn.functional.layer_norm(torch.from_numpy(x), (12,), eps=1e-6).numpy()
    got = layer_norm(jnp.asarray(x), eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


def test_t5_rms_norm_matches_torch():
    # T5LayerNorm (wan_text_encoder.py:44-56)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 8)).astype(np.float32)
    w = rng.standard_normal(8).astype(np.float32)
    tx = torch.from_numpy(x)
    expected = (
        torch.from_numpy(w)
        * (tx * torch.rsqrt(tx.float().pow(2).mean(-1, keepdim=True) + 1e-6))
    ).numpy()
    got = t5_rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-5)


def test_sinusoidal_embedding_matches_torch():
    # sinusoidal_embedding_1d (ref :210-220): [cos | sin] of pos * 10000^{-i/half}
    dim = 32
    pos = np.array([0.0, 1.0, 13.5, 999.0], dtype=np.float32)
    tpos = torch.from_numpy(pos).double()
    half = dim // 2
    sinusoid = torch.outer(tpos, torch.pow(10000, -torch.arange(half).double() / half))
    expected = torch.cat([torch.cos(sinusoid), torch.sin(sinusoid)], dim=1).float().numpy()

    # fp32 on TPU (no fp64): cos/sin of large angles (t~1000 rad) lose ~1e-3
    # relative precision — far below bf16 weight noise downstream.
    got = sinusoidal_embedding_1d(dim, jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-2, atol=2e-3)


def _torch_rope_apply(x, grid, head_dim):
    """Reference rope_apply (ref :224-231, :295-323) on a single sample."""
    f, h, w = grid
    d = head_dim

    def rope_params(max_seq_len, dim, theta=10000):
        freqs = torch.outer(
            torch.arange(max_seq_len),
            1.0 / torch.pow(theta, torch.arange(0, dim, 2).double() / dim),
        )
        return torch.polar(torch.ones_like(freqs), freqs)

    freqs = torch.cat(
        [
            rope_params(64, d - 4 * (d // 6)),
            rope_params(64, 2 * (d // 6)),
            rope_params(64, 2 * (d // 6)),
        ],
        dim=1,
    )
    c = d // 2
    freqs = freqs.split([c - 2 * (c // 3), c // 3, c // 3], dim=1)

    b, L, n, _ = x.shape
    seq_len = f * h * w
    out = []
    for i in range(b):
        x_i = torch.view_as_complex(x[i, :seq_len].float().reshape(seq_len, n, -1, 2))
        freqs_i = torch.cat(
            [
                freqs[0][:f].view(f, 1, 1, -1).expand(f, h, w, -1),
                freqs[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
                freqs[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
            ],
            dim=-1,
        ).reshape(seq_len, 1, -1)
        x_i = torch.view_as_real(x_i * freqs_i).flatten(2)
        out.append(x_i)
    return torch.stack(out).float()


def test_rope_apply_matches_torch_reference():
    grid = (3, 4, 5)
    head_dim = 24  # d//6 = 4 -> split (8, 8, 8) halves (4, 2, 2) freqs... d=24: c=12, splits (4,4,4)
    n_heads = 2
    rng = np.random.default_rng(3)
    L = grid[0] * grid[1] * grid[2]
    x = rng.standard_normal((2, L, n_heads, head_dim)).astype(np.float32)

    expected = _torch_rope_apply(torch.from_numpy(x), grid, head_dim).numpy()

    freqs = rope_freqs_3d(grid, head_dim)
    got = rope_apply(jnp.asarray(x), freqs)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


def test_rope_identity_at_origin():
    # position (0,0,0) tokens must be unrotated
    grid = (2, 2, 2)
    freqs = rope_freqs_3d(grid, 24)
    x = jnp.ones((1, 8, 1, 24))
    y = rope_apply(x, freqs)
    np.testing.assert_allclose(np.asarray(y[0, 0]), np.ones((1, 24)), rtol=1e-6)


def test_attention_matches_torch_sdpa():
    rng = np.random.default_rng(4)
    b, lq, lk, n, d = 2, 6, 9, 2, 8
    q = rng.standard_normal((b, lq, n, d)).astype(np.float32)
    k = rng.standard_normal((b, lk, n, d)).astype(np.float32)
    v = rng.standard_normal((b, lk, n, d)).astype(np.float32)

    tq = torch.from_numpy(q).transpose(1, 2)
    tk = torch.from_numpy(k).transpose(1, 2)
    tv = torch.from_numpy(v).transpose(1, 2)
    expected = (
        torch.nn.functional.scaled_dot_product_attention(tq, tk, tv)
        .transpose(1, 2)
        .numpy()
    )
    got = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), backend="xla")
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


def test_attention_k_lens_masking():
    rng = np.random.default_rng(5)
    b, lq, lk, n, d = 2, 4, 8, 1, 8
    q = rng.standard_normal((b, lq, n, d)).astype(np.float32)
    k = rng.standard_normal((b, lk, n, d)).astype(np.float32)
    v = rng.standard_normal((b, lk, n, d)).astype(np.float32)
    k_lens = jnp.array([3, 8], dtype=jnp.int32)

    got = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), k_lens=k_lens, backend="xla")

    # row 0: only first 3 keys participate
    got_trunc = attention(
        jnp.asarray(q[:1]), jnp.asarray(k[:1, :3]), jnp.asarray(v[:1, :3]), backend="xla"
    )
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(got_trunc[0]), rtol=1e-5, atol=1e-6)

    # row 1: full-length equivalence
    got_full = attention(jnp.asarray(q[1:]), jnp.asarray(k[1:]), jnp.asarray(v[1:]), backend="xla")
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(got_full[0]), rtol=1e-5, atol=1e-6)


def test_flash_attention_kernel_interpret_matches_xla():
    """Pallas kernel vs XLA attention, interpreter mode on CPU."""
    from stableavatar_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(6)
    b, lq, lk, n, d = 2, 256, 384, 2, 64
    q = jnp.asarray(rng.standard_normal((b, lq, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, lk, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, lk, n, d)).astype(np.float32))
    k_lens = jnp.array([300, 384], dtype=jnp.int32)

    import jax.experimental.pallas as pl  # noqa: F401
    from unittest import mock

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    with mock.patch.object(fa.pl, "pallas_call", interp_call):
        got = fa.flash_attention(q, k, v, k_lens=k_lens, block_q=128, block_k=128)

    want = attention(q, k, v, k_lens=k_lens, backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_riflex_rope_frequency_reduction():
    """RIFLEx (ref :235-292): the k-th intrinsic temporal frequency is clamped
    to 0.9 * 2pi / L_test (optionally scaled) for length extrapolation."""
    from stableavatar_tpu.ops.rope import _axis_freqs

    base = _axis_freqs(8)
    rif = _axis_freqs(8, riflex_k=3, riflex_L_test=66)
    np.testing.assert_allclose(rif[2], 0.9 * 2 * np.pi / 66, rtol=1e-9)
    # other frequencies untouched
    mask = np.ones(8, bool); mask[2] = False
    np.testing.assert_allclose(rif[mask], base[mask])

    scaled = _axis_freqs(8, riflex_k=3, riflex_L_test=66, riflex_scale=4.886)
    np.testing.assert_allclose(scaled[2], 0.9 * 2 * np.pi / 66 / 4.886, rtol=1e-9)

    # full pipeline integration: riflex freqs drive rope_apply without error
    freqs = rope_freqs_3d((4, 2, 2), 24, riflex_k=2, riflex_L_test=66)
    out = rope_apply(jnp.ones((1, 16, 1, 24)), freqs)
    assert np.isfinite(np.asarray(out)).all()


def test_flash_attention_backward_interpret_matches_xla():
    """Pallas backward kernels vs XLA attention VJP, interpreter mode."""
    from unittest import mock

    from stableavatar_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(7)
    b, lq, lk, n, d = 1, 256, 256, 2, 64
    q = jnp.asarray(rng.standard_normal((b, lq, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, lk, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, lk, n, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, lq, n, d)).astype(np.float32))
    k_lens = jnp.array([200], dtype=jnp.int32)

    orig = fa.pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    with mock.patch.object(fa.pl, "pallas_call", interp_call):
        def f(q, k, v):
            return fa.flash_attention(q, k, v, k_lens=k_lens, block_q=128, block_k=128)

        out, vjp = jax.vjp(f, q, k, v)
        dq, dk, dv = vjp(g)

    def f_ref(q, k, v):
        return jax.nn.dot_product_attention(
            q, k, v, key_value_seq_lengths=k_lens, implementation="xla"
        )

    out_ref, vjp_ref = jax.vjp(f_ref, q, k, v)
    dq_r, dk_r, dv_r = vjp_ref(g)

    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r), rtol=2e-3, atol=2e-3)

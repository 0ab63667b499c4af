"""Encoder parity tests: wav2vec2 against a real HF `Wav2Vec2Model` oracle
(tiny config, converted weights), T5/CLIP shape + formula checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_w2v():
    from transformers import Wav2Vec2Config as HFConfig, Wav2Vec2Model

    hf_cfg = HFConfig(
        hidden_size=16,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=32,
        conv_dim=(8, 8, 8, 8, 8, 8, 8),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        hidden_act="gelu",
        layer_norm_eps=1e-5,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    model = Wav2Vec2Model(hf_cfg).eval()
    return model


def test_wav2vec2_matches_hf(hf_w2v):
    from stableavatar_tpu.config import Wav2Vec2Config
    from stableavatar_tpu.models.wav2vec import wav2vec2_forward
    from stableavatar_tpu.utils.checkpoint import convert_wav2vec2

    cfg = Wav2Vec2Config(
        hidden_size=16, num_layers=2, num_heads=2, ffn_dim=32,
        conv_dims=(8,) * 7, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    sd = {k: v.detach().numpy() for k, v in hf_w2v.state_dict().items()}
    params = convert_wav2vec2(sd, cfg)

    rng = np.random.default_rng(0)
    wav = rng.standard_normal((1, 4000)).astype(np.float32)

    with torch.no_grad():
        want = hf_w2v(torch.from_numpy(wav)).last_hidden_state.numpy()

    got = np.asarray(wav2vec2_forward(params, cfg, jnp.asarray(wav)))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_wav2vec2_output_length_formula():
    from stableavatar_tpu.config import Wav2Vec2Config

    cfg = Wav2Vec2Config()
    # 84 video frames at 640 samples -> 167 tokens (reference window size)
    assert cfg.output_length(84 * 640) == 167
    # ~50 tokens per second
    assert abs(cfg.output_length(16000) - 49) <= 1


def test_t5_shapes_and_mask():
    from stableavatar_tpu.config import T5Config
    from stableavatar_tpu.models.t5 import init_t5, t5_encode

    cfg = T5Config(vocab=50, dim=16, dim_attn=16, dim_ffn=32, num_heads=4,
                   num_layers=2, text_len=8)
    params = init_t5(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[3, 5, 7, 1, 0, 0, 0, 0]])
    mask = jnp.array([[1, 1, 1, 1, 0, 0, 0, 0]])
    out = t5_encode(params, cfg, ids, mask)
    assert out.shape == (1, 8, 16)
    assert np.isfinite(np.asarray(out)).all()

    # changing a masked-out token must not change unmasked outputs
    ids2 = ids.at[0, 6].set(9)
    out2 = t5_encode(params, cfg, ids2, mask)
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(out2[:, :4]), rtol=1e-5, atol=1e-6)


def test_t5_relative_buckets_match_reference_formula():
    import math

    from stableavatar_tpu.models.t5 import relative_position_buckets

    # torch replica of the reference bucketing (wan_text_encoder.py:235-254)
    def torch_buckets(lq, lk, num_buckets=32, max_dist=128):
        rel_pos = torch.arange(lk).unsqueeze(0) - torch.arange(lq).unsqueeze(1)
        nb = num_buckets // 2
        rel_buckets = (rel_pos > 0).long() * nb
        rel_pos = torch.abs(rel_pos)
        max_exact = nb // 2
        rel_pos_large = max_exact + (
            torch.log(rel_pos.float() / max_exact) / math.log(max_dist / max_exact) * (nb - max_exact)
        ).long()
        rel_pos_large = torch.min(rel_pos_large, torch.full_like(rel_pos_large, nb - 1))
        rel_buckets += torch.where(rel_pos < max_exact, rel_pos, rel_pos_large)
        return rel_buckets.numpy()

    got = relative_position_buckets(20, 20)
    want = torch_buckets(20, 20)
    np.testing.assert_array_equal(got, want)


def test_clip_visual_shapes():
    from stableavatar_tpu.config import CLIPConfig
    from stableavatar_tpu.models.clip import (
        clip_visual_forward,
        init_clip_visual,
        preprocess_reference_image,
    )

    cfg = CLIPConfig(image_size=28, patch_size=14, vision_dim=32, vision_heads=2, vision_layers=3)
    params = init_clip_visual(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((2, 3, 64, 64))
    x = preprocess_reference_image(img, cfg)
    assert x.shape == (2, 3, 28, 28)
    out = clip_visual_forward(params, cfg, x, use_31_block=True)
    # 4 patches + cls = 5 tokens; use_31_block drops the last of 3 blocks
    assert out.shape == (2, 5, 32)
    assert np.isfinite(np.asarray(out)).all()


def _torch_clip_block(p, x, heads, eps):
    """Pre-norm ViT block per reference AttentionBlock (wan_image_encoder.py:148-155)."""
    import numpy as np

    def t(a):
        return torch.from_numpy(np.asarray(a).copy()).float()

    def lin(pp, h):
        y = h @ t(pp["w"])
        if "b" in pp:
            y = y + t(pp["b"])
        return y

    h = torch.nn.functional.layer_norm(x, x.shape[-1:], t(p["norm1"]["w"]), t(p["norm1"]["b"]), eps)
    b, l, d = h.shape
    qkv = lin(p["attn"]["qkv"], h).reshape(b, l, 3, heads, d // heads)
    q, k, v = qkv.unbind(2)
    o = torch.nn.functional.scaled_dot_product_attention(
        q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
    ).transpose(1, 2).reshape(b, l, d)
    x = x + lin(p["attn"]["proj"], o)
    h = torch.nn.functional.layer_norm(x, x.shape[-1:], t(p["norm2"]["w"]), t(p["norm2"]["b"]), eps)
    h = lin(p["mlp"]["fc2"], torch.nn.functional.gelu(lin(p["mlp"]["fc1"], h)))
    return x + h


def test_clip_visual_matches_torch_oracle():
    import numpy as np

    from stableavatar_tpu.config import CLIPConfig
    from stableavatar_tpu.models.clip import clip_visual_forward, init_clip_visual

    cfg = CLIPConfig(image_size=28, patch_size=14, vision_dim=32, vision_heads=2, vision_layers=3)
    params = init_clip_visual(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)

    got = clip_visual_forward(params, cfg, jnp.asarray(img), use_31_block=True)

    def t(a):
        return torch.from_numpy(np.asarray(a).copy()).float()

    p = 14
    x = torch.from_numpy(img).reshape(2, 3, 2, p, 2, p)
    x = x.permute(0, 2, 4, 1, 3, 5).reshape(2, 4, -1)
    x = x @ t(params["patch_embedding"]["w"])
    cls = t(params["cls_embedding"]).expand(2, -1, -1)
    x = torch.cat([cls, x], dim=1) + t(params["pos_embedding"])
    x = torch.nn.functional.layer_norm(
        x, x.shape[-1:], t(params["pre_norm"]["w"]), t(params["pre_norm"]["b"]), cfg.eps
    )
    with torch.no_grad():
        for bp in params["blocks"][:-1]:  # use_31_block drops the last
            x = _torch_clip_block(bp, x, cfg.vision_heads, cfg.eps)

    np.testing.assert_allclose(np.asarray(got), x.numpy(), rtol=2e-3, atol=2e-3)


def test_t5_matches_torch_oracle():
    """Full tiny umT5 forward vs a torch replica of the reference formulas
    (wan_text_encoder.py: T5Attention no-scale + pos bias, gated GELU FFN)."""
    import math

    import numpy as np

    from stableavatar_tpu.config import T5Config
    from stableavatar_tpu.models.t5 import init_t5, relative_position_buckets, t5_encode

    cfg = T5Config(vocab=50, dim=24, dim_attn=24, dim_ffn=48, num_heads=4,
                   num_layers=2, text_len=10, shared_pos=False)
    params = init_t5(jax.random.PRNGKey(1), cfg)

    ids = np.array([[3, 7, 11, 2, 1, 0, 0, 0, 0, 0]], dtype=np.int32)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0, 0, 0, 0]], dtype=np.int32)
    got = t5_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask))

    def t(a):
        return torch.from_numpy(np.asarray(a).copy()).float()

    def t5norm(x, w):
        return t(w) * (x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + cfg.eps))

    def gelu_tanh(x):
        return 0.5 * x * (1.0 + torch.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))

    x = t(params["token_embedding"])[torch.from_numpy(ids).long()]
    L = ids.shape[1]
    n, hd = cfg.num_heads, cfg.dim_attn // cfg.num_heads
    tm = torch.from_numpy(mask)
    with torch.no_grad():
        for bp in params["blocks"]:
            buckets = torch.from_numpy(relative_position_buckets(L, L, cfg.num_buckets, cfg.max_dist))
            bias = t(bp["pos_emb"])[buckets].permute(2, 0, 1).unsqueeze(0)
            h = t5norm(x, bp["norm1"]["w"])
            q = (h @ t(bp["attn"]["q"]["w"])).reshape(1, L, n, hd)
            k = (h @ t(bp["attn"]["k"]["w"])).reshape(1, L, n, hd)
            v = (h @ t(bp["attn"]["v"]["w"])).reshape(1, L, n, hd)
            attn = torch.einsum("binc,bjnc->bnij", q, k) + bias
            attn = attn.masked_fill(tm.view(1, 1, 1, -1) == 0, torch.finfo(torch.float32).min)
            attn = torch.softmax(attn, dim=-1)
            o = torch.einsum("bnij,bjnc->binc", attn, v).reshape(1, L, -1)
            x = x + o @ t(bp["attn"]["o"]["w"])
            h = t5norm(x, bp["norm2"]["w"])
            ff = (h @ t(bp["ffn"]["fc1"]["w"])) * gelu_tanh(h @ t(bp["ffn"]["gate"]["w"]))
            x = x + ff @ t(bp["ffn"]["fc2"]["w"])
        x = t5norm(x, params["norm"]["w"])

    np.testing.assert_allclose(np.asarray(got), x.numpy(), rtol=2e-3, atol=2e-3)

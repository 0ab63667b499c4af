"""Multi-device sharding on the virtual 8-CPU mesh: sharded == single-device
outputs; dryrun train step executes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@requires_8
def test_sharded_dit_forward_matches_single_device():
    from stableavatar_tpu.config import DiTConfig
    from stableavatar_tpu.models.dit import dit_forward, init_dit
    from stableavatar_tpu.parallel.mesh import make_mesh, mesh_context
    from stableavatar_tpu.parallel.sharding import shard_params

    cfg = DiTConfig(
        dim=32, ffn_dim=64, freq_dim=16, text_dim=32, in_dim=36, out_dim=16,
        num_heads=4, num_layers=2, text_len=8, clip_tokens=5, clip_dim=16,
        audio_in_dim=8, audio_proj_dim=32, vocal_num_heads=4,
    )
    key = jax.random.PRNGKey(0)
    params = init_dit(key, cfg)

    b, f, h, w = 1, 3, 8, 8
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (b, 16, f, h, w))
    t = jnp.full((b,), 500.0)
    text = jax.random.normal(ks[1], (b, cfg.text_len, cfg.text_dim))
    clip = jax.random.normal(ks[2], (b, cfg.clip_tokens, cfg.clip_dim))
    y = jax.random.normal(ks[3], (b, 20, f, h, w))
    audio = jax.random.normal(ks[4], (b, 12, cfg.audio_in_dim))

    ref = dit_forward(params, cfg, x, t, text, clip, y, audio, video_sample_n_frames=9)

    mesh = make_mesh(dp=1, fsdp=2, sp=4)
    with mesh_context(mesh):
        sparams = shard_params(params, mesh)
        fn = jax.jit(
            lambda p, *a: dit_forward(p, cfg, *a, video_sample_n_frames=9)
        )
        out = fn(sparams, x, t, text, clip, y, audio)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


@requires_8
def test_dryrun_multichip_entrypoint():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_param_sharding_spec_rules():
    from jax.sharding import PartitionSpec as P

    from stableavatar_tpu.parallel.sharding import param_sharding_spec

    big = jnp.zeros((4096, 256))
    assert param_sharding_spec(big, 4) == P("fsdp", None)
    small = jnp.zeros((16,))
    assert param_sharding_spec(small, 4) == P()
    odd = jnp.zeros((4097, 333))
    assert param_sharding_spec(odd, 4) == P()


@requires_8
def test_ring_attention_matches_full():
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from stableavatar_tpu.ops.attention import attention
    from stableavatar_tpu.ops.ring_attention import ring_attention
    from stableavatar_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=1, fsdp=1, sp=8)
    key = jax.random.PRNGKey(0)
    b, l, n, d = 2, 64, 2, 16
    q = jax.random.normal(key, (b, l, n, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, l, n, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, l, n, d))

    want = attention(q, k, v, backend="xla")

    fn = shard_map(
        partial(ring_attention, axis_name="sp"),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
    )
    got = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_wan_14b_fsdp_sharding_plan():
    """Every large 14B parameter must get a real fsdp shard (no silent
    replication of the big matrices) at fsdp=8 — validated on abstract
    shapes, no memory."""
    from jax.sharding import PartitionSpec as P

    from stableavatar_tpu.config import WAN_14B
    from stableavatar_tpu.models.dit import init_dit
    from stableavatar_tpu.parallel.sharding import param_sharding_spec

    shapes = jax.eval_shape(lambda: init_dit(jax.random.PRNGKey(0), WAN_14B))
    total = 0
    sharded = 0
    for leaf in jax.tree.leaves(shapes):
        size = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += size
        spec = param_sharding_spec(leaf, 8)
        if spec != P():
            sharded += size
    # >99% of the 14B parameter volume must be fsdp-sharded
    assert sharded / total > 0.99, sharded / total


def test_wan_14b_deep_proxy_train_and_denoise_on_mesh():
    """14B at REAL depth (40 layers, 2-stage vocal projector) with the width
    cut, fsdp=8: one train step + one window denoise execute on the virtual
    mesh, and the measured per-device parameter bytes match the fsdp=8
    memory plan (each device holds ~1/8 of the sharded volume).

    Reference shape source: `wan_fantasy_transformer3d_14B.py` (dim 5120,
    ffn 13824, 40 heads, 40 layers; vocal proj 768 -> 2048 -> 5120)."""
    from functools import partial

    from stableavatar_tpu.config import DiTConfig
    from stableavatar_tpu.models.dit import cast_params, dit_forward, init_dit
    from stableavatar_tpu.parallel.mesh import make_mesh, mesh_context
    from stableavatar_tpu.parallel.sharding import param_sharding_spec, shard_params
    from stableavatar_tpu.train.trainer import (
        TrainConfig,
        make_optimizer,
        make_train_step,
        train_sigmas,
    )

    cfg = DiTConfig(
        dim=128, ffn_dim=344, num_heads=8, num_layers=40,  # full 14B depth
        text_len=16, text_dim=32, freq_dim=64,
        audio_in_dim=24, audio_proj_hidden=48, audio_proj_dim=128,  # 2-stage
        vocal_num_heads=8,
    )
    mesh = make_mesh(dp=1, fsdp=8, sp=1)
    params = cast_params(init_dit(jax.random.PRNGKey(0), cfg), jnp.bfloat16)

    with mesh_context(mesh):
        params = shard_params(params, mesh)

        # memory plan: per-device bytes of sharded leaves == total/8
        total_bytes = 0
        dev0_bytes = 0
        sharded_bytes = 0
        for leaf in jax.tree.leaves(params):
            total_bytes += leaf.nbytes
            shard = leaf.addressable_shards[0]
            dev0_bytes += int(np.prod(shard.data.shape)) * leaf.dtype.itemsize
            from jax.sharding import PartitionSpec as P

            if param_sharding_spec(leaf, 8) != P():
                sharded_bytes += leaf.nbytes
        expected_dev0 = sharded_bytes / 8 + (total_bytes - sharded_bytes)
        assert abs(dev0_bytes - expected_dev0) / expected_dev0 < 0.01, (
            dev0_bytes, expected_dev0,
        )
        # at the cut width the unsharded small leaves (norms, modulation,
        # biases) weigh relatively more than at dim=5120 — the full-width
        # >99% volume check is test_wan_14b_fsdp_sharding_plan above
        assert sharded_bytes / total_bytes > 0.95

        # one window denoise (the 14B hardcodes 21 latent frames; the proxy
        # uses 5 for CPU time)
        rng = np.random.default_rng(0)
        b, f, lh, lw = 3, 5, 4, 4
        x = jnp.asarray(rng.standard_normal((b, 16, f, lh, lw)), jnp.bfloat16)
        t = jnp.full((b,), 500.0, jnp.float32)
        text = jnp.asarray(rng.standard_normal((b, cfg.text_len, cfg.text_dim)), jnp.bfloat16)
        clip_fea = jnp.asarray(rng.standard_normal((b, cfg.clip_tokens, cfg.clip_dim)), jnp.bfloat16)
        y = jnp.asarray(rng.standard_normal((b, 20, f, lh, lw)), jnp.bfloat16)
        vocal = jnp.asarray(rng.standard_normal((1, 40, cfg.audio_in_dim)), jnp.bfloat16)
        out = dit_forward(
            params, cfg, x, t, text, clip_fea, y, vocal,
            video_sample_n_frames=17, vocal_cfg_tile=True,
        )
        assert np.isfinite(np.asarray(out, np.float32)).all()

        # one train step (remat through the 40-layer scan)
        tc = TrainConfig(remat=True, video_sample_n_frames=17)
        tx = make_optimizer(tc)
        opt_state = tx.init(params)
        step_fn = make_train_step(cfg, tc, tx, train_sigmas(1000, 5.0))
        batch = {
            "latents": jnp.asarray(rng.standard_normal((1, 16, f, lh, lw)), jnp.float32),
            "inpaint_latents": jnp.asarray(rng.standard_normal((1, 20, f, lh, lw)), jnp.bfloat16),
            "prompt_embeds": text[:1],
            "clip_fea": clip_fea[:1],
            "vocal_embeddings": vocal,
            "face_masks": jnp.ones((1, 1, f, lh, lw), jnp.float32),
            "lip_masks": jnp.ones((1, 1, f, lh, lw), jnp.float32),
        }
        params2, _, metrics = step_fn(params, opt_state, batch, jax.random.PRNGKey(1),
                                      jnp.asarray(0), False)
        assert np.isfinite(float(metrics["loss"]))


def test_dit_ring_attention_matches_ulysses():
    """dit_forward(attn_impl='ring') under an sp=8 mesh == the default
    Ulysses head-resharding path (and == unsharded)."""
    from stableavatar_tpu.config import DiTConfig
    from stableavatar_tpu.models.dit import dit_forward, init_dit
    from stableavatar_tpu.parallel.mesh import make_mesh, mesh_context

    cfg = DiTConfig(dim=64, ffn_dim=128, num_heads=8, num_layers=2,
                    text_len=16, text_dim=32, audio_proj_dim=64,
                    vocal_num_heads=8)
    rng = np.random.default_rng(4)
    params = init_dit(jax.random.PRNGKey(0), cfg)
    # densify head so outputs are nonzero
    params["head"]["head"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1), params["head"]["head"]["w"].shape) * 0.05
    )

    b, f, lh, lw = 1, 8, 8, 8  # L = 8*4*4 = 128 tokens -> 16/shard at sp=8
    x = jnp.asarray(rng.standard_normal((b, 16, f, lh, lw)), jnp.float32)
    t = jnp.full((b,), 500.0, jnp.float32)
    text = jnp.asarray(rng.standard_normal((b, cfg.text_len, cfg.text_dim)), jnp.float32)
    clip_fea = jnp.asarray(rng.standard_normal((b, cfg.clip_tokens, cfg.clip_dim)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, 20, f, lh, lw)), jnp.float32)
    vocal = jnp.asarray(rng.standard_normal((b, 60, cfg.audio_in_dim)), jnp.float32)

    args = (params, cfg, x, t, text, clip_fea, y, vocal)
    kw = dict(video_sample_n_frames=29)

    want = dit_forward(*args, **kw)

    mesh = make_mesh(dp=1, fsdp=1, sp=8)

    def run(p, x, t, text, clip_fea, y, vocal):
        return dit_forward(p, cfg, x, t, text, clip_fea, y, vocal, **kw,
                           attn_impl="ring")

    with mesh_context(mesh):
        got_ring = jax.jit(run)(params, x, t, text, clip_fea, y, vocal)

    np.testing.assert_allclose(
        np.asarray(got_ring), np.asarray(want), rtol=2e-3, atol=2e-3
    )


def test_ring_partials_full_dit_shape():
    """The fused-stats flash kernel + LSE merge reproduce full attention at
    the REAL 21.5k-token DiT self-attention length (reduced heads, interpret
    mode on CPU) — the 14B/long-context ring building block at shape."""
    from unittest import mock

    from stableavatar_tpu.ops import flash_attention as fa

    b, L, n, d = 1, 21504, 1, 64
    chunks = 8
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((b, L, n, d)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((b, L, n, d)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((b, L, n, d)).astype(np.float32))

    orig = fa.pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    # query chunk 0 attends to all 8 key chunks via combinable partials
    lq = L // chunks
    qc = q[:, :lq]
    o = lse = None
    with mock.patch.object(fa.pl, "pallas_call", interp_call):
        for ci in range(chunks):
            kc = k[:, ci * lq : (ci + 1) * lq]
            vc = v[:, ci * lq : (ci + 1) * lq]
            o_i, lse_i = fa.flash_attention_with_stats(qc, kc, vc)
            if o is None:
                o, lse = o_i.astype(jnp.float32), lse_i
            else:
                m = jnp.maximum(lse, lse_i)
                w_old, w_new = jnp.exp(lse - m), jnp.exp(lse_i - m)
                denom = w_old + w_new
                o = (o * (w_old / denom)[..., None]
                     + o_i.astype(jnp.float32) * (w_new / denom)[..., None])
                lse = m + jnp.log(denom)

    from stableavatar_tpu.ops.attention import attention as _attn

    want = _attn(qc, k, v, backend="xla")
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(want), rtol=5e-4, atol=5e-4
    )


def test_generate_long_under_mesh_matches_single_device():
    """The CLI's sharded-inference path (mesh_context + shard_params +
    generate_long) produces the same latents as the unsharded run — the
    sweep-step programs compile and execute correctly under GSPMD
    (fsdp=2, sp=2 on the virtual 8-device CPU mesh)."""
    from tests.test_pipeline import make_tiny_models
    from stableavatar_tpu.parallel.mesh import make_mesh, mesh_context
    from stableavatar_tpu.parallel.sharding import shard_params
    from stableavatar_tpu.pipelines.long import generate_long

    models = make_tiny_models()
    rng = np.random.default_rng(5)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    wav = rng.standard_normal(18 * 640).astype(np.float32) * 0.1
    kwargs = dict(
        ref_image=ref, vocal_waveform=wav, prompt="speech",
        num_inference_steps=2, clip_length=9, overlap_window_length=1,
        seed=4, output_type="latent",
    )

    base = generate_long(models, **kwargs)

    mesh = make_mesh(dp=1, fsdp=2, sp=2)
    with mesh_context(mesh):
        models.dit_params = shard_params(models.dit_params, mesh)
        sharded = generate_long(models, **kwargs)

    np.testing.assert_allclose(
        np.asarray(sharded.latents), np.asarray(base.latents),
        rtol=2e-3, atol=2e-4,
    )


def test_generate_long_14b_variant_under_mesh_matches_single_device():
    """VERDICT r3 item 7: the FULL generate_long path at the 14B structural
    variant — real 40-layer depth and the 2-stage (768->2048->5120 shaped)
    vocal projector, width cut for CPU — executes under the fsdp=2 x sp=2
    virtual mesh and matches the single-device run, so the first real
    2-chip session starts from a green end-to-end path
    (multiple_gpu_inference.sh:17-26)."""
    import dataclasses as dc

    from tests.test_pipeline import make_tiny_models
    from stableavatar_tpu.config import DiTConfig
    from stableavatar_tpu.models.dit import init_dit
    from stableavatar_tpu.parallel.mesh import make_mesh, mesh_context
    from stableavatar_tpu.parallel.sharding import shard_params
    from stableavatar_tpu.pipelines.long import generate_long

    models = make_tiny_models()
    cfg14 = dc.replace(
        models.dit_cfg,
        num_layers=40,                      # full 14B depth
        audio_proj_hidden=24,               # 2-stage 14B vocal projector
    )
    assert isinstance(cfg14, DiTConfig)
    models.dit_cfg = cfg14
    models.dit_params = init_dit(jax.random.PRNGKey(14), cfg14)

    rng = np.random.default_rng(6)
    ref = rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    wav = rng.standard_normal(18 * 640).astype(np.float32) * 0.1
    kwargs = dict(
        ref_image=ref, vocal_waveform=wav, prompt="speech",
        num_inference_steps=2, clip_length=9, overlap_window_length=1,
        seed=5, output_type="latent",
    )

    base = generate_long(models, **kwargs)

    mesh = make_mesh(dp=1, fsdp=2, sp=2)
    with mesh_context(mesh):
        models.dit_params = shard_params(models.dit_params, mesh)
        sharded = generate_long(models, **kwargs)

    np.testing.assert_allclose(
        np.asarray(sharded.latents), np.asarray(base.latents),
        rtol=2e-3, atol=2e-4,
    )

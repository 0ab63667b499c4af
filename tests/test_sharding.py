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

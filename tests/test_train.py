"""Training stack: one jitted train step end-to-end (tiny), loss math,
anomaly-aware clipping, LoRA create/merge/unmerge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stableavatar_tpu.config import DiTConfig
from stableavatar_tpu.models.dit import init_dit
from stableavatar_tpu.train.losses import (
    anomaly_aware_max_norm,
    masked_flow_loss,
    sample_timestep_indices,
)
from stableavatar_tpu.train.trainer import (
    TrainConfig,
    make_optimizer,
    make_train_step,
    train_sigmas,
    trainable_mask,
)

TINY = DiTConfig(
    dim=32, ffn_dim=64, freq_dim=16, text_dim=32, in_dim=36, out_dim=16,
    num_heads=4, num_layers=2, text_len=8, clip_tokens=5, clip_dim=16,
    audio_in_dim=8, audio_proj_dim=32, vocal_num_heads=4,
)


def _batch(b=1, f=3, h=8, w=8):
    rng = np.random.default_rng(0)
    return {
        "latents": jnp.asarray(rng.standard_normal((b, 16, f, h, w)), jnp.float32),
        "inpaint_latents": jnp.asarray(rng.standard_normal((b, 20, f, h, w)), jnp.float32),
        "prompt_embeds": jnp.asarray(rng.standard_normal((b, TINY.text_len, TINY.text_dim)), jnp.float32),
        "clip_fea": jnp.asarray(rng.standard_normal((b, TINY.clip_tokens, TINY.clip_dim)), jnp.float32),
        "vocal_embeddings": jnp.asarray(rng.standard_normal((b, 20, TINY.audio_in_dim)), jnp.float32),
        "face_masks": jnp.asarray(rng.uniform(0, 1, (b, 1, f, h, w)), jnp.float32),
        "lip_masks": jnp.asarray(rng.uniform(0, 1, (b, 1, f, h, w)), jnp.float32),
    }


def test_train_step_decreases_nothing_but_runs_and_updates():
    tc = TrainConfig(remat=False, video_sample_n_frames=9, learning_rate=1e-3)
    params = init_dit(jax.random.PRNGKey(0), TINY)
    tx = make_optimizer(tc)
    opt_state = tx.init(params)
    step = make_train_step(TINY, tc, tx, train_sigmas())

    before = np.asarray(params["head"]["head"]["w"]).copy()  # donated below
    new_params, opt_state, metrics = step(
        params, opt_state, _batch(), jax.random.PRNGKey(1), jnp.asarray(0)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # head weight is zero-init; gradient should move it
    after = np.asarray(new_params["head"]["head"]["w"])
    assert float(np.abs(after - before).max()) > 0.0


def test_masked_flow_loss_weighting_modes():
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.standard_normal((1, 4, 3, 4, 4)), jnp.float32)
    target = jnp.zeros_like(pred)
    face = jnp.ones((1, 1, 3, 4, 4)) * 0.5
    lip = jnp.ones((1, 1, 3, 4, 4)) * 0.25

    base = float(jnp.mean(jnp.square(pred)))
    # flag in [0.4, 0.5) -> face weighting
    l_face = float(masked_flow_loss(pred, target, face, lip, jnp.asarray(0.45)))
    np.testing.assert_allclose(l_face, base * 0.5, rtol=1e-5)
    # flag >= 0.5 -> lip weighting
    l_lip = float(masked_flow_loss(pred, target, face, lip, jnp.asarray(0.7)))
    np.testing.assert_allclose(l_lip, base * 0.25, rtol=1e-5)
    # flag < 0.4 -> 1 + face + lip
    l_both = float(masked_flow_loss(pred, target, face, lip, jnp.asarray(0.1)))
    np.testing.assert_allclose(l_both, base * 1.75, rtol=1e-5)


def test_motion_sub_loss_channel_axis():
    pred = jnp.ones((1, 4, 3, 2, 2))
    target = jnp.zeros_like(pred)
    ones_mask = jnp.ones((1, 1, 3, 2, 2))
    l0 = masked_flow_loss(pred, target, ones_mask, ones_mask, jnp.asarray(0.45), motion_sub_ratio=0.0)
    l1 = masked_flow_loss(pred, target, ones_mask, ones_mask, jnp.asarray(0.45), motion_sub_ratio=0.5)
    # constant pred => channel diffs are zero => sub_loss = 0 => loss halves
    np.testing.assert_allclose(float(l1), float(l0) * 0.5, rtol=1e-5)


def test_anomaly_aware_max_norm():
    # normal regime: bound = linear decay value
    b0 = float(anomaly_aware_max_norm(jnp.asarray(0.01), 0.05, 5.0, 100, jnp.asarray(200)))
    np.testing.assert_allclose(b0, 0.05, rtol=1e-5)
    # anomalous: norm/bound > 5 after decay window -> shrink by min(ratio, 10)
    b1 = float(anomaly_aware_max_norm(jnp.asarray(10.0), 0.05, 5.0, 100, jnp.asarray(200)))
    np.testing.assert_allclose(b1, 0.05 / 10.0, rtol=1e-4)
    # before window: no anomaly handling; bound interpolates toward 0.25 at step 0
    b2 = float(anomaly_aware_max_norm(jnp.asarray(10.0), 0.05, 5.0, 100, jnp.asarray(0)))
    np.testing.assert_allclose(b2, 0.25, rtol=1e-5)


def test_sample_timestep_stratification():
    key = jax.random.PRNGKey(0)
    idx = sample_timestep_indices(key, 1000, 1000, dp_rank=2, dp_size=4)
    assert int(idx.min()) >= 500 and int(idx.max()) < 750


def test_trainable_mask_modes():
    params = init_dit(jax.random.PRNGKey(0), TINY)
    mask_all = trainable_mask(params, train_all=True)
    assert all(jax.tree.leaves(mask_all))


def test_lora_roundtrip():
    from stableavatar_tpu.utils.lora import create_lora, merge_lora, unmerge_lora

    params = init_dit(jax.random.PRNGKey(0), TINY)
    lora = create_lora(jax.random.PRNGKey(1), params, rank=4, alpha=8.0)

    n_adapters = len([
        l for l in jax.tree_util.tree_leaves_with_path(
            lora, is_leaf=lambda x: isinstance(x, dict) and "down" in x
        )
    ])
    assert n_adapters > 0

    # up is zero-init -> merge is identity
    merged = merge_lora(params, lora, rank=4, alpha=8.0)
    np.testing.assert_allclose(
        np.asarray(merged["blocks"]["self_attn"]["q"]["w"]),
        np.asarray(params["blocks"]["self_attn"]["q"]["w"]),
    )

    # nonzero up: merge then unmerge restores original
    lora_nz = jax.tree.map(lambda x: x + 0.01, lora)
    merged = merge_lora(params, lora_nz, rank=4, alpha=8.0)
    assert float(jnp.abs(
        merged["blocks"]["self_attn"]["q"]["w"] - params["blocks"]["self_attn"]["q"]["w"]
    ).max()) > 0
    restored = unmerge_lora(merged, lora_nz, rank=4, alpha=8.0)
    np.testing.assert_allclose(
        np.asarray(restored["blocks"]["self_attn"]["q"]["w"]),
        np.asarray(params["blocks"]["self_attn"]["q"]["w"]),
        rtol=1e-4, atol=1e-5,
    )


def test_teacache_controller():
    from stableavatar_tpu.models.teacache import TeaCache, get_teacache_coefficients

    coef = get_teacache_coefficients("wan2.1-t2v-1.3b")
    assert coef is not None
    tc = TeaCache(coef, num_steps=10, rel_l1_thresh=0.5, num_skip_start_steps=2)

    e0 = jnp.ones((1, 6, 8))
    assert tc.plan(e0) is True  # cnt 0 forced
    assert tc.plan(e0 * 1.001) is True  # skip-start window
    # small drift accumulates below threshold -> skip
    r = tc.plan(e0 * 1.002)
    assert isinstance(r, bool)
    tc.store(jnp.zeros((1, 4, 8)))
    assert tc.residual is not None


def test_adam8bit_matches_adamw_direction():
    """8-bit Adam must track fp32 AdamW closely at step 1 (identical modulo
    int8 quantization of nu)."""
    import optax

    from stableavatar_tpu.train.adam8bit import adamw8bit

    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.standard_normal((16, 128)).astype(np.float32))}
    grads = {"w": jnp.asarray(rng.standard_normal((16, 128)).astype(np.float32))}

    tx8 = adamw8bit(1e-3, weight_decay=0.0)
    txf = optax.adamw(1e-3, b1=0.9, b2=0.999, eps=1e-10, weight_decay=0.0)

    s8 = tx8.init(params)
    sf = txf.init(params)
    u8, _ = tx8.update(grads, s8, params)
    uf, _ = txf.update(grads, sf, params)
    np.testing.assert_allclose(np.asarray(u8["w"]), np.asarray(uf["w"]), rtol=0.05, atol=1e-5)


def test_adam8bit_state_is_int8():
    from stableavatar_tpu.train.adam8bit import adamw8bit

    params = {"w": jnp.ones((8, 256))}
    tx = adamw8bit(1e-3)
    state = tx.init(params)
    assert state[0].nu["w"].q.dtype == jnp.int8
    assert state[0].mu["w"].dtype == jnp.bfloat16


def test_came_optimizer_converges_and_shapes():
    """CAME (train/came.py): factored state shapes, convergence on a simple
    least-squares problem, and reference hyperparams via make_optimizer."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from stableavatar_tpu.train.came import came
    from stableavatar_tpu.train.trainer import TrainConfig, make_optimizer

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    params = {"w": jnp.zeros((8, 4)), "bias": jnp.zeros((4,))}

    def loss_fn(p):
        return jnp.mean((A @ p["w"] + p["bias"] - b) ** 2)

    tx = came(2e-2)
    state = tx.init(params)
    # factored leaf for the 2D weight, unfactored for the 1D bias
    assert state.leaves["w"].row.shape == (8,)
    assert state.leaves["w"].col.shape == (4,)
    assert state.leaves["bias"].row.shape == (4,)

    # the system is overdetermined: compare against the true least-squares
    # optimum, not zero
    A1 = np.concatenate([np.asarray(A), np.ones((16, 1), np.float32)], axis=1)
    wb, res, *_ = np.linalg.lstsq(A1, np.asarray(b), rcond=None)
    opt_loss = float(np.mean((A1 @ wb - np.asarray(b)) ** 2))

    l0 = float(loss_fn(params))
    for _ in range(300):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    final = float(loss_fn(params))
    assert final < opt_loss + 0.25 * (l0 - opt_loss), (final, opt_loss, l0)

    # reference --use_came config path builds without error
    tx2 = make_optimizer(TrainConfig(use_came=True))
    st2 = tx2.init(params)
    up, _ = tx2.update(grads, st2, params)
    assert all(np.isfinite(np.asarray(u)).all() for u in jax.tree.leaves(up))


def test_gradient_accumulation_multisteps():
    """gradient_accumulation_steps=k: params update only at the k-th micro
    step, and the sync update equals one k=1 step on the MEAN of the micro
    gradients (reference accelerator.accumulate semantics,
    train_1B_square.py:786,1083)."""
    import optax

    from stableavatar_tpu.train.trainer import make_optimizer

    params = {"w": jnp.ones(4)}
    g1 = {"w": jnp.full(4, 0.02)}
    g2 = {"w": jnp.full(4, 0.04)}

    cfg_acc = TrainConfig(learning_rate=1e-2, weight_decay=0.0,
                          gradient_accumulation_steps=2)
    tx = make_optimizer(cfg_acc)
    st = tx.init(params)
    up1, st = tx.update(g1, st, params)
    assert float(optax.global_norm(up1)) == 0.0  # micro step: no update
    p_mid = optax.apply_updates(params, up1)
    np.testing.assert_array_equal(np.asarray(p_mid["w"]), np.asarray(params["w"]))
    up2, st = tx.update(g2, st, p_mid)
    p_acc = optax.apply_updates(p_mid, up2)

    cfg_one = TrainConfig(learning_rate=1e-2, weight_decay=0.0)
    tx1 = make_optimizer(cfg_one)
    st1 = tx1.init(params)
    gm = {"w": (g1["w"] + g2["w"]) / 2.0}
    up, _ = tx1.update(gm, st1, params)
    p_one = optax.apply_updates(params, up)

    np.testing.assert_allclose(np.asarray(p_acc["w"]), np.asarray(p_one["w"]),
                               rtol=1e-6)


def test_anomaly_clip_transform_clips_in_chain():
    """The chained anomaly clip bounds the update magnitude exactly like the
    old in-step clipping did (bound = max_norm*ratio at count 0)."""
    import optax

    from stableavatar_tpu.train.trainer import anomaly_clip_transform

    clip = anomaly_clip_transform(0.05, 5.0, 100)
    st = clip.init(None)
    big = {"w": jnp.full(4, 10.0)}
    out, st = clip.update(big, st)
    # count 0 -> bound = 0.05*5.0 = 0.25
    np.testing.assert_allclose(float(optax.global_norm(out)), 0.25, rtol=1e-4)
    assert int(st["count"]) == 1


def test_lr_schedules_match_diffusers_get_scheduler():
    """Our relative LR multiplier matches transformers.get_scheduler (the
    exact implementation the reference trains with,
    train_1B_square.py:989-994) at sampled steps for every supported kind."""
    import torch
    from transformers import get_scheduler

    from stableavatar_tpu.train.trainer import lr_multiplier_schedule

    total, warm, base = 200, 20, 1e-2
    for kind in ("constant", "constant_with_warmup", "linear", "cosine",
                 "cosine_with_restarts", "polynomial"):
        opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=base)
        ref = get_scheduler(kind, opt, num_warmup_steps=warm,
                            num_training_steps=total)
        ours = lr_multiplier_schedule(
            TrainConfig(learning_rate=base, lr_scheduler=kind,
                        lr_warmup_steps=warm, lr_total_steps=total)
        )
        for step in range(0, total + 1):
            want = ref.get_last_lr()[0] / base
            got = float(ours(step))
            assert abs(got - want) < 1e-5, (kind, step, got, want)
            opt.step()
            ref.step()


def test_density_timestep_sampling_distributions():
    """compute_density_for_timestep_sampling parity: logit_normal
    concentrates mid-range, mode/uniform cover [0, N); all within bounds
    after the trainer's clip."""
    from stableavatar_tpu.train.losses import density_timestep_indices

    key = jax.random.PRNGKey(0)
    n = 4096
    for scheme in (None, "logit_normal", "mode"):
        idx = np.asarray(density_timestep_indices(key, n, scheme, 1000))
        idx = np.clip(idx, 0, 999)
        assert idx.min() >= 0 and idx.max() <= 999
    ln = np.asarray(density_timestep_indices(key, n, "logit_normal", 1000))
    un = np.asarray(density_timestep_indices(key, n, None, 1000))
    # logit-normal concentrates mass in the middle vs uniform
    assert np.std(ln) < np.std(un)

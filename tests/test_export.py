"""JAX -> torch export: exact inverse of convert_dit (bit-exact fp32
roundtrip), loadable by the reference torch module."""

import numpy as np
import pytest

import jax

from stableavatar_tpu.config import DiTConfig
from stableavatar_tpu.models.dit import init_dit
from stableavatar_tpu.utils.checkpoint import (
    convert_dit,
    export_dit_to_torch_state_dict,
    save_torch_dit,
)


def _cfg():
    return DiTConfig(dim=32, ffn_dim=64, num_heads=2, num_layers=2,
                     text_len=16, text_dim=24, freq_dim=32,
                     audio_in_dim=16, audio_proj_dim=32, vocal_num_heads=2)


def test_export_convert_roundtrip_bit_exact():
    cfg = _cfg()
    params = init_dit(jax.random.PRNGKey(0), cfg)
    sd = export_dit_to_torch_state_dict(params, cfg)
    back = convert_dit(sd, cfg)

    flat_a, tree_a = jax.tree.flatten(params)
    flat_b, tree_b = jax.tree.flatten(back)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_export_loads_into_reference_module(tmp_path):
    """The exported .pt loads strict=True into the actual reference torch
    module (dims matched) — a TPU-trained model can be handed back."""
    torch = pytest.importorskip("torch")
    import os, sys

    from stableavatar_tpu.utils.diffusers_shim import ensure_diffusers

    ensure_diffusers()
    ref_root = os.environ.get("REFERENCE_ROOT", "/root/reference")
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    from wan.models.wan_fantasy_transformer3d_1B import WanTransformer3DFantasyModel
    from wan.models.vocal_projector_fantasy_1B import (
        FantasyTalkingVocalCondition1BModel,
    )

    cfg = DiTConfig(dim=64, ffn_dim=128, num_heads=4, num_layers=2,
                    text_len=32, text_dim=48, freq_dim=64,
                    audio_in_dim=768, audio_proj_dim=64, vocal_num_heads=8)
    params = init_dit(jax.random.PRNGKey(1), cfg)
    path = save_torch_dit(str(tmp_path / "transformer3d-test.pt"), params, cfg)

    model = WanTransformer3DFantasyModel(
        model_type="i2v", patch_size=(1, 2, 2), text_len=32, in_dim=36,
        dim=64, ffn_dim=128, freq_dim=64, text_dim=48, out_dim=16,
        num_heads=4, num_layers=2,
    )
    model.vocal_projector = FantasyTalkingVocalCondition1BModel(
        audio_in_dim=768, audio_proj_dim=64, dit_dim=64
    )
    sd = torch.load(path, map_location="cpu", weights_only=True)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    # freqs buffer etc. may be missing; no parameter should be
    param_names = {n for n, _ in model.named_parameters()}
    assert not (param_names & set(missing)), param_names & set(missing)

"""Parity harness (scripts/parity_vs_torch.py) exercised on random tiny
weights: the ACTUAL reference torch module from /root/reference is
instantiated, its state_dict converted with the production converters, and
the harness's forward probe must report near-zero diff.

This is the code path real checkpoints will take — execution against real
weights only needs a mount (see the script docstring)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

torch = pytest.importorskip("torch")


def _tiny_ref_model():
    import parity_vs_torch as pv

    pv._import_reference()
    from wan.models.wan_fantasy_transformer3d_1B import WanTransformer3DFantasyModel

    from wan.models.vocal_projector_fantasy_1B import (
        FantasyTalkingVocalCondition1BModel,
    )

    torch.manual_seed(0)
    model = WanTransformer3DFantasyModel(
        model_type="i2v",
        patch_size=(1, 2, 2),
        text_len=32,
        in_dim=36,
        dim=64,
        ffn_dim=128,
        freq_dim=64,
        text_dim=48,
        out_dim=16,
        num_heads=4,
        num_layers=2,
        eps=1e-6,
    )
    # the reference hardcodes audio_proj_dim=1536 (works only because the
    # real model has dim==1536); swap in a dim-matched tiny projector
    model.vocal_projector = FantasyTalkingVocalCondition1BModel(
        audio_in_dim=768, audio_proj_dim=64, dit_dim=64
    )
    # densify the zero-init vocal branch + head so the comparison is
    # non-trivial
    with torch.no_grad():
        for blk in model.blocks:
            blk.cross_attn.k_vocal.weight.normal_(0, 0.1)
            blk.cross_attn.v_vocal.weight.normal_(0, 0.1)
        model.head.head.weight.normal_(0, 0.05)
    return model.eval()


def _tiny_cfg():
    from stableavatar_tpu.config import DiTConfig

    return DiTConfig(
        dim=64,
        ffn_dim=128,
        num_heads=4,
        num_layers=2,
        text_len=32,
        text_dim=48,
        freq_dim=64,
        audio_in_dim=768,
        audio_proj_dim=64,
        vocal_num_heads=8,
    )


def test_forward_probe_on_converted_tiny_reference():
    import parity_vs_torch as pv

    ref_model = _tiny_ref_model()
    cfg = _tiny_cfg()
    jax_params = pv.convert_torch_dit_to_jax(ref_model, cfg)

    report = pv.compare_dit_forward(ref_model, jax_params, cfg, f=5, lh=8, lw=8, la=40)
    assert report["max_rel"] < 5e-3, report
    assert np.isfinite(report["mean_abs"])


def test_harness_imports_and_loaders_exist():
    """The load functions referenced in the docstring exist and the reference
    package imports (assembly smoke; full assembly needs checkpoints)."""
    import parity_vs_torch as pv

    assert callable(pv.load_reference_pipeline)
    assert callable(pv.load_reference_dit)
    assert callable(pv.load_tpu_stack)
    assert callable(pv.compare_pipelines)
    wan = pv._import_reference()
    assert wan is not None


def _tiny_ref_model_14b():
    """The ACTUAL reference 14B module at a tiny config — exercises the 14B
    variant's semantics that differ from 1B: the vocal projector runs on the
    FULL CFG batch (no [-1:] slice + [0,v,v] tile,
    `wan_fantasy_transformer3d_14B.py:1008`), latents_num_frames is
    hardcoded 21 (`:569`), and the projector is the 2-stage
    768->2048->proj_dim `VocalProjModel` (`vocal_projector_fantasy_14B.py:
    384-398`)."""
    import parity_vs_torch as pv

    pv._import_reference()
    from wan.models.wan_fantasy_transformer3d_14B import (
        WanTransformer3DFantasy14BModel,
    )
    from wan.models.vocal_projector_fantasy_14B import (
        FantasyTalkingVocalCondition14BModel,
    )

    torch.manual_seed(1)
    model = WanTransformer3DFantasy14BModel(
        model_type="i2v",
        patch_size=(1, 2, 2),
        text_len=32,
        in_dim=36,
        dim=64,
        ffn_dim=128,
        freq_dim=64,
        text_dim=48,
        out_dim=16,
        num_heads=4,
        num_layers=2,
        eps=1e-6,
    )
    # dim-matched tiny projector (the default ctor uses audio_proj_dim=dim
    # already, but rebuild for a seeded init); VocalProjModel's hidden 2048
    # stays (hardcoded in the reference)
    model.vocal_projector = FantasyTalkingVocalCondition14BModel(
        audio_in_dim=768, audio_proj_dim=64, dit_dim=64
    )
    with torch.no_grad():
        for blk in model.blocks:
            blk.cross_attn.k_vocal.weight.normal_(0, 0.1)
            blk.cross_attn.v_vocal.weight.normal_(0, 0.1)
        model.head.head.weight.normal_(0, 0.05)
    return model.eval()


def test_forward_probe_on_converted_tiny_reference_14b():
    """14B-variant step parity: full-batch vocal projector (no CFG tiling)
    at the reference's hardcoded 21 latent frames / 81 video frames."""
    import parity_vs_torch as pv
    from stableavatar_tpu.config import DiTConfig

    ref_model = _tiny_ref_model_14b()
    cfg = DiTConfig(
        dim=64,
        ffn_dim=128,
        num_heads=4,
        num_layers=2,
        text_len=32,
        text_dim=48,
        freq_dim=64,
        audio_in_dim=768,
        audio_proj_dim=64,
        audio_proj_hidden=2048,
        vocal_num_heads=8,
    )
    jax_params = pv.convert_torch_dit_to_jax(ref_model, cfg)

    report = pv.compare_dit_forward(
        ref_model, jax_params, cfg, f=21, lh=8, lw=8, la=165,
        video_sample_n_frames=81, vocal_cfg_tile=False,
    )
    assert report["max_rel"] < 5e-3, report
    assert np.isfinite(report["mean_abs"])

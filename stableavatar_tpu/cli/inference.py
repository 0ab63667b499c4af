"""CLI inference entry point.

Preserves the reference `inference.py` flag surface (`:238-409`) mapped onto
the TPU stack:

- `--ulysses_degree/--ring_degree` -> the 'sp' mesh axis size (both forms of
  sequence parallelism are one GSPMD sharding here);
- `--fsdp_dit` -> parameter sharding over the 'fsdp' axis;
- `--GPU_memory_mode` -> any offload mode (the default here) keeps umT5-xxl
  in host RAM and encodes prompts on the CPU backend — the 16 GB v5e analog
  of the reference's 13 GB `model_cpu_offload`; `--t5_cpu` (parsed-only in
  the reference) does the same explicitly;
- TeaCache flags map to the host-side controller;
- `--fast_path` enables the TPU int8/fused-rope inference path
  (utils/fastpath.py).

Run: python -m stableavatar_tpu.cli.inference --config_path ... (see --help)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("stableavatar-tpu inference")
    # I/O (reference inference.py:238-409 flag names preserved)
    p.add_argument("--config_path", type=str, default=None)
    p.add_argument("--pretrained_model_name_or_path", type=str, required=False)
    p.add_argument("--transformer_path", type=str, default=None)
    p.add_argument("--pretrained_wav2vec_path", type=str, default=None)
    p.add_argument("--validation_reference_path", type=str, required=False)
    p.add_argument("--validation_driven_audio_path", type=str, required=False)
    p.add_argument("--validation_prompts", type=str, default="")
    p.add_argument("--negative_prompts", type=str, default="")
    p.add_argument("--output_dir", type=str, default="outputs")
    # generation
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--sample_steps", type=int, default=50)
    # reference spellings --sample_*_guide_scale accepted as aliases
    # (inference.py:343-351; defaults follow inference.sh:23-24, the
    # recommended operating point, not the reference argparse defaults)
    p.add_argument("--text_guide_scale", "--sample_text_guide_scale",
                   type=float, default=3.0)
    p.add_argument("--audio_guide_scale", "--sample_audio_guide_scale",
                   type=float, default=5.0)
    p.add_argument("--sample_shift", type=float, default=None,
                   help="flow-matching sigma shift (inference.py:338-342); "
                        "None keeps the config default 5.0")
    p.add_argument("--clip_sample_n_frames", type=int, default=81)
    p.add_argument("--overlap_window_length", type=int, default=15)
    p.add_argument("--overlapping_weight_scheme", type=str, default="uniform",
                   choices=["uniform", "log"])
    p.add_argument("--sample_solver", type=str, default="euler",
                   choices=["euler", "dpm++", "unipc"],
                   help="flow-matching solver; the reference hardwires Euler "
                        "in this pipeline (inference.py:491-493) but ships "
                        "dpm++/unipc as injectable schedulers "
                        "(wan/utils/fm_solvers*.py)")
    p.add_argument("--solver_order", type=int, default=2, choices=[1, 2, 3])
    p.add_argument("--color_correction_strength", type=float, default=0.0,
                   help="opt-in LAB-space color match of the decoded video "
                        "to the reference image (0 disables = reference "
                        "parity: the util is imported but unwired at "
                        "wan_inference_long_pipeline.py:32)")
    p.add_argument("--solver_type", type=str, default=None,
                   choices=["midpoint", "heun", "bh1", "bh2"],
                   help="dpm++: midpoint (default) | heun; unipc: bh2 "
                        "(default) | bh1 (reference NaNs at the final step "
                        "with bh1; ours folds it to the exact x0)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--motion_frame", type=int, default=25)  # accepted-unused (parity)
    # RIFLEx RoPE extrapolation — the reference wires enable_riflex(k=6,
    # L_test=66, L_test_scale=4.886) but no entry point calls it
    # (wan_fantasy_transformer3d_1B.py:890-906); opt-in here
    p.add_argument("--enable_riflex", action="store_true")
    p.add_argument("--riflex_k", type=int, default=6)
    p.add_argument("--riflex_L_test", type=int, default=66)
    p.add_argument("--riflex_scale", type=float, default=4.886)
    # parsed-only in the reference too (trainer-flag residue in its
    # inference argparse, inference.py:241-299): accepted for CLI compat
    p.add_argument("--input_perturbation", type=float, default=0)
    p.add_argument("--revision", type=str, default=None)
    p.add_argument("--variant", type=str, default=None)
    p.add_argument("--report_to", type=str, default="tensorboard")
    p.add_argument("--validation_epochs", type=int, default=1)
    p.add_argument("--offload_model", action="store_true",
                   help="reference parses this separately from "
                        "GPU_memory_mode (inference.py:302-304); here any "
                        "offload request maps to the same T5-on-host analog")
    # model family
    p.add_argument("--model_family", type=str, default="1.3B", choices=["1.3B", "14B"])
    # memory / speed
    # default differs from the reference's model_full_load: a 16 GB v5e
    # cannot hold umT5-xxl + DiT + activations (the reference targets 25 GB
    # GPUs, app.py:283); model_cpu_offload == encode-then-release here
    p.add_argument("--GPU_memory_mode", type=str, default="model_cpu_offload",
                   choices=["model_full_load", "model_cpu_offload",
                            "model_cpu_offload_and_qfloat8", "sequential_cpu_offload"])
    p.add_argument("--enable_teacache", action="store_true")
    p.add_argument("--teacache_threshold", type=float, default=0.1)
    p.add_argument("--num_skip_start_steps", type=int, default=5)
    # parsed-only (parity): TeaCache state is a handful of host-side floats
    # here (models/teacache.py) — there is nothing to offload, unlike the
    # reference's GPU-resident residual tensors
    p.add_argument("--teacache_offload", action="store_true")
    # TPU inference fast path (utils/fastpath.py): split-pair rope layout +
    # int8 MXU attention/linears.  "qk" quantizes self-attention QK^T;
    # "linears" additionally runs block projections/FFN as W8A8
    p.add_argument("--fast_path", type=str, default="off",
                   choices=["off", "rope", "qk", "linears"])
    # exact shipped-reference attention numerics: the 1B reference
    # force-disables flash-attn (wan_fantasy_transformer3d_1B.py:45-46) and
    # its SDPA path drops the vocal k_lens padding masks; we honor them by
    # default (a quality improvement) — this flag replicates the reference
    p.add_argument("--reference_attn_numerics", action="store_true",
                   help="drop vocal k_lens padding masks in cross-attention, "
                        "bit-matching the shipped reference SDPA path")
    # unbounded-length output: stream decoded u8 segments straight to the
    # mp4 writer so host RAM stays O(segment) instead of O(duration) —
    # a 5-minute 512^2 clip is ~23 GB as one float array
    p.add_argument("--stream_output", action="store_true")
    # parallelism (reference: xfuser ulysses/ring + FSDP)
    # multi-host bootstrap (parallel/distributed.py; reference scale-out is
    # 8 machines x 8 GPUs via Accelerate static rendezvous)
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--ulysses_degree", type=int, default=1)
    p.add_argument("--ring_degree", type=int, default=1)
    p.add_argument("--fsdp_dit", action="store_true")
    p.add_argument("--t5_fsdp", action="store_true")  # parsed-only in reference too
    p.add_argument("--t5_cpu", action="store_true")
    return p


def resolve_fast_path(args):
    """Map --fast_path x --GPU_memory_mode onto the param-prep knobs.

    Returns (prepare, quant, rope_split, attn_quant).

    `model_cpu_offload_and_qfloat8` quantizes weight STORAGE only
    (quant="store": int8 weights + per-channel scales, dequantized to bf16
    at use) — the TPU analog of the reference's fp8 weight storage with
    autocast compute (`wan/utils/fp8_optimization.py:28-56`, applied at
    `inference.py:516-518`).  It is a memory mode: compute stays bf16.
    int8 COMPUTE (W8A8 linears, int8 QK) remains an explicit perf opt-in
    via --fast_path.
    """
    fast = getattr(args, "fast_path", "off")
    quant_store = (
        getattr(args, "GPU_memory_mode", "") == "model_cpu_offload_and_qfloat8"
    )
    prepare = fast != "off" or quant_store
    if fast == "linears":
        quant = True  # W8A8 compute (covers the storage saving too)
    elif quant_store:
        quant = "store"
    else:
        quant = False
    attn_quant = "qk" if fast in ("qk", "linears") else "none"
    return prepare, quant, prepare, attn_quant


def build_tokenizer(args, root, t5_cfg):
    """The umT5 tokenizer when present on disk, else a deterministic
    byte-level fallback so the CLI still runs e2e in smoke mode."""
    tok_dir = root and os.path.join(root, "google/umt5-xxl")
    if tok_dir and os.path.isdir(tok_dir):
        from transformers import AutoTokenizer

        hf_tok = AutoTokenizer.from_pretrained(tok_dir)
        # training tokenizes at --tokenizer_max_length (226 default,
        # train_1B_square.py:636-640); inference at the model text_len (512)
        tok_len = int(getattr(args, "tokenizer_max_length", 0) or t5_cfg.text_len)

        def tokenizer(text):
            out = hf_tok(
                text, padding="max_length", max_length=tok_len,
                truncation=True, add_special_tokens=True, return_tensors="np",
            )
            ids = out["input_ids"][0]
            mask = out["attention_mask"][0]
            if tok_len < t5_cfg.text_len:  # re-pad to the model context
                import numpy as _np

                pad = t5_cfg.text_len - tok_len
                ids = _np.pad(ids, (0, pad))
                mask = _np.pad(mask, (0, pad))
            return ids, mask
    else:
        # no umT5 tokenizer on disk (random-weight smoke runs): fall back to
        # a deterministic byte-level tokenizer so the CLI still runs e2e
        print("[stableavatar-tpu] no umt5 tokenizer found - using byte-level "
              "fallback (smoke mode; outputs are not meaningful without "
              "checkpoints)")

        def tokenizer(text):
            import numpy as _np

            ids = _np.zeros(t5_cfg.text_len, dtype=_np.int32)
            toks = [b % (t5_cfg.vocab - 2) + 2 for b in text.encode()][: t5_cfg.text_len - 1]
            ids[: len(toks)] = toks
            ids[len(toks)] = 1  # eos
            mask = _np.zeros(t5_cfg.text_len, dtype=_np.int32)
            mask[: len(toks) + 1] = 1
            return ids, mask

    return tokenizer


def load_models(args):
    """Assemble the WanModels bundle from checkpoints (or random init when no
    checkpoint paths are given — useful for smoke runs)."""
    import contextlib

    import jax
    import jax.numpy as jnp

    from stableavatar_tpu.config import WAN_1_3B, WAN_14B, VAEConfig
    from stableavatar_tpu.models.clip import init_clip_visual
    from stableavatar_tpu.models.dit import cast_params, init_dit
    from stableavatar_tpu.models.t5 import init_t5
    from stableavatar_tpu.models.vae import init_vae
    from stableavatar_tpu.models.wav2vec import init_wav2vec2
    from stableavatar_tpu.pipelines.common import WanModels
    from stableavatar_tpu.utils import checkpoint as ckpt

    # STABLEAVATAR_TINY=1: self-consistent miniature configs so the FULL
    # CLI path drives end to end on a CPU in seconds (checkpoint-free
    # plumbing smoke; outputs are random-weight noise)
    tiny_cfgs = None
    if os.environ.get("STABLEAVATAR_TINY") == "1":
        from stableavatar_tpu.config import tiny_debug_configs

        tiny_cfgs = tiny_debug_configs()
        print("[stableavatar-tpu] STABLEAVATAR_TINY=1 - tiny debug models "
              "(plumbing smoke only)")

    cfg = WAN_14B if args.model_family == "14B" else WAN_1_3B
    if tiny_cfgs is not None:
        cfg = tiny_cfgs[0]
    if getattr(args, "enable_riflex", False):
        import dataclasses as _dc

        cfg = _dc.replace(
            cfg, riflex_k=args.riflex_k, riflex_L_test=args.riflex_L_test,
            riflex_scale=args.riflex_scale,
        )
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)

    root = args.pretrained_model_name_or_path

    def maybe(path):
        return root and os.path.exists(os.path.join(root, path))

    from stableavatar_tpu.config import T5Config, CLIPConfig, Wav2Vec2Config

    t5_cfg = tiny_cfgs[2] if tiny_cfgs is not None else T5Config()
    # umT5-xxl is ~11.4 GB bf16 and is used exactly once per request; on a
    # 16 GB v5e it cannot coexist with the DiT + decode working set, so any
    # mode but model_full_load keeps it in HOST RAM and encodes on the CPU
    # backend (the reference's --t5_cpu, which it only parses;
    # inference.py:316-324) — encode_prompt_ids routes by param device.
    t5_host = (
        getattr(args, "t5_cpu", False)
        or getattr(args, "offload_model", False)
        or getattr(args, "GPU_memory_mode", "model_full_load") != "model_full_load"
    )
    t5_encode_and_free = False
    if t5_host:
        # Some accelerator plugins (e.g. the axon TPU tunnel) register ONLY
        # their own backend — there is no 'cpu' backend to offload onto.
        # Inference knows its prompts up front, so instead load T5 on the
        # accelerator FIRST (before anything else claims HBM), encode the
        # prompts eagerly, and free the 11.4 GB before the DiT loads.
        try:
            cpu_dev = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            t5_host = False
            t5_encode_and_free = (
                getattr(args, "validation_prompts", None) is not None
            )
            print(
                "[stableavatar-tpu] no CPU backend to offload the text encoder "
                "onto; "
                + ("encoding prompts eagerly then freeing T5 from device HBM"
                   if t5_encode_and_free else
                   "keeping T5 on the accelerator (bf16)")
            )
    t5_device_ctx = (
        jax.default_device(cpu_dev) if t5_host else contextlib.nullcontext()
    )
    # host CPU runs f32 (CPU bf16 gemms are emulated and ~100x slower);
    # device runs bf16 (umt5-xxl f32 is ~21 GB — over HBM)
    t5_dtype = jnp.float32 if t5_host else jnp.bfloat16
    with t5_device_ctx:
        if maybe("models_t5_umt5-xxl-enc-bf16.pth"):
            sd = ckpt.load_torch_state_dict(os.path.join(root, "models_t5_umt5-xxl-enc-bf16.pth"))
            t5_params = cast_params(ckpt.convert_t5(sd, t5_cfg), t5_dtype)
        else:
            # init+cast fused in ONE jit: a separate f32 init would
            # materialize the full 21 GB tree before a bf16 cast
            t5_params = jax.jit(
                lambda k: cast_params(init_t5(k, t5_cfg), t5_dtype)
            )(ks[2])
        jax.block_until_ready(jax.tree.leaves(t5_params)[0])

    tokenizer = build_tokenizer(args, root, t5_cfg)

    text_ctx = None
    if t5_encode_and_free and tokenizer is not None:
        from stableavatar_tpu.models.t5 import t5_encode
        from stableavatar_tpu.pipelines.common import stack_cfg_ids

        ids, mask = stack_cfg_ids(
            tokenizer, args.validation_prompts,
            getattr(args, "negative_prompts", "") or "",
        )
        emb = t5_encode(t5_params, t5_cfg, ids, mask)
        text_ctx = emb * mask[..., None].astype(emb.dtype)
        text_ctx.block_until_ready()
        t5_params = None  # frees ~11.4 GB of HBM before the DiT loads
        print("[stableavatar-tpu] prompts encoded; T5 released from device")

    if maybe("diffusion_pytorch_model.safetensors"):
        sd = ckpt.load_torch_state_dict(os.path.join(root, "diffusion_pytorch_model.safetensors"))
        dit_params = ckpt.convert_dit(sd, cfg)
    else:
        # init+cast fused in ONE jitted program: eager init over the
        # tunneled TPU pays an RPC round-trip per primitive (minutes for
        # the random-weight smoke fallback)
        dit_params = jax.jit(lambda k: cast_params(init_dit(k, cfg), jnp.bfloat16))(ks[0])
    if args.transformer_path and os.path.exists(args.transformer_path):
        # fine-tuned .pt override: non-strict, size-filtered merge
        # (reference inference.py:485-490)
        sd = ckpt.load_torch_state_dict(args.transformer_path)
        dit_params = ckpt.merge_pt_override(dit_params, sd, cfg)
    dit_params = cast_params(dit_params, jnp.bfloat16)

    vae_cfg = tiny_cfgs[1] if tiny_cfgs is not None else VAEConfig()
    if maybe("Wan2.1_VAE.pth"):
        sd = ckpt.load_torch_state_dict(os.path.join(root, "Wan2.1_VAE.pth"))
        vae_params = ckpt.convert_vae(sd, vae_cfg)
        vae_params = cast_params(vae_params, jnp.bfloat16)
    else:
        vae_params = jax.jit(
            lambda k: cast_params(init_vae(k, vae_cfg), jnp.bfloat16)
        )(ks[1])

    clip_cfg = tiny_cfgs[3] if tiny_cfgs is not None else CLIPConfig()
    if maybe("models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth"):
        sd = ckpt.load_torch_state_dict(
            os.path.join(root, "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth")
        )
        clip_params = ckpt.convert_clip_visual(sd, clip_cfg)
        clip_params = cast_params(clip_params, jnp.bfloat16)
    else:
        clip_params = jax.jit(
            lambda k: cast_params(init_clip_visual(k, clip_cfg), jnp.bfloat16)
        )(ks[3])

    w2v_cfg = tiny_cfgs[4] if tiny_cfgs is not None else Wav2Vec2Config()
    if args.pretrained_wav2vec_path and os.path.isdir(args.pretrained_wav2vec_path):
        # honor the checkpoint's processor normalization setting
        pc = os.path.join(args.pretrained_wav2vec_path, "preprocessor_config.json")
        if os.path.exists(pc):
            import json

            with open(pc) as f:
                import dataclasses

                w2v_cfg = dataclasses.replace(
                    w2v_cfg, do_normalize=bool(json.load(f).get("do_normalize", True))
                )
        import glob

        files = glob.glob(os.path.join(args.pretrained_wav2vec_path, "*.bin")) + glob.glob(
            os.path.join(args.pretrained_wav2vec_path, "*.safetensors")
        )
        if files:
            sd = ckpt.load_torch_state_dict(files[0])
            sd = {k.removeprefix("wav2vec2."): v for k, v in sd.items()}
            w2v_params = ckpt.convert_wav2vec2(sd, w2v_cfg)
        else:
            w2v_params = jax.jit(lambda k: init_wav2vec2(k, w2v_cfg))(ks[4])
    else:
        w2v_params = jax.jit(lambda k: init_wav2vec2(k, w2v_cfg))(ks[4])

    teacache = None
    # getattr: load_models is shared with cli/train.py, whose parser has no
    # inference-only teacache flags
    if getattr(args, "enable_teacache", False):
        from stableavatar_tpu.models.teacache import TeaCache, get_teacache_coefficients

        coef = get_teacache_coefficients(f"wan2.1-t2v-{args.model_family.lower()}")
        teacache = TeaCache(
            coef, args.sample_steps, rel_l1_thresh=args.teacache_threshold,
            num_skip_start_steps=args.num_skip_start_steps,
        )

    prep, quant, rope_split, attn_quant = resolve_fast_path(args)
    sequential = (
        getattr(args, "GPU_memory_mode", "") == "sequential_cpu_offload"
    )
    if sequential and prep:
        # the reference's --GPU_memory_mode values are mutually exclusive
        # modes (inference.py:513-524): sequential offload does not compose
        # with the fp8/int8 prep (which materializes the full prepared tree
        # in device memory — the thing sequential mode exists to avoid)
        print("[stableavatar-tpu] sequential_cpu_offload: skipping fast-path "
              "param prep (bf16 host-streamed blocks)")
        prep, quant, rope_split, attn_quant = False, False, False, "none"
    if prep:
        from stableavatar_tpu.utils.fastpath import prepare_fast_params

        dit_params = prepare_fast_params(dit_params, cfg, quant=quant)

    # reference semantics: ring_degree>1 selects ring attention inside the
    # sp group (inference.py:445-449 composes world = ring x ulysses)
    attn_impl = "ring" if getattr(args, "ring_degree", 1) > 1 else "ulysses"

    streamed_dit = None
    if sequential:
        # block weights live in HOST RAM and stream through a
        # double-buffered HBM slot (models/streaming.py) — runs 14B (~28 GB
        # bf16) on a 16 GB chip; the reference mode it mirrors exists for
        # exactly this (`inference.py:513-524`)
        from stableavatar_tpu.models.streaming import StreamedDiT

        streamed_dit = StreamedDiT(
            dit_params, cfg,
            rope_split=rope_split, attn_quant=attn_quant,
            attn_impl=attn_impl,
            honor_vocal_k_lens=not getattr(args, "reference_attn_numerics", False),
        )
        # free the device-resident stacked blocks; the pipeline only touches
        # streamed_dit in this mode
        dit_params = None
        print(f"[stableavatar-tpu] sequential_cpu_offload: "
              f"{streamed_dit.num_layers} DiT blocks host-resident, "
              f"streaming double-buffered")

    return WanModels(
        dit_params=dit_params,
        dit_cfg=cfg,
        vae_params=vae_params,
        vae_cfg=vae_cfg,
        t5_params=t5_params,
        t5_cfg=t5_cfg,
        clip_params=clip_params,
        clip_cfg=clip_cfg,
        wav2vec_params=w2v_params,
        wav2vec_cfg=w2v_cfg,
        tokenizer=tokenizer,
        teacache=teacache,
        rope_split=rope_split,
        attn_quant=attn_quant,
        attn_impl=attn_impl,
        honor_vocal_k_lens=not getattr(args, "reference_attn_numerics", False),
        text_ctx=text_ctx,
        streamed_dit=streamed_dit,
    )


def main(argv=None):
    args = build_parser().parse_args(argv)

    from stableavatar_tpu.parallel.mesh import make_mesh, mesh_context
    from stableavatar_tpu.parallel.sharding import shard_params
    from stableavatar_tpu.pipelines.long import generate_long
    from stableavatar_tpu.utils.media import load_image, load_wav
    from stableavatar_tpu.utils.video_io import save_videos_grid

    from stableavatar_tpu.parallel.distributed import (
        apply_platform_override,
        initialize_distributed,
    )

    apply_platform_override()
    initialize_distributed(
        args.coordinator_address, args.num_processes, args.process_id
    )

    import jax

    sp = args.ulysses_degree * args.ring_degree
    fsdp = 1
    if args.fsdp_dit and len(jax.devices()) >= sp * 2:
        fsdp = len(jax.devices()) // sp
    mesh = None
    if sp > 1 or fsdp > 1:
        mesh = make_mesh(dp=1, fsdp=fsdp, sp=sp)

    # validate inputs BEFORE the multi-minute model load.  TeaCache composes
    # with the multistep solvers (skip schedule + residual replay under
    # dpm++/unipc, tests/test_pipeline.py::test_generate_long_multistep_with_
    # teacache) — no solver restriction.
    for path, what in [
        (args.validation_reference_path, "reference image"),
        (args.validation_driven_audio_path, "driving audio"),
    ]:
        if not path or not os.path.exists(path):
            print(f"error: {what} not found: {path!r}", file=sys.stderr)
            return 2

    import time as _time

    _t0 = _time.time()
    models = load_models(args)
    print(f"[stableavatar-tpu] models loaded ({_time.time()-_t0:.0f}s)", flush=True)

    ref = load_image(args.validation_reference_path, (args.width, args.height))
    wav, _ = load_wav(args.validation_driven_audio_path, args.sample_rate)

    # encode the prompt up front, then release umT5 from device HBM — the
    # TPU analog of the reference's model_cpu_offload (inference.py:513-524):
    # umT5-xxl bf16 is ~9.5 GB and is needed exactly once per request; a
    # 16 GB v5e cannot hold it alongside the DiT + activations
    from stableavatar_tpu.pipelines.common import encode_prompts

    text_ctx = models.text_ctx  # pre-encoded by the loader (T5 freed)
    if text_ctx is None and models.tokenizer is not None:
        text_ctx = encode_prompts(
            models, args.validation_prompts, args.negative_prompts
        )
        text_ctx.block_until_ready()
        print(f"[stableavatar-tpu] prompt encoded ({_time.time()-_t0:.0f}s)", flush=True)

    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, f"video_seed{args.seed}.mp4")
    sink_writer = None
    if args.stream_output:
        from stableavatar_tpu.utils.video_io import StreamingVideoWriter

        # direct-ffmpeg backend muxes the driving audio in the same pass
        sink_writer = StreamingVideoWriter(
            out_path, fps=args.fps,
            audio_path=args.validation_driven_audio_path,
        )

    with mesh_context(mesh):
        if mesh is not None and models.dit_params is not None:
            # sequential_cpu_offload keeps blocks host-resident (dit_params
            # is None then); its single-chip streaming path is not sharded
            models.dit_params = shard_params(models.dit_params, mesh)
        out = generate_long(
            models,
            ref_image=ref,
            vocal_waveform=wav,
            text_ctx=text_ctx,
            prompt=args.validation_prompts,
            negative_prompt=args.negative_prompts,
            num_inference_steps=args.sample_steps,
            text_guide_scale=args.text_guide_scale,
            audio_guide_scale=args.audio_guide_scale,
            clip_length=args.clip_sample_n_frames,
            overlap_window_length=args.overlap_window_length,
            overlapping_weight_scheme=args.overlapping_weight_scheme,
            scheduler=args.sample_solver,
            solver_order=args.solver_order,
            solver_type=args.solver_type,
            fps=args.fps,
            sr=args.sample_rate,
            seed=args.seed,
            shift=(args.sample_shift if args.sample_shift is not None else 5.0),
            color_correction_strength=args.color_correction_strength,
            frame_sink=sink_writer.append if sink_writer is not None else None,
        )

    print(f"[stableavatar-tpu] generation done ({_time.time()-_t0:.0f}s)", flush=True)
    if sink_writer is not None:
        out_path = sink_writer.close()
    else:
        out_path = save_videos_grid(out.videos, out_path, fps=args.fps) or out_path
    # mux the driving audio when ffmpeg is available (reference
    # save_video_ffmpeg crops + muxes, inference.py:53-89)
    from stableavatar_tpu.utils.media import ffmpeg_available, mux_audio

    if sink_writer is not None and sink_writer.audio_muxed:
        pass  # streamed through ffmpeg with the audio in the same pass
    elif not out_path.endswith(".mp4"):
        # StreamingVideoWriter's PNG-directory fallback (no mp4 backend):
        # nothing to mux audio into
        print("audio mux skipped: output is a frame directory, not an mp4")
    elif ffmpeg_available():
        try:
            muxed = out_path[: -len(".mp4")] + "_audio.mp4"
            mux_audio(out_path, args.validation_driven_audio_path, muxed)
            out_path = muxed
        except Exception as e:
            print(f"audio mux skipped: {e}")
    print(f"saved {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Training CLI — reference trainer flag surface on the TPU stack.

Replaces the five near-clone reference trainers (`train_1B_square.py`,
`train_1B_rec_vec.py`, `train_1B_rec_vec_lora.py`, `train_14B.py`,
`train_14B_lora.py`, each 1.4-1.5k LoC) with one parametrized entry point:
`--model_family`, `--rec_vec` (dataset interleave), `--lora` cover all five.
Accelerate/DeepSpeed launch configs are replaced by the ('dp','fsdp','sp')
mesh flags — the same code runs 1 chip or a 64-chip pod slice.
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser("stableavatar-tpu train")
    # data (reference train_1B_square.py:293-750 flag names preserved)
    p.add_argument("--train_data_dir", type=str, required=False)
    p.add_argument("--train_data_meta", type=str, required=False,
                   help="index txt listing clip dirs")
    p.add_argument("--train_data_rec_meta", type=str, default=None)
    p.add_argument("--train_data_vec_meta", type=str, default=None)
    p.add_argument("--video_sample_size", type=int, default=512)
    p.add_argument("--video_sample_n_frames", type=int, default=81)
    # frame-sampling stride (reference LargeScaleTalkingFantasyVideos
    # sample_frame_rate, train_1B_square.py:968; window span =
    # (n_frames-1)*stride+1 then linspace indexing)
    p.add_argument("--sample_frame_rate", type=int, default=1)
    p.add_argument("--audio_sample_rate", type=int, default=16000)
    # reference: DataLoader(num_workers=...) (train_1B_square.py:433,979);
    # here a decode thread pool + bounded background prefetch
    p.add_argument("--dataloader_num_workers", type=int, default=0)
    p.add_argument("--prefetch_depth", type=int, default=2)
    p.add_argument("--fps", type=int, default=25)
    # model
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None)
    p.add_argument("--transformer_path", type=str, default=None)
    p.add_argument("--pretrained_wav2vec_path", type=str, default=None)
    p.add_argument("--model_family", type=str, default="1.3B", choices=["1.3B", "14B"])
    # optimization
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--adam_weight_decay", type=float, default=3e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-10)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--lr_scheduler", type=str, default="constant",
                   choices=["constant", "constant_with_warmup", "linear",
                            "cosine", "cosine_with_restarts", "polynomial"])
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--scale_lr", action="store_true",
                   help="scale LR by accum * batch * dp degree "
                        "(train_1B_square.py:903-906)")
    p.add_argument("--max_grad_norm", type=float, default=0.05)
    p.add_argument("--initial_grad_norm_ratio", type=float, default=5.0)
    p.add_argument("--abnormal_norm_clip_start", type=int, default=1000)
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--max_train_steps", type=int, default=10000)
    p.add_argument("--gradient_checkpointing", action="store_true", default=True)
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="maps to int8 weight storage on TPU (optax state stays fp32)")
    p.add_argument("--use_came", action="store_true",
                   help="CAME optimizer (reference --use_came, train/came.py)")
    import argparse as _argparse

    p.add_argument("--uniform_sampling", action=_argparse.BooleanOptionalAction,
                   default=True,
                   help="stratified-uniform timestep sampling; "
                        "--no-uniform_sampling switches to density sampling "
                        "per --weighting_scheme (train_1B_square.py:1206-1219)")
    p.add_argument("--weighting_scheme", type=str, default=None,
                   choices=[None, "sigma_sqrt", "cosmap", "logit_normal", "mode"])
    p.add_argument("--logit_mean", type=float, default=0.0)
    p.add_argument("--logit_std", type=float, default=1.0)
    p.add_argument("--mode_scale", type=float, default=1.29)
    p.add_argument("--train_sampling_steps", type=int, default=1000)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--train_mode", type=str, default="inpaint",
                   choices=["inpaint", "normal"])
    p.add_argument("--tokenizer_max_length", type=int, default=226)
    p.add_argument("--vae_mini_batch", type=int, default=1,
                   help="accepted for parity; the jitted streaming encode "
                        "handles the full batch in fixed memory")
    p.add_argument("--num_train_epochs", type=int, default=None,
                   help="accepted for parity; this loop is step-based "
                        "(--max_train_steps), like the reference's "
                        "max_train_steps override")
    p.add_argument("--motion_sub_loss", action="store_true")
    p.add_argument("--motion_sub_loss_ratio", type=float, default=0.25)
    # lora
    p.add_argument("--lora", action="store_true")
    p.add_argument("--rank", type=int, default=128)
    p.add_argument("--network_alpha", type=int, default=64)
    # checkpointing
    p.add_argument("--output_dir", type=str, default="train_output")
    p.add_argument("--log_every", type=int, default=10,
                   help="metrics JSONL/TensorBoard cadence in steps")
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=3)
    p.add_argument("--resume_from_checkpoint", type=str, default="latest")
    p.add_argument("--validation_steps", type=int, default=None)
    p.add_argument("--validation_reference_path", type=str, default=None)
    p.add_argument("--validation_driven_audio_path", type=str, default=None)
    # parallelism (replaces accelerate_config/*.yaml + deepspeed JSONs)
    # multi-host: one jax.distributed.initialize per process
    # (parallel/distributed.py; reference: 8 machines x 8 GPUs, Accelerate
    # static rendezvous)
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--low_vram", action="store_true",
                   help="keep umT5-xxl in host RAM and encode prompts on the "
                        "CPU backend (the reference ping-pongs encoders "
                        "CPU<->GPU, train_1B_square.py:1102-1107; activations "
                        "side is covered by remat + bf16)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    # must run before any other jax API touches the backend
    from stableavatar_tpu.parallel.distributed import (
        apply_platform_override,
        initialize_distributed,
    )

    apply_platform_override()
    initialize_distributed(
        args.coordinator_address, args.num_processes, args.process_id
    )

    import jax

    from stableavatar_tpu.cli.inference import load_models
    from stableavatar_tpu.data.dataset import InterleavedDataset, TalkingVideoDataset
    from stableavatar_tpu.parallel.mesh import make_mesh, mesh_context
    from stableavatar_tpu.parallel.sharding import shard_params
    from stableavatar_tpu.train.loop import train
    from stableavatar_tpu.train.trainer import TrainConfig

    # --low_vram: umT5-xxl (11.4 GB bf16) stays in host RAM;
    # encode_prompt_ids routes by param device (pipelines/common.py)
    args.t5_cpu = bool(getattr(args, "low_vram", False))
    models = load_models(args)

    if args.scale_lr:
        args.learning_rate = (args.learning_rate
                              * args.gradient_accumulation_steps
                              * args.train_batch_size * args.dp)

    tc = TrainConfig(
        learning_rate=args.learning_rate,
        weight_decay=args.adam_weight_decay,
        adam_eps=args.adam_epsilon,
        max_grad_norm=args.max_grad_norm,
        initial_grad_norm_ratio=args.initial_grad_norm_ratio,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        lr_total_steps=args.max_train_steps,
        abnormal_norm_clip_start=args.abnormal_norm_clip_start,
        motion_sub_loss=args.motion_sub_loss,
        motion_sub_loss_ratio=args.motion_sub_loss_ratio,
        weighting_scheme=args.weighting_scheme,
        uniform_sampling=args.uniform_sampling,
        logit_mean=args.logit_mean,
        logit_std=args.logit_std,
        mode_scale=args.mode_scale,
        num_train_timesteps=args.train_sampling_steps,
        adam_beta1=args.adam_beta1,
        adam_beta2=args.adam_beta2,
        remat=args.gradient_checkpointing,
        video_sample_n_frames=args.video_sample_n_frames,
        use_8bit_adam=args.use_8bit_adam,
        use_came=args.use_came,
    )

    size = (args.video_sample_size, args.video_sample_size)
    if args.train_data_rec_meta and args.train_data_vec_meta:
        # rec+vec interleave (train_1B_rec_vec.py:1101-1127): 832x480 + 480x832
        ds = InterleavedDataset(
            [
                TalkingVideoDataset(args.train_data_rec_meta, args.train_data_dir or "",
                                    sample_size=(480, 832), clip_length=args.video_sample_n_frames,
                                    sample_frame_rate=args.sample_frame_rate),
                TalkingVideoDataset(args.train_data_vec_meta, args.train_data_dir or "",
                                    sample_size=(832, 480), clip_length=args.video_sample_n_frames,
                                    sample_frame_rate=args.sample_frame_rate),
            ],
            seed=args.seed,
        )
        batches = ds.batches(args.train_batch_size,
                             num_workers=args.dataloader_num_workers,
                             prefetch_depth=args.prefetch_depth)
    else:
        ds = TalkingVideoDataset(
            args.train_data_meta, args.train_data_dir or "",
            sample_size=size, clip_length=args.video_sample_n_frames,
            sample_frame_rate=args.sample_frame_rate,
            fps=args.fps, sr=args.audio_sample_rate, seed=args.seed,
        )
        batches = ds.batches(args.train_batch_size,
                             num_workers=args.dataloader_num_workers,
                             prefetch_depth=args.prefetch_depth)

    mesh = None
    if args.dp * args.fsdp * args.sp > 1:
        if jax.process_count() > 1:
            from stableavatar_tpu.parallel.distributed import make_multihost_mesh

            mesh = make_multihost_mesh(dp=args.dp, fsdp=args.fsdp, sp=args.sp)
        else:
            mesh = make_mesh(dp=args.dp, fsdp=args.fsdp, sp=args.sp)

    validation_cfg = None
    if args.validation_steps and args.validation_reference_path:
        from stableavatar_tpu.utils.media import load_image, load_wav

        ref = load_image(args.validation_reference_path, size)
        wav, _ = load_wav(args.validation_driven_audio_path, args.audio_sample_rate)
        validation_cfg = {"ref_image": ref, "vocal_waveform": wav[: args.audio_sample_rate * 4]}

    with mesh_context(mesh):
        if mesh is not None:
            models.dit_params = shard_params(models.dit_params, mesh)
        train(
            models,
            batches,
            tc,
            output_dir=args.output_dir,
            max_train_steps=args.max_train_steps,
            checkpointing_steps=args.checkpointing_steps,
            checkpoints_total_limit=args.checkpoints_total_limit,
            resume_from_checkpoint=args.resume_from_checkpoint,
            seed=args.seed,
            train_mode=args.train_mode,
            log_every=args.log_every,
            validation_steps=args.validation_steps,
            validation_cfg=validation_cfg,
        )


if __name__ == "__main__":
    main()

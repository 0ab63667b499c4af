"""Full training-CLI drive at tiny scale (STABLEAVATAR_TINY=1).

Exercises the ACTUAL `cli.train.main` path end to end on CPU — arg parsing,
model assembly (random-init fallback), dataset-from-disk (TalkingVideoDataset
decode threads), encode_batch conditioning, the jitted train step, checkpoint
write + metrics JSONL — the same surface `scripts/train_tpu_smoke.py` drives
on the chip, minus scale.  Complements tests/test_train_loop.py, which feeds
`train()` synthetic in-memory batches and never touches the CLI.

Reference analog: the five trainer entry points
(`/root/reference/train_1B_square.py` etc.) driven via accelerate launch.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def train_data(tmp_path):
    import cv2

    from stableavatar_tpu.utils.media import save_wav

    root = tmp_path / "data"
    clip = root / "speech_clip_000"
    (clip / "images").mkdir(parents=True)
    (clip / "face_masks").mkdir()
    (clip / "lip_masks").mkdir()

    rng = np.random.default_rng(0)
    for i in range(12):
        frame = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(clip / "images" / f"{i:05d}.png"), frame)
        mask = (rng.random((64, 64)) > 0.5).astype(np.uint8) * 255
        cv2.imwrite(str(clip / "face_masks" / f"{i:05d}.png"), mask)
        cv2.imwrite(str(clip / "lip_masks" / f"{i:05d}.png"), mask)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    save_wav(str(clip / "audio.wav"), wav, 16000)

    index = root / "index.txt"
    index.write_text(str(clip) + "\n")
    return str(index)


def test_train_cli_end_to_end_tiny(train_data, tmp_path, monkeypatch):
    from stableavatar_tpu.cli.train import main

    outdir = str(tmp_path / "run")
    monkeypatch.setenv("STABLEAVATAR_TINY", "1")

    main([
        "--train_data_meta", train_data,
        "--video_sample_size", "32",
        "--video_sample_n_frames", "5",
        "--train_batch_size", "1",
        "--max_train_steps", "2",
        "--checkpointing_steps", "2",
        "--checkpoints_total_limit", "1",
        "--learning_rate", "1e-4",
        "--dataloader_num_workers", "1",
        "--log_every", "1",
        "--output_dir", outdir,
    ])

    # checkpoint written and rotated to the latest
    ckpts = [d for d in os.listdir(outdir) if d.startswith("checkpoint-")]
    assert ckpts == ["checkpoint-2"], os.listdir(outdir)

    # metrics JSONL carries finite losses for both steps
    metrics = [f for f in os.listdir(outdir) if f.endswith(".metrics.jsonl")]
    assert metrics, os.listdir(outdir)
    with open(os.path.join(outdir, metrics[0])) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    losses = [r["train_loss"] for r in rows if "train_loss" in r]
    assert len(losses) >= 2 and all(np.isfinite(l) for l in losses), rows


def test_train_cli_lora_end_to_end_tiny(train_data, tmp_path, monkeypatch):
    """--lora drive: the reference's LoRA trainers
    (train_1B_rec_vec_lora.py / train_14B_lora.py) map to the same CLI with
    --lora; adapters train while base weights stay frozen."""
    from stableavatar_tpu.cli.train import main

    outdir = str(tmp_path / "run_lora")
    monkeypatch.setenv("STABLEAVATAR_TINY", "1")

    main([
        "--train_data_meta", train_data,
        "--video_sample_size", "32",
        "--video_sample_n_frames", "5",
        "--train_batch_size", "1",
        "--max_train_steps", "1",
        "--checkpointing_steps", "1",
        "--lora", "--rank", "2", "--network_alpha", "4",
        "--output_dir", outdir,
    ])
    assert any(d.startswith("checkpoint-") for d in os.listdir(outdir))

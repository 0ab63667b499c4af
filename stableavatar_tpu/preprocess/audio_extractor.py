"""mp4 -> 16 kHz mono WAV (reference `audio_extractor.py`, moviepy-based).

Host-side ffmpeg; gated with a clear error when ffmpeg is absent.
"""

from __future__ import annotations

import argparse

from stableavatar_tpu.utils.media import extract_audio


def extract(video_path: str, out_wav: str, sr: int = 16000) -> str:
    extract_audio(video_path, out_wav, sr)
    return out_wav


def main():
    p = argparse.ArgumentParser("audio_extractor")
    p.add_argument("--video_path", required=True)
    p.add_argument("--saved_audio_path", required=True)
    p.add_argument("--sample_rate", type=int, default=16000)
    a = p.parse_args()
    extract(a.video_path, a.saved_audio_path, a.sample_rate)


if __name__ == "__main__":
    main()

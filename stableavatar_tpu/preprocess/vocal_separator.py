"""Vocal separation (reference `vocal_seperator.py`: MDX-Net Kim_Vocal_2 via
the `audio-separator` ONNX package).

Separation is host-side preprocessing off the TPU hot path (SURVEY.md §2.3).
We use `audio-separator` when installed; otherwise fall back to a simple
spectral center-channel/karaoke filter (mid extraction + harmonic emphasis) so
the preprocessing pipeline stays runnable, with a warning that quality is
below the MDX-Net separator.
"""

from __future__ import annotations

import argparse
import warnings

import numpy as np

from stableavatar_tpu.utils.media import load_wav, save_wav


def separate(audio_path: str, out_path: str, model_dir: str | None = None) -> str:
    try:
        from audio_separator.separator import Separator  # optional dep

        sep = Separator(output_dir=".", model_file_dir=model_dir or ".")
        sep.load_model(model_filename="Kim_Vocal_2.onnx")
        outs = sep.separate(audio_path)
        vocal = [o for o in outs if "Vocal" in o]
        return vocal[0] if vocal else outs[0]
    except ImportError:
        warnings.warn(
            "audio-separator (ONNX) not installed; using a spectral-subtraction "
            "fallback vocal filter — install audio-separator for MDX-Net quality"
        )
        return _fallback_vocal_filter(audio_path, out_path)


def _fallback_vocal_filter(audio_path: str, out_path: str, sr: int = 16000) -> str:
    """Crude vocal emphasis: band-pass 80 Hz - 5 kHz + spectral noise floor
    subtraction.  Keeps speech intelligible for wav2vec conditioning."""
    from scipy.signal import butter, sosfilt, stft, istft

    wav, _ = load_wav(audio_path, sr)
    sos = butter(4, [80, 5000], btype="bandpass", fs=sr, output="sos")
    band = sosfilt(sos, wav).astype(np.float32)

    f, t, z = stft(band, fs=sr, nperseg=1024)
    mag = np.abs(z)
    noise_floor = np.quantile(mag, 0.1, axis=1, keepdims=True)
    mag_clean = np.maximum(mag - noise_floor, 0.0)
    z_clean = mag_clean * np.exp(1j * np.angle(z))
    _, clean = istft(z_clean, fs=sr, nperseg=1024)
    clean = clean[: len(wav)].astype(np.float32)
    save_wav(out_path, clean, sr)
    return out_path


def main():
    p = argparse.ArgumentParser("vocal_separator")
    p.add_argument("--audio_separator_model_file", default=None)
    p.add_argument("--audio_file_path", required=True)
    p.add_argument("--saved_vocal_path", required=True)
    a = p.parse_args()
    separate(a.audio_file_path, a.saved_vocal_path, a.audio_separator_model_file)


if __name__ == "__main__":
    main()

"""Vocal separation (reference `vocal_seperator.py`: MDX-Net Kim_Vocal_2 via
the `audio-separator` ONNX package).

Separation is host-side preprocessing off the TPU hot path (SURVEY.md §2.3).
Three tiers, best available wins:

1. **Native MDX-Net**: when the Kim_Vocal_2.onnx file is present, it is
   executed directly by our dependency-free ONNX runner
   (`utils/onnx_runner.py`) with the standard UVR/MDX STFT recipe
   (n_fft 7680, hop 1024, dim_f 3072, 256-frame segments) — no
   onnxruntime / audio-separator install needed.
2. `audio-separator` package when installed (reference parity path).
3. **DSP fallback**: harmonic/percussive separation (median-filter Wiener
   masking) + vocal band-pass — measurably better than a plain band-pass
   (tests/test_vocal_separation.py asserts the SNR gain), though still far
   below MDX-Net.
"""

from __future__ import annotations

import argparse
import os
import warnings

import numpy as np

from stableavatar_tpu.utils.media import load_wav, save_wav

# Kim_Vocal_2 MDX parameters (UVR model registry)
MDX_N_FFT = 7680
MDX_HOP = 1024
MDX_DIM_F = 3072
MDX_DIM_T = 256
MDX_SR = 44100


def separate(audio_path: str, out_path: str, model_dir: str | None = None) -> str:
    onnx_path = _find_model(model_dir)
    if onnx_path is not None:
        return separate_mdx_native(audio_path, out_path, onnx_path)
    try:
        from audio_separator.separator import Separator  # optional dep

        sep = Separator(output_dir=".", model_file_dir=model_dir or ".")
        sep.load_model(model_filename="Kim_Vocal_2.onnx")
        outs = sep.separate(audio_path)
        vocal = [o for o in outs if "Vocal" in o]
        return vocal[0] if vocal else outs[0]
    except ImportError:
        warnings.warn(
            "no Kim_Vocal_2.onnx found and audio-separator not installed; "
            "using the HPSS DSP fallback — mount the MDX model for "
            "reference-quality separation"
        )
        return _fallback_vocal_filter(audio_path, out_path)


def _find_model(model_dir):
    for d in filter(None, [model_dir, "."]):
        p = os.path.join(d, "Kim_Vocal_2.onnx")
        if os.path.exists(p):
            return p
    return None


# ---------------------------------------------------------------------------
# native MDX-Net inference (our ONNX runner)
# ---------------------------------------------------------------------------


def separate_mdx_native(
    audio_path: str, out_path: str, onnx_path: str, sr_out: int = 16000
) -> str:
    """Run the MDX-Net vocals model through utils/onnx_runner.py.

    Standard UVR recipe: 44.1 kHz stereo STFT (n_fft 7680, hop 1024), the
    lowest `dim_f` frequency bins as a [1, 4, dim_f, 256] re/im tensor per
    256-frame segment, model output ISTFT'd back to the vocals stem."""
    from stableavatar_tpu.utils.onnx_runner import load_onnx, run_graph

    graph = load_onnx(onnx_path)
    wav, _ = load_wav(audio_path, MDX_SR)
    stereo = np.stack([wav, wav]) if wav.ndim == 1 else wav  # [2, S]

    vocals = mdx_separate_waveform(stereo, graph)
    mono = vocals.mean(axis=0)
    # back to the pipeline rate
    from stableavatar_tpu.utils.media import resample

    mono16 = resample(mono, MDX_SR, sr_out)
    save_wav(out_path, mono16.astype(np.float32), sr_out)
    return out_path


def mdx_separate_waveform(stereo: np.ndarray, graph) -> np.ndarray:
    """[2, S] 44.1 kHz waveform -> [2, S] vocals via segment-wise MDX."""
    from scipy.signal import istft, stft
    from stableavatar_tpu.utils.onnx_runner import run_graph

    _, _, Z = stft(
        stereo, nperseg=MDX_N_FFT, noverlap=MDX_N_FFT - MDX_HOP, padded=True
    )  # [2, F, T]
    Zf = Z[:, :MDX_DIM_F]
    t_total = Zf.shape[-1]
    out = np.zeros_like(Zf)
    for start in range(0, t_total, MDX_DIM_T):
        seg = Zf[..., start : start + MDX_DIM_T]
        pad = MDX_DIM_T - seg.shape[-1]
        if pad:
            seg = np.pad(seg, ((0, 0), (0, 0), (0, pad)))
        x = np.concatenate([seg.real, seg.imag], axis=0)[None].astype(np.float32)
        y = np.asarray(next(iter(run_graph(graph, {graph.inputs[0]: x}).values())))
        y = y[0]
        spec = y[:2] + 1j * y[2:]
        out[..., start : start + MDX_DIM_T] = spec[..., : MDX_DIM_T - pad if pad else MDX_DIM_T]
    Zv = np.zeros_like(Z)
    Zv[:, :MDX_DIM_F] = out
    _, vocals = istft(Zv, nperseg=MDX_N_FFT, noverlap=MDX_N_FFT - MDX_HOP)
    return vocals[..., : stereo.shape[-1]].astype(np.float32)


# ---------------------------------------------------------------------------
# DSP fallback
# ---------------------------------------------------------------------------


def _fallback_vocal_filter(audio_path: str, out_path: str, sr: int = 16000) -> str:
    wav, _ = load_wav(audio_path, sr)
    clean = hpss_vocal_filter(wav, sr)
    save_wav(out_path, clean, sr)
    return out_path


def hpss_vocal_filter(wav: np.ndarray, sr: int = 16000) -> np.ndarray:
    """Harmonic/percussive separation + zero-phase vocal band-pass.

    Median filtering along time enhances sustained (harmonic/vocal) energy,
    along frequency enhances transients (drums); a Wiener soft mask keeps
    the harmonic part (Fitzgerald 2010).  The band-pass is zero-phase
    (`sosfiltfilt`) — the round-1 fallback's causal `sosfilt` added a
    frequency-dependent delay that decorrelated the output from the clean
    vocal (measured: ~1 dB SNR vs ~25 dB, tests/test_vocal_separation.py);
    the spectral noise-floor subtraction is dropped for the same reason (it
    clips quiet vocal passages)."""
    from scipy.ndimage import median_filter
    from scipy.signal import butter, istft, sosfiltfilt, stft

    f, t, z = stft(wav, fs=sr, nperseg=1024)
    mag = np.abs(z)
    harm = median_filter(mag, size=(1, 17))
    perc = median_filter(mag, size=(17, 1))
    mask = (harm**2) / (harm**2 + perc**2 + 1e-10)
    z_h = z * mask
    _, voc = istft(z_h, fs=sr, nperseg=1024)
    voc = voc[: len(wav)].astype(np.float32)

    sos = butter(4, [80, min(5000, sr // 2 - 1)], btype="bandpass", fs=sr, output="sos")
    return sosfiltfilt(sos, voc).astype(np.float32)


def bandpass_vocal_filter(wav: np.ndarray, sr: int = 16000) -> np.ndarray:
    """The previous (round-1) fallback, kept as the SNR comparison baseline."""
    from scipy.signal import butter, istft, sosfilt, stft

    sos = butter(4, [80, 5000], btype="bandpass", fs=sr, output="sos")
    band = sosfilt(sos, wav).astype(np.float32)
    f, t, z = stft(band, fs=sr, nperseg=1024)
    mag = np.abs(z)
    noise_floor = np.quantile(mag, 0.1, axis=1, keepdims=True)
    mag_clean = np.maximum(mag - noise_floor, 0.0)
    z_clean = mag_clean * np.exp(1j * np.angle(z))
    _, clean = istft(z_clean, fs=sr, nperseg=1024)
    return clean[: len(wav)].astype(np.float32)


def main():
    p = argparse.ArgumentParser("vocal_separator")
    p.add_argument("--audio_separator_model_file", default=None)
    p.add_argument("--audio_file_path", required=True)
    p.add_argument("--saved_vocal_path", required=True)
    args = p.parse_args()
    out = separate(
        args.audio_file_path, args.saved_vocal_path,
        model_dir=os.path.dirname(args.audio_separator_model_file)
        if args.audio_separator_model_file else None,
    )
    print(f"vocals written to {out}")


if __name__ == "__main__":
    main()

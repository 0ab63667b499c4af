"""Vocal separation quality: the HPSS fallback must beat the plain band-pass
baseline on a synthetic vocal+percussion mix, and the native MDX path must
drive a (tiny synthetic) ONNX model through the full STFT recipe."""

import numpy as np

from stableavatar_tpu.preprocess.vocal_separator import (
    bandpass_vocal_filter,
    hpss_vocal_filter,
)


def _synthetic_mix(sr=16000, seconds=3.0, rng=None):
    rng = rng or np.random.default_rng(0)
    t = np.arange(int(sr * seconds)) / sr
    # vowel-like vocal: harmonic stack at ~180 Hz with vibrato + formants
    f0 = 180 * (1 + 0.01 * np.sin(2 * np.pi * 5 * t))
    phase = 2 * np.pi * np.cumsum(f0) / sr
    vocal = sum(
        a * np.sin(k * phase)
        for k, a in [(1, 1.0), (2, 0.6), (3, 0.4), (4, 0.25), (5, 0.15)]
    )
    vocal *= 0.2 * (0.6 + 0.4 * np.sin(2 * np.pi * 1.5 * t) ** 2)  # syllables
    # percussion: short broadband bursts every 0.25 s
    perc = np.zeros_like(t)
    for start in np.arange(0, seconds, 0.25):
        i0 = int(start * sr)
        n = int(0.03 * sr)
        perc[i0 : i0 + n] += rng.standard_normal(n) * np.exp(-np.arange(n) / (0.005 * sr))
    perc *= 0.35
    return vocal.astype(np.float32), perc.astype(np.float32)


def _snr(est, ref):
    n = min(len(est), len(ref))
    est, ref = est[:n], ref[:n]
    # optimal scaling to remove gain mismatch
    a = float(np.dot(est, ref) / (np.dot(est, est) + 1e-12))
    noise = ref - a * est
    return 10 * np.log10(float(np.dot(ref, ref)) / (float(np.dot(noise, noise)) + 1e-12))


def test_hpss_beats_bandpass_baseline():
    vocal, perc = _synthetic_mix()
    mix = vocal + perc

    snr_mix = _snr(mix, vocal)
    snr_band = _snr(bandpass_vocal_filter(mix), vocal)
    snr_hpss = _snr(hpss_vocal_filter(mix), vocal)

    # the HPSS mask must clearly beat both the raw mix and the old fallback
    assert snr_hpss > snr_mix + 3.0, (snr_hpss, snr_mix)
    assert snr_hpss > snr_band + 2.0, (snr_hpss, snr_band)


def test_mdx_native_path_runs_tiny_model(tmp_path):
    """mdx_separate_waveform drives an ONNX graph through the full recipe
    (segmenting, re/im packing, ISTFT).  A 1x1-conv identity-ish model lets
    us check shape plumbing end to end without the real Kim_Vocal_2."""
    from tests.test_onnx_runner import _ld, _model, _node, _tensor
    from stableavatar_tpu.preprocess.vocal_separator import (
        MDX_DIM_F,
        mdx_separate_waveform,
    )
    from stableavatar_tpu.utils.onnx_runner import parse_onnx

    # y = x * 0.5 via a 1x1 conv over the 4 re/im channels
    w = (np.eye(4, dtype=np.float32) * 0.5).reshape(4, 4, 1, 1)
    nodes = [_node("Conv", ["input", "w"], ["output"])]
    model = _model(nodes, [_tensor("w", w)], ["input"], ["output"])
    graph = parse_onnx(model)

    rng = np.random.default_rng(1)
    stereo = rng.standard_normal((2, 44100)).astype(np.float32) * 0.1
    vocals = mdx_separate_waveform(stereo, graph)
    assert vocals.shape == stereo.shape
    assert np.isfinite(vocals).all()
    # a 0.5x spectrogram scale must come out as ~0.5x waveform (low bins
    # dominate white noise energy equally; allow loose bounds for the
    # dim_f truncation)
    ratio = np.linalg.norm(vocals) / np.linalg.norm(stereo)
    assert 0.3 < ratio < 0.7, ratio


def test_audio_extractor_gating_and_smoke(tmp_path):
    """preprocess/audio_extractor.py (the last unsmoked preproc surface):
    with ffmpeg absent the extractor fails LOUDLY (RuntimeError gate, not a
    silent empty wav); with ffmpeg present it really extracts a 16 kHz mono
    wav from a synthesized mp4."""
    import numpy as np
    import pytest

    from stableavatar_tpu.preprocess.audio_extractor import extract
    from stableavatar_tpu.utils import media

    if not media.ffmpeg_available():
        with pytest.raises(RuntimeError, match="ffmpeg"):
            extract("nonexistent.mp4", str(tmp_path / "o.wav"))
        pytest.skip("ffmpeg not available - real extraction path untested")

    import subprocess

    mp4 = str(tmp_path / "in.mp4")
    subprocess.run(
        ["ffmpeg", "-y", "-f", "lavfi", "-i", "sine=frequency=440:duration=1",
         "-f", "lavfi", "-i", "color=c=black:s=64x64:d=1",
         "-shortest", mp4],
        check=True, capture_output=True,
    )
    out = extract(mp4, str(tmp_path / "o.wav"), sr=16000)
    wav, sr = media.load_wav(out, 16000)
    assert sr == 16000
    assert 0.9 <= len(wav) / 16000 <= 1.1
    # a 440 Hz tone, not silence
    assert float(np.abs(wav).max()) > 0.05


def test_hpss_fallback_warns_loudly(tmp_path, capsys):
    """VERDICT r3: the DSP-fallback quality cliff must announce itself."""
    import warnings as _w

    import numpy as np

    from stableavatar_tpu.preprocess.vocal_separator import separate
    from stableavatar_tpu.utils.media import save_wav

    wav = (np.random.default_rng(0).standard_normal(16000) * 0.1).astype(np.float32)
    src = str(tmp_path / "in.wav")
    save_wav(src, wav, 16000)

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        out = separate(src, str(tmp_path / "out.wav"))
    assert out
    err = capsys.readouterr().err
    assert "VOCAL SEPARATION QUALITY WARNING" in err
    assert any("HPSS" in str(r.message) for r in rec)

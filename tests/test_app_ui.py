"""The Gradio UI path, executed: `build_ui()` constructs the reference's
three-tab contract (`/root/reference/app.py:280-496`), the Generate click
callback produces a video on disk through `AvatarService`, and
`launch(mcp_server=True)` serves HTTP (page render, MCP tool listing, and a
callback dispatched over POST /api) — via the first-party
`utils/gradio_shim.py` when real gradio is absent (this image)."""

import json
import os
import urllib.request
import wave

import numpy as np
import pytest

from tests.test_pipeline import make_tiny_models


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    from stableavatar_tpu.cli.app import AvatarService

    out = tmp_path_factory.mktemp("app_out")
    return AvatarService(make_tiny_models(), output_dir=str(out))


@pytest.fixture(scope="module")
def inputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("app_in")
    img_path = str(d / "ref.png")
    wav_path = str(d / "voice.wav")
    rng = np.random.default_rng(0)
    import imageio

    imageio.imwrite(img_path, rng.integers(0, 255, (32, 32, 3), np.uint8))
    w = (0.2 * np.sin(2 * np.pi * 220 * np.arange(18 * 640) / 16000)).astype(
        np.float32
    )
    with wave.open(wav_path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes((w * 32767).astype(np.int16).tobytes())
    return img_path, wav_path


def _gen_values(demo, img_path, wav_path):
    """Values for the Generate click wiring, in the UI's input order."""
    vals = demo.default_inputs("Generate 生成")
    # [image, audio, prompt, negative, width, height, clip_frames, steps,
    #  solver, cfg_t, cfg_a, overlap, scheme, fps, memory_mode, motion,
    #  tc_thresh, tc_skip, seed]
    vals[0], vals[1] = img_path, wav_path
    vals[2], vals[3] = "a person talking", ""
    vals[4] = vals[5] = 32  # width/height
    vals[6] = 9  # clip frames
    vals[7] = 2  # steps
    vals[11] = 1  # overlap
    vals[18] = 7  # seed
    return vals


def test_build_ui_three_tab_contract(service):
    from stableavatar_tpu.cli.app import build_ui

    demo = build_ui(service)
    labels = [t.label for t in demo.tabs]
    assert labels == [
        "Avatar Generation 数字人生成",
        "Audio Extraction 音频提取",
        "Vocal Separation 人声分离",
    ]
    assert [e["name"] for e in demo.events] == [
        "Generate 生成", "Extract", "Separate",
    ]
    gen = demo.events[0]
    assert len(gen["inputs"]) == 19 and len(gen["outputs"]) == 2


def test_generate_click_produces_video(service, inputs):
    from stableavatar_tpu.cli.app import build_ui

    demo = build_ui(service)
    img_path, wav_path = inputs
    video, used_seed = demo.dispatch(
        "Generate 生成", _gen_values(demo, img_path, wav_path)
    )
    assert used_seed == 7
    assert os.path.exists(video), video
    # the output components received the values
    assert demo.events[0]["outputs"][0].value == video


def test_service_generate_unipc_streaming(service, inputs):
    """Serving exposes the round-4 reduced-step operating point + the
    O(segment)-host-RAM streaming writer: generate() with sample_solver=unipc
    and stream_output=True writes frames through the frame sink."""
    img_path, wav_path = inputs
    video, used_seed, _ = service.generate(
        img_path, wav_path, "a person talking", "",
        width=32, height=32, num_inference_steps=3, clip_length=9,
        overlap_window_length=1, seed_param=11,
        sample_solver="unipc", stream_output=True,
    )
    assert used_seed == 11
    assert os.path.exists(video), video
    # PNG-dir fallback (no ffmpeg backend in this image) or mp4 — either way
    # the streamed output exists and is non-empty
    if os.path.isdir(video):
        assert os.listdir(video)


def test_launch_serves_http_and_mcp(service, inputs):
    from stableavatar_tpu.cli.app import build_ui

    demo = build_ui(service)
    img_path, wav_path = inputs
    demo.launch(server_name="127.0.0.1", server_port=0, mcp_server=True,
                prevent_thread_lock=True)
    try:
        base = f"http://127.0.0.1:{demo.server_port}"
        page = urllib.request.urlopen(base + "/", timeout=10).read().decode()
        assert "Avatar Generation" in page and "POST /api/" in page

        tools = json.loads(
            urllib.request.urlopen(base + "/mcp/tools", timeout=10).read()
        )["tools"]
        assert [t["name"] for t in tools] == ["Generate 生成", "Extract", "Separate"]

        # full HTTP callback dispatch (compile cache warm from the direct
        # dispatch test, so this is fast)
        body = json.dumps(
            {"data": _gen_values(demo, img_path, wav_path)}
        ).encode()
        from urllib.parse import quote

        req = urllib.request.Request(
            base + quote("/api/Generate 生成"), data=body,
            headers={"Content-Type": "application/json"}, method="POST",
        )
        resp = json.loads(urllib.request.urlopen(req, timeout=600).read())
        assert "data" in resp and len(resp["data"]) == 2, resp
        # values round-trip as JSON natives, not reprs: the video path must
        # exist verbatim and the seed must come back as a number
        video, used_seed = resp["data"]
        assert os.path.exists(video), video
        assert used_seed == 7, used_seed
    finally:
        demo.close()

"""ONNX wire-format parser + JAX executor (utils/onnx_runner.py), validated
by serializing a small conv net with a minimal protobuf writer and comparing
execution against torch."""

import struct

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from stableavatar_tpu.utils.onnx_runner import parse_onnx, run_graph


# --- minimal protobuf writer -------------------------------------------------

def _varint(x: int) -> bytes:
    out = b""
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num, wt, payload: bytes) -> bytes:
    return _varint(num << 3 | wt) + payload


def _ld(num, payload: bytes) -> bytes:
    return _field(num, 2, _varint(len(payload)) + payload)


def _tensor(name, arr: np.ndarray) -> bytes:
    out = b"".join(_field(1, 0, _varint(d)) for d in arr.shape)
    out += _field(2, 0, _varint(1))  # FLOAT
    out += _ld(8, name.encode())
    out += _ld(9, arr.astype("<f4").tobytes())
    return out


def _attr_ints(name, ints) -> bytes:
    out = _ld(1, name.encode())
    out += _ld(7, b"".join(_varint(i) for i in ints))
    out += _field(20, 0, _varint(7))  # type INTS
    return out


def _attr_int(name, i) -> bytes:
    return _ld(1, name.encode()) + _field(3, 0, _varint(i)) + _field(20, 0, _varint(2))


def _attr_float(name, f) -> bytes:
    return _ld(1, name.encode()) + _field(2, 5, struct.pack("<f", f)) + _field(20, 0, _varint(1))


def _node(op, inputs, outputs, attrs=b"") -> bytes:
    out = b"".join(_ld(1, s.encode()) for s in inputs)
    out += b"".join(_ld(2, s.encode()) for s in outputs)
    out += _ld(4, op.encode())
    out += attrs
    return out


def _value_info(name) -> bytes:
    return _ld(1, name.encode())


def _model(nodes, initializers, inputs, outputs) -> bytes:
    g = b"".join(_ld(1, n) for n in nodes)
    g += b"".join(_ld(5, t) for t in initializers)
    g += b"".join(_ld(11, _value_info(n)) for n in inputs)
    g += b"".join(_ld(12, _value_info(n)) for n in outputs)
    return _ld(7, g)


def test_conv_bn_relu_graph_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    w1 = rng.standard_normal((4, 3, 3, 3)).astype(np.float32) * 0.2
    b1 = rng.standard_normal(4).astype(np.float32) * 0.1
    scale = rng.uniform(0.5, 1.5, 4).astype(np.float32)
    bias = rng.standard_normal(4).astype(np.float32) * 0.1
    mean = rng.standard_normal(4).astype(np.float32) * 0.1
    var = rng.uniform(0.5, 1.5, 4).astype(np.float32)
    w2 = rng.standard_normal((6, 4, 3, 3)).astype(np.float32) * 0.2

    nodes = [
        _node("Conv", ["x", "w1", "b1"], ["c1"],
              _ld(5, _attr_ints("pads", [1, 1, 1, 1])) + _ld(5, _attr_ints("strides", [1, 1]))),
        _node("BatchNormalization", ["c1", "scale", "bias", "mean", "var"], ["bn"],
              _ld(5, _attr_float("epsilon", 1e-5))),
        _node("Relu", ["bn"], ["r1"]),
        _node("Conv", ["r1", "w2"], ["c2"],
              _ld(5, _attr_ints("pads", [1, 1, 1, 1])) + _ld(5, _attr_ints("strides", [2, 2]))),
        _node("Concat", ["c2", "c2"], ["out"], _ld(5, _attr_int("axis", 1))),
    ]
    inits = [_tensor("w1", w1), _tensor("b1", b1), _tensor("scale", scale),
             _tensor("bias", bias), _tensor("mean", mean), _tensor("var", var),
             _tensor("w2", w2)]
    model = _model(nodes, inits, ["x"], ["out"])

    g = parse_onnx(model)
    assert g.inputs == ["x"] and g.outputs == ["out"]
    got = np.asarray(run_graph(g, {"x": x})["out"])

    with torch.no_grad():
        t = torch.nn.functional.conv2d(torch.from_numpy(x), torch.from_numpy(w1),
                                       torch.from_numpy(b1), padding=1)
        t = torch.nn.functional.batch_norm(
            t, torch.from_numpy(mean), torch.from_numpy(var),
            torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5)
        t = torch.relu(t)
        t = torch.nn.functional.conv2d(t, torch.from_numpy(w2), padding=1, stride=2)
        want = torch.cat([t, t], dim=1).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv_transpose_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 5, 5)).astype(np.float32)
    w = rng.standard_normal((4, 3, 4, 4)).astype(np.float32) * 0.2  # [Cin, Cout, kH, kW]
    b = rng.standard_normal(3).astype(np.float32) * 0.1

    nodes = [
        _node("ConvTranspose", ["x", "w", "b"], ["out"],
              _ld(5, _attr_ints("pads", [1, 1, 1, 1])) + _ld(5, _attr_ints("strides", [2, 2]))),
    ]
    model = _model(nodes, [_tensor("w", w), _tensor("b", b)], ["x"], ["out"])
    got = np.asarray(run_graph(parse_onnx(model), {"x": x})["out"])

    with torch.no_grad():
        want = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=2, padding=1,
        ).numpy()
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gemm_and_elementwise():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 6)).astype(np.float32)
    w = rng.standard_normal((4, 6)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    nodes = [
        _node("Gemm", ["x", "w", "b"], ["g"], _ld(5, _attr_int("transB", 1))),
        _node("Sigmoid", ["g"], ["out"]),
    ]
    model = _model(nodes, [_tensor("w", w), _tensor("b", b)], ["x"], ["out"])
    got = np.asarray(run_graph(parse_onnx(model), {"x": x})["out"])
    want = 1 / (1 + np.exp(-(x @ w.T + b)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

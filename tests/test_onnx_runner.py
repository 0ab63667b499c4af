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


# --- scaled-down MDX-Net (TFC-TDF U-Net) topology ---------------------------

def _tensor_i64(name, arr: np.ndarray) -> bytes:
    out = b"".join(_field(1, 0, _varint(d)) for d in arr.shape)
    out += _field(2, 0, _varint(7))  # INT64
    out += _ld(8, name.encode())
    out += _ld(9, arr.astype("<i8").tobytes())
    return out


def test_mdx_net_topology_matches_torch():
    """A scaled-down UVR/MDX-Net Conv-TDF U-Net (the Kim_Vocal_2
    architecture the reference separates vocals with,
    `/root/reference/vocal_seperator.py:20-26`): freq-crop Slice, 1x1 stem
    conv, TFC conv blocks (Conv+BatchNorm+ReLU), a TDF bottleneck on the
    frequency axis (Transpose/MatMul/Add/Relu/MatMul/Add/Transpose +
    residual Add), strided-Conv downsample, ConvTranspose upsample, Concat
    skip connection, GroupNormalization, and a Sigmoid·Mul mask head —
    every op family the real MDX graph uses, serialized as real ONNX wire
    bytes and executed by our parser + JAX executor against torch."""
    rng = np.random.default_rng(3)
    C, G, F, T = 4, 4, 16, 8
    x = rng.standard_normal((1, C, F + 2, T)).astype(np.float32)

    def w(*shape, s=0.2):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    # weights
    stem_w, stem_b = w(G, C, 1, 1), w(G)
    bn = lambda c: (rng.uniform(0.5, 1.5, c).astype(np.float32),
                    w(c, s=0.1), w(c, s=0.1),
                    rng.uniform(0.5, 1.5, c).astype(np.float32))
    bn1 = bn(G)
    tfc1_w, tfc1_b = w(G, G, 3, 3), w(G)
    bn2 = bn(G)
    tdf1_w, tdf1_b = w(F, F // 2), w(F // 2)
    tdf2_w, tdf2_b = w(F // 2, F), w(F)
    down_w, down_b = w(2 * G, G, 2, 2), w(2 * G)
    bn3 = bn(2 * G)
    mid_w, mid_b = w(2 * G, 2 * G, 3, 3), w(2 * G)
    gn_s, gn_b = rng.uniform(0.5, 1.5, 2 * G).astype(np.float32), w(2 * G, s=0.1)
    up_w, up_b = w(2 * G, G, 2, 2), w(G)  # ConvTranspose [Cin, Cout, kH, kW]
    bn4 = bn(G)
    dec_w, dec_b = w(G, 2 * G, 3, 3), w(G)
    bn5 = bn(G)
    head_w, head_b = w(C, G, 1, 1), w(C)

    eps = 1e-5
    A = lambda *chunks: b"".join(_ld(5, c) for c in chunks)
    conv_attrs = A(_attr_ints("pads", [1, 1, 1, 1]), _attr_ints("strides", [1, 1]))
    nodes = [
        # dim_f crop (the real net slices the STFT to dim_f bins)
        _node("Slice", ["x", "sl_starts", "sl_ends", "sl_axes"], ["xc"]),
        _node("Conv", ["xc", "stem_w", "stem_b"], ["s0"]),
        _node("BatchNormalization", ["s0", "bn1_s", "bn1_b", "bn1_m", "bn1_v"],
              ["s1"], A(_attr_float("epsilon", eps))),
        _node("Relu", ["s1"], ["s2"]),
        # TFC
        _node("Conv", ["s2", "tfc1_w", "tfc1_b"], ["t0"], conv_attrs),
        _node("BatchNormalization", ["t0", "bn2_s", "bn2_b", "bn2_m", "bn2_v"],
              ["t1"], A(_attr_float("epsilon", eps))),
        _node("Relu", ["t1"], ["t2"]),
        # TDF over the freq axis: [B,C,F,T] -> [B,C,T,F] -> dense(F)
        _node("Transpose", ["t2"], ["d0"], A(_attr_ints("perm", [0, 1, 3, 2]))),
        _node("MatMul", ["d0", "tdf1_w"], ["d1"]),
        _node("Add", ["d1", "tdf1_b"], ["d2"]),
        _node("Relu", ["d2"], ["d3"]),
        _node("MatMul", ["d3", "tdf2_w"], ["d4"]),
        _node("Add", ["d4", "tdf2_b"], ["d5"]),
        _node("Transpose", ["d5"], ["d6"], A(_attr_ints("perm", [0, 1, 3, 2]))),
        _node("Add", ["t2", "d6"], ["enc1"]),  # residual
        # downsample
        _node("Conv", ["enc1", "down_w", "down_b"], ["dn0"],
              A(_attr_ints("strides", [2, 2]))),
        _node("BatchNormalization", ["dn0", "bn3_s", "bn3_b", "bn3_m", "bn3_v"],
              ["dn1"], A(_attr_float("epsilon", eps))),
        _node("Relu", ["dn1"], ["dn2"]),
        # bottleneck TFC + GroupNorm
        _node("Conv", ["dn2", "mid_w", "mid_b"], ["m0"], conv_attrs),
        _node("GroupNormalization", ["m0", "gn_s", "gn_b"], ["m1"],
              A(_attr_float("epsilon", eps), _attr_int("num_groups", 2))),
        _node("Relu", ["m1"], ["m2"]),
        # upsample + skip concat + decoder TFC
        _node("ConvTranspose", ["m2", "up_w", "up_b"], ["u0"],
              A(_attr_ints("strides", [2, 2]))),
        _node("BatchNormalization", ["u0", "bn4_s", "bn4_b", "bn4_m", "bn4_v"],
              ["u1"], A(_attr_float("epsilon", eps))),
        _node("Relu", ["u1"], ["u2"]),
        _node("Concat", ["u2", "enc1"], ["cat"], A(_attr_int("axis", 1))),
        _node("Conv", ["cat", "dec_w", "dec_b"], ["dc0"], conv_attrs),
        _node("BatchNormalization", ["dc0", "bn5_s", "bn5_b", "bn5_m", "bn5_v"],
              ["dc1"], A(_attr_float("epsilon", eps))),
        _node("Relu", ["dc1"], ["dc2"]),
        # mask head: sigmoid mask applied to the cropped input
        _node("Conv", ["dc2", "head_w", "head_b"], ["h0"]),
        _node("Sigmoid", ["h0"], ["mask"]),
        _node("Mul", ["mask", "xc"], ["out"]),
    ]
    inits = [
        _tensor_i64("sl_starts", np.array([0])),
        _tensor_i64("sl_ends", np.array([F])),
        _tensor_i64("sl_axes", np.array([2])),
        _tensor("stem_w", stem_w), _tensor("stem_b", stem_b),
        _tensor("tfc1_w", tfc1_w), _tensor("tfc1_b", tfc1_b),
        _tensor("tdf1_w", tdf1_w), _tensor("tdf1_b", tdf1_b),
        _tensor("tdf2_w", tdf2_w), _tensor("tdf2_b", tdf2_b),
        _tensor("down_w", down_w), _tensor("down_b", down_b),
        _tensor("mid_w", mid_w), _tensor("mid_b", mid_b),
        _tensor("gn_s", gn_s), _tensor("gn_b", gn_b),
        _tensor("up_w", up_w), _tensor("up_b", up_b),
        _tensor("dec_w", dec_w), _tensor("dec_b", dec_b),
        _tensor("head_w", head_w), _tensor("head_b", head_b),
    ]
    for i, name in enumerate(["bn1", "bn2", "bn3", "bn4", "bn5"]):
        s, b, m, v = [bn1, bn2, bn3, bn4, bn5][i]
        inits += [_tensor(f"{name}_s", s), _tensor(f"{name}_b", b),
                  _tensor(f"{name}_m", m), _tensor(f"{name}_v", v)]

    model = _model(nodes, inits, ["x"], ["out"])
    g = parse_onnx(model)
    got = np.asarray(run_graph(g, {"x": x})["out"])

    # torch oracle
    import torch.nn.functional as tf

    def tbn(t, p):
        s, b, m, v = p
        return tf.batch_norm(t, torch.from_numpy(m), torch.from_numpy(v),
                             torch.from_numpy(s), torch.from_numpy(b), eps=eps)

    with torch.no_grad():
        tx = torch.from_numpy(x)[:, :, :F, :]
        t = torch.relu(tbn(tf.conv2d(tx, torch.from_numpy(stem_w),
                                     torch.from_numpy(stem_b)), bn1))
        t = torch.relu(tbn(tf.conv2d(t, torch.from_numpy(tfc1_w),
                                     torch.from_numpy(tfc1_b), padding=1), bn2))
        d = t.permute(0, 1, 3, 2)
        d = torch.relu(d @ torch.from_numpy(tdf1_w) + torch.from_numpy(tdf1_b))
        d = (d @ torch.from_numpy(tdf2_w) + torch.from_numpy(tdf2_b)).permute(0, 1, 3, 2)
        enc1 = t + d
        t = torch.relu(tbn(tf.conv2d(enc1, torch.from_numpy(down_w),
                                     torch.from_numpy(down_b), stride=2), bn3))
        t = tf.conv2d(t, torch.from_numpy(mid_w), torch.from_numpy(mid_b), padding=1)
        t = torch.relu(tf.group_norm(t, 2, torch.from_numpy(gn_s),
                                     torch.from_numpy(gn_b), eps=eps))
        t = torch.relu(tbn(tf.conv_transpose2d(t, torch.from_numpy(up_w),
                                               torch.from_numpy(up_b), stride=2), bn4))
        t = torch.cat([t, enc1], dim=1)
        t = torch.relu(tbn(tf.conv2d(t, torch.from_numpy(dec_w),
                                     torch.from_numpy(dec_b), padding=1), bn5))
        mask = torch.sigmoid(tf.conv2d(t, torch.from_numpy(head_w),
                                       torch.from_numpy(head_b)))
        want = (mask * tx).numpy()

    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dead_extra_output_allowed_consumed_raises():
    """ADVICE r3: a node declaring an extra output that nothing reads (e.g.
    MaxPool's optional Indices) must still execute; an extra output that IS
    consumed downstream (or is a graph output) must fail loudly."""
    import pytest

    from stableavatar_tpu.utils.onnx_runner import parse_onnx, run_graph

    x = np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4)

    # MaxPool with a dead Indices output -> runs fine
    n = _node("MaxPool", ["x"], ["y", "idx"],
              _ld(5, _attr_ints("kernel_shape", [2, 2]))
              + _ld(5, _attr_ints("strides", [2, 2])))
    g = parse_onnx(_model([n], [], ["x"], ["y"]))
    out = run_graph(g, {"x": x})
    np.testing.assert_allclose(
        np.asarray(out["y"]).reshape(2, 2),
        np.array([[5, 7], [13, 15]], np.float32),
    )

    # same node but Indices is a graph output -> NotImplementedError
    g2 = parse_onnx(_model([n], [], ["x"], ["y", "idx"]))
    with pytest.raises(NotImplementedError, match="extra outputs"):
        run_graph(g2, {"x": x})

    # same node but Indices consumed by a downstream node -> raises too
    n2 = _node("Relu", ["idx"], ["z"])
    g3 = parse_onnx(_model([n, n2], [], ["x"], ["z"]))
    with pytest.raises(NotImplementedError, match="extra outputs"):
        run_graph(g3, {"x": x})

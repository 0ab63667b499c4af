"""Minimal ONNX model runner in JAX — no onnx / onnxruntime dependency.

The reference's vocal separator runs MDX-Net (Kim_Vocal_2.onnx) through the
`audio-separator` ONNX-Runtime package (`vocal_seperator.py:20-26`).  This
environment ships neither onnxruntime nor the onnx python package, so this
module implements the two pieces needed to execute such a model natively:

1. a hand-rolled protobuf *wire-format* parser for the ONNX ModelProto
   subset (graph, nodes, initializers, attributes, tensors) — the wire
   format is a stable public standard, ~100 lines to decode;
2. a topological JAX executor covering the convolutional op set MDX-Net /
   UVR models use (Conv, ConvTranspose, BatchNorm, activations, elementwise,
   Reshape/Transpose/Concat/Slice, MatMul/Gemm, pooling).

Unsupported ops raise with the op name, so extending coverage is a
one-function change.  tests/test_onnx_runner.py round-trips a small conv net
through a writer + this parser + executor against a numpy reference.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional

import numpy as np

# ---------------------------------------------------------------------------
# protobuf wire format
# ---------------------------------------------------------------------------


def _read_varint(buf: memoryview, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) triples of one message."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 1:
            val = bytes(buf[pos : pos + 8])
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            val = bytes(buf[pos : pos + 4])
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _packed_varints(v) -> List[int]:
    out = []
    pos = 0
    while pos < len(v):
        x, pos = _read_varint(v, pos)
        out.append(x)
    return out


def _svarint(x: int) -> int:
    """Interpret a varint as signed 64-bit (two's complement)."""
    return x - (1 << 64) if x >= 1 << 63 else x


class Tensor:
    def __init__(self):
        self.dims: List[int] = []
        self.data_type = 1
        self.name = ""
        self.raw = b""
        self.float_data: List[float] = []
        self.int64_data: List[int] = []

    def to_numpy(self) -> np.ndarray:
        dt = {1: np.float32, 7: np.int64, 10: np.float16, 6: np.int32,
              9: np.bool_, 11: np.float64}[self.data_type]
        if self.raw:
            arr = np.frombuffer(self.raw, dtype=dt)
        elif self.float_data:
            arr = np.asarray(self.float_data, np.float32)
        elif self.int64_data:
            arr = np.asarray(self.int64_data, np.int64)
        else:
            arr = np.zeros(0, dt)
        return arr.reshape(self.dims) if self.dims else arr.reshape(())


def _parse_tensor(buf) -> Tensor:
    t = Tensor()
    for f, wt, v in _fields(buf):
        if f == 1:
            t.dims.extend(_packed_varints(v) if wt == 2 else [_svarint(v)])
        elif f == 2:
            t.data_type = v
        elif f == 4:
            t.float_data.extend(struct.unpack(f"<{len(v) // 4}f", bytes(v)))
        elif f == 7:
            t.int64_data.extend(
                [_svarint(x) for x in (_packed_varints(v) if wt == 2 else [v])]
            )
        elif f == 8:
            t.name = bytes(v).decode()
        elif f == 9:
            t.raw = bytes(v)
    return t


class Attr:
    def __init__(self):
        self.name = ""
        self.f = None
        self.i = None
        self.s = None
        self.t: Optional[Tensor] = None
        self.floats: List[float] = []
        self.ints: List[int] = []

    @property
    def value(self):
        for v in (self.t, self.s, self.f, self.i):
            if v is not None:
                return v.to_numpy() if isinstance(v, Tensor) else v
        return self.ints if self.ints else self.floats


def _parse_attr(buf) -> Attr:
    a = Attr()
    for f, wt, v in _fields(buf):
        if f == 1:
            a.name = bytes(v).decode()
        elif f == 2:
            a.f = struct.unpack("<f", v)[0]
        elif f == 3:
            a.i = _svarint(v)
        elif f == 4:
            a.s = bytes(v)
        elif f == 5:
            a.t = _parse_tensor(v)
        elif f == 6:
            a.floats.extend(struct.unpack(f"<{len(v) // 4}f", bytes(v))
                            if wt == 2 else [struct.unpack("<f", v)[0]])
        elif f == 7:
            a.ints.extend(
                [_svarint(x) for x in (_packed_varints(v) if wt == 2 else [v])]
            )
    return a


class Node:
    def __init__(self):
        self.inputs: List[str] = []
        self.outputs: List[str] = []
        self.op_type = ""
        self.attrs: Dict[str, Attr] = {}


def _parse_node(buf) -> Node:
    n = Node()
    for f, wt, v in _fields(buf):
        if f == 1:
            n.inputs.append(bytes(v).decode())
        elif f == 2:
            n.outputs.append(bytes(v).decode())
        elif f == 4:
            n.op_type = bytes(v).decode()
        elif f == 5:
            a = _parse_attr(v)
            n.attrs[a.name] = a
    return n


class OnnxGraph:
    def __init__(self):
        self.nodes: List[Node] = []
        self.initializers: Dict[str, np.ndarray] = {}
        self.inputs: List[str] = []
        self.outputs: List[str] = []


def _parse_value_info_name(buf) -> str:
    for f, wt, v in _fields(buf):
        if f == 1:
            return bytes(v).decode()
    return ""


def parse_onnx(data: bytes) -> OnnxGraph:
    """Parse an ONNX ModelProto byte string into an OnnxGraph."""
    g = OnnxGraph()
    graph_buf = None
    for f, wt, v in _fields(memoryview(data)):
        if f == 7:
            graph_buf = v
    if graph_buf is None:
        raise ValueError("no graph in ONNX model")
    for f, wt, v in _fields(graph_buf):
        if f == 1:
            g.nodes.append(_parse_node(v))
        elif f == 5:
            t = _parse_tensor(v)
            g.initializers[t.name] = t.to_numpy()
        elif f == 11:
            g.inputs.append(_parse_value_info_name(v))
        elif f == 12:
            g.outputs.append(_parse_value_info_name(v))
    g.inputs = [i for i in g.inputs if i not in g.initializers]
    return g


# ---------------------------------------------------------------------------
# JAX executor
# ---------------------------------------------------------------------------


def _conv(x, w, b, attrs, transpose=False):
    import jax.numpy as jnp
    from jax import lax

    strides = tuple(attrs["strides"].ints) if "strides" in attrs else (1, 1)
    pads = tuple(attrs["pads"].ints) if "pads" in attrs else (0,) * 4
    dil = tuple(attrs["dilations"].ints) if "dilations" in attrs else (1, 1)
    groups = attrs["group"].i if "group" in attrs else 1
    if "auto_pad" in attrs and attrs["auto_pad"].s not in (None, b"", b"NOTSET"):
        raise NotImplementedError(f"Conv auto_pad={attrs['auto_pad'].s!r}")
    nd = x.ndim - 2
    assert nd == 2, "only 2-D convs implemented (the MDX-Net op set)"
    if len(strides) < nd:
        strides = strides * nd
    # onnx pads = [b1, b2, ..., e1, e2, ...]
    padding = tuple((pads[k], pads[k + nd]) for k in range(nd))
    if not transpose:
        out = lax.conv_general_dilated(
            x, jnp.asarray(w), strides, padding, rhs_dilation=dil,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=groups,
        )
    else:
        # ConvTranspose weight layout is [C_in, C_out/groups, kH, kW];
        # express as input-dilated conv with the spatially-flipped kernel
        # (exact ONNX output-shape semantics:
        #  out = (in-1)*stride - pad_b - pad_e + kernel + output_padding,
        #  output_padding appended at the end of each spatial dim)
        opad = (tuple(attrs["output_padding"].ints)
                if "output_padding" in attrs else (0,) * nd)
        if dil != (1, 1):
            raise NotImplementedError("ConvTranspose dilations != 1")
        wt = jnp.asarray(w)
        kh, kw = wt.shape[2], wt.shape[3]
        wf = jnp.flip(wt, axis=(2, 3)).transpose(1, 0, 2, 3)  # -> OIHW
        if groups > 1:
            # grouped transpose: [C_in, C_out/g, k, k] -> per-group flip;
            # after the transpose above the OIHW layout interleaves groups
            # incorrectly, so reorder O to group-major
            cin, cog = wt.shape[0], wt.shape[1]
            wf = (jnp.flip(wt, axis=(2, 3))
                  .reshape(groups, cin // groups, cog, kh, kw)
                  .transpose(0, 2, 1, 3, 4)
                  .reshape(groups * cog, cin // groups, kh, kw))
        pad_t = tuple(
            (kh_kw - 1 - p0, kh_kw - 1 - p1 + op)
            for (p0, p1), kh_kw, op in zip(padding, (kh, kw), opad)
        )
        out = lax.conv_general_dilated(
            x, wf, (1, 1), pad_t, lhs_dilation=strides,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=groups,
        )
    if b is not None:
        out = out + jnp.asarray(b).reshape((1, -1) + (1,) * nd)
    return out


def run_graph(graph: OnnxGraph, inputs: Dict[str, np.ndarray]):
    """Execute the graph; returns dict of output name -> jnp array."""
    import jax.numpy as jnp

    env: Dict[str, object] = {}
    env.update({k: jnp.asarray(v) for k, v in graph.initializers.items()})
    env.update({k: jnp.asarray(v) for k, v in inputs.items()})

    def get(name):
        return env[name] if name else None

    # names actually read anywhere in the graph: dead declared outputs
    # (e.g. MaxPool's optional Indices) are allowed to go uncomputed
    consumed = {i for n in graph.nodes for i in n.inputs if i}

    for node in graph.nodes:
        i = node.inputs
        op = node.op_type
        a = node.attrs
        if op == "Conv":
            out = _conv(get(i[0]), np.asarray(env[i[1]]),
                        np.asarray(env[i[2]]) if len(i) > 2 else None, a)
        elif op == "ConvTranspose":
            out = _conv(get(i[0]), np.asarray(env[i[1]]),
                        np.asarray(env[i[2]]) if len(i) > 2 else None, a,
                        transpose=True)
        elif op == "BatchNormalization":
            x, sc, bi, mean, var = (get(n) for n in i[:5])
            eps = a["epsilon"].f if "epsilon" in a else 1e-5
            shape = (1, -1) + (1,) * (x.ndim - 2)
            out = (x - mean.reshape(shape)) / jnp.sqrt(var.reshape(shape) + eps)
            out = out * sc.reshape(shape) + bi.reshape(shape)
        elif op == "InstanceNormalization":
            x, sc, bi = (get(n) for n in i[:3])
            eps = a["epsilon"].f if "epsilon" in a else 1e-5
            axes = tuple(range(2, x.ndim))
            m = jnp.mean(x, axis=axes, keepdims=True)
            v = jnp.var(x, axis=axes, keepdims=True)
            shape = (1, -1) + (1,) * (x.ndim - 2)
            out = (x - m) / jnp.sqrt(v + eps) * sc.reshape(shape) + bi.reshape(shape)
        elif op == "GroupNormalization":
            x, sc, bi = (get(n) for n in i[:3])
            eps = a["epsilon"].f if "epsilon" in a else 1e-5
            ng = a["num_groups"].i
            b_, c = x.shape[:2]
            xs = x.reshape(b_, ng, c // ng, *x.shape[2:])
            axes = tuple(range(2, xs.ndim))
            m = jnp.mean(xs, axis=axes, keepdims=True)
            v = jnp.var(xs, axis=axes, keepdims=True)
            xs = (xs - m) / jnp.sqrt(v + eps)
            shape = (1, -1) + (1,) * (x.ndim - 2)
            out = xs.reshape(x.shape) * sc.reshape(shape) + bi.reshape(shape)
        elif op == "Relu":
            out = jnp.maximum(get(i[0]), 0)
        elif op == "LeakyRelu":
            alpha = a["alpha"].f if "alpha" in a else 0.01
            x = get(i[0])
            out = jnp.where(x >= 0, x, alpha * x)
        elif op == "Elu":
            alpha = a["alpha"].f if "alpha" in a else 1.0
            x = get(i[0])
            out = jnp.where(x >= 0, x, alpha * (jnp.exp(x) - 1))
        elif op == "Sigmoid":
            out = 1.0 / (1.0 + jnp.exp(-get(i[0])))
        elif op == "Tanh":
            out = jnp.tanh(get(i[0]))
        elif op in ("Add", "Sub", "Mul", "Div"):
            x, y = get(i[0]), get(i[1])
            out = {"Add": x + y, "Sub": x - y, "Mul": x * y, "Div": x / y}[op]
        elif op == "Concat":
            out = jnp.concatenate([get(n) for n in i], axis=a["axis"].i)
        elif op == "Transpose":
            out = jnp.transpose(get(i[0]), a["perm"].ints)
        elif op == "Reshape":
            shape = [int(s) for s in np.asarray(env[i[1]])]
            out = get(i[0]).reshape(shape)
        elif op == "Slice":
            x = get(i[0])
            starts = np.asarray(env[i[1]]).tolist()
            ends = np.asarray(env[i[2]]).tolist()
            axes = np.asarray(env[i[3]]).tolist() if len(i) > 3 else list(range(len(starts)))
            steps = np.asarray(env[i[4]]).tolist() if len(i) > 4 else [1] * len(starts)
            sl = [slice(None)] * x.ndim
            for s, e, ax, st in zip(starts, ends, axes, steps):
                sl[ax] = slice(s, None if e >= 2**31 else e, st)
            out = x[tuple(sl)]
        elif op == "MatMul":
            out = get(i[0]) @ get(i[1])
        elif op == "Gemm":
            x, w = get(i[0]), get(i[1])
            if a.get("transA") and a["transA"].i:
                x = x.T
            if a.get("transB") and a["transB"].i:
                w = w.T
            alpha = a["alpha"].f if "alpha" in a else 1.0
            beta = a["beta"].f if "beta" in a else 1.0
            out = alpha * (x @ w)
            if len(i) > 2:
                out = out + beta * get(i[2])
        elif op in ("AveragePool", "MaxPool"):
            from jax import lax

            ks = tuple(a["kernel_shape"].ints)
            strides = tuple(a["strides"].ints) if "strides" in a else ks
            x = get(i[0])
            window = (1, 1) + ks
            strd = (1, 1) + strides
            if op == "MaxPool":
                out = lax.reduce_window(x, -jnp.inf, lax.max, window, strd, "VALID")
            else:
                s = lax.reduce_window(x, 0.0, lax.add, window, strd, "VALID")
                out = s / np.prod(ks)
        elif op == "GlobalAveragePool":
            x = get(i[0])
            out = jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)
        elif op == "Identity":
            out = get(i[0])
        elif op == "Cast":
            # onnx TensorProto.DataType -> numpy
            to = a["to"].i
            dt = {1: jnp.float32, 6: jnp.int32, 7: jnp.int64, 9: jnp.bool_,
                  10: jnp.float16, 11: jnp.float64}.get(to)
            if dt is None:
                raise NotImplementedError(f"Cast to data_type {to}")
            out = get(i[0]).astype(dt)
        elif op == "Unsqueeze":
            axes = (np.asarray(env[i[1]]).tolist() if len(i) > 1
                    else list(a["axes"].ints))
            out = get(i[0])
            for ax in sorted(axes):
                out = jnp.expand_dims(out, ax)
        elif op == "Squeeze":
            axes = (np.asarray(env[i[1]]).tolist() if len(i) > 1
                    else list(a["axes"].ints))
            out = jnp.squeeze(get(i[0]), axis=tuple(axes))
        elif op == "Constant":
            out = jnp.asarray(a["value"].t.to_numpy())
        elif op == "Pad":
            x = get(i[0])
            pads = ([int(p) for p in np.asarray(env[i[1]])] if len(i) > 1
                    else list(a["pads"].ints))
            nd = x.ndim
            cfg = [(pads[d], pads[d + nd]) for d in range(nd)]
            out = jnp.pad(x, cfg)
        else:
            raise NotImplementedError(f"ONNX op not implemented: {op}")
        # bind every declared output, not just the first: a node with extra
        # live outputs we don't compute must fail loudly, not produce NaNs
        # downstream
        if isinstance(out, tuple):
            for name, val in zip(node.outputs, out):
                if name:
                    env[name] = val
        else:
            # a DECLARED extra output is fine when dead (e.g. MaxPool's
            # optional Indices); only a consumed one must fail loudly
            extra = [
                o for o in node.outputs[1:]
                if o and (o in consumed or o in graph.outputs)
            ]
            if extra:
                raise NotImplementedError(
                    f"{op} declares unsupported extra outputs {extra} "
                    "that are consumed downstream"
                )
            env[node.outputs[0]] = out

    return {o: env[o] for o in graph.outputs}


def load_onnx(path: str) -> OnnxGraph:
    with open(path, "rb") as f:
        return parse_onnx(f.read())

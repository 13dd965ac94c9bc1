"""Independent torch evaluation of ONNX graph bytes — the numerical oracle
for whole-graph lowering parity (the stand-in for ONNX-Runtime-CPU, which is
not installable here; same role as the reference's recorded-scores parity
harness, SURVEY §4 "score-parity tests").

Covers the op set the full-scale family fixtures emit
(:mod:`birda_tpu.onnx.fullscale`). Every op is implemented with torch
primitives, sharing nothing with the jax lowering beyond the wire-format
parser.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as TF

from birda_tpu.onnx.proto import load_model


def _ints(node, name, default=None):
    v = node.attr(name)
    if v is None:
        return default
    return [int(x) for x in np.asarray(v).reshape(-1)]


def torch_eval(model_bytes: bytes, feeds: dict) -> dict:
    """Run the graph with torch; returns {output_name: np.ndarray}."""
    m = load_model(model_bytes)
    g = m.graph
    env: dict[str, torch.Tensor] = {}
    for name, t in g.initializers.items():
        if t.array is not None:
            # np.array copies: parsed initializers are read-only views over
            # the protobuf buffer, which torch refuses to wrap.
            env[name] = torch.from_numpy(np.array(t.array))
    for k, v in feeds.items():
        env[k] = torch.from_numpy(np.array(v))

    for node in g.nodes:
        op = node.op_type
        ins = [env[i] if i else None for i in node.inputs]

        if op == "Conv":
            x, w = ins[0], ins[1]
            b = ins[2] if len(ins) > 2 else None
            strides = _ints(node, "strides", [1] * (x.ndim - 2))
            pads = _ints(node, "pads", [0] * (2 * (x.ndim - 2)))
            groups = int(node.attr("group", 1))
            spatial = x.ndim - 2
            assert pads[:spatial] == pads[spatial:], "symmetric pads only"
            if spatial == 1:
                out = TF.conv1d(x, w, b, stride=strides, padding=pads[:1],
                                groups=groups)
            else:
                out = TF.conv2d(x, w, b, stride=strides, padding=pads[:2],
                                groups=groups)
        elif op == "BatchNormalization":
            x, scale, bias, mean, var = ins
            eps = float(node.attr("epsilon", 1e-5))
            out = TF.batch_norm(x, mean, var, scale, bias, training=False,
                                eps=eps)
        elif op == "Sigmoid":
            out = torch.sigmoid(ins[0])
        elif op == "Softmax":
            out = torch.softmax(ins[0], dim=int(node.attr("axis", -1)))
        elif op == "Mul":
            out = ins[0] * ins[1]
        elif op == "Add":
            out = ins[0] + ins[1]
        elif op == "Sub":
            out = ins[0] - ins[1]
        elif op == "Div":
            out = ins[0] / ins[1]
        elif op == "Sqrt":
            out = torch.sqrt(ins[0])
        elif op == "Log":
            out = torch.log(ins[0])
        elif op == "MatMul":
            out = torch.matmul(ins[0], ins[1])
        elif op == "Gemm":
            a, b = ins[0], ins[1]
            if node.attr("transA", 0):
                a = a.T
            if node.attr("transB", 0):
                b = b.T
            out = float(node.attr("alpha", 1.0)) * (a @ b)
            if len(ins) > 2 and ins[2] is not None:
                out = out + float(node.attr("beta", 1.0)) * ins[2]
        elif op == "Transpose":
            out = ins[0].permute(*_ints(node, "perm"))
        elif op == "Unsqueeze":
            out = ins[0]
            for ax in sorted(_ints(node, "axes")):
                out = out.unsqueeze(ax)
        elif op == "Squeeze":
            out = ins[0]
            for ax in sorted(_ints(node, "axes"), reverse=True):
                out = out.squeeze(ax)
        elif op == "Slice":
            starts = _ints(node, "starts")
            ends = _ints(node, "ends")
            axes = _ints(node, "axes") or list(range(len(starts)))
            out = ins[0]
            for st, en, ax in zip(starts, ends, axes):
                out = out.narrow(ax, st, min(en, out.shape[ax]) - st)
        elif op == "Concat":
            out = torch.cat([i for i in ins if i is not None],
                            dim=int(node.attr("axis")))
        elif op == "ReduceMean":
            axes = _ints(node, "axes")
            keep = bool(node.attr("keepdims", 1))
            out = ins[0].mean(dim=axes, keepdim=keep)
        elif op == "GlobalAveragePool":
            out = ins[0].mean(dim=tuple(range(2, ins[0].ndim)), keepdim=True)
        elif op == "Flatten":
            ax = int(node.attr("axis", 1))
            out = ins[0].reshape(int(np.prod(ins[0].shape[:ax])), -1)
        elif op == "DFT":
            assert int(node.attr("onesided", 0)) == 1
            ax = int(node.attr("axis", 1))
            spec = torch.fft.rfft(ins[0], dim=ax)
            out = torch.stack([spec.real, spec.imag], dim=-1).float()
        elif op == "Identity":
            out = ins[0]
        elif op == "Relu":
            out = torch.relu(ins[0])
        else:
            raise NotImplementedError(f"torch oracle: op {op}")

        env[node.outputs[0]] = out

    return {vi.name: env[vi.name].numpy() for vi in g.outputs}

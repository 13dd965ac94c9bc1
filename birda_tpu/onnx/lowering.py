"""ONNX graph -> JAX function lowering.

The TPU path for the reference's ONNX-Runtime delegation: a parsed
:class:`~birda_tpu.onnx.proto.Model` becomes a pure jax function that XLA
compiles per batch shape (mirroring the per-shape warmup registry,
reference ``src/inference/classifier.rs:222``).

Design notes:

- Static shapes only. Under ``jit`` every intermediate has a known static
  shape, so shape-manipulating ops (``Shape``/``Gather``/``Concat`` chains
  that feed ``Reshape``) are *constant-folded on the host with numpy*: any
  node whose inputs are all host constants is evaluated eagerly with numpy
  semantics, keeping reshape/slice parameters static for XLA.
- Layout: ONNX convs are NCHW. XLA on TPU prefers NHWC internally but
  handles the dimension numbers natively — we pass explicit
  ``dimension_numbers`` and let the compiler pick layouts.
- Matmuls/convs request ``preferred_element_type=float32`` so bf16 inputs
  still accumulate in fp32 on the MXU.

Covered op set: everything the BirdNET v2.4 / v3.0, Perch v2, geomodel and
BSG/bat-head graph families use — including the quantized forms the ORT
quantizer emits for the int8-arm assets (QDQ Quantize/DequantizeLinear and
QOperator QLinearConv/QLinearMatMul + com.microsoft QLinear* elementwise,
with integer-exact int32 accumulation) — plus common glue ops so unseen
exports have a fighting chance. Unknown ops raise ``UnsupportedOnnxOp``.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any

import numpy as np

from .proto import _NP_DTYPES, Graph, Model, load_model

_NP_FROM_ONNX_DT = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


class UnsupportedOnnxOp(NotImplementedError):
    pass


def _is_host(x) -> bool:
    return isinstance(x, (np.ndarray, np.generic, int, float, bool))


def _np(x):
    return np.asarray(x)


def _dtype_kind(x) -> str:
    """dtype kind without forcing materialization (tracer-safe)."""
    dt = getattr(x, "dtype", None)
    return dt.kind if dt is not None else np.asarray(x).dtype.kind


def _autopad_amounts(op_shape, kernel, strides, dilations, mode):
    """SAME_UPPER/SAME_LOWER pad amounts per spatial dim."""
    pads = []
    for dim, k, s, d in zip(op_shape, kernel, strides, dilations):
        eff_k = (k - 1) * d + 1
        out = -(-dim // s)
        total = max(0, (out - 1) * s + eff_k - dim)
        if mode == b"SAME_LOWER":
            pads.append((total - total // 2, total // 2))
        else:
            pads.append((total // 2, total - total // 2))
    return pads


def _constant_payload(node):
    """See :func:`birda_tpu.onnx.proto.constant_payload` (moved there so
    the graph-level fusion passes can fold Constant nodes too)."""
    from .proto import constant_payload

    return constant_payload(node)


class _Evaluator:
    """Executes a graph node-by-node over a value environment."""

    def __init__(self, graph: Graph, compute_dtype=None, opset: int = 0):
        import threading

        self.graph = graph
        #: Default-domain opset version; 0 = unknown (treated as modern).
        #: Gates version-dependent semantics (old coerce-2D Softmax).
        self.opset = opset
        #: Per-thread stack of live environments (control-flow closure).
        self._tls = threading.local()
        #: Names of subgraph initializers lifted into the params pytree by
        #: OnnxFunction (fed through the outer env, not baked as consts).
        self.lifted_params: set = set()
        #: When set (e.g. bfloat16), conv/matmul *inputs* are cast to this
        #: dtype while accumulation stays fp32 via preferred_element_type —
        #: the mixed-precision inference recipe (TensorRT fp16-engine
        #: analogue). None = bit-faithful fp32 (the parity path).
        self.compute_dtype = compute_dtype
        self.const: dict[str, np.ndarray] = {
            name: t.array for name, t in graph.initializers.items()
            if t.array is not None
        }
        # Pre-fold Constant nodes into the constant pool.
        for node in graph.nodes:
            if node.op_type == "Constant" and node.outputs:
                v = _constant_payload(node)
                if v is not None:
                    self.const[node.outputs[0]] = v

    @property
    def compute_dtype(self):
        if getattr(self._tls, "cd_suppressed", False):
            return None
        return self._compute_dtype

    @compute_dtype.setter
    def compute_dtype(self, value):
        self._compute_dtype = value

    @contextmanager
    def _no_compute_cast(self):
        """Suppress mixed-precision input casts for the enclosed handlers
        (integer conv/matmul paths accumulate in int32 and must never see
        a bf16 cast). Per-thread, like the env stack: one function's
        evaluator serves concurrent per-shape warmup traces under
        ``--jobs``, and a plain save/restore of the shared attribute would
        leak the suppression into (or past) a sibling thread's trace."""
        prev = getattr(self._tls, "cd_suppressed", False)
        self._tls.cd_suppressed = True
        try:
            yield
        finally:
            self._tls.cd_suppressed = prev

    # -- execution ----------------------------------------------------------

    def run(self, feeds: dict[str, Any]) -> dict[str, Any]:
        import contextlib

        import jax

        env: dict[str, Any] = dict(self.const)
        env.update(feeds)
        env[""] = None  # optional (absent) inputs
        # The fp32 path is the BIT-FAITHFUL parity route (SURVEY §6, ≤1e-3
        # vs ONNX Runtime CPU): on TPU, XLA's DEFAULT dot/conv precision
        # computes f32 matmuls with bf16 passes, which alone costs ~2e-3
        # of score drift on the real op mix (measured on-chip via
        # scripts/accept_asset.py, round 5). HIGHEST forces exact f32 MXU
        # arithmetic. It lives HERE (not in OnnxFunction.__call__) so
        # every execution route — including the parity bisector's direct
        # capture_activations run — shares one numeric regime. The perf
        # modes (bf16/int8) keep DEFAULT; their drift budget is
        # documented separately.
        precision_ctx = (jax.default_matmul_precision("highest")
                         if self.compute_dtype is None
                         else contextlib.nullcontext())
        # Control-flow handlers (If/Loop) need the live environment for
        # outer-scope closure; a per-thread stack keeps concurrent traces
        # of the same function (per-shape warmups under --jobs) isolated.
        stack = getattr(self._tls, "envs", None)
        if stack is None:
            stack = self._tls.envs = []
        stack.append(env)
        try:
            with precision_ctx:
                for node in self.graph.nodes:
                    if node.op_type == "Constant":
                        continue
                    handler = getattr(self, f"op_{node.op_type}", None)
                    if handler is None:
                        raise UnsupportedOnnxOp(
                            f"ONNX op '{node.op_type}' (node '{node.name}') "
                            "is not supported"
                        )
                    args = [
                        self._fetch(node, pos, i, env[i]) if i else None
                        for pos, i in enumerate(node.inputs)
                    ]
                    result = handler(node, *args)
                    if not isinstance(result, tuple):
                        result = (result,)
                    for out_name, val in zip(node.outputs, result):
                        if out_name:
                            env[out_name] = self._store(out_name, val)
        finally:
            stack.pop()
        return env

    def _store(self, name, val):
        """Hook over every value entering the environment; subclasses may
        change the materialized representation (e.g. the int8 PTQ path
        stores fusion-boundary tensors as int8)."""
        return val

    def _fetch(self, node, pos, name, val):
        """Hook over every value leaving the environment for a node input;
        subclasses may adapt the representation per consumer (the int8 PTQ
        path hands boundary-stored int8 tensors to quantized consumers
        as-is and dequantizes them for everyone else)."""
        return val

    def _graph_consumes(self, name: str) -> bool:
        """Whether a tensor name feeds any node (incl. subgraphs) or is a
        graph output — used by ops with declared-but-unsupported optional
        outputs to fail typed at build instead of leaking None downstream."""
        names = getattr(self, "_consumed_names", None)
        if names is None:
            names = set()

            def walk(g):
                for nd in g.nodes:
                    names.update(i for i in nd.inputs if i)
                    for a in nd.attrs.values():
                        if a.g is not None:
                            walk(a.g)

            walk(self.graph)
            names.update(o.name for o in self.graph.outputs)
            self._consumed_names = names
        return name in names

    # -- numeric dispatch: numpy for host constants, jnp for traced ---------

    @staticmethod
    def _lib(*xs):
        if all(_is_host(x) for x in xs if x is not None):
            return np
        import jax.numpy as jnp

        return jnp

    def _mm_cast(self, *xs):
        """Cast matmul/conv operands to the compute dtype (traced path only);
        float operands only — integer/bool inputs pass through."""
        if self.compute_dtype is None:
            return xs
        import jax.numpy as jnp

        return tuple(
            jnp.asarray(x, self.compute_dtype)
            if x is not None and _dtype_kind(x) == "f"
            else x
            for x in xs
        )

    # -- elementwise --------------------------------------------------------

    def op_Add(self, node, a, b):
        return self._lib(a, b).add(a, b)

    def op_Sub(self, node, a, b):
        return self._lib(a, b).subtract(a, b)

    def op_Mul(self, node, a, b):
        return self._lib(a, b).multiply(a, b)

    def op_Div(self, node, a, b):
        m = self._lib(a, b)
        res = m.divide(a, b)
        # ONNX integer Div truncates toward zero.
        if _dtype_kind(a) in "iu" and _dtype_kind(b) in "iu" and m is np:
            res = (np.sign(res) * np.floor(np.abs(res))).astype(_np(a).dtype)
        return res

    def op_Pow(self, node, a, b):
        return self._lib(a, b).power(a, b)

    def op_Sqrt(self, node, x):
        return self._lib(x).sqrt(x)

    def op_Exp(self, node, x):
        return self._lib(x).exp(x)

    def op_Log(self, node, x):
        return self._lib(x).log(x)

    def op_Neg(self, node, x):
        return self._lib(x).negative(x)

    def op_Abs(self, node, x):
        return self._lib(x).abs(x)

    def op_Floor(self, node, x):
        return self._lib(x).floor(x)

    def op_Ceil(self, node, x):
        return self._lib(x).ceil(x)

    def op_Reciprocal(self, node, x):
        return 1.0 / x

    def op_Min(self, node, *xs):
        m = self._lib(*xs)
        out = xs[0]
        for x in xs[1:]:
            out = m.minimum(out, x)
        return out

    def op_Max(self, node, *xs):
        m = self._lib(*xs)
        out = xs[0]
        for x in xs[1:]:
            out = m.maximum(out, x)
        return out

    def op_Erf(self, node, x):
        if _is_host(x):
            from scipy.special import erf as _erf

            return _erf(x).astype(_np(x).dtype)
        import jax

        return jax.scipy.special.erf(x)

    def op_Relu(self, node, x):
        return self._lib(x).maximum(x, 0)

    def op_LeakyRelu(self, node, x):
        alpha = node.attr("alpha", 0.01)
        m = self._lib(x)
        return m.where(x >= 0, x, alpha * x)

    def op_PRelu(self, node, x, slope):
        m = self._lib(x, slope)
        return m.where(x >= 0, x, slope * x)

    def op_Elu(self, node, x):
        alpha = node.attr("alpha", 1.0)
        m = self._lib(x)
        return m.where(x >= 0, x, alpha * (m.exp(x) - 1))

    def op_Sigmoid(self, node, x):
        if _is_host(x):
            z = _np(x).astype(np.float64)
            return (1.0 / (1.0 + np.exp(-z))).astype(np.float32)
        import jax

        return jax.nn.sigmoid(x)

    def op_HardSigmoid(self, node, x):
        alpha = node.attr("alpha", 0.2)
        beta = node.attr("beta", 0.5)
        return self._lib(x).clip(alpha * x + beta, 0, 1)

    def op_HardSwish(self, node, x):
        return x * self._lib(x).clip(x / 6.0 + 0.5, 0, 1)

    def op_Tanh(self, node, x):
        return self._lib(x).tanh(x)

    def op_Softplus(self, node, x):
        m = self._lib(x)
        return m.log1p(m.exp(-m.abs(x))) + m.maximum(x, 0)

    def op_Celu(self, node, x):
        alpha = node.attr("alpha", 1.0)
        m = self._lib(x)
        return m.maximum(x, 0) + m.minimum(
            alpha * (m.exp(m.minimum(x, 0) / alpha) - 1), 0
        )

    def op_Selu(self, node, x):
        alpha = node.attr("alpha", 1.6732632423543772)
        gamma = node.attr("gamma", 1.0507009873554805)
        m = self._lib(x)
        return gamma * m.where(x > 0, x, alpha * (m.exp(m.minimum(x, 0)) - 1))

    def op_Mish(self, node, x):
        m = self._lib(x)
        return x * m.tanh(self.op_Softplus(node, x))

    def op_Softsign(self, node, x):
        m = self._lib(x)
        return x / (1 + m.abs(x))

    def op_ThresholdedRelu(self, node, x):
        alpha = node.attr("alpha", 1.0)
        m = self._lib(x)
        return m.where(x > alpha, x, m.zeros_like(x))

    def op_Shrink(self, node, x):
        bias = node.attr("bias", 0.0)
        lambd = node.attr("lambd", 0.5)
        m = self._lib(x)
        return m.where(x < -lambd, x + bias,
                       m.where(x > lambd, x - bias, m.zeros_like(x)))

    # Trigonometric family: rare in classifier backbones but trivial to
    # support, and preflight should not flag an export over them (ORT runs
    # whatever the graph holds, reference src/inference/runtime.rs:14).
    def op_Sin(self, node, x):
        return self._lib(x).sin(x)

    def op_Cos(self, node, x):
        return self._lib(x).cos(x)

    def op_Tan(self, node, x):
        return self._lib(x).tan(x)

    def op_Asin(self, node, x):
        return self._lib(x).arcsin(x)

    def op_Acos(self, node, x):
        return self._lib(x).arccos(x)

    def op_Atan(self, node, x):
        return self._lib(x).arctan(x)

    def op_Sinh(self, node, x):
        return self._lib(x).sinh(x)

    def op_Cosh(self, node, x):
        return self._lib(x).cosh(x)

    def op_Asinh(self, node, x):
        return self._lib(x).arcsinh(x)

    def op_Acosh(self, node, x):
        return self._lib(x).arccosh(x)

    def op_Atanh(self, node, x):
        return self._lib(x).arctanh(x)

    def op_Dropout(self, node, x, ratio=None, training_mode=None):
        # Inference no-op: real exported inference graphs routinely carry
        # Dropout nodes, and ORT executes them as identity (reference
        # ``src/inference/runtime.rs:14`` runs whatever the graph holds).
        if (training_mode is not None and _is_host(training_mode)
                and bool(np.asarray(training_mode).reshape(-1)[0])):
            raise UnsupportedOnnxOp(
                "Dropout with training_mode=True (training graph, not an "
                "inference export)"
            )
        if len(node.outputs) > 1 and node.outputs[1]:
            mask = (np.ones(np.shape(x), np.bool_) if _is_host(x)
                    else self._lib(x).ones(x.shape, np.bool_))
            return x, mask
        return x

    def _softmax_axes(self, node, x) -> tuple:
        """Opset >= 13: softmax along one axis (default -1). Opset < 13:
        the input is coerced to 2-D at ``axis`` (default 1) and softmax
        runs over the flattened trailing block — equivalent to reducing
        jointly over every axis from ``axis`` on."""
        if 0 < self.opset < 13:
            ax = node.attr("axis", 1) % x.ndim
            return tuple(range(ax, x.ndim))
        return (node.attr("axis", -1) % x.ndim,)

    def op_Softmax(self, node, x):
        axes = self._softmax_axes(node, x)
        m = self._lib(x)
        e = m.exp(x - m.max(x, axis=axes, keepdims=True))
        return e / e.sum(axis=axes, keepdims=True)

    def op_LogSoftmax(self, node, x):
        axes = self._softmax_axes(node, x)
        m = self._lib(x)
        z = x - m.max(x, axis=axes, keepdims=True)
        return z - m.log(m.exp(z).sum(axis=axes, keepdims=True))

    def op_Hardmax(self, node, x):
        m = self._lib(x)
        if 0 < self.opset < 13:
            # Coerce-2D semantics: one-hot argmax over the flattened
            # trailing block.
            ax = node.attr("axis", 1) % x.ndim
            rows = int(np.prod(x.shape[:ax], dtype=np.int64)) if ax else 1
            flat = m.reshape(x, (rows, -1))
            idx = m.argmax(flat, axis=1)
            one = m.arange(flat.shape[1]) == m.expand_dims(idx, 1)
            out_dtype = _np(x).dtype if _is_host(x) else x.dtype
            return m.reshape(one.astype(out_dtype), x.shape)
        ax = node.attr("axis", -1) % x.ndim
        idx = m.argmax(x, axis=ax)
        shape = [1] * x.ndim
        shape[ax] = x.shape[ax]
        one = m.reshape(m.arange(x.shape[ax]), shape) == m.expand_dims(idx, ax)
        return one.astype(_np(x).dtype if _is_host(x) else x.dtype)

    def op_Clip(self, node, x, lo=None, hi=None):
        if lo is None:
            lo = node.attr("min", -np.inf)
        if hi is None:
            hi = node.attr("max", np.inf)
        return self._lib(x).clip(x, lo, hi)

    def op_Where(self, node, cond, a, b):
        return self._lib(cond, a, b).where(cond, a, b)

    def op_Equal(self, node, a, b):
        return self._lib(a, b).equal(a, b)

    def op_Greater(self, node, a, b):
        return self._lib(a, b).greater(a, b)

    def op_Less(self, node, a, b):
        return self._lib(a, b).less(a, b)

    def op_Not(self, node, x):
        return self._lib(x).logical_not(x)

    def op_And(self, node, a, b):
        return self._lib(a, b).logical_and(a, b)

    def op_Or(self, node, a, b):
        return self._lib(a, b).logical_or(a, b)

    def op_Xor(self, node, a, b):
        return self._lib(a, b).logical_xor(a, b)

    def op_GreaterOrEqual(self, node, a, b):
        return self._lib(a, b).greater_equal(a, b)

    def op_LessOrEqual(self, node, a, b):
        return self._lib(a, b).less_equal(a, b)

    def op_IsNaN(self, node, x):
        return self._lib(x).isnan(x)

    def op_IsInf(self, node, x):
        detect_pos = node.attr("detect_positive", 1)
        detect_neg = node.attr("detect_negative", 1)
        m = self._lib(x)
        if detect_pos and detect_neg:
            return m.isinf(x)
        if detect_pos:
            return m.isposinf(x)
        if detect_neg:
            return m.isneginf(x)
        return m.zeros(np.shape(x), np.bool_)

    def op_Sum(self, node, *xs):
        out = xs[0]
        m = self._lib(*xs)
        for x in xs[1:]:
            out = m.add(out, x)
        return out

    def op_Mean(self, node, *xs):
        return self.op_Sum(node, *xs) / len(xs)

    def op_Mod(self, node, a, b):
        fmod = node.attr("fmod", 0)
        m = self._lib(a, b)
        return m.fmod(a, b) if fmod else m.mod(a, b)

    # -- shape / structure ---------------------------------------------------

    def op_Identity(self, node, x):
        return x

    def op_Cast(self, node, x):
        to = _NP_FROM_ONNX_DT[node.attr("to")]
        if _is_host(x):
            return _np(x).astype(to)
        return x.astype(to)

    def op_Shape(self, node, x):
        # Static under jit: emit a host constant. Opset >= 15 adds
        # start/end slicing attributes (negative values count from the
        # back; both clamp to [0, rank] per the ONNX spec).
        rank = len(np.shape(x))

        def _clamp(v, default):
            if v is None:
                return default
            v = int(v)
            if v < 0:
                v += rank
            return min(max(v, 0), rank)

        start = _clamp(node.attr("start"), 0)
        end = _clamp(node.attr("end"), rank)
        return np.asarray(np.shape(x)[start:end], np.int64)

    def op_Size(self, node, x):
        return np.asarray(int(np.prod(x.shape)), np.int64)

    def op_Reshape(self, node, x, shape):
        shape = [int(s) for s in np.asarray(shape).reshape(-1)]
        allowzero = node.attr("allowzero", 0)
        if not allowzero:
            shape = [
                x.shape[i] if s == 0 else s for i, s in enumerate(shape)
            ]
        return x.reshape(shape)

    def op_Flatten(self, node, x):
        axis = node.attr("axis", 1)
        lead = int(np.prod(x.shape[:axis])) if axis > 0 else 1
        return x.reshape(lead, -1)

    def op_Transpose(self, node, x):
        perm = node.attr("perm")
        m = self._lib(x)
        return m.transpose(x, perm)

    def op_Squeeze(self, node, x, axes=None):
        if axes is None:
            axes = node.attr("axes")
        if axes is None:
            axes = [i for i, s in enumerate(x.shape) if s == 1]
        axes = tuple(int(a) % x.ndim for a in np.asarray(axes).reshape(-1))
        m = self._lib(x)
        return m.squeeze(x, axis=axes)

    def op_Unsqueeze(self, node, x, axes=None):
        if axes is None:
            axes = node.attr("axes")
        axes = sorted(int(a) for a in np.asarray(axes).reshape(-1))
        m = self._lib(x)
        out = x
        nd = x.ndim + len(axes)
        for a in axes:
            out = m.expand_dims(out, a % nd if a < 0 else a)
        return out

    def op_Concat(self, node, *xs):
        axis = node.attr("axis")
        return self._lib(*xs).concatenate([x for x in xs if x is not None], axis=axis)

    def op_Split(self, node, x, split=None):
        axis = node.attr("axis", 0)
        if split is None:
            split = node.attr("split")
        n_out = len(node.outputs)
        m = self._lib(x)
        if split is None:
            return tuple(m.split(x, n_out, axis=axis))
        split = [int(s) for s in np.asarray(split).reshape(-1)]
        bounds = np.cumsum(split)[:-1].tolist()
        return tuple(m.split(x, bounds, axis=axis))

    def op_Gather(self, node, x, idx):
        axis = node.attr("axis", 0)
        m = self._lib(x, idx)
        return m.take(x, _np(idx) if _is_host(idx) else idx, axis=axis)

    def op_GatherElements(self, node, x, idx):
        axis = node.attr("axis", 0)
        if _is_host(x) and _is_host(idx):
            return np.take_along_axis(_np(x), _np(idx), axis=axis)
        import jax.numpy as jnp

        return jnp.take_along_axis(x, idx, axis=axis)

    def op_Slice(self, node, x, starts=None, ends=None, axes=None, steps=None):
        if starts is None:  # opset < 10: attributes
            starts = node.attr("starts")
            ends = node.attr("ends")
            axes = node.attr("axes")
        starts = [int(v) for v in np.asarray(starts).reshape(-1)]
        ends = [int(v) for v in np.asarray(ends).reshape(-1)]
        axes = (
            list(range(len(starts)))
            if axes is None
            else [int(v) % x.ndim for v in np.asarray(axes).reshape(-1)]
        )
        steps = (
            [1] * len(starts)
            if steps is None
            else [int(v) for v in np.asarray(steps).reshape(-1)]
        )
        slicers = [slice(None)] * x.ndim
        for st, en, ax, sp in zip(starts, ends, axes, steps):
            # ONNX uses INT64_MAX-ish sentinels for "to the end".
            dim = x.shape[ax]
            if st > dim:
                st = dim
            if en > dim:
                en = dim
            slicers[ax] = slice(st, en, sp)
        return x[tuple(slicers)]

    def op_Expand(self, node, x, shape):
        shape = [int(s) for s in np.asarray(shape).reshape(-1)]
        m = self._lib(x)
        target = list(np.broadcast_shapes(tuple(x.shape), tuple(shape)))
        return m.broadcast_to(x, target)

    def op_Tile(self, node, x, repeats):
        repeats = [int(r) for r in np.asarray(repeats).reshape(-1)]
        return self._lib(x).tile(x, repeats)

    def op_SpaceToDepth(self, node, x):
        """NCHW [N,C,H,W] -> [N,C*b*b,H/b,W/b] (the classic TPU stem
        rewrite shows up in some EfficientNet exports)."""
        b = node.attr("blocksize")
        n, c, h, w = x.shape
        m = self._lib(x)
        y = m.reshape(x, (n, c, h // b, b, w // b, b))
        y = m.transpose(y, (0, 3, 5, 1, 2, 4))
        return m.reshape(y, (n, c * b * b, h // b, w // b))

    def op_DepthToSpace(self, node, x):
        b = node.attr("blocksize")
        mode = node.attr("mode", b"DCR")
        if isinstance(mode, bytes):
            mode = mode.decode()
        n, c, h, w = x.shape
        m = self._lib(x)
        if mode == "DCR":
            y = m.reshape(x, (n, b, b, c // (b * b), h, w))
            y = m.transpose(y, (0, 3, 4, 1, 5, 2))
        else:  # CRD
            y = m.reshape(x, (n, c // (b * b), b, b, h, w))
            y = m.transpose(y, (0, 1, 4, 2, 5, 3))
        return m.reshape(y, (n, c // (b * b), h * b, w * b))

    def op_Trilu(self, node, x, k=None):
        kk = 0 if k is None else int(np.asarray(k).reshape(-1)[0])
        m = self._lib(x)
        if node.attr("upper", 1):
            return m.triu(x, kk)
        return m.tril(x, kk)

    def op_Range(self, node, start, limit, delta):
        return np.arange(int(start), int(limit), int(delta), dtype=np.int64)

    def op_ConstantOfShape(self, node, shape):
        shape = [int(s) for s in np.asarray(shape).reshape(-1)]
        t = node.attr("value")
        if t is not None and getattr(t, "array", None) is not None:
            fill = t.array.reshape(-1)[0]
            return np.full(shape, fill, t.array.dtype)
        return np.zeros(shape, np.float32)

    def op_Pad(self, node, x, pads=None, value=None, axes=None):
        mode = node.attr("mode", b"constant")
        if isinstance(mode, bytes):
            mode = mode.decode()
        if pads is None:
            pads = node.attr("pads")
        pads = [int(p) for p in np.asarray(pads).reshape(-1)]
        nd = x.ndim
        if axes is not None:
            ax = [int(a) % nd for a in np.asarray(axes).reshape(-1)]
        else:
            ax = list(range(nd))
        half = len(pads) // 2
        pad_width = [(0, 0)] * nd
        for i, a in enumerate(ax):
            pad_width[a] = (pads[i], pads[i + half])
        m = self._lib(x)
        if mode == "constant":
            cv = 0 if value is None else float(np.asarray(value).reshape(-1)[0])
            return m.pad(x, pad_width, mode="constant", constant_values=cv)
        np_mode = {"reflect": "reflect", "edge": "edge", "wrap": "wrap"}[mode]
        return m.pad(x, pad_width, mode=np_mode)

    # -- reductions ----------------------------------------------------------

    _REDUCE_NOOP = object()  # sentinel: output == input, untransformed

    def _reduce_plan(self, node, x, axes):
        """Resolve the Reduce* axes spelling (input > attr) to a non-empty
        tuple, None (= reduce all axes), or :data:`_REDUCE_NOOP`. Empty or
        absent axes follow ``noop_with_empty_axes`` (opset 13+ attr,
        default 0 = reduce all — older opsets never carry it)."""
        if axes is None:
            axes = node.attr("axes")
        if axes is not None:
            t = tuple(int(a) % x.ndim for a in np.asarray(axes).reshape(-1))
            if t:
                return t
        return self._REDUCE_NOOP if node.attr("noop_with_empty_axes", 0) \
            else None

    def _reduce(self, node, x, fn_name, axes=None, pre=None):
        plan = self._reduce_plan(node, x, axes)
        if plan is self._REDUCE_NOOP:
            return x
        y = x if pre is None else pre(self._lib(x), x)
        keepdims = bool(node.attr("keepdims", 1))
        m = self._lib(y)
        return getattr(m, fn_name)(y, axis=plan, keepdims=keepdims)

    def op_ReduceMean(self, node, x, axes=None):
        return self._reduce(node, x, "mean", axes)

    def op_ReduceSum(self, node, x, axes=None):
        return self._reduce(node, x, "sum", axes)

    def op_ReduceMax(self, node, x, axes=None):
        return self._reduce(node, x, "max", axes)

    def op_ReduceMin(self, node, x, axes=None):
        return self._reduce(node, x, "min", axes)

    def op_ReduceProd(self, node, x, axes=None):
        return self._reduce(node, x, "prod", axes)

    def op_ReduceL1(self, node, x, axes=None):
        return self._reduce(node, x, "sum", axes, pre=lambda m, v: m.abs(v))

    def op_ReduceL2(self, node, x, axes=None):
        out = self._reduce(node, x, "sum", axes,
                           pre=lambda m, v: m.square(v))
        return out if out is x else self._lib(out).sqrt(out)

    def op_ReduceSumSquare(self, node, x, axes=None):
        return self._reduce(node, x, "sum", axes,
                            pre=lambda m, v: m.square(v))

    def op_ReduceLogSum(self, node, x, axes=None):
        out = self._reduce(node, x, "sum", axes)
        return out if out is x else self._lib(out).log(out)

    def op_ReduceLogSumExp(self, node, x, axes=None):
        # Max-subtracted for stability (the ONNX reference semantics are
        # plain log(sum(exp)); this is the same value without overflow).
        plan = self._reduce_plan(node, x, axes)
        if plan is self._REDUCE_NOOP:
            return x
        m = self._lib(x)
        peak = m.max(x, axis=plan, keepdims=True)
        out = m.log(m.sum(m.exp(x - peak), axis=plan, keepdims=True)) + peak
        if not bool(node.attr("keepdims", 1)):
            out = m.squeeze(out, axis=plan) if plan is not None \
                else m.reshape(out, ())
        return out

    def _argreduce(self, node, x, fn_name):
        axis = node.attr("axis", 0)
        keepdims = bool(node.attr("keepdims", 1))
        if node.attr("select_last_index", 0):
            raise UnsupportedOnnxOp(f"{node.op_type} select_last_index=1")
        m = self._lib(x)
        out = getattr(m, fn_name)(x, axis=axis)
        if keepdims:
            out = m.expand_dims(out, axis)
        return out.astype(np.int64) if m is np else out

    def op_ArgMax(self, node, x):
        return self._argreduce(node, x, "argmax")

    def op_ArgMin(self, node, x):
        return self._argreduce(node, x, "argmin")

    # -- linear algebra ------------------------------------------------------

    def _mm_out(self, out):
        """In compute-dtype mode, materialize matmul/conv outputs at the
        compute dtype: fusion-boundary tensors dominate HBM traffic on
        bandwidth-bound graphs, and fp32 accumulation already happened
        inside the op (docs/performance.md roofline)."""
        if self.compute_dtype is None or _is_host(out):
            return out
        return out.astype(self.compute_dtype)

    def op_MatMul(self, node, a, b):
        if _is_host(a) and _is_host(b):
            return np.matmul(a, b)
        import jax.numpy as jnp

        a, b = self._mm_cast(a, b)
        return self._mm_out(
            jnp.matmul(a, b, preferred_element_type=jnp.float32)
        )

    def op_Gemm(self, node, a, b, c=None):
        # The ONNX spec requires rank-2 A and B; a rank mismatch would
        # otherwise surface as an opaque dot_general shape error deep in
        # the jit trace (ORT rejects such graphs at session build).
        if getattr(a, "ndim", 2) != 2 or getattr(b, "ndim", 2) != 2:
            raise UnsupportedOnnxOp(
                f"Gemm requires rank-2 inputs, got A rank "
                f"{getattr(a, 'ndim', '?')} and B rank "
                f"{getattr(b, 'ndim', '?')} (node {node.name or node.op_type}"
                f"; the graph is invalid per the ONNX spec)"
            )
        alpha = node.attr("alpha", 1.0)
        beta = node.attr("beta", 1.0)
        if node.attr("transA", 0):
            a = a.T
        if node.attr("transB", 0):
            b = b.T
        if _is_host(a) and _is_host(b):
            out = alpha * np.matmul(a, b)
        else:
            import jax.numpy as jnp

            a, b = self._mm_cast(a, b)
            out = alpha * jnp.matmul(a, b, preferred_element_type=jnp.float32)
        if c is not None:
            out = out + beta * c
        return self._mm_out(out) if not _is_host(out) else out

    # -- convolution / pooling ----------------------------------------------

    def _conv_params(self, node, x, w):
        spatial = x.ndim - 2
        kernel = list(w.shape[2:])
        strides = list(node.attr("strides") or [1] * spatial)
        dilations = list(node.attr("dilations") or [1] * spatial)
        group = node.attr("group", 1)
        autopad = node.attr("auto_pad", b"NOTSET")
        pads_attr = node.attr("pads")
        if autopad in (b"SAME_UPPER", b"SAME_LOWER"):
            pads = _autopad_amounts(x.shape[2:], kernel, strides, dilations, autopad)
        elif autopad == b"VALID" or pads_attr is None:
            pads = [(0, 0)] * spatial
        else:
            p = [int(v) for v in pads_attr]
            pads = list(zip(p[:spatial], p[spatial:]))
        return strides, pads, dilations, group

    def op_Conv(self, node, x, w, b=None):
        import jax.numpy as jnp
        from jax import lax

        strides, pads, dilations, group = self._conv_params(node, x, w)
        spatial = x.ndim - 2
        # Conv1d-STFT form (single input channel, long kernel, big stride —
        # the in-graph DSP front-end of the BirdNET graphs, manifest
        # graph.notes): lower as frames-gather + one MXU matmul instead of a
        # strided convolution. Indices come from broadcasted_iota so no
        # large host constant lands in the serialized HLO.
        if (
            spatial == 1 and x.shape[1] == 1 and group == 1
            and dilations == [1] and w.shape[2] >= 256
            and pads == [(0, 0)]
        ):
            k = w.shape[2]
            t_out = (x.shape[2] - k) // strides[0] + 1
            from ..ops import stft_conv

            if stft_conv.enabled(x.shape, w.shape, strides[0],
                                 self.compute_dtype):
                # Pallas block-slab kernel: signal read once, DFT slabs
                # VMEM-resident, no frames materialization / layout copy
                # (ops/stft_conv.py; bf16-on-TPU only — fp32 parity and
                # CPU stay on the gather path below).
                out = stft_conv.conv1d_stft(
                    x[:, 0, :], jnp.asarray(w)[:, 0, :], hop=strides[0]
                )
                if b is not None:
                    out = out + jnp.asarray(b, out.dtype).reshape(1, -1, 1)
                return out
            row = lax.broadcasted_iota(jnp.int32, (t_out, k), 0) * strides[0]
            col = lax.broadcasted_iota(jnp.int32, (t_out, k), 1)
            xx, wmat = self._mm_cast(x[:, 0, :], jnp.asarray(w)[:, 0, :].T)
            frames = jnp.take(xx, row + col, axis=1)  # [B, T, k]
            out = jnp.einsum(
                "btk,kc->bct", frames, wmat,
                preferred_element_type=jnp.float32,
            )
            if b is not None:
                out = out + jnp.asarray(b).reshape(1, -1, 1)
            return self._mm_out(out)
        chars = "DHW"[3 - spatial :]
        dn = lax.conv_dimension_numbers(
            x.shape, w.shape,
            ("NC" + chars, "OI" + chars, "NC" + chars),
        )
        x, w = self._mm_cast(x, w)
        # Integer convs (QLinear* paths) accumulate in int32 — exactness is
        # the point; float convs accumulate fp32.
        pref = jnp.int32 if _dtype_kind(x) in "iu" else jnp.float32
        out = lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w),
            window_strides=strides, padding=pads,
            rhs_dilation=dilations, dimension_numbers=dn,
            feature_group_count=group,
            preferred_element_type=pref,
        )
        if b is not None:
            out = out + jnp.asarray(b).reshape((1, -1) + (1,) * spatial)
        return out if pref is jnp.int32 else self._mm_out(out)

    def op_BirdaFusedMelFrontend(self, node, x, w, fb):
        """Fused spectrogram front-end spliced in by
        :func:`birda_tpu.onnx.fuse.fuse_mel_frontend`: windowed-DFT conv,
        power spectrum, mel projection and log in one Pallas kernel
        (``ops/stft_conv.py::fused_logmel``). ``x`` is the conv input
        ``[B, 1, S]``; output ``[B, T, sum(mels)]`` = the chain's Log.

        The fusion pass cannot see the signal length, so the VMEM budget
        is re-checked here with real shapes; a geometry the kernel cannot
        hold falls back to the same math as composed XLA ops."""
        import jax.numpy as jnp

        from ..ops import stft_conv

        hop, eps = node.attr("hop"), node.attr("eps")
        if node.attr("src", b"conv") == b"stft":
            # STFT-op spelling: the signal is [B, S] (or [B, S, 1]).
            sig = x if getattr(x, "ndim", 2) == 2 else x[:, :, 0]
        else:
            sig = x[:, 0, :]
        wm = jnp.asarray(w)[:, 0, :]
        fbm = jnp.asarray(fb)
        s, (c, k), m = sig.shape[-1], wm.shape, fbm.shape[1]
        if stft_conv.fused_fits(int(s), int(k), hop, int(c), int(m)):
            return stft_conv.fused_logmel(sig, wm, fbm, hop=hop, eps=eps)
        # Composed fallback (identical semantics at compute dtype): the
        # gather-form DFT conv, power from the re/im halves, mel, log.
        from jax import lax

        bins = c // 2
        t_out = (s - k) // hop + 1
        row = lax.broadcasted_iota(jnp.int32, (t_out, k), 0) * hop
        col = lax.broadcasted_iota(jnp.int32, (t_out, k), 1)
        xx, wmat = self._mm_cast(sig, wm.T)
        frames = jnp.take(xx, row + col, axis=1)
        spec = jnp.einsum("btk,kc->btc", frames, wmat,
                          preferred_element_type=jnp.float32)
        power = (spec[..., :bins] ** 2 + spec[..., bins:2 * bins] ** 2)
        (power, fbc) = self._mm_cast(self._mm_out(power), fbm)
        mel = jnp.matmul(power, fbc, preferred_element_type=jnp.float32)
        return self._mm_out(jnp.log(mel + jnp.float32(eps)))

    def op_ConvTranspose(self, node, x, w, b=None):
        import jax.numpy as jnp
        from jax import lax

        spatial = x.ndim - 2
        strides = list(node.attr("strides") or [1] * spatial)
        dilations = list(node.attr("dilations") or [1] * spatial)
        group = node.attr("group", 1)
        pads_attr = node.attr("pads") or [0] * (2 * spatial)
        p = [int(v) for v in pads_attr]
        kernel = list(w.shape[2:])
        # ONNX ConvTranspose pads describe the *output* crop.
        pads = [
            (
                (k - 1) * d - p[i],
                (k - 1) * d - p[i + spatial],
            )
            for i, (k, d) in enumerate(zip(kernel, dilations))
        ]
        chars = "DHW"[3 - spatial :]
        dn = lax.conv_dimension_numbers(
            x.shape, w.shape, ("NC" + chars, "IO" + chars, "NC" + chars)
        )
        # Transposed conv is a true convolution of the dilated input: flip
        # the kernel spatially (lax convs are cross-correlations).
        w = jnp.flip(jnp.asarray(w), axis=tuple(range(2, 2 + spatial)))
        out = lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w),
            window_strides=[1] * spatial, padding=pads,
            lhs_dilation=strides, rhs_dilation=dilations,
            dimension_numbers=dn, feature_group_count=group,
            preferred_element_type=jnp.float32,
        )
        if b is not None:
            out = out + jnp.asarray(b).reshape((1, -1) + (1,) * spatial)
        return out

    def _pool(self, node, x, reducer, init, is_avg):
        import jax.numpy as jnp
        from jax import lax

        spatial = x.ndim - 2
        kernel = list(node.attr("kernel_shape"))
        strides = list(node.attr("strides") or [1] * spatial)
        dilations = [int(d) for d in (node.attr("dilations")
                                      or [1] * spatial)]
        autopad = node.attr("auto_pad", b"NOTSET")
        pads_attr = node.attr("pads")
        if autopad in (b"SAME_UPPER", b"SAME_LOWER"):
            pads = _autopad_amounts(x.shape[2:], kernel, strides, dilations, autopad)
        elif autopad == b"VALID" or pads_attr is None:
            pads = [(0, 0)] * spatial
        else:
            p = [int(v) for v in pads_attr]
            pads = list(zip(p[:spatial], p[spatial:]))

        base_pads = list(pads)
        if node.attr("ceil_mode", 0):
            # Ceil output size = extra high-side padding; reduce_window
            # pads with `init`, which is the identity for max/sum, so the
            # extension never changes window values. ONNX/ORT drop a last
            # window that would start entirely in the right padding
            # (start >= d + pad_l), so clamp n_out to that constraint —
            # without it, stride > kernel geometries emit a garbage
            # (-inf / 0-count) trailing position.
            pads = []
            for d, k, s, dl, (pl, ph) in zip(
                    x.shape[2:], kernel, strides, dilations, base_pads):
                eff_k = (k - 1) * dl + 1
                n_out = -(-(d + pl + ph - eff_k) // s) + 1
                while n_out > 1 and (n_out - 1) * s >= d + pl:
                    n_out -= 1
                need = (n_out - 1) * s + eff_k - (d + pl)
                pads.append((pl, max(ph, need)))

        window = (1, 1) + tuple(kernel)
        stride = (1, 1) + tuple(strides)
        dilation = (1, 1) + tuple(dilations)
        padding = ((0, 0), (0, 0)) + tuple(pads)
        x = jnp.asarray(x)
        out = lax.reduce_window(x, init, reducer, window, stride, padding,
                                window_dilation=dilation)
        if is_avg:
            ones = jnp.ones(x.shape, x.dtype)
            if node.attr("count_include_pad", 0):
                # Denominator counts the explicit padding but not the
                # ceil-mode extension (ORT semantics): pad ones with 1 over
                # base_pads, with 0 over anything ceil added beyond them.
                ones = jnp.pad(
                    ones, ((0, 0), (0, 0)) + tuple(base_pads),
                    constant_values=1.0)
                extra = tuple(
                    (0, ph - bh)
                    for (_, ph), (_, bh) in zip(pads, base_pads))
                counts = lax.reduce_window(
                    ones, 0.0, lax.add, window, stride,
                    ((0, 0), (0, 0)) + extra, window_dilation=dilation)
            else:
                counts = lax.reduce_window(
                    ones, 0.0, lax.add, window, stride, padding,
                    window_dilation=dilation)
            out = out / counts
        return out

    def op_MaxPool(self, node, x):
        from jax import lax

        if sum(1 for o in node.outputs if o) > 1:
            raise UnsupportedOnnxOp(
                "MaxPool with an Indices output is not supported")
        return self._pool(node, x, lax.max, -np.inf, False)

    def op_AveragePool(self, node, x):
        from jax import lax

        return self._pool(node, x, lax.add, 0.0, True)

    def op_GlobalAveragePool(self, node, x):
        m = self._lib(x)
        return m.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)

    def op_GlobalMaxPool(self, node, x):
        m = self._lib(x)
        return m.max(x, axis=tuple(range(2, x.ndim)), keepdims=True)

    # -- normalization -------------------------------------------------------

    def op_BatchNormalization(self, node, x, scale, bias, mean, var):
        eps = node.attr("epsilon", 1e-5)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        m = self._lib(x)
        inv = scale.reshape(shape) / m.sqrt(var.reshape(shape) + eps)
        return x * inv + (bias.reshape(shape) - mean.reshape(shape) * inv)

    def op_LayerNormalization(self, node, x, scale, bias=None):
        axis = node.attr("axis", -1)
        eps = node.attr("epsilon", 1e-5)
        m = self._lib(x)
        axes = tuple(range(axis % x.ndim, x.ndim))
        mu = m.mean(x, axis=axes, keepdims=True)
        var = m.mean((x - mu) ** 2, axis=axes, keepdims=True)
        out = (x - mu) / m.sqrt(var + eps) * scale
        if bias is not None:
            out = out + bias
        return out

    def op_InstanceNormalization(self, node, x, scale, bias):
        eps = node.attr("epsilon", 1e-5)
        m = self._lib(x)
        axes = tuple(range(2, x.ndim))
        mu = m.mean(x, axis=axes, keepdims=True)
        var = m.mean((x - mu) ** 2, axis=axes, keepdims=True)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        return (x - mu) / m.sqrt(var + eps) * scale.reshape(shape) + bias.reshape(shape)

    def op_LRN(self, node, x):
        alpha = node.attr("alpha", 1e-4)
        beta = node.attr("beta", 0.75)
        bias = node.attr("bias", 1.0)
        size = node.attr("size")
        import jax.numpy as jnp
        from jax import lax

        sq = jnp.square(jnp.asarray(x))
        half = size // 2
        window = (1, size) + (1,) * (x.ndim - 2)
        pads = ((0, 0), (half, size - 1 - half)) + ((0, 0),) * (x.ndim - 2)
        sums = lax.reduce_window(sq, 0.0, lax.add, window, (1,) * x.ndim, pads)
        return x / jnp.power(bias + alpha * sums / size, beta)

    def op_Gelu(self, node, x):
        approx = node.attr("approximate", b"none")
        if _is_host(x):
            from scipy.special import erf as _erf

            return (x * 0.5 * (1.0 + _erf(np.asarray(x) / np.sqrt(2.0)))).astype(
                _np(x).dtype
            )
        import jax

        approximate = approx == b"tanh"
        return jax.nn.gelu(x, approximate=approximate)

    def op_Sign(self, node, x):
        return self._lib(x).sign(x)

    def op_Round(self, node, x):
        # ONNX Round is round-half-to-even, matching numpy/jnp.
        return self._lib(x).round(x)

    def op_CumSum(self, node, x, axis):
        ax = int(np.asarray(axis).reshape(()))
        m = self._lib(x)
        exclusive = node.attr("exclusive", 0)
        reverse = node.attr("reverse", 0)
        if exclusive or reverse:
            raise UnsupportedOnnxOp("CumSum exclusive/reverse not supported")
        return m.cumsum(x, axis=ax)

    def op_TopK(self, node, x, k):
        k = int(np.asarray(k).reshape(-1)[0])
        axis = node.attr("axis", -1)
        largest = node.attr("largest", 1)
        if not largest:
            raise UnsupportedOnnxOp("TopK with largest=0")
        if _is_host(x):
            xs = np.moveaxis(_np(x), axis, -1)
            idx = np.argsort(-xs, axis=-1)[..., :k]
            vals = np.take_along_axis(xs, idx, axis=-1)
            return (np.moveaxis(vals, -1, axis),
                    np.moveaxis(idx.astype(np.int64), -1, axis))
        import jax
        import jax.numpy as jnp

        # lax.top_k ranks the last axis; any other axis moves there and
        # back (a layout change XLA fuses, not a materialized transpose).
        vals, idx = jax.lax.top_k(jnp.moveaxis(x, axis, -1), k)
        return (jnp.moveaxis(vals, -1, axis),
                jnp.moveaxis(idx.astype(jnp.int64), -1, axis))

    @staticmethod
    def _resize_coords(ct: str, d_in: int, d_out: int, scale: float):
        """ONNX output→input coordinate map for one axis. Host math: shapes
        are static, so indices/weights bake into the program as constants
        (tiny — one vector per resized axis)."""
        i = np.arange(d_out, dtype=np.float64)
        if ct == "half_pixel":
            return (i + 0.5) / scale - 0.5
        if ct == "pytorch_half_pixel":
            return (i + 0.5) / scale - 0.5 if d_out > 1 else np.zeros(1)
        if ct == "asymmetric":
            return i / scale
        if ct == "align_corners":
            if d_out == 1:
                return np.zeros(1)
            return i * ((d_in - 1) / (d_out - 1))
        if ct == "tf_half_pixel_for_nn":
            return (i + 0.5) / scale
        raise UnsupportedOnnxOp(
            f"Resize coordinate_transformation_mode '{ct}'")

    def _resize(self, node, x, out_shape, sc, mode: str, ct: str,
                nm: str | None = None):
        """Shared Resize/Upsample body: exact ONNX semantics via per-axis
        gathers (nearest) / two-point lerps (linear) with host-computed
        indices and weights. `nm` overrides the node's nearest_mode
        (legacy opset-10 Resize has no such attribute; its defined
        rounding is floor)."""
        m = self._lib(x)
        if mode == "nearest":
            if nm is None:
                nm = node.attr("nearest_mode", b"round_prefer_floor")
                nm = nm.decode() if isinstance(nm, bytes) else nm
            out = x
            for ax, (d_in, d_out) in enumerate(zip(x.shape, out_shape)):
                if d_in == d_out:
                    continue
                scale = float(sc[ax]) if sc is not None else d_out / d_in
                coord = self._resize_coords(ct, d_in, d_out, scale)
                if nm == "round_prefer_floor":
                    idx = np.ceil(coord - 0.5)
                elif nm == "round_prefer_ceil":
                    idx = np.floor(coord + 0.5)
                elif nm == "floor":
                    idx = np.floor(coord)
                elif nm == "ceil":
                    idx = np.ceil(coord)
                else:
                    raise UnsupportedOnnxOp(f"Resize nearest_mode '{nm}'")
                idx = np.clip(idx, 0, d_in - 1).astype(np.int64)
                out = m.take(out, idx, axis=ax)
            return out
        if mode in ("linear", "bilinear"):
            out = x
            for ax, (d_in, d_out) in enumerate(zip(x.shape, out_shape)):
                if d_in == d_out:
                    continue
                scale = float(sc[ax]) if sc is not None else d_out / d_in
                coord = self._resize_coords(ct, d_in, d_out, scale)
                lo = np.floor(coord)
                w = (coord - lo).astype(np.float32)
                lo_i = np.clip(lo, 0, d_in - 1).astype(np.int64)
                hi_i = np.clip(lo + 1, 0, d_in - 1).astype(np.int64)
                wshape = [1] * out.ndim
                wshape[ax] = d_out
                w = w.reshape(wshape)
                a = m.take(out, lo_i, axis=ax)
                b = m.take(out, hi_i, axis=ax)
                out = a * (1.0 - w) + b * w
            return out
        if mode == "cubic":
            if ct != "half_pixel":
                raise UnsupportedOnnxOp(
                    f"Resize cubic with coordinate mode '{ct}'")
            import jax

            return jax.image.resize(x, out_shape, method="bicubic")
        raise UnsupportedOnnxOp(f"Resize mode {mode}")

    def op_Resize(self, node, x, roi=None, scales=None, sizes=None):
        legacy = bool(self.opset and self.opset < 11)
        if legacy and scales is None and sizes is None and roi is not None:
            # Opset-10 spelling: Resize(X, scales) — the second input is
            # the scales tensor, not the roi.
            scales, roi = roi, None
        mode = node.attr("mode", b"nearest")
        if isinstance(mode, bytes):
            mode = mode.decode()
        if legacy:
            # Resize-10 predates coordinate_transformation_mode /
            # nearest_mode: its defined behavior is Upsample's —
            # asymmetric coordinates with floor rounding (matches ORT).
            ct = "asymmetric"
        else:
            ct = node.attr("coordinate_transformation_mode", b"half_pixel")
            ct = ct.decode() if isinstance(ct, bytes) else ct
        if ct == "tf_crop_and_resize":
            raise UnsupportedOnnxOp("Resize tf_crop_and_resize")
        if node.attr("antialias", 0):
            raise UnsupportedOnnxOp("Resize antialias=1")
        if node.attr("exclude_outside", 0):
            raise UnsupportedOnnxOp("Resize exclude_outside=1")
        kap = node.attr("keep_aspect_ratio_policy", b"stretch")
        kap = kap.decode() if isinstance(kap, bytes) else kap
        if kap != "stretch":
            raise UnsupportedOnnxOp(
                f"Resize keep_aspect_ratio_policy '{kap}'")
        # Opset-18 `axes`: scales/sizes list entries only for these axes;
        # expand to full rank with identity elsewhere.
        axes_attr = node.attr("axes")
        if axes_attr is not None:
            axes = [int(a) % x.ndim
                    for a in np.asarray(axes_attr).reshape(-1)]
        else:
            axes = list(range(x.ndim))
        sc = None
        if sizes is not None and np.asarray(sizes).size:
            sz = [int(s) for s in np.asarray(sizes).reshape(-1)]
            if len(sz) != len(axes):
                raise UnsupportedOnnxOp(
                    f"Resize sizes has {len(sz)} entries for {len(axes)} axes")
            out_shape = list(x.shape)
            for a, s in zip(axes, sz):
                out_shape[a] = s
        elif scales is not None and np.asarray(scales).size:
            s_list = np.asarray(scales, np.float64).reshape(-1)
            if len(s_list) != len(axes):
                raise UnsupportedOnnxOp(
                    f"Resize scales has {len(s_list)} entries for "
                    f"{len(axes)} axes")
            sc = np.ones(x.ndim, np.float64)
            for a, s in zip(axes, s_list):
                sc[a] = s
            out_shape = [
                int(np.floor(d * s)) for d, s in zip(x.shape, sc)
            ]
        else:
            raise UnsupportedOnnxOp("Resize needs scales or sizes")
        return self._resize(node, x, out_shape, sc, mode, ct,
                            nm="floor" if legacy else None)

    def op_Upsample(self, node, x, scales=None):
        # Deprecated (opset 7 attr / opset 9 input spelling); Resize
        # replaced it at opset 10. Legacy semantics = asymmetric
        # coordinates with floor rounding (what Resize-10 did, and what
        # torch/tf emitted through it).
        if scales is None:
            scales = node.attr("scales")
        if scales is None:
            raise UnsupportedOnnxOp("Upsample needs scales")
        sc = np.asarray(scales, np.float64).reshape(-1)
        out_shape = [int(np.floor(d * s)) for d, s in zip(x.shape, sc)]
        mode = node.attr("mode", b"nearest")
        if isinstance(mode, bytes):
            mode = mode.decode()
        if mode == "nearest":
            m = self._lib(x)
            out = x
            for ax, (d_in, d_out) in enumerate(zip(x.shape, out_shape)):
                if d_in == d_out:
                    continue
                idx = np.clip(
                    np.floor(np.arange(d_out) / sc[ax]), 0, d_in - 1
                ).astype(np.int64)
                out = m.take(out, idx, axis=ax)
            return out
        return self._resize(node, x, out_shape, sc, mode, "asymmetric")

    def op_Einsum(self, node, *xs):
        eq = node.attr("equation")
        if isinstance(eq, bytes):
            eq = eq.decode()
        if all(_is_host(x) for x in xs):
            return np.einsum(eq, *xs)
        import jax.numpy as jnp

        return jnp.einsum(eq, *xs, preferred_element_type=jnp.float32)

    # -- quantization ---------------------------------------------------------
    #
    # Covers both quantized-graph styles the ORT quantizer emits (the
    # registry's int8-arm assets): QDQ form (QuantizeLinear/DequantizeLinear
    # pairs around float ops) and QOperator form (QLinearConv/QLinearMatMul
    # plus the com.microsoft QLinear* elementwise ops). Semantics follow the
    # ONNX spec: quantize = saturate(round_half_even(x/scale) + zero_point);
    # compute happens in integer-exact float (int8 values are exactly
    # representable in fp32), requantize at the end.

    @staticmethod
    def _q_axis_shape(x_ndim: int, axis: int) -> tuple:
        shape = [1] * x_ndim
        shape[axis % x_ndim] = -1
        return tuple(shape)

    def _per_axis(self, arr, x_ndim: int, axis: int):
        """Reshape a per-axis scale/zero-point vector for broadcasting; pass
        scalars (and traced values) through unchanged."""
        if arr is None:
            return None
        if _is_host(arr) and np.asarray(arr).size > 1:
            return np.asarray(arr).reshape(self._q_axis_shape(x_ndim, axis))
        return arr

    def _quantize(self, x, scale, zp, node, default_dtype=np.uint8):
        dt = _np(zp).dtype if zp is not None and _is_host(zp) else np.dtype(
            default_dtype)
        info = np.iinfo(dt)
        ndim = getattr(x, "ndim", 0)
        axis = node.attr("axis", 1)
        scale = self._per_axis(scale, ndim, axis)
        zp = self._per_axis(zp, ndim, axis)
        m = self._lib(x, scale, zp)
        q = m.round(x / scale) + (0 if zp is None else zp)
        return m.clip(q, info.min, info.max).astype(dt)

    def _dequantize(self, x, scale, zp, node):
        ndim = getattr(x, "ndim", 0)
        axis = node.attr("axis", 1)
        scale = self._per_axis(scale, ndim, axis)
        zp = self._per_axis(zp, ndim, axis)
        m = self._lib(x, scale, zp)
        xf = (np.asarray(x, np.float32) if _is_host(x)
              else x.astype(np.float32))
        zf = 0.0 if zp is None else (
            np.asarray(zp, np.float32) if _is_host(zp)
            else zp.astype(np.float32))
        del m
        return (xf - zf) * scale

    def op_QuantizeLinear(self, node, x, scale, zp=None):
        return self._quantize(x, scale, zp, node)

    def op_DequantizeLinear(self, node, x, scale, zp=None):
        return self._dequantize(x, scale, zp, node)

    def op_DynamicQuantizeLinear(self, node, x):
        m = self._lib(x)
        qmin, qmax = 0.0, 255.0
        lo = m.minimum(m.min(x), 0.0)
        hi = m.maximum(m.max(x), 0.0)
        scale = (hi - lo) / (qmax - qmin)
        zp_f = m.clip(m.round(qmin - lo / scale), qmin, qmax)
        q = m.clip(m.round(x / scale) + zp_f, qmin, qmax).astype(np.uint8)
        return q, scale.astype(np.float32), zp_f.astype(np.uint8)

    def _deq_per_channel_weight(self, w, w_scale, w_zp, out_ch_axis=0):
        """Weights may be per-output-channel quantized: scale/zp shaped [O],
        broadcast along the output-channel axis."""
        ndim = getattr(w, "ndim", _np(w).ndim)
        s = self._per_axis(w_scale, ndim, out_ch_axis)
        z = self._per_axis(w_zp, ndim, out_ch_axis)
        wf = (np.asarray(w, np.float32) if _is_host(w)
              else w.astype(np.float32))
        zf = 0.0 if z is None else (
            np.asarray(z, np.float32) if _is_host(z) else z.astype(np.float32))
        return (wf - zf) * s

    @staticmethod
    def _as_i32(x, zp):
        """Zero-point-shifted int32 view of a quantized tensor."""
        xi = (np.asarray(x, np.int32) if _is_host(x) else x.astype(np.int32))
        if zp is not None:
            zi = (np.asarray(zp, np.int32) if _is_host(zp)
                  else zp.astype(np.int32))
            xi = xi - zi
        return xi

    def op_QLinearConv(self, node, x, x_s, x_zp, w, w_s, w_zp, y_s, y_zp,
                       b=None):
        # Integer-exact accumulation (what ONNX Runtime computes): conv the
        # zero-point-shifted int32 values with an int32 accumulator, add the
        # int32 bias, THEN apply the combined scale and requantize. A
        # dequantize-first float conv drifts off by one on rounding ties.
        import jax.numpy as jnp

        xi = self._as_i32(x, x_zp)
        # Per-channel weight zero points broadcast on the OUTPUT-channel
        # axis (0), not numpy's default trailing axis.
        wndim = getattr(w, "ndim", _np(w).ndim)
        wi = self._as_i32(w, self._per_axis(w_zp, wndim, 0))
        with self._no_compute_cast():  # never bf16-cast integer convs
            acc = self.op_Conv(node, xi, wi, None)  # int32 accum
        if b is not None:
            bi = (np.asarray(b, np.int32) if _is_host(b)
                  else b.astype(np.int32))
            acc = acc + (np.asarray(bi).reshape(1, -1, 1, 1)
                         if _is_host(bi) else bi.reshape(1, -1, 1, 1))
        # Combined scale: x_s * w_s / y_s; w_s may be per-output-channel.
        ws = self._per_axis(w_s, 4, 1)  # broadcast over the channel axis
        scale = (np.asarray(x_s, np.float32) * np.asarray(ws, np.float32)
                 / np.asarray(y_s, np.float32)
                 if _is_host(x_s) and _is_host(ws) and _is_host(y_s)
                 else x_s * ws / y_s)
        accf = acc.astype(jnp.float32) if not _is_host(acc) else acc.astype(np.float32)
        m = self._lib(accf, scale)
        dt = _np(y_zp).dtype if y_zp is not None and _is_host(y_zp) else np.dtype(np.uint8)
        info = np.iinfo(dt)
        zq = 0 if y_zp is None else y_zp
        q = m.round(accf * scale) + zq
        return m.clip(q, info.min, info.max).astype(dt)

    def op_QLinearMatMul(self, node, a, a_s, a_zp, b, b_s, b_zp, y_s, y_zp):
        ai = self._as_i32(a, a_zp)
        bi = self._as_i32(b, b_zp)
        if _is_host(ai) and _is_host(bi):
            acc = np.matmul(ai.astype(np.int64), bi.astype(np.int64))
            accf = acc.astype(np.float64)
        else:
            import jax.numpy as jnp

            acc = jnp.matmul(ai, bi, preferred_element_type=jnp.int32)
            accf = acc.astype(jnp.float32)
        m = self._lib(accf)
        scale = (np.float64(a_s) * np.float64(b_s) / np.float64(y_s)
                 if _is_host(a_s) and _is_host(b_s) and _is_host(y_s)
                 else a_s * b_s / y_s)
        dt = _np(y_zp).dtype if y_zp is not None and _is_host(y_zp) else np.dtype(np.uint8)
        info = np.iinfo(dt)
        q = m.round(accf * scale) + (0 if y_zp is None else y_zp)
        return m.clip(q, info.min, info.max).astype(dt)

    def op_MatMulInteger(self, node, a, b, a_zp=None, b_zp=None):
        m = self._lib(a, b)
        af = (_np(a).astype(np.int32) if _is_host(a) else a.astype(np.int32))
        bf = (_np(b).astype(np.int32) if _is_host(b) else b.astype(np.int32))
        if a_zp is not None:
            af = af - (np.asarray(a_zp, np.int32) if _is_host(a_zp)
                       else a_zp.astype(np.int32))
        if b_zp is not None:
            bf = bf - (np.asarray(b_zp, np.int32) if _is_host(b_zp)
                       else b_zp.astype(np.int32))
        if _is_host(af) and _is_host(bf):
            return np.matmul(af, bf).astype(np.int32)
        import jax.numpy as jnp

        return jnp.matmul(af, bf, preferred_element_type=jnp.int32)

    def op_ConvInteger(self, node, x, w, x_zp=None, w_zp=None):
        xi = self._as_i32(x, x_zp)
        wndim = getattr(w, "ndim", _np(w).ndim)
        wi = self._as_i32(w, self._per_axis(w_zp, wndim, 0))
        with self._no_compute_cast():
            return self.op_Conv(node, xi, wi, None)  # int32 accumulation

    # com.microsoft QLinear* elementwise ops (QOperator-format graphs).

    def _qlinear_binary(self, node, fn, a, a_s, a_zp, b, b_s, b_zp, y_s, y_zp):
        af = self._dequantize(a, a_s, a_zp, node)
        bf = self._dequantize(b, b_s, b_zp, node)
        return self._quantize(fn(af, bf), y_s, y_zp, node)

    def op_QLinearAdd(self, node, a, a_s, a_zp, b, b_s, b_zp, y_s, y_zp):
        m = self._lib(a, b)
        return self._qlinear_binary(node, m.add, a, a_s, a_zp, b, b_s, b_zp,
                                    y_s, y_zp)

    def op_QLinearMul(self, node, a, a_s, a_zp, b, b_s, b_zp, y_s, y_zp):
        m = self._lib(a, b)
        return self._qlinear_binary(node, m.multiply, a, a_s, a_zp,
                                    b, b_s, b_zp, y_s, y_zp)

    def op_QLinearSigmoid(self, node, x, x_s, x_zp, y_s, y_zp):
        xf = self._dequantize(x, x_s, x_zp, node)
        return self._quantize(self.op_Sigmoid(node, xf), y_s, y_zp, node)

    def op_QLinearLeakyRelu(self, node, x, x_s, x_zp, y_s, y_zp):
        xf = self._dequantize(x, x_s, x_zp, node)
        return self._quantize(self.op_LeakyRelu(node, xf), y_s, y_zp, node)

    def op_QLinearSoftmax(self, node, x, x_s, x_zp, y_s, y_zp):
        xf = self._dequantize(x, x_s, x_zp, node)
        return self._quantize(self.op_Softmax(node, xf), y_s, y_zp, node)

    def op_QLinearAveragePool(self, node, x, x_s, x_zp, y_s, y_zp):
        if node.attr("channels_last", 0):
            raise UnsupportedOnnxOp("QLinearAveragePool channels_last=1")
        xf = self._dequantize(x, x_s, x_zp, node)
        return self._quantize(self.op_AveragePool(node, xf), y_s, y_zp, node)

    def op_QLinearConcat(self, node, y_s, y_zp, *parts):
        # Variadic (tensor, scale, zero_point) triples after the output
        # scale/zp (com.microsoft spelling).
        if len(parts) % 3:
            raise UnsupportedOnnxOp("QLinearConcat malformed inputs")
        des = [
            self._dequantize(parts[i], parts[i + 1], parts[i + 2], node)
            for i in range(0, len(parts), 3)
        ]
        axis = node.attr("axis")
        out = self._lib(*des).concatenate(des, axis=axis)
        return self._quantize(out, y_s, y_zp, node)

    def op_QGemm(self, node, a, a_s, a_zp, b, b_s, b_zp, c=None,
                 y_s=None, y_zp=None):
        # com.microsoft QGemm: int inputs, fp32 bias at scale a_s*b_s;
        # float output when y_scale is absent.
        af = self._dequantize(a, a_s, a_zp, node)
        if node.attr("transA", 0):
            af = af.T
        if node.attr("transB", 0):
            # Transpose the quantized B first so a per-output-channel
            # b_scale lands on axis 1 of the [K, N] operand _dequantize
            # broadcasts over (the standard ORT quantized-Gemm layout
            # stores B as [N, K] with per-N scales).
            b = b.T if not _is_host(b) else np.transpose(b)
        bf = self._dequantize(b, b_s, b_zp, node)
        alpha = node.attr("alpha", 1.0)
        out = alpha * (af @ bf)
        if c is not None:
            # C is int32 quantized at a_scale*b_scale, zero-point 0.
            cf = (np.asarray(c, np.float32) if _is_host(c)
                  else c.astype(np.float32))
            out = out + cf * a_s * b_s  # np or traced scales both broadcast
        if y_s is None:
            return out
        return self._quantize(out, y_s, y_zp, node)

    def op_QLinearGlobalAveragePool(self, node, x, x_s, x_zp, y_s, y_zp):
        xf = self._dequantize(x, x_s, x_zp, node)
        channels_last = node.attr("channels_last", 0)
        m = self._lib(xf)
        axes = (
            tuple(range(1, xf.ndim - 1)) if channels_last
            else tuple(range(2, xf.ndim))
        )
        y = m.mean(xf, axis=axes, keepdims=True)
        return self._quantize(y, y_s, y_zp, node)

    # -- signal --------------------------------------------------------------

    def op_DFT(self, node, x, dft_length=None, axis=None):
        import jax.numpy as jnp

        onesided = node.attr("onesided", 0)
        inverse = node.attr("inverse", 0)
        ax = int(axis) if axis is not None else node.attr("axis", 1)
        if inverse:
            raise UnsupportedOnnxOp("inverse DFT not supported")
        n = int(dft_length) if dft_length is not None else None
        # x: [..., 1 or 2] last dim = real/imag pair per ONNX DFT contract.
        xr = x[..., 0] if x.shape[-1] in (1, 2) else x
        if not _is_host(xr) and xr.dtype not in (jnp.float32, jnp.float64):
            xr = xr.astype(jnp.float32)  # jax FFT rejects bf16 inputs
        out = jnp.fft.rfft(xr, n=n, axis=ax) if onesided else jnp.fft.fft(xr, n=n, axis=ax)
        return jnp.stack([out.real, out.imag], axis=-1).astype(jnp.float32)

    def op_STFT(self, node, signal, frame_step, window=None,
                frame_length=None):
        # Opset-17 in-graph STFT (the spelling the v3.0 manifest notes say
        # upstream replaced with Conv1d — a future export may ship it raw).
        import jax.numpy as jnp

        if not node.attr("onesided", 1):
            raise UnsupportedOnnxOp("STFT onesided=0")
        if signal.ndim == 3:
            if signal.shape[-1] != 1:
                raise UnsupportedOnnxOp("STFT on complex signals")
            signal = signal[..., 0]
        step = int(np.asarray(frame_step).reshape(()))
        if window is not None:
            w_len = int(window.shape[-1])
        elif frame_length is not None:
            w_len = int(np.asarray(frame_length).reshape(()))
        else:
            raise UnsupportedOnnxOp("STFT needs window or frame_length")
        n_frames = 1 + (signal.shape[-1] - w_len) // step
        sig = jnp.asarray(signal)
        if sig.dtype not in (jnp.float32, jnp.float64):
            sig = sig.astype(jnp.float32)
        # Overlapping frames via an on-device gather (indices are iota
        # math, not a host constant — keeps the serialized HLO small).
        from jax import lax

        row = lax.broadcasted_iota(jnp.int32, (n_frames, w_len), 0) * step
        col = lax.broadcasted_iota(jnp.int32, (n_frames, w_len), 1)
        frames = jnp.take(sig, row + col, axis=-1)  # [B, n_frames, w_len]
        if window is not None:
            frames = frames * jnp.asarray(window, frames.dtype)
        out = jnp.fft.rfft(frames, axis=-1)
        return jnp.stack([out.real, out.imag], axis=-1).astype(jnp.float32)

    def _cosine_window(self, node, size, a0, a1, a2):
        """Opset-17 generalized-cosine window generators. `size` is a host
        scalar in any real graph (it feeds STFT frame geometry), so the
        window is a host constant baked into the program."""
        n = int(np.asarray(size).reshape(()))
        dt = _NP_DTYPES.get(node.attr("output_datatype", 1))
        if dt is None:
            raise UnsupportedOnnxOp(
                f"{node.op_type} output_datatype "
                f"{node.attr('output_datatype')} is not supported")
        denom = n if node.attr("periodic", 1) else n - 1
        if denom <= 0:  # single-sample symmetric window
            return np.ones(n, dt)
        x = 2.0 * np.pi * np.arange(n, dtype=np.float64) / denom
        return (a0 - a1 * np.cos(x) + a2 * np.cos(2.0 * x)).astype(dt)

    def op_HannWindow(self, node, size):
        return self._cosine_window(node, size, 0.5, 0.5, 0.0)

    def op_HammingWindow(self, node, size):
        # ONNX pins the exact rational coefficients (not torch's 0.54).
        return self._cosine_window(node, size, 25.0 / 46.0, 21.0 / 46.0, 0.0)

    def op_BlackmanWindow(self, node, size):
        return self._cosine_window(node, size, 0.42, 0.5, 0.08)

    def op_MelWeightMatrix(self, node, num_mel_bins, dft_length, sample_rate,
                           lower_edge_hertz, upper_edge_hertz):
        """Opset-17 mel filterbank constant (the in-graph front-end's mel
        matrix when an exporter ships STFT+MelWeightMatrix instead of
        pre-baked initializers). Follows the ONNX spec's algorithm exactly:
        mel(f) = 2595*log10(1 + f/700), num_mel_bins+2 equally-mel-spaced
        edges snapped to integer DFT bins, triangular weights between them.
        All five inputs are host scalars, so the matrix is a baked constant.
        """
        bins = int(np.asarray(num_mel_bins).reshape(()))
        n_dft = int(np.asarray(dft_length).reshape(()))
        sr = int(np.asarray(sample_rate).reshape(()))
        lo = float(np.asarray(lower_edge_hertz).reshape(()))
        hi = float(np.asarray(upper_edge_hertz).reshape(()))
        dt = _NP_DTYPES.get(node.attr("output_datatype", 1))
        if dt is None:
            raise UnsupportedOnnxOp(
                "MelWeightMatrix output_datatype "
                f"{node.attr('output_datatype')} is not supported")
        n_spec = n_dft // 2 + 1
        mel_lo = 2595.0 * np.log10(1.0 + lo / 700.0)
        mel_hi = 2595.0 * np.log10(1.0 + hi / 700.0)
        edges = np.arange(bins + 2, dtype=np.float64)
        edges = edges * (mel_hi - mel_lo) / (bins + 2) + mel_lo
        hz = 700.0 * (np.power(10.0, edges / 2595.0) - 1.0)
        freq_bin = ((n_dft + 1) * hz // sr).astype(np.int64)
        out = np.zeros((n_spec, bins), np.float64)
        for i in range(bins):
            left, center, right = freq_bin[i], freq_bin[i + 1], freq_bin[i + 2]
            if center - left == 0:
                out[center, i] = 1.0
            else:
                for j in range(left, center + 1):
                    out[j, i] = (j - left) / float(center - left)
            if right - center > 0:
                for j in range(center, right):
                    out[j, i] = (right - j) / float(right - center)
        return out.astype(dt)

    # -- scatter / gather extras ---------------------------------------------

    def op_CastLike(self, node, x, target):
        dt = _np(target).dtype if _is_host(target) else target.dtype
        if _is_host(x):
            return np.asarray(x).astype(dt)
        return x.astype(dt)

    def op_EyeLike(self, node, x):
        k = node.attr("k", 0)
        to = node.attr("dtype")
        dt = _NP_DTYPES[to] if to is not None else (
            _np(x).dtype if _is_host(x) else x.dtype)
        return np.eye(x.shape[0], x.shape[1], k=k, dtype=dt)

    def op_OneHot(self, node, indices, depth, values):
        axis = node.attr("axis", -1)
        d = int(np.asarray(depth).reshape(()))
        m = self._lib(indices, values)
        # Spec: indices in [-depth, -1] wrap once; anything outside
        # [-depth, depth-1] yields an all-off_value row (no modulo wrap).
        idx = m.where(indices < 0, indices + d, indices)
        nd = idx.ndim + 1
        ax = axis % nd
        shape = [1] * nd
        shape[ax] = d
        rng = np.arange(d).reshape(shape)
        hot = m.expand_dims(idx, ax) == rng  # out-of-range matches nothing
        off, on = values[0], values[1]
        return m.where(hot, on, off)

    def op_GatherND(self, node, data, indices):
        batch_dims = node.attr("batch_dims", 0)
        if batch_dims:
            raise UnsupportedOnnxOp(
                f"GatherND batch_dims={batch_dims} is not supported")
        idx = _np(indices) if _is_host(indices) else indices
        last = indices.shape[-1]
        if _is_host(data) and _is_host(indices):
            return _np(data)[tuple(np.moveaxis(_np(indices), -1, 0))]
        import jax.numpy as jnp

        parts = tuple(idx[..., i] for i in range(last))
        return jnp.asarray(data)[parts]

    def _scatter_reduce(self, node):
        red = node.attr("reduction", b"none")
        red = red.decode() if isinstance(red, bytes) else red
        if red not in ("none", "add", "mul", "max", "min"):
            raise UnsupportedOnnxOp(
                f"{node.op_type} reduction '{red}' is not supported")
        return red

    def op_ScatterND(self, node, data, indices, updates):
        red = self._scatter_reduce(node)
        import jax.numpy as jnp

        d = jnp.asarray(data)
        idx = _np(indices) if _is_host(indices) else indices
        last = indices.shape[-1]
        parts = tuple(idx[..., i] for i in range(last))
        at = d.at[parts]
        if red == "none":
            return at.set(updates)
        return getattr(at, {"add": "add", "mul": "multiply",
                            "max": "max", "min": "min"}[red])(updates)

    def op_ScatterElements(self, node, data, indices, updates):
        red = self._scatter_reduce(node)
        axis = node.attr("axis", 0)
        if _is_host(data) and _is_host(indices) and _is_host(updates) \
                and red == "none":
            out = _np(data).copy()
            np.put_along_axis(out, _np(indices), _np(updates), axis=axis)
            return out
        import jax.numpy as jnp

        if red == "none":
            return jnp.put_along_axis(
                jnp.asarray(data), indices, updates, axis=axis,
                inplace=False)
        # Reduction form: expand to explicit ND coordinates, reuse the
        # .at[] machinery.
        d = jnp.asarray(data)
        idx = jnp.asarray(indices)
        coords = [
            jnp.broadcast_to(
                np.arange(idx.shape[a]).reshape(
                    [-1 if i == a else 1 for i in range(idx.ndim)]),
                idx.shape,
            )
            for a in range(idx.ndim)
        ]
        coords[axis % d.ndim] = idx
        at = d.at[tuple(coords)]
        return getattr(at, {"add": "add", "mul": "multiply",
                            "max": "max", "min": "min"}[red])(updates)

    def op_Scatter(self, node, data, indices, updates):
        # Deprecated opset-9 alias of ScatterElements.
        return self.op_ScatterElements(node, data, indices, updates)

    # -- opset-18+ breadth ops -------------------------------------------------

    def op_GroupNormalization(self, node, x, scale, bias):
        """Opset 18 (per-group scale/bias) and opset 21 (per-channel) —
        distinguished by the parameter length, as ORT does."""
        eps = node.attr("epsilon", 1e-5)
        g = node.attr("num_groups")
        m = self._lib(x, scale, bias)
        n, c = x.shape[0], x.shape[1]
        if g is None or c % g:
            raise UnsupportedOnnxOp(
                f"GroupNormalization num_groups={g} over C={c}")
        xs = m.reshape(x, (n, g, -1))
        mu = m.mean(xs, axis=-1, keepdims=True)
        var = m.mean((xs - mu) ** 2, axis=-1, keepdims=True)
        y = m.reshape((xs - mu) / m.sqrt(var + eps), x.shape)
        if scale.shape[0] == g != c:  # opset-18 per-group params
            scale = m.repeat(scale, c // g)
            bias = m.repeat(bias, c // g)
        shape = (1, c) + (1,) * (x.ndim - 2)
        return y * m.reshape(scale, shape) + m.reshape(bias, shape)

    def _rms_normalize(self, node, x, scale, axis_default=-1):
        eps = node.attr("epsilon", 1e-5)
        axis = node.attr("axis", axis_default)
        m = self._lib(x, scale)
        axes = tuple(range(axis % x.ndim, x.ndim))
        ms = m.mean(m.square(x), axis=axes, keepdims=True)
        return x / m.sqrt(ms + eps) * scale

    def op_RMSNormalization(self, node, x, scale):
        return self._rms_normalize(node, x, scale)

    def op_SimplifiedLayerNormalization(self, node, x, scale):
        # com.microsoft spelling of RMSNorm (transformer exports).
        return self._rms_normalize(node, x, scale)

    def op_ReverseSequence(self, node, x, seq_lens):
        batch_axis = node.attr("batch_axis", 1)
        time_axis = node.attr("time_axis", 0)
        m = self._lib(x, seq_lens)
        t_len = x.shape[time_axis]
        lens = m.reshape(seq_lens, (-1, 1)).astype(np.int64)
        t = np.arange(t_len, dtype=np.int64)[None, :]
        idx = m.where(t < lens, lens - 1 - t, t)  # [B, T]
        xm = m.moveaxis(x, (batch_axis, time_axis), (0, 1))
        idx = m.reshape(idx, idx.shape + (1,) * (xm.ndim - 2))
        out = m.take_along_axis(xm, idx, axis=1)
        return m.moveaxis(out, (0, 1), (batch_axis, time_axis))

    def op_CenterCropPad(self, node, x, shape):
        target = [int(v) for v in np.asarray(shape).reshape(-1)]
        axes = node.attr("axes")
        axes = (list(range(x.ndim)) if axes is None
                else [a % x.ndim for a in axes])
        m = self._lib(x)
        pads = []
        slices = [slice(None)] * x.ndim
        for ax, want in zip(axes, target):
            have = x.shape[ax]
            if want < have:  # centered crop, floor offset at the start
                start = (have - want) // 2
                slices[ax] = slice(start, start + want)
            elif want > have:  # centered pad, extra element at the end
                before = (want - have) // 2
                pads.append((ax, before, want - have - before))
        x = x[tuple(slices)]
        if pads:
            widths = [(0, 0)] * x.ndim
            for ax, b, a in pads:
                widths[ax] = (b, a)
            x = m.pad(x, widths)
        return x

    def op_Col2Im(self, node, x, image_shape, block_shape):
        """Inverse im2col (opset 18): scatter-add kernel taps back onto the
        image canvas. Each of the kH*kW taps lands as one static strided
        slice-add — XLA lowers these to in-place dynamic-update fusions."""
        img = [int(v) for v in np.asarray(image_shape).reshape(-1)]
        blk = [int(v) for v in np.asarray(block_shape).reshape(-1)]
        nsp = len(img)
        dil = list(node.attr("dilations") or [1] * nsp)
        pads = list(node.attr("pads") or [0] * (2 * nsp))
        strides = list(node.attr("strides") or [1] * nsp)
        if nsp != 2:
            raise UnsupportedOnnxOp(
                f"Col2Im with {nsp} spatial dims (only 2-D supported)")
        import jax.numpy as jnp

        (ih, iw), (kh, kw) = img, blk
        steps = [
            (img[i] + pads[i] + pads[nsp + i] - dil[i] * (blk[i] - 1) - 1)
            // strides[i] + 1
            for i in range(nsp)
        ]
        sh, sw = steps
        n = x.shape[0]
        c = x.shape[1] // (kh * kw)
        cols = jnp.reshape(jnp.asarray(x), (n, c, kh, kw, sh, sw))
        canvas = jnp.zeros(
            (n, c, ih + pads[0] + pads[2], iw + pads[1] + pads[3]),
            dtype=cols.dtype)
        for i in range(kh):
            for j in range(kw):
                canvas = canvas.at[
                    :, :,
                    i * dil[0]: i * dil[0] + sh * strides[0]: strides[0],
                    j * dil[1]: j * dil[1] + sw * strides[1]: strides[1],
                ].add(cols[:, :, i, j])
        return canvas[:, :, pads[0]: pads[0] + ih, pads[1]: pads[1] + iw]

    def op_GridSample(self, node, x, grid):
        """2-D GridSample (opset 16/20): linear/nearest over zeros/border
        padding. Gathers go through one flattened take_along_axis per
        corner — the XLA-friendly layout (no dynamic shapes)."""
        mode = node.attr("mode", b"linear")
        mode = mode.decode() if isinstance(mode, bytes) else mode
        pad = node.attr("padding_mode", b"zeros")
        pad = pad.decode() if isinstance(pad, bytes) else pad
        align = node.attr("align_corners", 0)
        if x.ndim != 4:
            raise UnsupportedOnnxOp("GridSample supports 2-D inputs only")
        if mode not in ("linear", "bilinear", "nearest"):
            raise UnsupportedOnnxOp(f"GridSample mode '{mode}'")
        if pad not in ("zeros", "border"):
            raise UnsupportedOnnxOp(f"GridSample padding_mode '{pad}'")
        import jax.numpy as jnp

        xj = jnp.asarray(x)
        n, c, h, w = xj.shape
        gx, gy = jnp.asarray(grid[..., 0]), jnp.asarray(grid[..., 1])

        def unnorm(g, size):
            if align:
                return (g + 1.0) * 0.5 * (size - 1)
            return ((g + 1.0) * size - 1.0) * 0.5

        fx, fy = unnorm(gx, w), unnorm(gy, h)
        flat = jnp.reshape(xj, (n, c, h * w))

        def tap(ix, iy):
            """Gather x[n,:,iy,ix] with border clamp; returns the values
            and an in-bounds mask (for zeros padding)."""
            ok = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
            ixc = jnp.clip(ix, 0, w - 1)
            iyc = jnp.clip(iy, 0, h - 1)
            idx = (iyc * w + ixc).astype(jnp.int32)
            idx = jnp.reshape(idx, (n, 1, -1))
            vals = jnp.take_along_axis(flat, idx, axis=2)
            vals = jnp.reshape(vals, (n, c) + gx.shape[1:])
            if pad == "zeros":
                vals = vals * jnp.expand_dims(ok, 1).astype(vals.dtype)
            return vals

        if mode == "nearest":
            return tap(jnp.round(fx).astype(jnp.int32),
                       jnp.round(fy).astype(jnp.int32))
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        wx = (fx - x0).astype(xj.dtype)[:, None]
        wy = (fy - y0).astype(xj.dtype)[:, None]
        x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
        v00 = tap(x0i, y0i)
        v01 = tap(x0i + 1, y0i)
        v10 = tap(x0i, y0i + 1)
        v11 = tap(x0i + 1, y0i + 1)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy

    def op_AffineGrid(self, node, theta, size):
        """Opset-20 AffineGrid (2-D): the sampling-grid generator paired
        with GridSample. theta [N,2,3], size [N,C,H,W] (host constant) →
        grid [N,H,W,2] of (x,y) in the normalized [-1,1] space."""
        dims = [int(v) for v in np.asarray(size).reshape(-1)]
        if len(dims) != 4:
            raise UnsupportedOnnxOp(
                f"AffineGrid with {len(dims) - 2} spatial dims "
                "(only 2-D supported)")
        n, _, h, w = dims
        align = node.attr("align_corners", 0)
        import jax.numpy as jnp

        def base(count):
            # Normalized sample centers along one axis.
            r = jnp.arange(count, dtype=jnp.float32)
            if align:
                return -1.0 + 2.0 * r / max(count - 1, 1)
            return (2.0 * r + 1.0) / count - 1.0

        xs = jnp.broadcast_to(base(w)[None, :], (h, w))
        ys = jnp.broadcast_to(base(h)[:, None], (h, w))
        ones = jnp.ones((h, w), jnp.float32)
        pts = jnp.stack([xs, ys, ones], axis=-1).reshape(h * w, 3)
        th = jnp.asarray(theta, jnp.float32)  # [N, 2, 3]
        grid = jnp.einsum("pk,nok->npo", pts, th)
        return grid.reshape(n, h, w, 2)

    def op_Det(self, node, x):
        if _is_host(x):
            return np.linalg.det(_np(x)).astype(_np(x).dtype)
        import jax.numpy as jnp

        return jnp.linalg.det(x)

    def op_BitShift(self, node, x, y):
        d = node.attr("direction")
        d = d.decode() if isinstance(d, bytes) else d
        m = self._lib(x, y)
        if d == "LEFT":
            return m.left_shift(x, y)
        if d == "RIGHT":
            return m.right_shift(x, y)
        raise UnsupportedOnnxOp(f"BitShift direction '{d}'")

    def op_BitwiseAnd(self, node, a, b):
        return self._lib(a, b).bitwise_and(a, b)

    def op_BitwiseOr(self, node, a, b):
        return self._lib(a, b).bitwise_or(a, b)

    def op_BitwiseXor(self, node, a, b):
        return self._lib(a, b).bitwise_xor(a, b)

    def op_BitwiseNot(self, node, x):
        return self._lib(x).invert(x)

    # -- attention (opset 23 + com.microsoft fused transformer ops) -----------
    #
    # Transformer exports arrive in two shapes: the raw decomposition
    # (MatMul/Softmax chains — already covered) and ORT-optimizer output
    # carrying fused com.microsoft ops. Both lower to one jnp.einsum-based
    # core so XLA sees plain batched matmuls (MXU) with the softmax fused
    # between them. KV-cache inputs (past/present) are decode-time state
    # with data-dependent lengths — out of scope for an offline audio
    # classifier, preflighted as unsupported.

    def _sdpa(self, q, k, v, mask=None, is_causal=False, scale=None,
              softcap=0.0):
        """q/k/v: [B, H, S, D] (kv heads may divide q heads — GQA).
        mask: bool (True = attend) or additive float, broadcastable to
        [B, H, Sq, Skv]. Returns (out, qk_raw) where qk_raw is the scaled
        Q·Kᵀ before mask/softcap (qk_matmul_output_mode=0)."""
        import jax.numpy as jnp

        q, k, v = (jnp.asarray(t) for t in (q, k, v))
        hq, hkv = q.shape[1], k.shape[1]
        if hq != hkv:  # grouped-query attention: repeat kv heads
            if hq % hkv:
                raise UnsupportedOnnxOp(
                    f"Attention q_heads={hq} not a multiple of kv_heads={hkv}")
            k = jnp.repeat(k, hq // hkv, axis=1)
            v = jnp.repeat(v, hq // hkv, axis=1)
        if scale is None:
            scale = 1.0 / float(np.sqrt(q.shape[-1]))
        qk_raw = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        qk = qk_raw
        # Spec ordering (Attention-23 pattern graph): additive mask joins
        # the logits BEFORE softcap; boolean/causal masking is a -inf
        # select right before the softmax (so softcap cannot turn a
        # masked-out position into a finite -softcap logit).
        bool_mask = None
        if mask is not None:
            mask = jnp.asarray(mask)
            while mask.ndim < 4:
                mask = mask[None]
            if mask.dtype == jnp.bool_:
                bool_mask = mask
            else:
                qk = qk + mask
        if softcap:
            qk = softcap * jnp.tanh(qk / softcap)
        if is_causal:
            # Upper-left alignment (tril of ones(Sq, Skv)), matching the
            # spec's torch-SDPA semantics for non-square masks; combines
            # with any provided mask rather than replacing it.
            sq, skv = qk.shape[-2], qk.shape[-1]
            from jax import lax

            row = lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
            col = lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
            causal = col <= row
            bool_mask = causal if bool_mask is None else bool_mask & causal
        if bool_mask is not None:
            qk = jnp.where(bool_mask, qk, -jnp.inf)
        import jax

        w = jax.nn.softmax(qk, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(jnp.float32))
        return out.astype(v.dtype), qk_raw

    @staticmethod
    def _split_heads(x, n_heads):
        """[B, S, H*D] -> [B, H, S, D]"""
        import jax.numpy as jnp

        b, s, hid = x.shape
        return jnp.transpose(
            jnp.reshape(jnp.asarray(x), (b, s, n_heads, hid // n_heads)),
            (0, 2, 1, 3))

    @staticmethod
    def _merge_heads(x):
        """[B, H, S, D] -> [B, S, H*D]"""
        import jax.numpy as jnp

        b, h, s, d = x.shape
        return jnp.reshape(jnp.transpose(x, (0, 2, 1, 3)), (b, s, h * d))

    def op_Attention(self, node, q, k, v, attn_mask=None,
                     past_key=None, past_value=None):
        """Opset-23 Attention: 3-D ([B,S,hidden]) or 4-D ([B,H,S,D])
        Q/K/V, bool or additive mask, is_causal, GQA, scale, softcap."""
        if past_key is not None or past_value is not None:
            raise UnsupportedOnnxOp("Attention past_key/past_value (KV cache)")
        if len(node.outputs) > 3 and node.outputs[3]:
            mode = node.attr("qk_matmul_output_mode", 0)
            if mode != 0:
                raise UnsupportedOnnxOp(
                    f"Attention qk_matmul_output_mode={mode}")
        three_d = q.ndim == 3
        if three_d:
            hq = node.attr("q_num_heads")
            hkv = node.attr("kv_num_heads")
            if not hq or not hkv:
                raise UnsupportedOnnxOp(
                    "3-D Attention requires q_num_heads/kv_num_heads")
            q = self._split_heads(q, hq)
            k = self._split_heads(k, hkv)
            v = self._split_heads(v, hkv)
        out, qk = self._sdpa(
            q, k, v, mask=attn_mask,
            is_causal=bool(node.attr("is_causal", 0)),
            scale=node.attr("scale"),
            softcap=node.attr("softcap", 0.0))
        if three_d:
            out = self._merge_heads(out)
        results = [out]
        if len(node.outputs) > 1:
            # With no past KV, present_key/value are K/V in head layout.
            results += [k, v]
            if len(node.outputs) > 3:
                results.append(qk)
        return tuple(results) if len(results) > 1 else out

    def op_MultiHeadAttention(self, node, query, key=None, value=None,
                              bias=None, key_padding_mask=None,
                              attention_bias=None, past_key=None,
                              past_value=None):
        """com.microsoft MultiHeadAttention: separate Q/K/V ([B,S,hidden]),
        packed QKV in `query` ([B,S,num_heads,3,head_size]), or packed KV
        in `key` ([B,kv_S,num_heads,2,head_size]); optional fused bias and
        additive attention bias."""
        import jax.numpy as jnp

        if past_key is not None or past_value is not None:
            raise UnsupportedOnnxOp("MultiHeadAttention past KV cache")
        if key_padding_mask is not None:
            raise UnsupportedOnnxOp("MultiHeadAttention key_padding_mask")
        n = node.attr("num_heads")
        if not n:
            raise UnsupportedOnnxOp("MultiHeadAttention requires num_heads")

        def heads(x):  # [B, S, N, D] -> [B, N, S, D]
            return jnp.transpose(jnp.asarray(x), (0, 2, 1, 3))

        if key is None and value is None:
            # Packed QKV: [B, S, num_heads, 3, head_size] (the only packed
            # query layout the com.microsoft contract defines).
            if query.ndim != 5 or query.shape[3] != 3:
                raise UnsupportedOnnxOp(
                    "MultiHeadAttention without key/value requires packed "
                    f"QKV [B,S,heads,3,head] (got rank {query.ndim})")
            if bias is not None:
                raise UnsupportedOnnxOp(
                    "MultiHeadAttention bias with packed QKV")
            query = jnp.asarray(query)
            q, k, v = (heads(query[..., i, :]) for i in range(3))
        elif value is None and key is not None and key.ndim == 5:
            # Packed KV: [B, kv_S, num_heads, 2, head_size].
            if key.shape[3] != 2:
                raise UnsupportedOnnxOp(
                    "MultiHeadAttention packed KV must be [B,S,heads,2,head]")
            if bias is not None:
                raise UnsupportedOnnxOp(
                    "MultiHeadAttention bias with packed KV")
            key = jnp.asarray(key)
            q = self._split_heads(jnp.asarray(query), n)
            k, v = (heads(key[..., i, :]) for i in range(2))
        else:
            q, k, v = (jnp.asarray(t) for t in (query, key, value))
            if bias is not None:
                b = jnp.asarray(bias, q.dtype)
                hid = q.shape[-1]
                q = q + b[:hid]
                k = k + b[hid:hid + k.shape[-1]]
                v = v + b[hid + k.shape[-1]:]
            q, k, v = (self._split_heads(t, n) for t in (q, k, v))
        out, _ = self._sdpa(q, k, v, mask=attention_bias,
                            scale=node.attr("scale"))
        return self._merge_heads(out)

    def op_FusedMatMul(self, node, a, b):
        # com.microsoft: MatMul with transpose/alpha folded in.
        if node.attr("transBatchA", 0) or node.attr("transBatchB", 0):
            raise UnsupportedOnnxOp("FusedMatMul transBatchA/B")
        import jax.numpy as jnp

        a, b = self._mm_cast(a, b)
        a, b = jnp.asarray(a), jnp.asarray(b)
        if node.attr("transA", 0):
            a = jnp.swapaxes(a, -1, -2)
        if node.attr("transB", 0):
            b = jnp.swapaxes(b, -1, -2)
        out = jnp.matmul(a, b, preferred_element_type=jnp.float32)
        return out.astype(a.dtype) * node.attr("alpha", 1.0)

    def op_FastGelu(self, node, x, bias=None):
        # com.microsoft: tanh-approximated gelu with optional fused bias.
        m = self._lib(x, bias)
        if bias is not None:
            x = x + bias
        c = np.sqrt(2.0 / np.pi).astype(np.float32)
        return 0.5 * x * (1.0 + m.tanh(c * (x + 0.044715 * x ** 3)))

    def op_BiasGelu(self, node, x, bias):
        # Exact-erf gelu; jax evaluates host constants too (losing only
        # constant folding, which never matters for an activation).
        import jax

        return jax.nn.gelu(x + bias, approximate=False)

    def op_QuickGelu(self, node, x):
        alpha = node.attr("alpha", 1.702)
        m = self._lib(x)
        if m is np:
            return x / (1.0 + np.exp(-alpha * x))
        import jax

        return x * jax.nn.sigmoid(alpha * x)

    def _skip_layer_norm(self, node, x, skip, gamma, beta, bias, rms):
        eps = node.attr("epsilon", 1e-12)
        m = self._lib(x, skip, gamma, beta, bias)
        total = x + skip if bias is None else x + skip + bias
        if rms:
            denom = m.sqrt(m.mean(m.square(total), axis=-1, keepdims=True)
                           + eps)
            out = total / denom * gamma
        else:
            mu = m.mean(total, axis=-1, keepdims=True)
            var = m.mean((total - mu) ** 2, axis=-1, keepdims=True)
            out = (total - mu) / m.sqrt(var + eps) * gamma
            if beta is not None:
                out = out + beta
        # Outputs 2/3 (mean, inv_std_var) are training-only; output 4 is
        # the pre-norm sum some graphs feed the residual stream from.
        for pos in (1, 2):
            if len(node.outputs) > pos and node.outputs[pos] \
                    and self._graph_consumes(node.outputs[pos]):
                raise UnsupportedOnnxOp(
                    f"{node.op_type} training-only output "
                    f"'{node.outputs[pos]}' (mean/inv_std_var) is consumed "
                    "by the graph")
        results = [out]
        if len(node.outputs) > 1:
            results += [None, None]
            if len(node.outputs) > 3:
                results.append(total)
        return tuple(results) if len(results) > 1 else out

    def op_SkipLayerNormalization(self, node, x, skip, gamma, beta=None,
                                  bias=None):
        return self._skip_layer_norm(node, x, skip, gamma, beta, bias,
                                     rms=False)

    def op_SkipSimplifiedLayerNormalization(self, node, x, skip, gamma,
                                            bias=None):
        return self._skip_layer_norm(node, x, skip, gamma, None, bias,
                                     rms=True)

    # -- control flow ----------------------------------------------------------
    #
    # ONNX If/Loop execute at trace time: branch selection and trip counts
    # must be graph-static (host values), in which case If picks its branch
    # and Loop unrolls into the XLA program — the compiler-friendly form of
    # the exporter patterns these carry (static preprocessing loops,
    # config-dependent branches). Data-dependent control flow raises a
    # typed error naming the node (ORT executes it dynamically; a graph
    # that truly needs it is out of scope for a batch classifier).

    _LOOP_UNROLL_CAP = 4096

    def _outer_env(self) -> dict:
        stack = getattr(self._tls, "envs", None)
        return stack[-1] if stack else {}

    def _subgraph_evaluator(self, graph) -> "_Evaluator":
        """One evaluator per subgraph body, cached (Loop/Scan call it per
        unrolled iteration). Always the stock float evaluator: the int8 /
        calibration subclasses deliberately target top-level nodes only,
        so subgraph content executes float-correct rather than
        half-quantized with missing scales."""
        cache = getattr(self, "_sub_evs", None)
        if cache is None:
            cache = self._sub_evs = {}
        ev = cache.get(id(graph))
        if ev is None:
            ev = _Evaluator(graph, compute_dtype=self.compute_dtype,
                            opset=self.opset)
            # Large subgraph weights lifted into the params pytree by
            # OnnxFunction arrive through the outer env instead.
            for n in self.lifted_params:
                ev.const.pop(n, None)
            ev.lifted_params = self.lifted_params
            cache[id(graph)] = ev
        return ev

    def _run_subgraph(self, graph, feeds: dict) -> list:
        """Execute a subgraph attribute with outer-scope closure (ONNX
        nested-scope semantics: subgraph nodes may reference any name
        visible in the enclosing graph; the subgraph's own initializers
        and Constants shadow same-named outer values)."""
        ev = self._subgraph_evaluator(graph)
        env = {
            k: v for k, v in self._outer_env().items()
            if k and k not in ev.const
        }
        env.update(feeds)
        out_env = ev.run(env)
        return [out_env[vi.name] for vi in graph.outputs]

    def op_If(self, node, cond):
        if not _is_host(cond):
            raise UnsupportedOnnxOp(
                f"If with a data-dependent condition (node "
                f"'{node.name or 'If'}'); conditions must be graph-static")
        branch = node.attr("then_branch") if bool(
            np.asarray(cond).reshape(())) else node.attr("else_branch")
        if branch is None:
            raise UnsupportedOnnxOp("If without branch subgraphs")
        return tuple(self._run_subgraph(branch, {}))

    def op_Loop(self, node, m=None, cond=None, *v_init):
        body = node.attr("body")
        if body is None:
            raise UnsupportedOnnxOp("Loop without a body subgraph")
        if m is None and cond is None:
            raise UnsupportedOnnxOp(
                "Loop with neither trip count nor condition")
        if m is not None and not _is_host(m):
            raise UnsupportedOnnxOp(
                f"Loop with a data-dependent trip count (node "
                f"'{node.name or 'Loop'}')")

        def host_bool(v, what):
            if v is None:
                return True
            if not _is_host(v):
                raise UnsupportedOnnxOp(
                    f"Loop with a data-dependent {what} (node "
                    f"'{node.name or 'Loop'}')")
            return bool(np.asarray(v).reshape(()))

        trip = int(np.asarray(m).reshape(())) if m is not None else None
        if trip is not None and trip > self._LOOP_UNROLL_CAP:
            raise UnsupportedOnnxOp(
                f"Loop trip count {trip} exceeds the unroll cap "
                f"{self._LOOP_UNROLL_CAP}")
        n_vars = len(v_init)
        n_scan = len(body.outputs) - 1 - n_vars
        keep = host_bool(cond, "condition")
        vars_ = list(v_init)
        scans: list[list] = [[] for _ in range(n_scan)]
        i = 0
        while keep and (trip is None or i < trip):
            if trip is None and i >= self._LOOP_UNROLL_CAP:
                raise UnsupportedOnnxOp(
                    f"while-style Loop exceeded the unroll cap "
                    f"{self._LOOP_UNROLL_CAP}")
            feeds = {body.inputs[0].name: np.int64(i)}
            if len(body.inputs) > 1:
                feeds[body.inputs[1].name] = np.bool_(True)
            for vi, v in zip(body.inputs[2:], vars_):
                feeds[vi.name] = v
            outs = self._run_subgraph(body, feeds)
            keep = host_bool(outs[0], "loop-carried condition")
            vars_ = list(outs[1:1 + n_vars])
            for acc, v in zip(scans, outs[1 + n_vars:]):
                acc.append(v)
            i += 1
        results = list(vars_)
        for acc in scans:
            if not acc:
                raise UnsupportedOnnxOp(
                    "Loop with zero iterations and scan outputs")
            if all(_is_host(v) for v in acc):
                results.append(np.stack([_np(v) for v in acc]))
            else:
                import jax.numpy as jnp

                results.append(jnp.stack([jnp.asarray(v) for v in acc]))
        return tuple(results) if len(results) != 1 else results[0]

    def op_Scan(self, node, *args):
        # Opset-9+ Scan: N state vars + M scan inputs, body consumes one
        # slice of each scan input per step. The sequence length is a
        # static shape, so it unrolls like Loop.
        if self.opset == 8:
            raise UnsupportedOnnxOp(
                "opset-8 Scan (sequence_lens/batch form) is not supported")
        body = node.attr("body")
        m_scan = node.attr("num_scan_inputs")
        if body is None or m_scan is None:
            raise UnsupportedOnnxOp("Scan needs body and num_scan_inputs")
        n_state = len(args) - m_scan
        if n_state < 0:
            raise UnsupportedOnnxOp("Scan with fewer inputs than "
                                    "num_scan_inputs")
        states = list(args[:n_state])
        scan_in = list(args[n_state:])
        in_axes = list(node.attr("scan_input_axes") or [0] * m_scan)
        in_dirs = list(node.attr("scan_input_directions") or [0] * m_scan)
        out_axes = node.attr("scan_output_axes")
        out_dirs = node.attr("scan_output_directions")
        t_len = int(scan_in[0].shape[in_axes[0] % scan_in[0].ndim])
        if t_len > self._LOOP_UNROLL_CAP:
            raise UnsupportedOnnxOp(
                f"Scan length {t_len} exceeds the unroll cap "
                f"{self._LOOP_UNROLL_CAP}")
        n_scan_out = len(body.outputs) - n_state
        accs: list[list] = [[] for _ in range(n_scan_out)]
        for t in range(t_len):
            feeds = {}
            for vi, v in zip(body.inputs[:n_state], states):
                feeds[vi.name] = v
            for j, (x, ax, d) in enumerate(zip(scan_in, in_axes, in_dirs)):
                idx = t_len - 1 - t if d else t
                m = self._lib(x)
                feeds[body.inputs[n_state + j].name] = m.take(
                    x, idx, axis=ax % x.ndim)
            outs = self._run_subgraph(body, feeds)
            states = list(outs[:n_state])
            for acc, v in zip(accs, outs[n_state:]):
                acc.append(v)
        results = list(states)
        for j, acc in enumerate(accs):
            if out_dirs and j < len(out_dirs) and out_dirs[j]:
                acc = acc[::-1]
            ax = out_axes[j] if out_axes and j < len(out_axes) else 0
            if all(_is_host(v) for v in acc):
                results.append(np.stack([_np(v) for v in acc], axis=ax))
            else:
                import jax.numpy as jnp

                results.append(
                    jnp.stack([jnp.asarray(v) for v in acc], axis=ax))
        return tuple(results) if len(results) != 1 else results[0]

    # -- recurrent ops ---------------------------------------------------------
    #
    # Static-length recurrences unroll at trace time like Loop/Scan: the
    # sequence axis is a static shape, each step is dense math XLA fuses.
    # Default activations only (the release graphs carry none of these;
    # exotic configurations raise typed errors naming the limit).

    def _rnn_common(self, node, x):
        """Shared RNN/GRU/LSTM setup. Returns (directions, seq_len)."""
        if node.attr("layout", 0) != 0:
            raise UnsupportedOnnxOp(f"{node.op_type} layout=1")
        if node.attr("clip") is not None:
            raise UnsupportedOnnxOp(f"{node.op_type} clip")
        direction = node.attr("direction", b"forward")
        direction = direction.decode() if isinstance(direction, bytes) \
            else direction
        if direction not in ("forward", "reverse", "bidirectional"):
            raise UnsupportedOnnxOp(
                f"{node.op_type} direction '{direction}'")
        seq_len = int(x.shape[0])
        if seq_len > self._LOOP_UNROLL_CAP:
            raise UnsupportedOnnxOp(
                f"{node.op_type} sequence length {seq_len} exceeds the "
                f"unroll cap {self._LOOP_UNROLL_CAP}")
        dirs = ["forward", "reverse"] if direction == "bidirectional" \
            else [direction]
        return dirs, seq_len

    @staticmethod
    def _rnn_acts(node, defaults):
        acts = node.attr("activations")
        if acts is not None:
            names = [a.decode() if isinstance(a, bytes) else a for a in acts]
            # A bidirectional node lists both directions' activations.
            if names not in (defaults, defaults + defaults):
                raise UnsupportedOnnxOp(
                    f"{node.op_type} non-default activations {names}")

    def _rnn_run(self, x, seq_len, reverse, cell):
        """Drive one direction: cell(xt) per step; outputs in time order."""
        steps = range(seq_len - 1, -1, -1) if reverse else range(seq_len)
        ys = [None] * seq_len
        for t in steps:
            ys[t] = cell(x[t])
        return ys

    def op_RNN(self, node, x, w, r, b=None, sequence_lens=None,
               initial_h=None):
        if sequence_lens is not None:
            raise UnsupportedOnnxOp("RNN sequence_lens")
        self._rnn_acts(node, ["Tanh"])
        dirs, seq_len = self._rnn_common(node, x)
        m = self._lib(x, w, r, b, initial_h)
        hid = int(np.asarray(node.attr("hidden_size") or w.shape[1]))
        batch = int(x.shape[1])
        y_dirs, h_dirs = [], []
        for d, dname in enumerate(dirs):
            wd, rd = w[d], r[d]
            wb = b[d][:hid] + b[d][hid:] if b is not None else 0.0
            h = initial_h[d] if initial_h is not None \
                else m.zeros((batch, hid), _np(x).dtype if _is_host(x)
                             else x.dtype)
            state = {"h": h}

            def cell(xt, wd=wd, rd=rd, wb=wb, state=state):
                state["h"] = m.tanh(xt @ wd.T + state["h"] @ rd.T + wb)
                return state["h"]

            ys = self._rnn_run(x, seq_len, dname == "reverse", cell)
            y_dirs.append(m.stack(ys))
            h_dirs.append(ys[0 if dname == "reverse" else -1])
        y = m.stack(y_dirs, 1)  # [seq, dirs, batch, hid]
        return y, m.stack(h_dirs)

    def op_GRU(self, node, x, w, r, b=None, sequence_lens=None,
               initial_h=None):
        if sequence_lens is not None:
            raise UnsupportedOnnxOp("GRU sequence_lens")
        self._rnn_acts(node, ["Sigmoid", "Tanh"])
        dirs, seq_len = self._rnn_common(node, x)
        lbr = node.attr("linear_before_reset", 0)
        m = self._lib(x, w, r, b, initial_h)
        hid = int(np.asarray(node.attr("hidden_size") or w.shape[1] // 3))
        batch = int(x.shape[1])

        def sig(v):
            return 1.0 / (1.0 + m.exp(-v))

        y_dirs, h_dirs = [], []
        for d, dname in enumerate(dirs):
            wz, wr_, wh = (w[d][i * hid:(i + 1) * hid] for i in range(3))
            rz, rr, rh = (r[d][i * hid:(i + 1) * hid] for i in range(3))
            if b is not None:
                (wbz, wbr, wbh, rbz, rbr, rbh) = (
                    b[d][i * hid:(i + 1) * hid] for i in range(6))
            else:
                wbz = wbr = wbh = rbz = rbr = rbh = 0.0
            h = initial_h[d] if initial_h is not None \
                else m.zeros((batch, hid), _np(x).dtype if _is_host(x)
                             else x.dtype)
            state = {"h": h}

            def cell(xt, wz=wz, wr_=wr_, wh=wh, rz=rz, rr=rr, rh=rh,
                     wbz=wbz, wbr=wbr, wbh=wbh, rbz=rbz, rbr=rbr, rbh=rbh,
                     state=state):
                hp = state["h"]
                z = sig(xt @ wz.T + hp @ rz.T + wbz + rbz)
                rg = sig(xt @ wr_.T + hp @ rr.T + wbr + rbr)
                if lbr:
                    n = m.tanh(xt @ wh.T + wbh + rg * (hp @ rh.T + rbh))
                else:
                    n = m.tanh(xt @ wh.T + wbh + (rg * hp) @ rh.T + rbh)
                state["h"] = (1.0 - z) * n + z * hp
                return state["h"]

            ys = self._rnn_run(x, seq_len, dname == "reverse", cell)
            y_dirs.append(m.stack(ys))
            h_dirs.append(ys[0 if dname == "reverse" else -1])
        return m.stack(y_dirs, 1), m.stack(h_dirs)

    def op_LSTM(self, node, x, w, r, b=None, sequence_lens=None,
                initial_h=None, initial_c=None, p=None):
        if sequence_lens is not None:
            raise UnsupportedOnnxOp("LSTM sequence_lens")
        if p is not None:
            raise UnsupportedOnnxOp("LSTM peepholes")
        if node.attr("input_forget", 0):
            raise UnsupportedOnnxOp("LSTM input_forget=1")
        self._rnn_acts(node, ["Sigmoid", "Tanh", "Tanh"])
        dirs, seq_len = self._rnn_common(node, x)
        m = self._lib(x, w, r, b, initial_h, initial_c)
        hid = int(np.asarray(node.attr("hidden_size") or w.shape[1] // 4))
        batch = int(x.shape[1])

        def sig(v):
            return 1.0 / (1.0 + m.exp(-v))

        y_dirs, h_dirs, c_dirs = [], [], []
        for d, dname in enumerate(dirs):
            # ONNX gate order: i, o, f, c.
            wi, wo, wf, wc = (w[d][i * hid:(i + 1) * hid] for i in range(4))
            ri, ro, rf, rc = (r[d][i * hid:(i + 1) * hid] for i in range(4))
            if b is not None:
                (wbi, wbo, wbf, wbc, rbi, rbo, rbf, rbc) = (
                    b[d][i * hid:(i + 1) * hid] for i in range(8))
            else:
                wbi = wbo = wbf = wbc = rbi = rbo = rbf = rbc = 0.0
            dt = _np(x).dtype if _is_host(x) else x.dtype
            h = initial_h[d] if initial_h is not None \
                else m.zeros((batch, hid), dt)
            c = initial_c[d] if initial_c is not None \
                else m.zeros((batch, hid), dt)
            state = {"h": h, "c": c}

            def cell(xt, wi=wi, wo=wo, wf=wf, wc=wc, ri=ri, ro=ro, rf=rf,
                     rc=rc, wbi=wbi, wbo=wbo, wbf=wbf, wbc=wbc, rbi=rbi,
                     rbo=rbo, rbf=rbf, rbc=rbc, state=state):
                hp, cp = state["h"], state["c"]
                i_g = sig(xt @ wi.T + hp @ ri.T + wbi + rbi)
                f_g = sig(xt @ wf.T + hp @ rf.T + wbf + rbf)
                g_g = m.tanh(xt @ wc.T + hp @ rc.T + wbc + rbc)
                o_g = sig(xt @ wo.T + hp @ ro.T + wbo + rbo)
                state["c"] = f_g * cp + i_g * g_g
                state["h"] = o_g * m.tanh(state["c"])
                return state["h"]

            ys = self._rnn_run(x, seq_len, dname == "reverse", cell)
            y_dirs.append(m.stack(ys))
            h_dirs.append(ys[0 if dname == "reverse" else -1])
            c_dirs.append(state["c"])
        return m.stack(y_dirs, 1), m.stack(h_dirs), m.stack(c_dirs)

    # -- normalization extras --------------------------------------------------

    def op_MeanVarianceNormalization(self, node, x):
        axes = node.attr("axes", [0, 2, 3])
        axes = tuple(int(a) % x.ndim for a in np.asarray(axes).reshape(-1))
        m = self._lib(x)
        mu = m.mean(x, axis=axes, keepdims=True)
        var = m.mean(m.square(x), axis=axes, keepdims=True) - m.square(mu)
        return (x - mu) / m.sqrt(var + 1e-9)

    def op_LpNormalization(self, node, x):
        p = node.attr("p", 2)
        axis = node.attr("axis", -1)
        m = self._lib(x)
        if p == 1:
            norm = m.sum(m.abs(x), axis=axis, keepdims=True)
        elif p == 2:
            norm = m.sqrt(m.sum(m.square(x), axis=axis, keepdims=True))
        else:
            raise UnsupportedOnnxOp(f"LpNormalization p={p}")
        return x / norm

    def op_GlobalLpPool(self, node, x):
        p = node.attr("p", 2)
        m = self._lib(x)
        axes = tuple(range(2, x.ndim))
        if p == 1:
            return m.sum(m.abs(x), axis=axes, keepdims=True)
        if p == 2:
            return m.sqrt(m.sum(m.square(x), axis=axes, keepdims=True))
        raise UnsupportedOnnxOp(f"GlobalLpPool p={p}")

    def op_LpPool(self, node, x):
        from jax import lax

        p = node.attr("p", 2)
        if p not in (1, 2):
            raise UnsupportedOnnxOp(f"LpPool p={p}")
        m = self._lib(x)
        powered = m.abs(x) if p == 1 else m.square(x)
        out = self._pool(node, powered, lax.add, 0.0, False)
        return out if p == 1 else self._lib(out).sqrt(out)


#: Float initializers at least this large are lifted out of the trace into
#: an explicit params pytree: one device copy shared by every compiled batch
#: shape, and the serialized HLO stays small for the remote compile service
#: (a 500 MB graph baked as literals would be rejected outright).
LIFT_PARAM_BYTES = 1 << 16


def lower(model: Model | bytes | str, compute_dtype=None) -> "OnnxFunction":
    """Lower an ONNX model (path, bytes, or parsed Model) to a jax function.

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) runs matmuls/convs in mixed
    precision with fp32 accumulation; None is the bit-faithful fp32 path.
    """
    if isinstance(model, Model):
        # A caller-owned Model is never mutated: the fusion pass splices
        # nodes in place, and the same object may later be lowered on the
        # fp32 parity path, which must see the original node-by-node graph.
        return OnnxFunction(model, compute_dtype=compute_dtype)
    model = load_model(model)
    maybe_fuse_frontend(model, compute_dtype)
    return OnnxFunction(model, compute_dtype=compute_dtype)


def maybe_fuse_frontend(model: Model, compute_dtype) -> int:
    """Apply the mel-front-end fusion pass when the Pallas kernel path is
    active (bf16 on TPU); a no-op otherwise, keeping CPU tests and the
    fp32 parity route on the reference node-by-node semantics. Only call
    on a Model this module loaded itself (the pass mutates the graph)."""
    from ..ops import stft_conv

    if not stft_conv.kernel_enabled(compute_dtype):
        return 0
    from .fuse import fuse_mel_frontend

    return fuse_mel_frontend(model.graph)


class OnnxFunction:
    """A callable jax function built from an ONNX graph.

    Call with positional arrays matching the graph's (non-initializer)
    inputs; returns a tuple of outputs (or a single array if one output).

    Large float weights live in :attr:`params` (name -> array) and are fed
    per call rather than closed over — pass ``params=`` with device-resident
    copies to share one HBM allocation across all compiled batch shapes.
    Small initializers (shape tensors, scalars, index lists) stay host-side
    so static-shape constant folding keeps working.
    """

    def __init__(self, model: Model, compute_dtype=None, evaluator=None):
        self.model = model
        self.graph = model.graph
        # A caller-supplied evaluator swaps the execution semantics while
        # keeping the param-lifting / feed plumbing (the int8 PTQ path in
        # :mod:`.quantize` rides this hook).
        self._eval = (
            evaluator if evaluator is not None
            else _Evaluator(self.graph, compute_dtype=compute_dtype,
                            opset=model.opset)
        )
        # Caller-supplied evaluators (int8 path, calibration) are built
        # from the graph alone; thread the model's opset through so
        # version-gated semantics stay consistent.
        if getattr(self._eval, "opset", 0) == 0:
            self._eval.opset = model.opset
        # Fail with the FULL list of unsupported ops/attrs/dtypes up front
        # (one fix list instead of a raise-on-first retry loop); the per-op
        # raises in the evaluator remain as the runtime backstop.
        from .preflight import preflight_or_raise

        preflight_or_raise(model, evaluator=self._eval)
        init_names = set(self.graph.initializers)
        self.input_names = [
            vi.name for vi in self.graph.inputs if vi.name not in init_names
        ]
        self.output_names = [vi.name for vi in self.graph.outputs]
        self.params: dict[str, np.ndarray] = {}
        for name in list(self._eval.const):
            arr = self._eval.const[name]
            if (
                name in init_names
                and isinstance(arr, np.ndarray)
                and (
                    arr.dtype.kind == "f"
                    or (arr.dtype.kind in "iu" and arr.dtype.itemsize == 1)
                )
                and arr.nbytes >= LIFT_PARAM_BYTES
            ):
                self.params[name] = self._eval.const.pop(name)

        # Large weights inside If/Loop/Scan bodies also lift (they would
        # otherwise bake into the HLO as literals on every trace — the
        # remote compile service rejects big programs, CLAUDE.md). They
        # reach the subgraph evaluator through the outer-env closure;
        # name collisions with top-level values stay inline (shadowing).
        def _subgraphs(graph):
            for n in graph.nodes:
                for a in n.attrs.values():
                    if a.g is not None:
                        yield a.g
                        yield from _subgraphs(a.g)

        for sub in _subgraphs(self.graph):
            for name, t in sub.initializers.items():
                arr = t.array
                if (
                    name
                    and name not in self.params
                    and name not in self._eval.const
                    and isinstance(arr, np.ndarray)
                    and arr.dtype.kind == "f"
                    and arr.nbytes >= LIFT_PARAM_BYTES
                ):
                    self.params[name] = arr
                    self._eval.lifted_params.add(name)

    def input_info(self):
        return [vi for vi in self.graph.inputs if vi.name in self.input_names]

    def __call__(self, *args, params=None, **feeds):
        if args:
            feeds = dict(zip(self.input_names, args)) | feeds
        missing = [n for n in self.input_names if n not in feeds]
        if missing:
            raise ValueError(f"missing graph inputs: {missing}")
        env = dict(params if params is not None else self.params)
        env.update(feeds)
        # fp32 runs under HIGHEST matmul precision inside _Evaluator.run
        # (shared with every direct-run route, e.g. the parity bisector).
        env = self._eval.run(env)
        outs = tuple(env[n] for n in self.output_names)
        return outs[0] if len(outs) == 1 else outs

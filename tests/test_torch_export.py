"""Independent-producer parse/parity tests: real torch.onnx exporter bytes.

Every other ONNX fixture in this suite is produced by our own encoder
(``birda_tpu/onnx/encode.py``), so parser bugs that mirror encoder bugs
would be invisible. ``torch.onnx.export`` (the TorchScript exporter) is a
real-world producer available offline — its C++ protobuf writer emits
different field orderings, doc_strings, value_infos and opset_import
records than our encoder ever does. These tests export real torch modules,
load the bytes through our parser, preflight them, and check numerical
parity against torch eval — the closest in-environment stand-in for
day-one real-asset loading (reference: ORT executes whatever the shipped
graph holds, ``src/inference/runtime.rs:14``).

The exporter's final step (``_add_onnxscript_fn``) only splices
onnxscript custom functions into the serialized proto and requires the
``onnx`` package (absent here); standard aten graphs carry none, so we
bypass that step and take the C++-serialized bytes as-is.
"""

import io

import numpy as np
import torch
import torch.nn as nn

from birda_tpu.onnx.lowering import lower
from birda_tpu.onnx.preflight import preflight
from birda_tpu.onnx.proto import load_model


def torch_export(model, args, opset=17, input_names=None, dynamic_axes=None):
    """torch.onnx.export without the onnx-package post-processing step."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    try:
        buf = io.BytesIO()
        torch.onnx.export(
            model, args, buf, opset_version=opset, dynamo=False,
            input_names=input_names, dynamic_axes=dynamic_axes)
        return buf.getvalue()
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


def check_parity(model, x, opset=17, atol=1e-5, **export_kw):
    model.eval()
    mb = torch_export(model, (torch.from_numpy(x),), opset, **export_kw)
    assert preflight(mb) == []
    fn = lower(mb)
    got = np.asarray(fn(x))
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < atol, np.max(np.abs(got - want))
    return mb


class TestTorchExporterBytes:
    def test_cnn_classifier_head(self):
        torch.manual_seed(0)
        m = nn.Sequential(
            nn.Conv2d(1, 8, 3, stride=2, padding=1),
            nn.BatchNorm2d(8), nn.ReLU(),
            nn.Conv2d(8, 16, 3, padding=1, groups=8),  # depthwise
            nn.SiLU(),
            nn.AdaptiveAvgPool2d(1), nn.Flatten(),
            nn.Linear(16, 6), nn.Softmax(dim=-1),
        )
        x = np.random.default_rng(0).normal(size=(2, 1, 16, 16)).astype(np.float32)
        mb = check_parity(m, x)
        # The parsed model must look like real exporter output, not ours.
        parsed = load_model(mb)
        assert parsed.opset == 17
        assert any(n.op_type == "Conv" for n in parsed.graph.nodes)

    def test_lstm_module(self):
        torch.manual_seed(1)

        class Wrap(nn.Module):
            def __init__(self):
                super().__init__()
                self.lstm = nn.LSTM(6, 5, batch_first=False,
                                    bidirectional=True)

            def forward(self, x):
                y, _ = self.lstm(x)
                return y

        x = np.random.default_rng(1).normal(size=(7, 2, 6)).astype(np.float32)
        check_parity(Wrap(), x)

    def test_transformer_encoder_block(self):
        # need_weights=True forces the exporter down the explicit
        # matmul+softmax MHA path (its fused-SDPA path cannot trace).
        torch.manual_seed(2)

        class Block(nn.Module):
            def __init__(self, d=16):
                super().__init__()
                self.mha = nn.MultiheadAttention(d, 4, batch_first=True)
                self.ln1 = nn.LayerNorm(d)
                self.ln2 = nn.LayerNorm(d)
                self.ff = nn.Sequential(
                    nn.Linear(d, 32), nn.GELU(), nn.Linear(32, d))

            def forward(self, x):
                a, _ = self.mha(x, x, x, need_weights=True)
                x = self.ln1(x + a)
                return self.ln2(x + self.ff(x))

        x = np.random.default_rng(2).normal(size=(2, 5, 16)).astype(np.float32)
        check_parity(Block(), x, atol=2e-5)

    def test_squeeze_excite_block(self):
        torch.manual_seed(3)

        class SE(nn.Module):
            def __init__(self, c=8):
                super().__init__()
                self.body = nn.Conv2d(c, c, 3, padding=1)
                self.fc1 = nn.Conv2d(c, c // 4, 1)
                self.fc2 = nn.Conv2d(c // 4, c, 1)

            def forward(self, x):
                x = self.body(x)
                s = x.mean((2, 3), keepdim=True)
                s = torch.sigmoid(self.fc2(nn.functional.silu(self.fc1(s))))
                return x * s

        x = np.random.default_rng(3).normal(size=(1, 8, 12, 12)).astype(np.float32)
        check_parity(SE(), x)

    def test_dynamic_batch_axis(self):
        # Real assets export with a symbolic batch dim; the lowering must
        # accept any batch at call time (per-shape jit, reference
        # classifier.rs warmup registry).
        torch.manual_seed(4)
        m = nn.Sequential(nn.Linear(5, 4), nn.Tanh(), nn.Linear(4, 3))
        m.eval()
        x1 = np.random.default_rng(4).normal(size=(1, 5)).astype(np.float32)
        mb = torch_export(m, (torch.from_numpy(x1),), 17,
                          input_names=["inp"],
                          dynamic_axes={"inp": {0: "batch"}})
        parsed = load_model(mb)
        assert parsed.graph.inputs[0].shape[0] == "batch"
        fn = lower(mb)
        for b in (1, 4):
            x = np.random.default_rng(b).normal(size=(b, 5)).astype(np.float32)
            with torch.no_grad():
                want = m(torch.from_numpy(x)).numpy()
            assert np.max(np.abs(np.asarray(fn(x)) - want)) < 1e-5

    def test_mel_style_audio_frontend(self):
        # Conv1d framing -> power -> log: the BirdNET-style front-end
        # family, exported by the real exporter.
        torch.manual_seed(5)

        class FrontEnd(nn.Module):
            def __init__(self):
                super().__init__()
                self.frame = nn.Conv1d(1, 32, 64, stride=16, bias=False)

            def forward(self, x):
                spec = self.frame(x) ** 2
                return torch.log(spec + 1e-6)

        x = np.random.default_rng(5).normal(size=(2, 1, 1024)).astype(np.float32)
        check_parity(FrontEnd(), x, atol=1e-4)

    def test_bf16_and_int8_paths_on_exporter_bytes(self):
        # The mixed-precision and PTQ pipelines pattern-match the graph;
        # they have only ever seen our own encoder's bytes before this.
        import jax.numpy as jnp

        from birda_tpu.onnx.quantize import calibrate, lower_int8

        torch.manual_seed(6)
        m = nn.Sequential(
            nn.Conv2d(4, 16, 3, padding=1), nn.BatchNorm2d(16), nn.ReLU(),
            nn.Conv2d(16, 16, 3, padding=1), nn.ReLU(),
            nn.AdaptiveAvgPool2d(1), nn.Flatten(), nn.Linear(16, 5),
        )
        m.eval()
        rng = np.random.default_rng(6)
        x = rng.normal(size=(2, 4, 12, 12)).astype(np.float32)
        mb = torch_export(m, (torch.from_numpy(x),), 17)
        with torch.no_grad():
            want = m(torch.from_numpy(x)).numpy()

        bf = lower(mb, compute_dtype=jnp.bfloat16)
        got = np.asarray(bf(x)).astype(np.float32)
        assert np.max(np.abs(got - want)) < 0.05  # bf16 mantissa drift

        calib = calibrate(mb, [x], min_weight_bytes=1)
        qfn = lower_int8(mb, calib, compute_dtype=jnp.float32,
                         min_weight_bytes=1, protect_outputs=False)
        assert qfn.quantized_nodes
        got = np.asarray(qfn(x, params=qfn.params))
        assert np.max(np.abs(got - want)) < 0.05 * max(
            1.0, np.max(np.abs(want)))

    def test_mutated_exporter_bytes_raise_only_wireerror(self):
        # Same contract as TestParserFuzz, but over real exporter bytes
        # (longer varint runs, doc_strings, different field layout).
        from birda_tpu.onnx.proto import WireError, load_model

        torch.manual_seed(7)
        m = nn.Sequential(nn.Conv2d(1, 4, 3), nn.ReLU(), nn.Flatten())
        m.eval()
        x = torch.randn(1, 1, 8, 8)
        mb = torch_export(m, (x,), 17)
        rng = np.random.default_rng(99)
        for i in range(300):
            b = bytearray(mb)
            mode = i % 3
            if mode == 0:
                b = b[: rng.integers(1, len(b))]
            elif mode == 1:
                for _ in range(3):
                    b[rng.integers(len(b))] ^= 1 << rng.integers(8)
            else:
                pos = int(rng.integers(len(b)))
                b = b[:pos] + bytes(
                    rng.integers(0, 256, 5, dtype=np.uint8)) + b[pos:]
            try:
                load_model(bytes(b))
            except WireError:
                pass


class TestTorchExportFrontEndFusion:
    """A torch-exported Conv1d-STFT front-end chain (slices, squares,
    transpose, mel matmul, eps, log — the full fusable spelling) must
    engage the mel-front-end fusion on the REAL exporter's bytes: the
    exporter emits python scalars as Constant nodes and its own
    Slice/Pow spellings, which is exactly where a matcher tuned only to
    our encoder would silently fall back (VERDICT r3 gap)."""

    def _export(self):
        torch.manual_seed(7)
        bins, frame, hop, mels = 96, 256, 80, 32

        class FrontEnd(nn.Module):
            def __init__(self):
                super().__init__()
                self.frame = nn.Conv1d(1, 2 * bins, frame, stride=hop,
                                       bias=False)
                self.register_buffer(
                    "mel", torch.rand(bins, mels) * 0.1)

            def forward(self, x):
                c = self.frame(x)
                re, im = c[:, :bins], c[:, bins:]
                p = (re * re + im * im).transpose(1, 2)
                return torch.log(p @ self.mel + 1e-6)

        x = np.random.default_rng(7).normal(
            size=(2, 1, 4096)).astype(np.float32)
        m = FrontEnd()
        m.eval()
        mb = torch_export(m, (torch.from_numpy(x),), 17)
        return m, mb, x

    def test_fusion_engages_on_exporter_bytes(self):
        from birda_tpu.onnx.fuse import FUSED_OP, fuse_mel_frontend

        _, mb, _ = self._export()
        model = load_model(mb)
        assert fuse_mel_frontend(model.graph) == 1, (
            "producer-shaped conv1d front-end export fell back to "
            "node-by-node execution: "
            + ", ".join(n.op_type for n in model.graph.nodes))
        assert any(n.op_type == FUSED_OP for n in model.graph.nodes)

    def test_fused_matches_torch(self, monkeypatch):
        from birda_tpu.onnx.fuse import fuse_mel_frontend
        from birda_tpu.onnx.lowering import OnnxFunction

        m, mb, x = self._export()
        model = load_model(mb)
        assert fuse_mel_frontend(model.graph) == 1
        monkeypatch.setenv("BIRDA_STFT_KERNEL", "pallas")
        fn = OnnxFunction(model)
        got = np.asarray(fn(x, params=fn.params), np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(x)).numpy()
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) < 0.08  # bf16 DFT slabs, log out

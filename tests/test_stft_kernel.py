"""Pallas Conv1d-STFT kernel (ops/stft_conv.py) vs the gather+einsum form.

The kernel only engages on a TPU backend at bf16 compute; these tests force
it on CPU via ``BIRDA_STFT_KERNEL=pallas`` (interpret mode) and pin that it
computes exactly the same windowed-DFT as the gather formulation it
replaces, across the three release-graph geometries.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _gather_form(x, w, hop):
    """The fallback formulation from onnx/lowering.py::op_Conv — with the
    bf16 operand rounding applied but the dot run in f32 (XLA:CPU has no
    bf16 dot; rounding-then-upcasting is numerically identical to a bf16
    matmul with fp32 accumulation)."""
    from jax import lax

    t = (x.shape[1] - w.shape[1]) // hop + 1
    k = w.shape[1]
    row = lax.broadcasted_iota(jnp.int32, (t, k), 0) * hop
    col = lax.broadcasted_iota(jnp.int32, (t, k), 1)
    xr = x.astype(jnp.bfloat16).astype(jnp.float32)
    wr = w.T.astype(jnp.bfloat16).astype(jnp.float32)
    frames = jnp.take(xr, row + col, axis=1)
    return jnp.einsum("btk,kc->bct", frames, wr,
                      preferred_element_type=jnp.float32)


# (S, K, hop, C): v2.4 / v3.0 / Perch front-end geometries, shrunk in S
# and C (the kernel's tiling depends on K/hop, not on those).
GEOMETRIES = [
    pytest.param(20_000, 2048, 278, 66, id="v24-shape"),
    pytest.param(20_000, 1024, 320, 34, id="v30-shape"),
    pytest.param(20_000, 640, 320, 640, id="perch-frame-shape"),
]


class TestConv1dStftKernel:
    @pytest.mark.parametrize("s,k,hop,c", GEOMETRIES)
    def test_matches_gather_form(self, s, k, hop, c):
        from birda_tpu.ops.stft_conv import conv1d_stft

        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (3, s)).astype(np.float32)
        w = rng.normal(0, 0.02, (c, k)).astype(np.float32)
        got = np.asarray(conv1d_stft(x, w, hop=hop, interpret=True),
                         np.float32)
        want = np.asarray(_gather_form(x, w, hop), np.float32)
        assert got.shape == want.shape
        # Same bf16 operands; only the fp32 accumulation order differs.
        denom = np.abs(want).max()
        assert np.abs(got - want).max() / denom < 2e-2

    def test_t_smaller_than_tile(self):
        """T below one tile exercises the ragged output block path."""
        from birda_tpu.ops.stft_conv import conv1d_stft

        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, (2, 6000)).astype(np.float32)
        w = rng.normal(0, 0.02, (40, 2048)).astype(np.float32)
        got = np.asarray(conv1d_stft(x, w, hop=278, interpret=True),
                         np.float32)
        want = np.asarray(_gather_form(x, w, 278), np.float32)
        assert got.shape == want.shape
        assert np.abs(got - want).max() / np.abs(want).max() < 2e-2

    def test_enabled_gating(self, monkeypatch):
        from birda_tpu.ops import stft_conv

        shape_x, shape_w = (4, 1, 144_000), (2050, 1, 2048)
        # CPU backend, auto mode: off (gather path serves tests/parity).
        monkeypatch.delenv("BIRDA_STFT_KERNEL", raising=False)
        assert not stft_conv.enabled(shape_x, shape_w, 278, jnp.bfloat16)
        # Forced on: engages regardless of backend.
        monkeypatch.setenv("BIRDA_STFT_KERNEL", "pallas")
        assert stft_conv.enabled(shape_x, shape_w, 278, jnp.bfloat16)
        # fp32 parity mode never uses the kernel.
        assert not stft_conv.enabled(shape_x, shape_w, 278, None)
        # Forced off wins over everything.
        monkeypatch.setenv("BIRDA_STFT_KERNEL", "gather")
        assert not stft_conv.enabled(shape_x, shape_w, 278, jnp.bfloat16)

    def test_lowering_integration(self, monkeypatch):
        """A bf16 ONNX lowering with the kernel forced matches the gather
        lowering end to end (same graph, same inputs)."""
        import fixtures_onnx as fo
        from birda_tpu.onnx.lowering import lower

        rng = np.random.default_rng(2)
        k, c, s = 512, 34, 8000
        w = rng.normal(0, 0.05, (c, 1, k)).astype(np.float32)
        mb = fo.model(
            [fo.node("Conv", ["x", "w"], ["y"], attrs=[
                fo.attr_ints("strides", [160]),
                fo.attr_ints("kernel_shape", [k]),
            ])],
            inputs=[fo.value_info("x", ["batch", 1, s])],
            outputs=[fo.value_info("y", ["batch", c, (s - k) // 160 + 1])],
            initializers=[fo.tensor("w", w)],
        )
        x = rng.normal(0, 1, (2, 1, s)).astype(np.float32)
        # Reference: the same windowed matmul with bf16 operand rounding,
        # accumulated in f64 numpy (the gather lowering itself cannot run
        # its bf16 einsum on XLA:CPU for this shape — DotThunk gap).
        t = (s - k) // 160 + 1
        row = np.arange(t)[:, None] * 160 + np.arange(k)[None, :]
        xr = np.asarray(jnp.asarray(x[:, 0, :], jnp.bfloat16), np.float64)
        wr = np.asarray(jnp.asarray(w[:, 0, :].T, jnp.bfloat16), np.float64)
        want = np.einsum("btk,kc->bct", xr[:, row], wr).astype(np.float32)

        monkeypatch.setenv("BIRDA_STFT_KERNEL", "pallas")
        fn2 = lower(mb, compute_dtype=jnp.bfloat16)
        got = np.asarray(fn2(x, params=fn2.params), np.float32)
        assert got.shape == want.shape
        assert np.abs(got - want).max() / np.abs(want).max() < 2e-2


class TestMelFrontendFusion:
    """Graph-level fusion of the Conv1d-STFT→power→mel→log chain
    (onnx/fuse.py) into the fused Pallas kernel."""

    def _tiny(self):
        from birda_tpu.onnx import fullscale as fs

        return fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)

    def test_pass_matches_and_splices(self):
        from birda_tpu.onnx.fuse import FUSED_OP, fuse_mel_frontend
        from birda_tpu.onnx.proto import load_model

        g = self._tiny()
        model = load_model(g.model_bytes)
        n_before = len(model.graph.nodes)
        fused = fuse_mel_frontend(model.graph)
        assert fused == 1
        ops = [n.op_type for n in model.graph.nodes]
        assert FUSED_OP in ops
        # The whole chain (conv, 2 slices, 2 muls, add, transpose,
        # 2 mel matmuls, concat, eps-add, log = 12 nodes) became one.
        assert len(model.graph.nodes) == n_before - 11
        node = next(n for n in model.graph.nodes if n.op_type == FUSED_OP)
        assert node.attr("hop") == g.spec.hop
        # The fused filterbank concatenates both banks column-wise.
        fb = model.graph.initializers[node.inputs[2]].array
        assert fb.shape == (g.spec.n_fft // 2 + 1,
                            sum(m for m, _, _ in g.spec.mel_banks))
        # The superseded per-bank mel matrices and the eps scalar are
        # dropped — otherwise the big ones get param-lifted and shipped
        # to the device unused.
        used = {i for n in model.graph.nodes for i in n.inputs}
        for name in model.graph.initializers:
            assert name in used, f"orphaned initializer {name}"

    def test_pass_leaves_non_matching_graphs_alone(self):
        import fixtures_onnx as fo
        from birda_tpu.onnx.fuse import fuse_mel_frontend
        from birda_tpu.onnx.proto import load_model

        model = load_model(fo.make_fixture_geomodel(num_species=5))
        nodes = [n.op_type for n in model.graph.nodes]
        assert fuse_mel_frontend(model.graph) == 0
        assert [n.op_type for n in model.graph.nodes] == nodes

    def test_fused_scores_match_unfused(self, monkeypatch):
        """End to end on the tiny full-scale graph: scores through the
        fused front-end match the node-by-node bf16 path."""
        import jax.numpy as jnp

        from birda_tpu.onnx.lowering import lower

        g = self._tiny()
        rng = np.random.default_rng(3)
        x = rng.normal(0, 0.1, (2, g.spec.sample_count)).astype(np.float32)

        # Reference: the bit-faithful fp32 lowering (XLA:CPU cannot execute
        # the bf16 gather path's einsum — DotThunk gap — so the comparison
        # budget is the documented bf16-vs-fp32 score drift).
        monkeypatch.setenv("BIRDA_STFT_KERNEL", "gather")
        fn = lower(g.model_bytes, compute_dtype=None)
        assert not any(n.op_type == "BirdaFusedMelFrontend"
                       for n in fn.graph.nodes)
        want = np.asarray(fn(x, params=fn.params)[0], np.float32)

        monkeypatch.setenv("BIRDA_STFT_KERNEL", "pallas")
        fn2 = lower(g.model_bytes, compute_dtype=jnp.bfloat16)
        assert any(n.op_type == "BirdaFusedMelFrontend"
                   for n in fn2.graph.nodes)
        got = np.asarray(fn2(x, params=fn2.params)[0], np.float32)
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) < 0.05
        assert np.array_equal(np.argmax(got, -1), np.argmax(want, -1))

    def test_single_bank_v30_shape_fuses(self):
        """v3.0's single mel bank takes the no-Concat branch."""
        from birda_tpu.onnx import fullscale as fs
        from birda_tpu.onnx.fuse import FUSED_OP, fuse_mel_frontend
        from birda_tpu.onnx.proto import load_model

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V30_SPEC), seed=1)
        model = load_model(g.model_bytes)
        assert fuse_mel_frontend(model.graph) == 1
        node = next(n for n in model.graph.nodes if n.op_type == FUSED_OP)
        fb = model.graph.initializers[node.inputs[2]].array
        assert fb.shape[0] == g.spec.n_fft // 2 + 1

    def test_pow_squared_spelling_matches(self):
        """Real exporters often spell |X|^2 as Pow(x, 2); the matcher
        accepts it alongside Mul(x, x)."""
        import fixtures_onnx as fo
        from birda_tpu.onnx.fuse import FUSED_OP, fuse_mel_frontend
        from birda_tpu.onnx.proto import load_model

        rng = np.random.default_rng(4)
        k, hop, s = 512, 160, 8000
        bins = 40
        t = (s - k) // hop + 1
        w = rng.normal(0, 0.05, (2 * bins, 1, k)).astype(np.float32)
        fb = rng.uniform(0, 0.1, (bins, 16)).astype(np.float32)
        mb = fo.model(
            [
                fo.node("Conv", ["x", "w"], ["c"], attrs=[
                    fo.attr_ints("strides", [hop]),
                    fo.attr_ints("kernel_shape", [k]),
                ]),
                fo.node("Slice", ["c"], ["re"], attrs=[
                    fo.attr_ints("starts", [0]), fo.attr_ints("ends", [bins]),
                    fo.attr_ints("axes", [1])]),
                fo.node("Slice", ["c"], ["im"], attrs=[
                    fo.attr_ints("starts", [bins]),
                    fo.attr_ints("ends", [2 * bins]),
                    fo.attr_ints("axes", [1])]),
                fo.node("Pow", ["re", "two"], ["re2"]),
                fo.node("Pow", ["im", "two"], ["im2"]),
                fo.node("Add", ["re2", "im2"], ["p"]),
                fo.node("Transpose", ["p"], ["pt"],
                        attrs=[fo.attr_ints("perm", [0, 2, 1])]),
                fo.node("MatMul", ["pt", "fb"], ["mel"]),
                fo.node("Add", ["mel", "eps"], ["mele"]),
                fo.node("Log", ["mele"], ["y"]),
            ],
            inputs=[fo.value_info("x", ["batch", 1, s])],
            outputs=[fo.value_info("y", ["batch", t, 16])],
            initializers=[
                fo.tensor("w", w), fo.tensor("fb", fb),
                fo.tensor("two", np.float32(2.0)),
                fo.tensor("eps", np.float32(1e-6)),
            ],
        )
        model = load_model(mb)
        assert fuse_mel_frontend(model.graph) == 1
        assert any(n.op_type == FUSED_OP for n in model.graph.nodes)

    def test_split_spelling_matches(self):
        """Exporters may separate the cos/sin banks with one Split(axis=1)
        instead of two Slices; the fused scores must match the
        node-by-node execution exactly in fp32."""
        import fixtures_onnx as fo
        from birda_tpu.onnx.fuse import FUSED_OP, fuse_mel_frontend
        from birda_tpu.onnx.lowering import OnnxFunction, lower
        from birda_tpu.onnx.proto import load_model

        rng = np.random.default_rng(6)
        k, hop, s = 512, 160, 8000
        bins = 40
        t = (s - k) // hop + 1
        w = rng.normal(0, 0.05, (2 * bins, 1, k)).astype(np.float32)
        fb = rng.uniform(0, 0.1, (bins, 16)).astype(np.float32)
        mb = fo.model(
            [
                fo.node("Conv", ["x", "w"], ["c"], attrs=[
                    fo.attr_ints("strides", [hop]),
                    fo.attr_ints("kernel_shape", [k]),
                ]),
                fo.node("Split", ["c"], ["re", "im"],
                        attrs=[fo.attr_int("axis", 1)]),
                fo.node("Mul", ["re", "re"], ["re2"]),
                fo.node("Mul", ["im", "im"], ["im2"]),
                fo.node("Add", ["re2", "im2"], ["p"]),
                fo.node("Transpose", ["p"], ["pt"],
                        attrs=[fo.attr_ints("perm", [0, 2, 1])]),
                fo.node("MatMul", ["pt", "fb"], ["mel"]),
                fo.node("Add", ["mel", "eps"], ["mele"]),
                fo.node("Log", ["mele"], ["y"]),
            ],
            inputs=[fo.value_info("x", ["batch", 1, s])],
            outputs=[fo.value_info("y", ["batch", t, 16])],
            initializers=[
                fo.tensor("w", w), fo.tensor("fb", fb),
                fo.tensor("eps", np.float32(1e-6)),
            ],
        )
        x = rng.normal(0, 0.3, (2, 1, s)).astype(np.float32)
        plain = lower(mb)
        want = np.asarray(plain(x, params=plain.params), np.float32)

        model = load_model(mb)
        assert fuse_mel_frontend(model.graph) == 1
        assert any(n.op_type == FUSED_OP for n in model.graph.nodes)
        fn = OnnxFunction(model)
        got = np.asarray(fn(x, params=fn.params), np.float32)
        # The fused kernel computes its DFT slabs in bf16 (its production
        # dtype) even when the surrounding graph is fp32, so the budget is
        # the documented bf16 drift, not exactness.
        assert np.abs(got - want).max() / np.abs(want).max() < 2e-2

    def test_stray_matmul_off_spectrum_left_alone(self):
        """A third MatMul off the transposed spectrum that does NOT feed
        the matched Concat (an auxiliary head) must block the fusion:
        splicing would delete it and orphan its consumers."""
        import fixtures_onnx as fo
        from birda_tpu.onnx.fuse import fuse_mel_frontend
        from birda_tpu.onnx.lowering import lower
        from birda_tpu.onnx.proto import load_model

        rng = np.random.default_rng(9)
        k, hop, s = 512, 160, 8000
        bins = 40
        t = (s - k) // hop + 1
        w = rng.normal(0, 0.05, (2 * bins, 1, k)).astype(np.float32)
        fb1 = rng.uniform(0, 0.1, (bins, 16)).astype(np.float32)
        fb2 = rng.uniform(0, 0.1, (bins, 12)).astype(np.float32)
        fb3 = rng.uniform(0, 0.1, (bins, 8)).astype(np.float32)
        mb = fo.model(
            [
                fo.node("Conv", ["x", "w"], ["c"], attrs=[
                    fo.attr_ints("strides", [hop]),
                    fo.attr_ints("kernel_shape", [k]),
                ]),
                fo.node("Slice", ["c"], ["re"], attrs=[
                    fo.attr_ints("starts", [0]), fo.attr_ints("ends", [bins]),
                    fo.attr_ints("axes", [1])]),
                fo.node("Slice", ["c"], ["im"], attrs=[
                    fo.attr_ints("starts", [bins]),
                    fo.attr_ints("ends", [2 * bins]),
                    fo.attr_ints("axes", [1])]),
                fo.node("Mul", ["re", "re"], ["re2"]),
                fo.node("Mul", ["im", "im"], ["im2"]),
                fo.node("Add", ["re2", "im2"], ["p"]),
                fo.node("Transpose", ["p"], ["pt"],
                        attrs=[fo.attr_ints("perm", [0, 2, 1])]),
                fo.node("MatMul", ["pt", "fb1"], ["mel1"]),
                fo.node("MatMul", ["pt", "fb2"], ["mel2"]),
                fo.node("MatMul", ["pt", "fb3"], ["z"]),  # stray bank
                fo.node("Concat", ["mel1", "mel2"], ["mel"],
                        attrs=[fo.attr_int("axis", 2)]),
                fo.node("Add", ["mel", "eps"], ["mele"]),
                fo.node("Log", ["mele"], ["y"]),
            ],
            inputs=[fo.value_info("x", ["batch", 1, s])],
            outputs=[fo.value_info("y", ["batch", t, 28]),
                     fo.value_info("z", ["batch", t, 8])],
            initializers=[
                fo.tensor("w", w), fo.tensor("fb1", fb1),
                fo.tensor("fb2", fb2), fo.tensor("fb3", fb3),
                fo.tensor("eps", np.float32(1e-6)),
            ],
        )
        model = load_model(mb)
        n_before = len(model.graph.nodes)
        assert fuse_mel_frontend(model.graph) == 0
        assert len(model.graph.nodes) == n_before
        # Both heads still execute.
        fn = lower(mb)
        x = rng.normal(0, 0.3, (2, 1, s)).astype(np.float32)
        y, z = fn(x, params=fn.params)
        assert np.asarray(y).shape == (2, t, 28)
        assert np.asarray(z).shape == (2, t, 8)

    def test_split_uneven_or_wrong_axis_left_alone(self):
        """A Split that is not the equal cos/sin halving must not match."""
        import fixtures_onnx as fo
        from birda_tpu.onnx.fuse import fuse_mel_frontend
        from birda_tpu.onnx.proto import load_model

        rng = np.random.default_rng(7)
        k, hop, s = 512, 160, 8000
        bins = 40
        t = (s - k) // hop + 1
        w = rng.normal(0, 0.05, (2 * bins, 1, k)).astype(np.float32)
        fb = rng.uniform(0, 0.1, (bins, 16)).astype(np.float32)

        def graph(split_attrs, split_outputs):
            return fo.model(
                [
                    fo.node("Conv", ["x", "w"], ["c"], attrs=[
                        fo.attr_ints("strides", [hop]),
                        fo.attr_ints("kernel_shape", [k]),
                    ]),
                    fo.node("Split", ["c"], split_outputs,
                            attrs=split_attrs),
                    fo.node("Mul", ["re", "re"], ["re2"]),
                    fo.node("Mul", ["im", "im"], ["im2"]),
                    fo.node("Add", ["re2", "im2"], ["p"]),
                    fo.node("Transpose", ["p"], ["pt"],
                            attrs=[fo.attr_ints("perm", [0, 2, 1])]),
                    fo.node("MatMul", ["pt", "fb"], ["mel"]),
                    fo.node("Add", ["mel", "eps"], ["mele"]),
                    fo.node("Log", ["mele"], ["y"]),
                ],
                inputs=[fo.value_info("x", ["batch", 1, s])],
                outputs=[fo.value_info("y", ["batch", t, 16])],
                initializers=[
                    fo.tensor("w", w), fo.tensor("fb", fb),
                    fo.tensor("eps", np.float32(1e-6)),
                ],
            )

        # Uneven halves: not the re/im separation.
        m1 = load_model(graph(
            [fo.attr_int("axis", 1),
             fo.attr_ints("split", [bins - 8, bins + 8])], ["re", "im"]))
        assert fuse_mel_frontend(m1.graph) == 0
        # Wrong axis.
        m2 = load_model(graph([fo.attr_int("axis", 2)], ["re", "im"]))
        assert fuse_mel_frontend(m2.graph) == 0

    def test_int8_mode_composes_with_fusion(self, monkeypatch):
        """--precision int8 on a graph with the fused front-end: the DSP
        stays float through the kernel, the backbone quantizes, and the
        scores track the unfused int8 build."""
        import jax.numpy as jnp

        from birda_tpu.onnx import fullscale as fs
        from birda_tpu.onnx.quantize import (calibrate, calibration_signals,
                                             lower_int8)

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        batches = list(calibration_signals(g.spec.sample_count, batch=2,
                                           n_batches=1))
        calib = calibrate(g.model_bytes, batches, min_weight_bytes=256)
        x = batches[0]

        monkeypatch.setenv("BIRDA_STFT_KERNEL", "gather")
        q1 = lower_int8(g.model_bytes, calib, min_weight_bytes=256)
        want = np.asarray(q1(x, params=q1.params)[0], np.float32)

        monkeypatch.setenv("BIRDA_STFT_KERNEL", "pallas")
        q2 = lower_int8(g.model_bytes, calib, min_weight_bytes=256,
                        compute_dtype=jnp.bfloat16)
        assert any(n.op_type == "BirdaFusedMelFrontend"
                   for n in q2.graph.nodes)
        assert len(q2.quantized_nodes) >= 20  # backbone still quantizes
        got = np.asarray(q2(x, params=q2.params)[0], np.float32)
        assert np.max(np.abs(got - want)) < 0.06
        assert np.array_equal(np.argmax(got, -1), np.argmax(want, -1))

    def test_caller_owned_model_never_mutated(self, monkeypatch):
        """lower() must not splice the fusion into a Model object the
        caller passed in — the same object may later be lowered on the
        fp32 parity path, which needs the original node-by-node graph."""
        import jax.numpy as jnp

        from birda_tpu.onnx.lowering import lower
        from birda_tpu.onnx.proto import load_model

        g = self._tiny()
        model = load_model(g.model_bytes)
        ops_before = [n.op_type for n in model.graph.nodes]
        monkeypatch.setenv("BIRDA_STFT_KERNEL", "pallas")
        lower(model, compute_dtype=jnp.bfloat16)
        assert [n.op_type for n in model.graph.nodes] == ops_before

    def test_vmem_overflow_falls_back_to_composed_ops(self, monkeypatch):
        """A fused node whose geometry the kernel cannot hold in VMEM is
        executed as composed ops with identical semantics (the fusion
        pass cannot see the signal length, so this is a runtime check)."""
        import jax.numpy as jnp

        from birda_tpu.onnx.lowering import lower
        from birda_tpu.ops import stft_conv

        g = self._tiny()
        rng = np.random.default_rng(5)
        x = rng.normal(0, 0.1, (2, g.spec.sample_count)).astype(np.float32)

        monkeypatch.setenv("BIRDA_STFT_KERNEL", "pallas")
        fn = lower(g.model_bytes, compute_dtype=jnp.bfloat16)
        assert any(n.op_type == "BirdaFusedMelFrontend"
                   for n in fn.graph.nodes)
        want = np.asarray(fn(x, params=fn.params)[0], np.float32)

        monkeypatch.setattr(stft_conv, "fused_fits",
                            lambda *a, **k: False)
        fn2 = lower(g.model_bytes, compute_dtype=jnp.bfloat16)
        got = np.asarray(fn2(x, params=fn2.params)[0], np.float32)
        assert np.max(np.abs(got - want)) < 0.05
        assert np.array_equal(np.argmax(got, -1), np.argmax(want, -1))


class TestStftOpSpellingFusion:
    """The opset-17 ``STFT``-op chain spelling — what a producer that
    keeps ``tf.signal.stft`` as the signal op exports (the TF-oracle
    full-chain graph in tests/test_tf_oracle.py has exactly this shape) —
    must engage the same front-end fusion, with the windowed-DFT conv
    weights synthesized from the window (fuse.py::_match_chain_stft)."""

    K, HOP, S, MELS = 512, 160, 4096, 24

    def _graph(self, pre_squeeze=False, use_split=False, fft_len=None):
        import fixtures_onnx as fo

        k, hop, s, mels = self.K, self.HOP, self.S, self.MELS
        bins = k // 2 + 1
        t = (s - k) // hop + 1
        rng = np.random.default_rng(11)
        win = (0.5 - 0.5 * np.cos(
            2 * np.pi * np.arange(k) / k)).astype(np.float32)
        fb = rng.uniform(0, 0.1, (bins, mels)).astype(np.float32)

        stft_inputs = ["sig", "step", "win"]
        inits = [
            fo.tensor("step", np.array(hop, np.int64)),
            fo.tensor("win", win),
            fo.tensor("fb", fb),
            fo.tensor("eps", np.array(1e-6, np.float32)),
            fo.tensor("ax3", np.array([3], np.int64)),
        ]
        if fft_len is not None:
            stft_inputs.append("flen")
            inits.append(fo.tensor("flen", np.array(fft_len, np.int64)))
        nodes = [fo.node("STFT", stft_inputs, ["c"])]
        if use_split:
            nodes.append(fo.node("Split", ["c"], ["re", "im"],
                                 attrs=[fo.attr_int("axis", 3)]))
        else:
            inits += [fo.tensor("s0", np.array([0], np.int64)),
                      fo.tensor("s1", np.array([1], np.int64)),
                      fo.tensor("s2", np.array([2], np.int64))]
            nodes += [fo.node("Slice", ["c", "s0", "s1", "ax3"], ["re"]),
                      fo.node("Slice", ["c", "s1", "s2", "ax3"], ["im"])]
        if pre_squeeze:
            nodes += [fo.node("Squeeze", ["re", "ax3"], ["req"]),
                      fo.node("Squeeze", ["im", "ax3"], ["imq"]),
                      fo.node("Mul", ["req", "req"], ["re2"]),
                      fo.node("Mul", ["imq", "imq"], ["im2"]),
                      fo.node("Add", ["re2", "im2"], ["pow"])]
        else:
            nodes += [fo.node("Mul", ["re", "re"], ["re2"]),
                      fo.node("Mul", ["im", "im"], ["im2"]),
                      fo.node("Add", ["re2", "im2"], ["pow4"]),
                      fo.node("Squeeze", ["pow4", "ax3"], ["pow"])]
        nodes += [
            fo.node("MatMul", ["pow", "fb"], ["mel"]),
            fo.node("Add", ["mel", "eps"], ["mele"]),
            fo.node("Log", ["mele"], ["y"]),
        ]
        return fo.model(
            nodes,
            inputs=[fo.value_info("sig", ["batch", s])],
            outputs=[fo.value_info("y", ["batch", t, mels])],
            initializers=inits,
            opset=17,
        )

    def _assert_fused_matches(self, mb, monkeypatch):
        from birda_tpu.onnx.fuse import FUSED_OP, fuse_mel_frontend
        from birda_tpu.onnx.lowering import OnnxFunction, lower
        from birda_tpu.onnx.proto import load_model

        rng = np.random.default_rng(12)
        x = rng.normal(0, 0.3, (2, self.S)).astype(np.float32)
        plain = lower(mb)  # fp32 node-by-node STFT path = the reference
        want = np.asarray(plain(x, params=plain.params), np.float32)

        model = load_model(mb)
        assert fuse_mel_frontend(model.graph) == 1
        node = next(n for n in model.graph.nodes if n.op_type == FUSED_OP)
        assert node.attr("src") == b"stft"
        assert node.attr("hop") == self.HOP
        # Synthesized conv weights: [2*bins, 1, K] from window x DFT.
        w = model.graph.initializers[node.inputs[1]].array
        assert w.shape == (2 * (self.K // 2 + 1), 1, self.K)
        # No orphaned initializers after the splice.
        used = {i for n in model.graph.nodes for i in n.inputs}
        for name in model.graph.initializers:
            assert name in used, f"orphaned initializer {name}"

        monkeypatch.setenv("BIRDA_STFT_KERNEL", "pallas")
        fn = OnnxFunction(model)
        got = np.asarray(fn(x, params=fn.params), np.float32)
        assert got.shape == want.shape
        # log-domain comparison, bf16 DFT slabs in the kernel.
        assert np.max(np.abs(got - want)) < 0.08

    def test_slices_post_add_squeeze(self, monkeypatch):
        """The TF-oracle export shape: Slice re/im on the complex axis,
        square, Add, Squeeze after the add."""
        self._assert_fused_matches(self._graph(), monkeypatch)

    def test_squeeze_before_square(self, monkeypatch):
        self._assert_fused_matches(self._graph(pre_squeeze=True),
                                   monkeypatch)

    def test_split_complex_axis(self, monkeypatch):
        self._assert_fused_matches(self._graph(use_split=True), monkeypatch)

    def test_explicit_frame_length_matches_window(self, monkeypatch):
        self._assert_fused_matches(self._graph(fft_len=self.K), monkeypatch)

    def test_zero_padded_fft_length_does_not_fuse(self):
        """fft_length != window length means a zero-padded DFT the
        synthesized weights would get wrong — must fall back."""
        from birda_tpu.onnx.fuse import fuse_mel_frontend
        from birda_tpu.onnx.proto import load_model

        model = load_model(self._graph(fft_len=2 * self.K))
        assert fuse_mel_frontend(model.graph) == 0

    def test_lower_bf16_engages_stft_fusion(self, monkeypatch):
        """End to end through lower(): a producer-shaped STFT-op export
        must NOT silently fall back to node-by-node execution when the
        kernel path is active (VERDICT r3 gap: fusion engagement)."""
        import jax.numpy as jnp

        from birda_tpu.onnx.lowering import lower

        monkeypatch.setenv("BIRDA_STFT_KERNEL", "pallas")
        fn = lower(self._graph(), compute_dtype=jnp.bfloat16)
        assert any(n.op_type == "BirdaFusedMelFrontend"
                   for n in fn.graph.nodes)


class TestConstantNodeFolding:
    """Exporters emit chain scalars (eps, slice params, split sizes) as
    Constant *nodes*; the fusion matchers read graph.initializers, so
    fuse.py folds Constant nodes first (fold_constant_nodes). Without the
    fold, a real export silently runs node-by-node."""

    def test_conv_chain_with_constant_nodes_fuses(self):
        import fixtures_onnx as fo
        from birda_tpu.onnx.fuse import FUSED_OP, fuse_mel_frontend
        from birda_tpu.onnx.proto import load_model

        rng = np.random.default_rng(13)
        k, hop, s, bins = 512, 160, 4096, 40
        t = (s - k) // hop + 1
        w = rng.normal(0, 0.05, (2 * bins, 1, k)).astype(np.float32)
        fb = rng.uniform(0, 0.1, (bins, 16)).astype(np.float32)
        mb = fo.model(
            [
                # eps and the Pow exponent arrive as Constant nodes, the
                # way torch.onnx.export spells python scalars.
                fo.node("Constant", [], ["two"],
                        attrs=[fo.attr_tensor("value", np.float32(2.0))]),
                fo.node("Constant", [], ["eps"],
                        attrs=[fo.attr_tensor("value", np.float32(1e-6))]),
                fo.node("Conv", ["x", "w"], ["c"], attrs=[
                    fo.attr_ints("strides", [hop]),
                    fo.attr_ints("kernel_shape", [k]),
                ]),
                fo.node("Slice", ["c"], ["re"], attrs=[
                    fo.attr_ints("starts", [0]), fo.attr_ints("ends", [bins]),
                    fo.attr_ints("axes", [1])]),
                fo.node("Slice", ["c"], ["im"], attrs=[
                    fo.attr_ints("starts", [bins]),
                    fo.attr_ints("ends", [2 * bins]),
                    fo.attr_ints("axes", [1])]),
                fo.node("Pow", ["re", "two"], ["re2"]),
                fo.node("Pow", ["im", "two"], ["im2"]),
                fo.node("Add", ["re2", "im2"], ["p"]),
                fo.node("Transpose", ["p"], ["pt"],
                        attrs=[fo.attr_ints("perm", [0, 2, 1])]),
                fo.node("MatMul", ["pt", "fb"], ["mel"]),
                fo.node("Add", ["mel", "eps"], ["mele"]),
                fo.node("Log", ["mele"], ["y"]),
            ],
            inputs=[fo.value_info("x", ["batch", 1, s])],
            outputs=[fo.value_info("y", ["batch", t, 16])],
            initializers=[fo.tensor("w", w), fo.tensor("fb", fb)],
        )
        model = load_model(mb)
        assert fuse_mel_frontend(model.graph) == 1
        assert any(n.op_type == FUSED_OP for n in model.graph.nodes)
        # The folded Constant nodes are gone (consumed by the chain).
        assert not any(n.op_type == "Constant" for n in model.graph.nodes)

    def test_constant_graph_output_keeps_its_node(self):
        import fixtures_onnx as fo
        from birda_tpu.onnx.fuse import fold_constant_nodes
        from birda_tpu.onnx.lowering import lower
        from birda_tpu.onnx.proto import load_model

        mb = fo.model(
            [fo.node("Constant", [], ["y"],
                     attrs=[fo.attr_tensor(
                         "value", np.arange(4, dtype=np.float32))]),
             fo.node("Identity", ["x"], ["z"])],
            inputs=[fo.value_info("x", [4])],
            outputs=[fo.value_info("y", [4]), fo.value_info("z", [4])],
        )
        model = load_model(mb)
        assert fold_constant_nodes(model.graph) == 0
        assert any(n.op_type == "Constant" for n in model.graph.nodes)
        fn = lower(model)
        y, z = fn(np.ones(4, np.float32))
        assert np.array_equal(np.asarray(y), np.arange(4, dtype=np.float32))

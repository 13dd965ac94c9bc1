"""External-data tensor resolution + whole-graph preflight.

Real 400-560 MB ONNX exports routinely ship weights in sidecar files
(``data_location = EXTERNAL``), and real inference graphs carry Dropout
nodes; ORT handles both natively (reference ``src/inference/runtime.rs:14``).
These tests pin the day-one real-asset loading path: sidecar weights lower
bit-identically to inline ones, every failure mode is a typed error, and
the preflight reports ALL unsupported graph elements in one pass.
"""

import numpy as np
import pytest

import fixtures_onnx as fo
from birda_tpu.errors import OnnxExternalData, OnnxGraphUnsupported
from birda_tpu.onnx.lowering import lower
from birda_tpu.onnx.preflight import preflight
from birda_tpu.onnx.proto import load_model


def _matmul_graphs(rng, location="weights.bin", offset=0, **ext_kw):
    """(inline_model, external_model, weight, sidecar_payload)."""
    w = rng.normal(size=(6, 4)).astype(np.float32)
    kw = dict(
        inputs=[fo.value_info("x", ["batch", 6])],
        outputs=[fo.value_info("y", ["batch", 4])],
    )
    nodes = [fo.node("MatMul", ["x", "w"], ["y"])]
    inline = fo.model(nodes, initializers=[fo.tensor("w", w)], **kw)
    external = fo.model(
        nodes,
        initializers=[fo.external_tensor("w", w, location, offset=offset,
                                         **ext_kw)],
        **kw,
    )
    return inline, external, w, w.tobytes()


class TestExternalData:
    def test_sidecar_lowering_bit_identical(self, tmp_path):
        rng = np.random.default_rng(7)
        inline, external, w, payload = _matmul_graphs(rng)
        (tmp_path / "m.onnx").write_bytes(external)
        (tmp_path / "weights.bin").write_bytes(payload)
        x = rng.normal(size=(3, 6)).astype(np.float32)
        got = np.asarray(lower(str(tmp_path / "m.onnx"))(x))
        want = np.asarray(lower(inline)(x))
        assert np.array_equal(got, want)

    def test_offset_and_surrounding_junk(self, tmp_path):
        """Payload at a nonzero offset inside a shared sidecar (the
        convert_model_to_external_data all-in-one-file layout)."""
        rng = np.random.default_rng(8)
        inline, external, w, payload = _matmul_graphs(rng, offset=128)
        (tmp_path / "m.onnx").write_bytes(external)
        (tmp_path / "weights.bin").write_bytes(
            b"\xab" * 128 + payload + b"\xcd" * 64
        )
        x = rng.normal(size=(2, 6)).astype(np.float32)
        got = np.asarray(lower(str(tmp_path / "m.onnx"))(x))
        want = np.asarray(lower(inline)(x))
        assert np.array_equal(got, want)

    def test_no_length_entry_still_loads(self, tmp_path):
        """length is optional in the spec; dims x dtype give the size."""
        rng = np.random.default_rng(9)
        inline, external, w, payload = _matmul_graphs(rng, with_length=False)
        (tmp_path / "m.onnx").write_bytes(external)
        (tmp_path / "weights.bin").write_bytes(payload)
        x = rng.normal(size=(2, 6)).astype(np.float32)
        assert np.array_equal(
            np.asarray(lower(str(tmp_path / "m.onnx"))(x)),
            np.asarray(lower(inline)(x)),
        )

    def test_missing_sidecar_is_typed_error(self, tmp_path):
        rng = np.random.default_rng(10)
        _, external, _, _ = _matmul_graphs(rng)
        (tmp_path / "m.onnx").write_bytes(external)
        with pytest.raises(OnnxExternalData, match="weights.bin"):
            load_model(tmp_path / "m.onnx")

    def test_bytes_without_base_dir_is_typed_error(self):
        rng = np.random.default_rng(11)
        _, external, _, _ = _matmul_graphs(rng)
        with pytest.raises(OnnxExternalData, match="base directory"):
            load_model(external)

    def test_bytes_with_base_dir_resolves(self, tmp_path):
        rng = np.random.default_rng(12)
        inline, external, _, payload = _matmul_graphs(rng)
        (tmp_path / "weights.bin").write_bytes(payload)
        x = rng.normal(size=(2, 6)).astype(np.float32)
        m = load_model(external, base_dir=tmp_path)
        assert np.array_equal(
            np.asarray(lower(m)(x)), np.asarray(lower(inline)(x))
        )

    def test_truncated_sidecar_is_typed_error(self, tmp_path):
        rng = np.random.default_rng(13)
        _, external, _, payload = _matmul_graphs(rng)
        (tmp_path / "m.onnx").write_bytes(external)
        (tmp_path / "weights.bin").write_bytes(payload[:-8])
        with pytest.raises(OnnxExternalData, match="bytes"):
            load_model(tmp_path / "m.onnx")

    def test_path_escape_rejected(self, tmp_path):
        rng = np.random.default_rng(14)
        _, external, _, payload = _matmul_graphs(rng, location="../evil.bin")
        model_dir = tmp_path / "models"
        model_dir.mkdir()
        (model_dir / "m.onnx").write_bytes(external)
        (tmp_path / "evil.bin").write_bytes(payload)  # exists, but outside
        with pytest.raises(OnnxExternalData, match="escapes"):
            load_model(model_dir / "m.onnx")

    def test_subdirectory_location_allowed(self, tmp_path):
        rng = np.random.default_rng(15)
        inline, external, _, payload = _matmul_graphs(
            rng, location="weights/w.bin"
        )
        (tmp_path / "m.onnx").write_bytes(external)
        (tmp_path / "weights").mkdir()
        (tmp_path / "weights" / "w.bin").write_bytes(payload)
        x = rng.normal(size=(2, 6)).astype(np.float32)
        assert np.array_equal(
            np.asarray(lower(str(tmp_path / "m.onnx"))(x)),
            np.asarray(lower(inline)(x)),
        )


class TestPreflight:
    def _bad_model(self):
        """Two unsupported ops (one twice), one bad attr config, one
        exotic-dtype initializer — five distinct issues, four findings
        (repeated op types collapse into one with a count)."""
        # A bfloat16 initializer: dtype 16 has no numpy mapping here.
        exotic = fo._int(2, 16) + fo._str(8, "w_bf16") + fo._msg(9, b"\x00\x00")
        return fo.model(
            [
                fo.node("NonZero", ["x"], ["a"]),
                fo.node("CumSum", ["a", "ax"], ["b"],
                        attrs=[fo.attr_int("exclusive", 1)]),
                fo.node("NonMaxSuppression", ["b"], ["c"]),
                fo.node("NonZero", ["c"], ["y"]),
            ],
            inputs=[fo.value_info("x", [1, 8])],
            outputs=[fo.value_info("y", [1, 8])],
            initializers=[
                fo.tensor("ax", np.asarray(0, np.int64)),
                exotic,
            ],
        )

    def test_all_issues_reported_at_once(self):
        findings = preflight(self._bad_model())
        rendered = "\n".join(f.render() for f in findings)
        assert "NonZero" in rendered and "2 occurrences" in rendered
        assert "NonMaxSuppression" in rendered
        assert "exclusive/reverse CumSum" in rendered
        assert "BFLOAT16" in rendered
        assert len(findings) == 4

    def test_lower_raises_aggregate(self):
        with pytest.raises(OnnxGraphUnsupported) as ei:
            lower(self._bad_model())
        msg = str(ei.value)
        # One error names every issue — the single fix list.
        for frag in ("NonZero", "NonMaxSuppression", "CumSum", "BFLOAT16"):
            assert frag in msg

    def test_clean_graph_passes(self):
        assert preflight(fo.make_fixture_geomodel()) == []

    def test_fullscale_families_pass(self):
        from birda_tpu.onnx import fullscale as fs

        for spec in (fs.BIRDNET_V24_SPEC, fs.BIRDNET_V30_SPEC,
                     fs.PERCH_V2_SPEC):
            g = fs.cached_build(fs.tiny_spec(spec), seed=3)
            assert preflight(load_model(g.model_bytes)) == []


class TestNewInferenceOps:
    """Ops real inference exports carry that the lowering must run."""

    def test_dropout_is_identity(self):
        x = np.random.default_rng(0).normal(size=(2, 5)).astype(np.float32)
        mb = fo.model(
            [fo.node("Dropout", ["x"], ["y"])],
            inputs=[fo.value_info("x", [2, 5])],
            outputs=[fo.value_info("y", [2, 5])],
        )
        assert np.array_equal(np.asarray(lower(mb)(x)), x)

    def test_dropout_with_ratio_and_mask(self):
        x = np.random.default_rng(1).normal(size=(3, 4)).astype(np.float32)
        mb = fo.model(
            [fo.node("Dropout", ["x", "ratio"], ["y", "mask"])],
            inputs=[fo.value_info("x", [3, 4])],
            outputs=[fo.value_info("y", [3, 4]),
                     fo.value_info("mask", [3, 4], elem_type=9)],
            initializers=[fo.tensor("ratio", np.asarray(0.5, np.float32))],
        )
        y, mask = lower(mb)(x)
        assert np.array_equal(np.asarray(y), x)
        assert np.asarray(mask).all()

    @pytest.mark.parametrize("op,torch_fn", [
        ("Celu", lambda t: __import__("torch").nn.functional.celu(t)),
        ("Selu", lambda t: __import__("torch").nn.functional.selu(t)),
        ("Mish", lambda t: __import__("torch").nn.functional.mish(t)),
        ("Softsign", lambda t: __import__("torch").nn.functional.softsign(t)),
    ])
    def test_activations_vs_torch(self, op, torch_fn):
        import torch

        x = np.random.default_rng(2).normal(
            scale=3.0, size=(4, 7)).astype(np.float32)
        mb = fo.model(
            [fo.node(op, ["x"], ["y"])],
            inputs=[fo.value_info("x", [4, 7])],
            outputs=[fo.value_info("y", [4, 7])],
        )
        got = np.asarray(lower(mb)(x))
        want = torch_fn(torch.from_numpy(x)).numpy()
        assert np.max(np.abs(got - want)) < 1e-5

    def test_shrink(self):
        x = np.array([[-2.0, -0.4, 0.0, 0.4, 2.0]], np.float32)
        mb = fo.model(
            [fo.node("Shrink", ["x"], ["y"], attrs=[
                fo.attr_float("lambd", 0.5), fo.attr_float("bias", 0.1),
            ])],
            inputs=[fo.value_info("x", [1, 5])],
            outputs=[fo.value_info("y", [1, 5])],
        )
        got = np.asarray(lower(mb)(x))
        want = np.array([[-1.9, 0.0, 0.0, 0.0, 1.9]], np.float32)
        assert np.allclose(got, want, atol=1e-6)

    @pytest.mark.parametrize("op,ref", [
        ("ReduceL1", lambda x: np.abs(x).sum(axis=1, keepdims=True)),
        ("ReduceL2", lambda x: np.sqrt((x * x).sum(axis=1, keepdims=True))),
        ("ReduceSumSquare", lambda x: (x * x).sum(axis=1, keepdims=True)),
        ("ReduceLogSum", lambda x: np.log(x.sum(axis=1, keepdims=True))),
        ("ReduceLogSumExp",
         lambda x: np.log(np.exp(x).sum(axis=1, keepdims=True))),
    ])
    def test_reductions(self, op, ref):
        rng = np.random.default_rng(3)
        x = (rng.uniform(0.1, 2.0, size=(3, 6))).astype(np.float32)
        mb = fo.model(
            [fo.node(op, ["x"], ["y"], attrs=[fo.attr_ints("axes", [1])])],
            inputs=[fo.value_info("x", [3, 6])],
            outputs=[fo.value_info("y", [3, 1])],
        )
        got = np.asarray(lower(mb)(x))
        assert np.max(np.abs(got - ref(x))) < 1e-5

    def test_argmin_and_comparisons(self):
        x = np.array([[3.0, 1.0, 2.0]], np.float32)
        mb = fo.model(
            [fo.node("ArgMin", ["x"], ["y"],
                     attrs=[fo.attr_int("axis", 1)])],
            inputs=[fo.value_info("x", [1, 3])],
            outputs=[fo.value_info("y", [1, 1], elem_type=7)],
        )
        assert np.asarray(lower(mb)(x)).reshape(()) == 1

    def test_shape_start_end(self):
        x = np.zeros((2, 3, 4, 5), np.float32)
        mb = fo.model(
            [fo.node("Shape", ["x"], ["y"], attrs=[
                fo.attr_int("start", 1), fo.attr_int("end", -1),
            ])],
            inputs=[fo.value_info("x", [2, 3, 4, 5])],
            outputs=[fo.value_info("y", [2], elem_type=7)],
        )
        assert np.array_equal(np.asarray(lower(mb)(x)), [3, 4])

    def test_sum_mean_variadic(self):
        rng = np.random.default_rng(4)
        xs = [rng.normal(size=(2, 3)).astype(np.float32) for _ in range(3)]
        for op, ref in (("Sum", sum(xs)), ("Mean", sum(xs) / 3)):
            mb = fo.model(
                [fo.node(op, ["a", "b", "c"], ["y"])],
                inputs=[fo.value_info(n, [2, 3]) for n in "abc"],
                outputs=[fo.value_info("y", [2, 3])],
            )
            got = np.asarray(lower(mb)(*xs))
            assert np.max(np.abs(got - ref)) < 1e-6


class TestPreflightAttentionGates:
    def test_new_op_gates_all_reported(self):
        """The session's op-surface gates: every statically-checkable
        unsupported configuration lands in the one-pass fix list."""
        mb = fo.model(
            [
                fo.node("Attention", ["q", "k", "v", "", "pk"], ["y0"]),
                fo.node("Attention", ["y0", "k", "v"],
                        ["y1", "", "", "qk"],
                        attrs=[fo.attr_int("qk_matmul_output_mode", 2)]),
                fo.node("MultiHeadAttention", ["y1", "k", "v", "", "kpm"],
                        ["y2"], domain="com.microsoft",
                        attrs=[fo.attr_int("num_heads", 2)]),
                fo.node("GridSample", ["y2", "g"], ["y3"],
                        attrs=[fo.attr_str("mode", "cubic"),
                               fo.attr_str("padding_mode", "reflection")]),
                fo.node("FusedMatMul", ["y3", "w"], ["y4"],
                        domain="com.microsoft",
                        attrs=[fo.attr_int("transBatchA", 1)]),
                fo.node("BitShift", ["i", "i"], ["y5"],
                        attrs=[fo.attr_str("direction", "SIDEWAYS")]),
                fo.node("STFT", ["s", "st"], ["y6"],
                        attrs=[fo.attr_int("onesided", 0)]),
                fo.node("GatherND", ["y4", "idx"], ["y7"],
                        attrs=[fo.attr_int("batch_dims", 1)]),
                fo.node("GroupNormalization", ["y7", "sc", "bi"], ["y"]),
            ],
            inputs=[fo.value_info("q", [1, 2, 3, 4])],
            outputs=[fo.value_info("y", [1, 2, 3, 4])],
            initializers=[
                fo.tensor("k", np.zeros((1, 2, 3, 4), np.float32)),
                fo.tensor("v", np.zeros((1, 2, 3, 4), np.float32)),
                fo.tensor("pk", np.zeros((1, 2, 0, 4), np.float32)),
                fo.tensor("kpm", np.zeros((1, 3), np.int32)),
                fo.tensor("g", np.zeros((1, 2, 2, 2), np.float32)),
                fo.tensor("w", np.zeros((4, 4), np.float32)),
                fo.tensor("i", np.zeros(3, np.uint8)),
                fo.tensor("s", np.zeros((1, 64), np.float32)),
                fo.tensor("st", np.asarray(16, np.int64)),
                fo.tensor("idx", np.zeros((1, 1), np.int64)),
                fo.tensor("sc", np.ones(2, np.float32)),
                fo.tensor("bi", np.zeros(2, np.float32)),
            ],
            opset=23,
        )
        rendered = "\n".join(f.render() for f in preflight(mb))
        for frag in (
            "past_key/past_value",
            "qk_matmul_output_mode=2",
            "key_padding_mask",
            "GridSample mode 'cubic'",
            "padding_mode 'reflection'",
            "transBatchA/transBatchB",
            "BitShift direction 'SIDEWAYS'",
            "STFT onesided=0",
            "GatherND batch_dims>0",
            "GroupNormalization requires num_groups",
        ):
            assert frag in rendered, frag

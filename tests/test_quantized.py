"""Quantized-graph lowering: the op set the ORT quantizer emits for the
registry's int8-arm assets — QDQ form (QuantizeLinear/DequantizeLinear
pairs) and QOperator form (QLinearConv/QLinearMatMul + com.microsoft
QLinear* elementwise ops). Numpy is the oracle: int8 values and their
products are exactly representable in fp32, so the expected outputs are
computed independently at fp64 and must match exactly (same round/saturate
semantics)."""

import numpy as np

import fixtures_onnx as fo
from birda_tpu.onnx.lowering import lower


def run(model_bytes, *args):
    out = lower(model_bytes)(*args)
    return np.asarray(out)


def q_ref(x, scale, zp, dtype):
    info = np.iinfo(dtype)
    q = np.round(x / scale) + zp  # numpy round = half-to-even, per spec
    return np.clip(q, info.min, info.max).astype(dtype)


class TestQuantizeDequantize:
    def test_quantize_uint8_round_half_even_and_saturation(self):
        x = np.array([[0.0, 0.05, 0.15, 0.25, 100.0, -5.0]], np.float32)
        scale, zp = np.float32(0.1), np.uint8(10)
        mb = fo.model(
            [fo.node("QuantizeLinear", ["x", "s", "z"], ["y"])],
            inputs=[fo.value_info("x", [1, 6])],
            outputs=[fo.value_info("y", [1, 6], elem_type=2)],
            initializers=[fo.tensor("s", scale), fo.tensor("z", zp)],
        )
        got = run(mb, x)
        want = q_ref(x, scale, int(zp), np.uint8)
        np.testing.assert_array_equal(got, want)
        assert got.dtype == np.uint8
        # ties-to-even: 0.05/0.1 = 0.5 -> 0; 0.15/0.1 = 1.5 -> 2
        assert got[0, 1] == 10 and got[0, 2] == 12
        assert got[0, 4] == 255 and got[0, 5] == 0  # saturation

    def test_dequantize_int8_per_axis(self):
        w = np.array([[[-128, 0], [127, 1]]], np.int8).transpose(1, 0, 2)
        scale = np.array([0.5, 0.25], np.float32)
        zp = np.array([0, 1], np.int8)
        mb = fo.model(
            [fo.node("DequantizeLinear", ["w", "s", "z"], ["y"],
                     attrs=[fo.attr_int("axis", 0)])],
            inputs=[],
            outputs=[fo.value_info("y", list(w.shape))],
            initializers=[fo.tensor("w", w), fo.tensor("s", scale),
                          fo.tensor("z", zp)],
        )
        got = run(mb)
        want = (w.astype(np.float32)
                - zp.reshape(2, 1, 1)) * scale.reshape(2, 1, 1)
        np.testing.assert_array_equal(got, want)

    def test_dynamic_quantize(self):
        x = np.array([[-1.0, 0.0, 2.0, 0.5]], np.float32)
        mb = fo.model(
            [fo.node("DynamicQuantizeLinear", ["x"], ["y", "ys", "yzp"])],
            inputs=[fo.value_info("x", [1, 4])],
            outputs=[fo.value_info("y", [1, 4], elem_type=2),
                     fo.value_info("ys", [], elem_type=1),
                     fo.value_info("yzp", [], elem_type=2)],
        )
        fn = lower(mb)
        y, ys, yzp = fn(x)
        scale = 3.0 / 255.0
        assert abs(float(ys) - scale) < 1e-7
        # round(0 - (-1)/scale) = round(85) = 85
        assert int(yzp) == 85
        np.testing.assert_array_equal(
            np.asarray(y), q_ref(x, scale, 85, np.uint8))


class TestQLinearOps:
    def _qconv_model(self, x_q, w_q, scales, b=None, per_channel=False,
                     group=1):
        x_s, x_zp, w_s, w_zp, y_s, y_zp = scales
        inits = [
            fo.tensor("xs", np.float32(x_s)), fo.tensor("xzp", np.int8(x_zp)),
            fo.tensor("w", w_q),
            fo.tensor("ws", np.asarray(w_s, np.float32)),
            fo.tensor("wzp", np.asarray(w_zp, np.int8)),
            fo.tensor("ys", np.float32(y_s)), fo.tensor("yzp", np.int8(y_zp)),
        ]
        ins = ["x", "xs", "xzp", "w", "ws", "wzp", "ys", "yzp"]
        if b is not None:
            inits.append(fo.tensor("b", b))
            ins.append("b")
        return fo.model(
            [fo.node("QLinearConv", ins, ["y"], attrs=[
                fo.attr_ints("strides", [1, 1]),
                fo.attr_ints("pads", [1, 1, 1, 1]),
                fo.attr_ints("kernel_shape", [3, 3]),
                fo.attr_int("group", group),
            ])],
            inputs=[fo.value_info("x", list(x_q.shape), elem_type=3)],
            outputs=[fo.value_info("y", ["n"], elem_type=3)],
            initializers=inits,
        )

    def _ref_qconv(self, x_q, w_q, scales, b=None):
        """ORT semantics: int32 accumulation (exact in fp64 here), then an
        fp32 requantize multiply with round-half-even."""
        import torch
        import torch.nn.functional as TF

        x_s, x_zp, w_s, w_zp, y_s, y_zp = scales
        xi = x_q.astype(np.float64) - x_zp
        w_zp_arr = np.asarray(w_zp, np.float64).reshape(-1, 1, 1, 1) \
            if np.asarray(w_zp).size > 1 else np.float64(w_zp)
        wi = w_q.astype(np.float64) - w_zp_arr
        acc = TF.conv2d(torch.from_numpy(xi), torch.from_numpy(wi),
                        padding=1).numpy()  # integer values, exact in fp64
        if b is not None:
            acc = acc + b.astype(np.float64).reshape(1, -1, 1, 1)
        scale = (np.float32(x_s) * np.asarray(w_s, np.float32)
                 / np.float32(y_s)).reshape(
            (1, -1, 1, 1) if np.asarray(w_s).size > 1 else ())
        q = np.round(acc.astype(np.float32) * scale) + y_zp
        return np.clip(q, -128, 127).astype(np.int8)

    def test_qlinear_conv_per_tensor(self):
        rng = np.random.default_rng(0)
        x_q = rng.integers(-128, 128, (2, 3, 8, 8)).astype(np.int8)
        w_q = rng.integers(-127, 128, (4, 3, 3, 3)).astype(np.int8)
        b = rng.integers(-1000, 1000, 4).astype(np.int32)
        scales = (0.02, 3, 0.05, 0, 0.3, -5)
        got = run(self._qconv_model(x_q, w_q, scales, b=b), x_q)
        want = self._ref_qconv(x_q, w_q, scales, b=b)
        np.testing.assert_array_equal(got, want)

    def test_qlinear_conv_per_channel_weights(self):
        rng = np.random.default_rng(1)
        x_q = rng.integers(-128, 128, (1, 2, 6, 6)).astype(np.int8)
        w_q = rng.integers(-127, 128, (3, 2, 3, 3)).astype(np.int8)
        scales = (0.01, 0, np.array([0.03, 0.05, 0.07]),
                  np.array([0, 1, -1]), 0.25, 0)
        got = run(self._qconv_model(x_q, w_q, scales, per_channel=True), x_q)
        want = self._ref_qconv(x_q, w_q, scales)
        np.testing.assert_array_equal(got, want)

    def test_qlinear_matmul(self):
        rng = np.random.default_rng(2)
        a_q = rng.integers(0, 256, (3, 16)).astype(np.uint8)
        b_q = rng.integers(0, 256, (16, 5)).astype(np.uint8)
        mb = fo.model(
            [fo.node("QLinearMatMul",
                     ["a", "as", "azp", "b", "bs", "bzp", "ys", "yzp"],
                     ["y"])],
            inputs=[fo.value_info("a", [3, 16], elem_type=2)],
            outputs=[fo.value_info("y", [3, 5], elem_type=2)],
            initializers=[
                fo.tensor("as", np.float32(0.02)),
                fo.tensor("azp", np.uint8(128)),
                fo.tensor("b", b_q),
                fo.tensor("bs", np.float32(0.04)),
                fo.tensor("bzp", np.uint8(120)),
                fo.tensor("ys", np.float32(0.5)),
                fo.tensor("yzp", np.uint8(128)),
            ],
        )
        got = run(mb, a_q)
        af = (a_q.astype(np.float64) - 128) * 0.02
        bf = (b_q.astype(np.float64) - 120) * 0.04
        want = q_ref(af @ bf, 0.5, 128, np.uint8)
        np.testing.assert_array_equal(got, want)

    def test_matmul_integer(self):
        rng = np.random.default_rng(3)
        a = rng.integers(0, 256, (2, 8)).astype(np.uint8)
        b = rng.integers(-128, 128, (8, 3)).astype(np.int8)
        mb = fo.model(
            [fo.node("MatMulInteger", ["a", "b", "azp"], ["y"])],
            inputs=[fo.value_info("a", [2, 8], elem_type=2)],
            outputs=[fo.value_info("y", [2, 3], elem_type=6)],
            initializers=[fo.tensor("b", b), fo.tensor("azp", np.uint8(100))],
        )
        got = run(mb, a)
        want = (a.astype(np.int64) - 100) @ b.astype(np.int64)
        np.testing.assert_array_equal(got, want.astype(np.int32))

    def test_qlinear_sigmoid_and_add(self):
        rng = np.random.default_rng(4)
        x_q = rng.integers(-128, 128, (2, 10)).astype(np.int8)
        mb = fo.model(
            [
                fo.node("QLinearSigmoid",
                        ["x", "xs", "xzp", "ss", "szp"], ["sig"]),
                fo.node("QLinearAdd",
                        ["sig", "ss", "szp", "x", "xs", "xzp", "ys", "yzp"],
                        ["y"]),
            ],
            inputs=[fo.value_info("x", [2, 10], elem_type=3)],
            outputs=[fo.value_info("y", [2, 10], elem_type=3)],
            initializers=[
                fo.tensor("xs", np.float32(0.05)), fo.tensor("xzp", np.int8(0)),
                fo.tensor("ss", np.float32(1 / 256)),
                fo.tensor("szp", np.int8(-128)),
                fo.tensor("ys", np.float32(0.06)), fo.tensor("yzp", np.int8(0)),
            ],
        )
        got = run(mb, x_q)
        xf = x_q.astype(np.float64) * 0.05
        sig_q = q_ref(1 / (1 + np.exp(-xf)), 1 / 256, -128, np.int8)
        sig_f = (sig_q.astype(np.float64) + 128) * (1 / 256)
        want = q_ref(sig_f + xf, 0.06, 0, np.int8)
        np.testing.assert_array_equal(got, want)


class TestQdqGraph:
    def test_qdq_convnet_matches_float_within_quant_error(self):
        """A QDQ-form mini-convnet (the ORT quantizer's default output
        format): int8 weights + Q/DQ pairs around activations. The lowered
        result must track the float graph within the quantization budget."""
        rng = np.random.default_rng(5)
        w1 = rng.normal(0, 0.2, (8, 1, 3, 3)).astype(np.float32)
        w1_s = np.float32(np.max(np.abs(w1)) / 127)
        w1_q = q_ref(w1, w1_s, 0, np.int8)
        x_s = np.float32(1 / 64)

        nodes = [
            fo.node("QuantizeLinear", ["x", "xs", "xzp"], ["xq"]),
            fo.node("DequantizeLinear", ["xq", "xs", "xzp"], ["xdq"]),
            fo.node("DequantizeLinear", ["w1q", "w1s", "w1zp"], ["w1dq"]),
            fo.node("Conv", ["xdq", "w1dq"], ["c1"], attrs=[
                fo.attr_ints("strides", [1, 1]),
                fo.attr_ints("pads", [1, 1, 1, 1]),
                fo.attr_ints("kernel_shape", [3, 3]),
            ]),
            fo.node("Relu", ["c1"], ["r1"]),
            fo.node("GlobalAveragePool", ["r1"], ["gap"]),
            fo.node("Flatten", ["gap"], ["y"], attrs=[fo.attr_int("axis", 1)]),
        ]
        mb = fo.model(
            nodes,
            inputs=[fo.value_info("x", [2, 1, 12, 12])],
            outputs=[fo.value_info("y", [2, 8])],
            initializers=[
                fo.tensor("xs", x_s), fo.tensor("xzp", np.int8(0)),
                fo.tensor("w1q", w1_q),
                fo.tensor("w1s", w1_s), fo.tensor("w1zp", np.int8(0)),
            ],
        )
        x = rng.normal(0, 0.5, (2, 1, 12, 12)).astype(np.float32)
        got = run(mb, x)

        import torch
        import torch.nn.functional as TF

        xdq = np.clip(np.round(x / x_s), -128, 127) * x_s
        w1dq = w1_q.astype(np.float32) * w1_s
        want = TF.relu(TF.conv2d(torch.from_numpy(xdq.astype(np.float32)),
                                 torch.from_numpy(w1dq), padding=1))
        want = want.mean(dim=(2, 3)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_int8_weights_are_lifted(self):
        """Large int8 weight blobs go to the params pytree like floats do."""
        rng = np.random.default_rng(6)
        w_q = rng.integers(-127, 128, (256, 256)).astype(np.int8)
        mb = fo.model(
            [
                fo.node("DequantizeLinear", ["wq", "ws"], ["w"]),
                fo.node("MatMul", ["x", "w"], ["y"]),
            ],
            inputs=[fo.value_info("x", [2, 256])],
            outputs=[fo.value_info("y", [2, 256])],
            initializers=[fo.tensor("wq", w_q),
                          fo.tensor("ws", np.float32(0.01))],
        )
        fn = lower(mb)
        assert "wq" in fn.params
        x = rng.normal(0, 1, (2, 256)).astype(np.float32)
        got = np.asarray(fn(x))
        want = x @ (w_q.astype(np.float32) * 0.01)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestConvInteger:
    def test_conv_integer_int32_exact(self):
        import torch
        import torch.nn.functional as TF

        rng = np.random.default_rng(7)
        x = rng.integers(0, 256, (1, 4, 10, 10)).astype(np.uint8)
        w = rng.integers(-128, 128, (8, 4, 3, 3)).astype(np.int8)
        mb = fo.model(
            [fo.node("ConvInteger", ["x", "w", "xzp"], ["y"], attrs=[
                fo.attr_ints("strides", [1, 1]),
                fo.attr_ints("pads", [1, 1, 1, 1]),
                fo.attr_ints("kernel_shape", [3, 3]),
            ])],
            inputs=[fo.value_info("x", [1, 4, 10, 10], elem_type=2)],
            outputs=[fo.value_info("y", ["n"], elem_type=6)],
            initializers=[fo.tensor("w", w), fo.tensor("xzp", np.uint8(128))],
        )
        got = run(mb, x)
        want = TF.conv2d(
            torch.from_numpy(x.astype(np.float64) - 128),
            torch.from_numpy(w.astype(np.float64)), padding=1,
        ).numpy().astype(np.int32)
        np.testing.assert_array_equal(got, want)
        assert got.dtype == np.int32


class TestMoreQLinearOps:
    """Remaining com.microsoft QLinear family the ORT quantizer can emit
    (int8-arm release variants): Softmax, AveragePool, Concat, QGemm."""

    def test_qlinear_softmax_and_avgpool(self):
        rng = np.random.default_rng(0)
        x = rng.normal(0, 2, (2, 8)).astype(np.float32)
        xq = np.clip(np.round(x / 0.05), -128, 127).astype(np.int8)
        mb = fo.model(
            [fo.node("QLinearSoftmax", ["xq", "xs", "xz", "ys", "yz"], ["y"],
                     attrs=[fo.attr_int("axis", -1)])],
            inputs=[fo.value_info("xq", [2, 8], elem_type=3)],
            outputs=[fo.value_info("y", [2, 8], elem_type=2)],
            initializers=[
                fo.tensor("xs", np.float32(0.05)),
                fo.tensor("xz", np.int8(0)),
                fo.tensor("ys", np.float32(1.0 / 255)),
                fo.tensor("yz", np.uint8(0)),
            ],
        )
        got = lower(mb)(xq)
        xf = xq.astype(np.float32) * 0.05
        e = np.exp(xf - xf.max(1, keepdims=True))
        want = np.clip(np.round((e / e.sum(1, keepdims=True)) * 255), 0, 255)
        assert np.max(np.abs(np.asarray(got).astype(np.int32)
                             - want.astype(np.int32))) <= 1

        xi = rng.normal(0, 1, (1, 2, 4, 4)).astype(np.float32)
        xiq = np.clip(np.round(xi / 0.02), -128, 127).astype(np.int8)
        mb = fo.model(
            [fo.node("QLinearAveragePool",
                     ["xq", "xs", "xz", "ys", "yz"], ["y"],
                     attrs=[fo.attr_ints("kernel_shape", [2, 2]),
                            fo.attr_ints("strides", [2, 2])])],
            inputs=[fo.value_info("xq", [1, 2, 4, 4], elem_type=3)],
            outputs=[fo.value_info("y", [1, 2, 2, 2], elem_type=3)],
            initializers=[
                fo.tensor("xs", np.float32(0.02)),
                fo.tensor("xz", np.int8(0)),
                fo.tensor("ys", np.float32(0.02)),
                fo.tensor("yz", np.int8(0)),
            ],
        )
        got = np.asarray(lower(mb)(xiq)).astype(np.float32) * 0.02
        want = (xiq.astype(np.float32) * 0.02).reshape(1, 2, 2, 2, 2, 2) \
            .mean((3, 5))
        assert np.max(np.abs(got - want)) <= 0.02 + 1e-6

    def test_qlinear_concat(self):
        a = np.arange(-4, 4, dtype=np.int8).reshape(2, 4)
        b = (np.arange(8, dtype=np.int8) - 2).reshape(2, 4)
        mb = fo.model(
            [fo.node("QLinearConcat",
                     ["ys", "yz", "a", "as_", "az", "b", "bs", "bz"], ["y"],
                     attrs=[fo.attr_int("axis", 1)])],
            inputs=[fo.value_info("a", [2, 4], elem_type=3),
                    fo.value_info("b", [2, 4], elem_type=3)],
            outputs=[fo.value_info("y", [2, 8], elem_type=3)],
            initializers=[
                fo.tensor("ys", np.float32(0.1)),
                fo.tensor("yz", np.int8(0)),
                fo.tensor("as_", np.float32(0.1)),
                fo.tensor("az", np.int8(0)),
                fo.tensor("bs", np.float32(0.2)),
                fo.tensor("bz", np.int8(0)),
            ],
        )
        got = np.asarray(lower(mb)(a, b))
        want = np.concatenate(
            [a.astype(np.int32), 2 * b.astype(np.int32)], axis=1)
        assert np.max(np.abs(got.astype(np.int32) - want)) <= 1

    def test_qgemm_float_output(self):
        rng = np.random.default_rng(1)
        a = np.clip(rng.normal(0, 40, (3, 6)), -127, 127).astype(np.int8)
        b = np.clip(rng.normal(0, 40, (6, 4)), -127, 127).astype(np.int8)
        c = np.round(rng.normal(0, 100, 4)).astype(np.int32)
        mb = fo.model(
            [fo.node("QGemm",
                     ["a", "as_", "az", "b", "bs", "bz", "c"], ["y"])],
            inputs=[fo.value_info("a", [3, 6], elem_type=3)],
            outputs=[fo.value_info("y", [3, 4])],
            initializers=[
                fo.tensor("as_", np.float32(0.02)),
                fo.tensor("az", np.int8(0)),
                fo.tensor("b", b),
                fo.tensor("bs", np.float32(0.05)),
                fo.tensor("bz", np.int8(0)),
                fo.tensor("c", c),
            ],
        )
        got = np.asarray(lower(mb)(a))
        want = ((a.astype(np.float32) * 0.02)
                @ (b.astype(np.float32) * 0.05)
                + c.astype(np.float32) * (0.02 * 0.05))
        assert np.max(np.abs(got - want)) < 1e-4

    def test_qgemm_transB_per_channel_scale(self):
        # ORT quantized-Gemm layout: B stored [N, K] with per-N scales.
        rng = np.random.default_rng(2)
        a = np.clip(rng.normal(0, 40, (3, 6)), -127, 127).astype(np.int8)
        bT = np.clip(rng.normal(0, 40, (4, 6)), -127, 127).astype(np.int8)
        bs = np.array([0.01, 0.02, 0.03, 0.04], np.float32)
        mb = fo.model(
            [fo.node("QGemm", ["a", "as_", "az", "b", "bs", "bz"], ["y"],
                     attrs=[fo.attr_int("transB", 1)])],
            inputs=[fo.value_info("a", [3, 6], elem_type=3)],
            outputs=[fo.value_info("y", [3, 4])],
            initializers=[
                fo.tensor("as_", np.float32(0.05)),
                fo.tensor("az", np.int8(0)),
                fo.tensor("b", bT),
                fo.tensor("bs", bs),
                fo.tensor("bz", np.zeros(4, np.int8)),
            ],
        )
        got = np.asarray(lower(mb)(a))
        want = (a.astype(np.float32) * 0.05) @ (
            bT.astype(np.float32) * bs[:, None]).T
        assert np.max(np.abs(got - want)) < 1e-4

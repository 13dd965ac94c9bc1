"""Tests for the calibrated int8 execution mode (onnx/quantize.py).

Strategy mirrors the QLinear lowering tests: small hand-built graphs where
the expected numerics are computable exactly, plus the tiny full-scale
family graphs for an end-to-end parity budget (the CI-speed stand-ins for
the real assets, same op mix — SURVEY §4 "fake backend" pattern).
"""

import json

import numpy as np
import pytest

import fixtures_onnx as fo
from birda_tpu.onnx import fullscale as fs
from birda_tpu.onnx.lowering import lower
from birda_tpu.onnx.quantize import (
    CalibrationResult,
    calibrate,
    calibration_signals,
    lower_int8,
)


def conv_gemm_graph(seed=0, out_ch=8):
    """Conv -> Relu -> Flatten -> Gemm: one quantizable conv + one gemm."""
    rng = np.random.default_rng(seed)
    w = rng.normal(0, 0.2, (out_ch, 4, 3, 3)).astype(np.float32)
    b = rng.normal(0, 0.1, out_ch).astype(np.float32)
    g = rng.normal(0, 0.2, (out_ch * 36, 16)).astype(np.float32)
    mb = fo.model(
        [
            fo.node("Conv", ["x", "w", "b"], ["c"], attrs=[
                fo.attr_ints("pads", [0, 0, 0, 0]),
                fo.attr_ints("kernel_shape", [3, 3]),
            ]),
            fo.node("Relu", ["c"], ["r"]),
            fo.node("Flatten", ["r"], ["f"], attrs=[fo.attr_int("axis", 1)]),
            fo.node("Gemm", ["f", "g"], ["y"]),
        ],
        inputs=[fo.value_info("x", ["batch", 4, 8, 8])],
        outputs=[fo.value_info("y", ["batch", 16])],
        initializers=[fo.tensor("w", w), fo.tensor("b", b),
                      fo.tensor("g", g)],
    )
    return mb, (w, b, g)


class TestCalibrate:
    def test_captures_eligible_inputs_with_correct_stats(self):
        mb, (w, b, g) = conv_gemm_graph()
        rng = np.random.default_rng(1)
        x1 = rng.normal(0, 1.0, (2, 4, 8, 8)).astype(np.float32)
        x2 = rng.normal(0, 2.0, (2, 4, 8, 8)).astype(np.float32)
        calib = calibrate(mb, [x1, x2], min_weight_bytes=1)
        assert calib.batches == 2
        # Conv input "x": amax is the max over both batches.
        want_amax = max(np.abs(x1).max(), np.abs(x2).max())
        assert calib.stats["x"]["amax"] == pytest.approx(want_amax, rel=1e-6)
        assert calib.stats["x"]["ndim"] == 4
        # Gemm input "f" was captured too (flattened relu output).
        fn = lower(mb)
        f1 = np.maximum(np.asarray(fn(x1, params=fn.params)), 0)  # not f, but shape sanity
        assert "f" in calib.stats
        assert calib.stats["f"]["ndim"] == 2
        assert calib.stats["f"]["amax"] > 0
        del f1
        # scale = amax / 127
        assert calib.scale("x") == pytest.approx(want_amax / 127.0, rel=1e-6)

    def test_percentile_method_clips_tail(self):
        mb, _ = conv_gemm_graph()
        rng = np.random.default_rng(2)
        x = rng.normal(0, 1.0, (2, 4, 8, 8)).astype(np.float32)
        x[0, 0, 0, 0] = 500.0  # outlier
        c_max = calibrate(mb, [x], min_weight_bytes=1, method="max")
        c_pct = calibrate(mb, [x], min_weight_bytes=1, method="percentile",
                          percentile=99.0)
        assert c_max.scale("x") == pytest.approx(500.0 / 127.0, rel=1e-6)
        assert c_pct.scale("x") < 0.1 * c_max.scale("x")

    def test_json_roundtrip(self):
        mb, _ = conv_gemm_graph()
        x = np.random.default_rng(3).normal(
            0, 1, (2, 4, 8, 8)).astype(np.float32)
        calib = calibrate(mb, [x], min_weight_bytes=1)
        back = CalibrationResult.from_json(calib.to_json())
        assert back.method == calib.method
        assert back.stats == json.loads(json.dumps(calib.stats))
        assert back.scale("x") == calib.scale("x")

    def test_unknown_method_rejected(self):
        mb, _ = conv_gemm_graph()
        with pytest.raises(ValueError):
            calibrate(mb, [], method="entropy")

    def test_amean_averages_across_batches(self):
        """The heavy-tail guard's statistic is the mean over the whole
        calibration set — one loud batch must not mask quiet ones."""
        mb, _ = conv_gemm_graph()
        quiet = np.full((2, 4, 8, 8), 0.01, np.float32)
        loud = np.full((2, 4, 8, 8), 1.0, np.float32)
        calib = calibrate(mb, [quiet, loud], min_weight_bytes=1)
        assert calib.stats["x"]["amean"] == pytest.approx(0.505, rel=1e-3)

    def test_cached_calibration_keys_on_sample_count(self, tmp_path,
                                                     monkeypatch):
        """Same graph calibrated at two input lengths must not share
        cached scales."""
        monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
        from birda_tpu.onnx.quantize import cached_calibration

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        _, l1 = cached_calibration(g.model_bytes, g.spec.sample_count)
        _, l2 = cached_calibration(g.model_bytes, g.spec.sample_count // 2)
        assert (l1, l2) == (False, False)  # both computed fresh
        assert len(list(tmp_path.rglob("int8_calib/*.json"))) == 2
        # And the repeat run of either length loads its own entry.
        _, l3 = cached_calibration(g.model_bytes, g.spec.sample_count)
        assert l3 is True


class TestInt8Exactness:
    def test_conv_exact_on_power_of_two_grid(self):
        """Inputs/weights on an int8 grid with power-of-two scales: the int8
        path must reproduce the float conv bit-exactly (int32 accumulation
        of values that are exactly representable)."""
        import jax.numpy as jnp

        rng = np.random.default_rng(4)
        wq = rng.integers(-127, 128, (8, 4, 3, 3)).astype(np.float32)
        for c in range(8):
            wq[c, 0, 0, 0] = 127.0  # pin per-channel amax
        w = wq * 0.125  # sw = 2^-3 exactly
        xq = rng.integers(-127, 128, (2, 4, 8, 8)).astype(np.float32)
        xq[0, 0, 0, 0] = 127.0
        x = xq * 0.25  # sx = 2^-2 exactly
        mb = fo.model(
            [fo.node("Conv", ["x", "w"], ["y"], attrs=[
                fo.attr_ints("pads", [0, 0, 0, 0]),
                fo.attr_ints("kernel_shape", [3, 3]),
            ])],
            inputs=[fo.value_info("x", ["batch", 4, 8, 8])],
            outputs=[fo.value_info("y", ["batch", 8, 6, 6])],
            initializers=[fo.tensor("w", w)],
        )
        calib = calibrate(mb, [x], min_weight_bytes=1)
        qfn = lower_int8(mb, calib, compute_dtype=jnp.float32,
                         min_weight_bytes=1, protect_outputs=False,
                         smooth_alpha=None)  # keep the exact 2^-k grid
        assert qfn.quantized_nodes  # the conv executes int8
        got = np.asarray(qfn(x, params=qfn.params))
        ffn = lower(mb)
        want = np.asarray(ffn(x, params=ffn.params))
        np.testing.assert_array_equal(got, want)

    def test_lifted_int8_conv_weight_traces_under_jit(self):
        """Weights >= LIFT_PARAM_BYTES arrive as *tracers* inside jit — the
        quantized conv path must not try to materialize them (regression:
        np.asarray on a traced weight)."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(11)
        w = rng.normal(0, 0.1, (64, 32, 6, 6)).astype(np.float32)  # 73728 el
        x = rng.normal(0, 1.0, (2, 32, 16, 16)).astype(np.float32)
        mb = fo.model(
            [fo.node("Conv", ["x", "w"], ["y"], attrs=[
                fo.attr_ints("pads", [0, 0, 0, 0]),
                fo.attr_ints("kernel_shape", [6, 6]),
            ])],
            inputs=[fo.value_info("x", ["batch", 32, 16, 16])],
            outputs=[fo.value_info("y", ["batch", 64, 11, 11])],
            initializers=[fo.tensor("w", w)],
        )
        calib = calibrate(mb, [x], min_weight_bytes=1)
        qfn = lower_int8(mb, calib, compute_dtype=jnp.float32,
                         min_weight_bytes=1, protect_outputs=False)
        assert any(np.asarray(v).dtype == np.int8
                   for v in qfn.params.values())  # the weight was lifted
        params = {k: jax.device_put(v) for k, v in qfn.params.items()}
        got = np.asarray(jax.jit(
            lambda p, a: qfn(a, params=p))(params, x))
        want = np.asarray(lower(mb)(x))
        # int8 quantization noise only: ~2% of the +-8 output range here
        # (1152-MAC accumulation); the tracer bug this guards against
        # produced an exception, not drift.
        assert np.max(np.abs(got - want)) < 0.04 * np.max(np.abs(want))

    def test_gemm_transb_exact(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        wq = rng.integers(-127, 128, (16, 32)).astype(np.float32)  # [N,K]
        wq[:, 0] = 127.0
        w = wq * 0.0625
        xq = rng.integers(-127, 128, (4, 32)).astype(np.float32)
        xq[0, 0] = 127.0
        x = xq * 0.5
        c = rng.normal(0, 1, 16).astype(np.float32)
        mb = fo.model(
            [fo.node("Gemm", ["x", "w", "c"], ["y"], attrs=[
                fo.attr_int("transB", 1),
            ])],
            inputs=[fo.value_info("x", ["batch", 32])],
            outputs=[fo.value_info("y", ["batch", 16])],
            initializers=[fo.tensor("w", w), fo.tensor("c", c)],
        )
        calib = calibrate(mb, [x], min_weight_bytes=1)
        qfn = lower_int8(mb, calib, compute_dtype=jnp.float32,
                         min_weight_bytes=1, protect_outputs=False,
                         smooth_alpha=None)  # keep the exact 2^-k grid
        assert qfn.quantized_nodes
        got = np.asarray(qfn(x, params=qfn.params))
        want = x @ w.T + c
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestSmoothQuant:
    def test_outlier_channel_rescued(self):
        """One input channel 100x louder than the rest wrecks per-tensor
        activation quantization; the SmoothQuant fold (divide activation,
        multiply weight per channel) restores accuracy at identical
        runtime cost."""
        import jax.numpy as jnp

        rng = np.random.default_rng(21)
        w = rng.normal(0, 0.2, (64, 16)).astype(np.float32)
        mb = fo.model(
            [fo.node("MatMul", ["x", "w"], ["y"])],
            inputs=[fo.value_info("x", ["batch", 64])],
            outputs=[fo.value_info("y", ["batch", 16])],
            initializers=[fo.tensor("w", w)],
        )
        x = rng.normal(0, 0.5, (16, 64)).astype(np.float32)
        x[:, 0] *= 100.0  # the outlier channel
        calib = calibrate(mb, [x], min_weight_bytes=1)
        want = x @ w

        def err(qfn):
            # jit so the activation arrives traced: the real int8 path,
            # not the host-constant float safety net.
            import jax

            got = np.asarray(jax.jit(
                lambda p, a: qfn(a, params=p))(qfn.params, x), np.float32)
            return float(np.max(np.abs(got - want)))

        plain = lower_int8(mb, calib, compute_dtype=jnp.float32,
                           min_weight_bytes=1, protect_outputs=False,
                           smooth_alpha=None)
        smoothed = lower_int8(mb, calib, compute_dtype=jnp.float32,
                              min_weight_bytes=1, protect_outputs=False)
        assert smoothed.smoothed_tensors == ["x"]
        assert plain.smoothed_tensors == []
        # The rebalancing must win by a wide margin on this construction.
        assert err(smoothed) < 0.25 * err(plain)

    def test_smoothing_is_identity_on_balanced_channels(self):
        """Uniform channel magnitudes: smoothing must not hurt."""
        import jax.numpy as jnp

        rng = np.random.default_rng(22)
        w = rng.normal(0, 0.2, (64, 16)).astype(np.float32)
        mb = fo.model(
            [fo.node("MatMul", ["x", "w"], ["y"])],
            inputs=[fo.value_info("x", ["batch", 64])],
            outputs=[fo.value_info("y", ["batch", 16])],
            initializers=[fo.tensor("w", w)],
        )
        x = rng.normal(0, 0.5, (16, 64)).astype(np.float32)
        calib = calibrate(mb, [x], min_weight_bytes=1)
        want = x @ w
        outs = []
        for alpha in (None, 0.5):
            import jax

            qfn = lower_int8(mb, calib, compute_dtype=jnp.float32,
                             min_weight_bytes=1, protect_outputs=False,
                             smooth_alpha=alpha)
            got = np.asarray(jax.jit(
                lambda p, a: qfn(a, params=p))(qfn.params, x), np.float32)
            outs.append(float(np.max(np.abs(got - want))))
        plain_err, smooth_err = outs
        assert smooth_err < 2.0 * plain_err + 1e-4

    def test_percentile_clipping_respected_under_smoothing(self):
        """Smoothed activations derive their scale from per-channel maxima;
        a percentile calibration's clipping intent must survive (shrunk by
        the same pctl/amax ratio) rather than silently reverting to max."""
        rng = np.random.default_rng(24)
        w = rng.normal(0, 0.2, (64, 16)).astype(np.float32)
        mb = fo.model(
            [fo.node("MatMul", ["x", "w"], ["y"])],
            inputs=[fo.value_info("x", ["batch", 64])],
            outputs=[fo.value_info("y", ["batch", 16])],
            initializers=[fo.tensor("w", w)],
        )
        x = rng.normal(0, 0.5, (64, 64)).astype(np.float32)
        # Element outlier: big enough to separate pctl from amax, small
        # enough that the heavy-tail guard keeps the node quantized.
        x[0, 0] = 20.0
        c_max = calibrate(mb, [x], min_weight_bytes=1, method="max")
        c_pct = calibrate(mb, [x], min_weight_bytes=1,
                          method="percentile", percentile=90.0)
        q_max = lower_int8(mb, c_max, min_weight_bytes=1,
                           protect_outputs=False)
        q_pct = lower_int8(mb, c_pct, min_weight_bytes=1,
                           protect_outputs=False)
        assert q_max.smoothed_tensors == q_pct.smoothed_tensors == ["x"]
        assert q_pct._eval._ascale["x"] < 0.5 * q_max._eval._ascale["x"]

    def test_depthwise_conv_smoothing_correct(self):
        """Depthwise convs fold s on the output-channel axis (in == out);
        the smoothed int8 result must match the float conv within noise."""
        import jax.numpy as jnp

        rng = np.random.default_rng(23)
        w = rng.normal(0, 0.3, (8, 1, 3, 3)).astype(np.float32)
        mb = fo.model(
            [fo.node("Conv", ["x", "w"], ["y"], attrs=[
                fo.attr_ints("pads", [1, 1, 1, 1]),
                fo.attr_int("group", 8),
            ])],
            inputs=[fo.value_info("x", ["batch", 8, 12, 12])],
            outputs=[fo.value_info("y", ["batch", 8, 12, 12])],
            initializers=[fo.tensor("w", w)],
        )
        x = rng.normal(0, 0.5, (2, 8, 12, 12)).astype(np.float32)
        x[:, 3] *= 50.0  # outlier channel
        calib = calibrate(mb, [x], min_weight_bytes=1)
        import jax

        want = np.asarray(lower(mb)(x), np.float32)

        def worst_rel(qfn):
            got = np.asarray(jax.jit(
                lambda p, a: qfn(a, params=p))(qfn.params, x), np.float32)
            rels = [
                np.max(np.abs(got[:, c] - want[:, c]))
                / (np.max(np.abs(want[:, c])) + 1e-6)
                for c in range(8)
            ]
            return max(map(float, rels))

        smoothed = lower_int8(mb, calib, compute_dtype=jnp.float32,
                              min_weight_bytes=1, protect_outputs=False)
        assert smoothed.smoothed_tensors == ["x"]
        plain = lower_int8(mb, calib, compute_dtype=jnp.float32,
                           min_weight_bytes=1, protect_outputs=False,
                           smooth_alpha=None)
        # For depthwise (in channel == out channel) the fold is absorbed
        # exactly by the per-output-channel weight scales, so smoothing
        # strictly sharpens the activation grid for the quiet channels.
        assert worst_rel(smoothed) < 0.5 * worst_rel(plain)
        assert worst_rel(smoothed) < 0.1

    def test_depthwise_multiplier_gt1_skips_smoothing(self):
        """Depthwise Conv with channel multiplier m>1 (out = in*m) passes
        the ``w.shape[1]*group == C_in`` gate but its per-out-channel
        maxima can't fold into per-in-channel activation scales: it must
        silently skip smoothing (not crash) and still lower correctly."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(31)
        w = rng.normal(0, 0.3, (16, 1, 3, 3)).astype(np.float32)  # m=2
        mb = fo.model(
            [fo.node("Conv", ["x", "w"], ["y"], attrs=[
                fo.attr_ints("pads", [1, 1, 1, 1]),
                fo.attr_int("group", 8),
            ])],
            inputs=[fo.value_info("x", ["batch", 8, 12, 12])],
            outputs=[fo.value_info("y", ["batch", 16, 12, 12])],
            initializers=[fo.tensor("w", w)],
        )
        x = rng.normal(0, 0.5, (2, 8, 12, 12)).astype(np.float32)
        calib = calibrate(mb, [x], min_weight_bytes=1)
        q = lower_int8(mb, calib, compute_dtype=jnp.float32,
                       min_weight_bytes=1, protect_outputs=False)
        assert q.smoothed_tensors == []  # skipped, not crashed
        want = np.asarray(lower(mb)(x), np.float32)
        got = np.asarray(jax.jit(
            lambda p, a: q(a, params=p))(q.params, x), np.float32)
        assert np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-6) < 0.1


class TestSelectionRules:
    def test_stft_frontend_conv_stays_float(self):
        """The Conv1d-STFT form (in_ch 1, kernel >= 256) never quantizes."""
        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        x = next(calibration_signals(g.spec.sample_count, batch=2,
                                     n_batches=1))
        calib = calibrate(g.model_bytes, [x])
        qfn = lower_int8(g.model_bytes, calib)
        assert qfn.quantized_nodes
        stft = [k for k, v in qfn.skipped_nodes.items()
                if k.startswith("conv") and v == "structural"]
        assert stft  # the front-end conv was structurally excluded

    def test_weight_shared_with_float_consumer_not_quantized(self):
        rng = np.random.default_rng(6)
        w = rng.normal(0, 0.2, (32, 16)).astype(np.float32)
        mb = fo.model(
            [
                fo.node("MatMul", ["x", "w"], ["m"]),
                # Same initializer consumed by a non-quantizable op:
                fo.node("ReduceSum", ["w"], ["s"], attrs=[
                    fo.attr_ints("axes", [0]), fo.attr_int("keepdims", 0),
                ]),
                fo.node("Add", ["m", "s"], ["y"]),
            ],
            inputs=[fo.value_info("x", ["batch", 32])],
            outputs=[fo.value_info("y", ["batch", 16])],
            initializers=[fo.tensor("w", w)],
        )
        x = rng.normal(0, 1, (4, 32)).astype(np.float32)
        calib = calibrate(mb, [x], min_weight_bytes=1)
        qfn = lower_int8(mb, calib, min_weight_bytes=1,
                         protect_outputs=False)
        assert qfn.quantized_nodes == []
        assert "weight-shared-with-float-consumer" in \
            qfn.skipped_nodes.values()
        # And it still computes correctly (float path untouched).
        got = np.asarray(qfn(x, params=qfn.params)).astype(np.float32)
        want = x @ w + w.sum(0)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    def test_heavy_tailed_activation_skipped(self):
        rng = np.random.default_rng(7)
        w = rng.normal(0, 0.2, (64, 16)).astype(np.float32)
        mb = fo.model(
            [fo.node("MatMul", ["x", "w"], ["y"])],
            inputs=[fo.value_info("x", ["batch", 64])],
            outputs=[fo.value_info("y", ["batch", 16])],
            initializers=[fo.tensor("w", w)],
        )
        x = rng.normal(0, 0.01, (4, 64)).astype(np.float32)
        x[0, 0] = 1e4  # amax >> rms
        calib = calibrate(mb, [x], min_weight_bytes=1)
        qfn = lower_int8(mb, calib, min_weight_bytes=1,
                         protect_outputs=False)
        assert qfn.quantized_nodes == []
        assert list(qfn.skipped_nodes.values()) == [
            "heavy-tailed-activation"]

    def test_3d_matmul_not_selected(self):
        rng = np.random.default_rng(8)
        w = rng.normal(0, 0.2, (8, 16)).astype(np.float32)
        mb = fo.model(
            [fo.node("MatMul", ["x", "w"], ["y"])],
            inputs=[fo.value_info("x", ["batch", 4, 8])],
            outputs=[fo.value_info("y", ["batch", 4, 16])],
            initializers=[fo.tensor("w", w)],
        )
        x = rng.normal(0, 1, (2, 4, 8)).astype(np.float32)
        calib = calibrate(mb, [x], min_weight_bytes=1)
        qfn = lower_int8(mb, calib, min_weight_bytes=1,
                         protect_outputs=False)
        assert qfn.quantized_nodes == []
        assert list(qfn.skipped_nodes.values()) == ["non-2d-matmul"]

    def test_small_weights_stay_float(self):
        mb, _ = conv_gemm_graph()
        x = np.random.default_rng(9).normal(
            0, 1, (2, 4, 8, 8)).astype(np.float32)
        calib = calibrate(mb, [x])  # default min_weight_bytes
        qfn = lower_int8(mb, calib)  # conv w is 1152 B, gemm g is 18 KB
        assert "small-weight" in qfn.skipped_nodes.values()

    def test_activation_gate_is_opt_in_and_exempts_depthwise(self):
        """With ``min_act_elems`` set, a dense conv with a 576 B weight but
        a 16k-element activation quantizes (byte savings scale with the
        activation) — while a depthwise conv of the same activation size
        stays float (int8 depthwise on the VPU measured as a loss), and
        the default (gate off) quantizes neither."""
        import jax
        import jax.numpy as jnp

        from birda_tpu.onnx.quantize import DEFAULT_MIN_ACT_ELEMS

        rng = np.random.default_rng(10)
        w = rng.normal(0, 0.2, (4, 4, 3, 3)).astype(np.float32)   # 576 B
        wd = rng.normal(0, 0.3, (4, 1, 3, 3)).astype(np.float32)  # 144 B
        mb = fo.model(
            [
                fo.node("Conv", ["x", "w"], ["y"], attrs=[
                    fo.attr_ints("pads", [1, 1, 1, 1]),
                ]),
                fo.node("Conv", ["y", "wd"], ["z"], attrs=[
                    fo.attr_ints("pads", [1, 1, 1, 1]),
                    fo.attr_int("group", 4),
                ]),
            ],
            inputs=[fo.value_info("x", ["batch", 4, 64, 64])],
            outputs=[fo.value_info("z", ["batch", 4, 64, 64])],
            initializers=[fo.tensor("w", w), fo.tensor("wd", wd)],
        )
        x = rng.normal(0, 0.5, (2, 4, 64, 64)).astype(np.float32)
        calib = calibrate(mb, [x])
        assert calib.stats["x"]["aelems"] == 4 * 64 * 64
        # Default: gate off, both convs stay float (the measured optimum).
        q0 = lower_int8(mb, calib, protect_outputs=False)
        assert q0.quantized_nodes == []
        # Gate on: the dense conv quantizes, the depthwise stays exempt.
        qfn = lower_int8(mb, calib, compute_dtype=jnp.float32,
                         protect_outputs=False,
                         min_act_elems=DEFAULT_MIN_ACT_ELEMS)
        assert qfn.quantized_nodes == ["y"]
        assert qfn.skipped_nodes["z"] == "small-weight"
        got = np.asarray(jax.jit(
            lambda p, a: qfn(a, params=p))(qfn.params, x), np.float32)
        want = np.asarray(lower(mb)(x), np.float32)
        assert np.max(np.abs(got - want)) < 0.05 * np.max(np.abs(want))


class TestBoundaryStorePolicies:
    """Fusion-boundary int8 materialization policies and the
    dequantize-on-read path for non-quantized consumers (residual Adds,
    SE pools — the tensors the strict rule left at 2 B/element)."""

    def _mixed_consumer_graph(self):
        """u = Relu(Conv1(x)) feeds BOTH Conv2 (quantized) and a residual
        Add (not) — the MBConv residual-stream pattern."""
        rng = np.random.default_rng(30)
        w1 = rng.normal(0, 0.15, (16, 16, 3, 3)).astype(np.float32)  # 9 KB
        w2 = rng.normal(0, 0.15, (16, 16, 3, 3)).astype(np.float32)
        nodes = [
            fo.node("Conv", ["x", "w1"], ["c1"], attrs=[
                fo.attr_ints("pads", [1, 1, 1, 1]),
            ]),
            fo.node("Relu", ["c1"], ["u"]),
            fo.node("Conv", ["u", "w2"], ["c2"], attrs=[
                fo.attr_ints("pads", [1, 1, 1, 1]),
            ]),
            fo.node("Add", ["c2", "u"], ["y"]),  # residual over u
        ]
        mb = fo.model(
            nodes,
            inputs=[fo.value_info("x", ["batch", 16, 12, 12])],
            outputs=[fo.value_info("y", ["batch", 16, 12, 12])],
            initializers=[fo.tensor("w1", w1), fo.tensor("w2", w2)],
        )
        x = rng.normal(0, 0.5, (2, 16, 12, 12)).astype(np.float32)
        return mb, x

    def test_tolerant_stores_mixed_consumer_tensor(self):
        import jax
        import jax.numpy as jnp

        mb, x = self._mixed_consumer_graph()
        calib = calibrate(mb, [x])
        wantfn = lower(mb)
        want = np.asarray(wantfn(x, params=wantfn.params), np.float32)
        results = {}
        for policy in ("strict", "tolerant", "frontier"):
            qfn = lower_int8(mb, calib, compute_dtype=jnp.float32,
                             min_weight_bytes=1, protect_outputs=False,
                             boundary_store=policy)
            assert set(qfn.quantized_nodes) == {"c1", "c2"}
            got = np.asarray(jax.jit(
                lambda p, a: qfn(a, params=p))(qfn.params, x), np.float32)
            assert np.max(np.abs(got - want)) < 0.05 * np.max(np.abs(want)), \
                policy
            results[policy] = set(qfn.int8_boundary_tensors)
        # u has a non-quantized consumer (the Add): strict leaves it float,
        # tolerant and frontier store it int8 and the Add dequantizes on
        # read. x is a graph feed (never stored); y is an output.
        assert "u" not in results["strict"]
        assert "u" in results["tolerant"]
        assert "u" in results["frontier"]
        assert "y" not in results["tolerant"]

    def test_frontier_skips_sole_quantized_consumer(self):
        """A tensor whose only reader is a quantized node is left to the
        consumer's quantize-on-read under "frontier" (same HBM bytes, no
        forced materialization of an XLA-fusable producer chain)."""
        import jax.numpy as jnp

        mb, x = self._mixed_consumer_graph()
        calib = calibrate(mb, [x])
        q_f = lower_int8(mb, calib, compute_dtype=jnp.float32,
                         min_weight_bytes=1, protect_outputs=False,
                         boundary_store="frontier")
        q_t = lower_int8(mb, calib, compute_dtype=jnp.float32,
                         min_weight_bytes=1, protect_outputs=False,
                         boundary_store="tolerant")
        # x (the graph input) is c1's activation with conv c1 its sole
        # reader: tolerant lists it, frontier does not.
        assert "x" in q_t.int8_boundary_tensors
        assert "x" not in q_f.int8_boundary_tensors

    def test_all_policy_stores_se_style_stream(self):
        """"all" additionally stores a large tensor that only elementwise
        ops read (the SE pool/gate stream): consumer-derived policies
        can't reach it because no matmul/conv consumes it."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(33)
        w1 = rng.normal(0, 0.15, (16, 16, 3, 3)).astype(np.float32)
        w2 = rng.normal(0, 0.15, (16, 16, 3, 3)).astype(np.float32)
        nodes = [
            fo.node("Conv", ["x", "w1"], ["c1"], attrs=[
                fo.attr_ints("pads", [1, 1, 1, 1]),
            ]),
            fo.node("Relu", ["c1"], ["r"]),           # 16*32*32 = 16384/sample
            fo.node("GlobalAveragePool", ["r"], ["g"]),
            fo.node("Sigmoid", ["g"], ["s"]),
            fo.node("Mul", ["r", "s"], ["m"]),        # SE gate over r
            fo.node("Conv", ["m", "w2"], ["y"], attrs=[
                fo.attr_ints("pads", [1, 1, 1, 1]),
            ]),
        ]
        mb = fo.model(
            nodes,
            inputs=[fo.value_info("x", ["batch", 16, 32, 32])],
            outputs=[fo.value_info("y", ["batch", 16, 32, 32])],
            initializers=[fo.tensor("w1", w1), fo.tensor("w2", w2)],
        )
        x = rng.normal(0, 0.5, (2, 16, 32, 32)).astype(np.float32)
        calib = calibrate(mb, [x])
        assert "r" in calib.stats  # large-intermediate capture
        q_fro = lower_int8(mb, calib, compute_dtype=jnp.float32,
                           protect_outputs=False, boundary_store="frontier")
        q_all = lower_int8(mb, calib, compute_dtype=jnp.float32,
                           protect_outputs=False, boundary_store="all")
        # r is read only by GlobalAveragePool and Mul — no conv/matmul —
        # so only "all" can store it.
        assert "r" not in q_fro.int8_boundary_tensors
        assert "r" in q_all.int8_boundary_tensors
        wantfn = lower(mb)
        want = np.asarray(wantfn(x, params=wantfn.params), np.float32)
        got = np.asarray(jax.jit(
            lambda p, a: q_all(a, params=p))(q_all.params, x), np.float32)
        assert np.max(np.abs(got - want)) < 0.06 * np.max(np.abs(want))

    def test_all_policy_never_stores_pre_dft_audio(self):
        """Tensors feeding a DFT are time-domain audio: int8-storing them
        puts a quantization noise floor under the whole spectrum, and a
        bf16 dequant once crashed jax's rfft outright (Perch v2 family).
        The DSP guard walks backward from DFT inputs through
        elementwise/shape ops and excludes the lot; the graph must still
        execute at the bf16 compute dtype."""
        import jax.numpy as jnp

        g = fs.cached_build(fs.tiny_spec(fs.PERCH_V2_SPEC), seed=1)
        batches = list(calibration_signals(g.spec.sample_count, batch=2,
                                           n_batches=1))
        calib = calibrate(g.model_bytes, batches, min_weight_bytes=256)
        qfn = lower_int8(g.model_bytes, calib, min_weight_bytes=256,
                         compute_dtype=jnp.bfloat16,
                         boundary_store="all")
        dft_inputs = {i for n in qfn.graph.nodes if n.op_type == "DFT"
                      for i in n.inputs if i}
        assert dft_inputs  # the tiny Perch graph carries the DFT op
        assert not dft_inputs & set(qfn.int8_boundary_tensors)
        # The framer conv's output reaches the DFT through Transpose/Mul
        # and must be excluded too (the walk crosses elementwise ops).
        stored = set(qfn.int8_boundary_tensors)
        for n in qfn.graph.nodes:
            if n.op_type == "Transpose" and any(
                    o in dft_inputs or o in stored for o in n.outputs):
                assert not set(n.inputs) & stored
        # Traces end to end at bf16 — the rfft-rejects-bf16 regression
        # fired at trace time (XLA:CPU cannot *execute* bf16 dots, so the
        # numeric check below runs fp32).
        import jax

        shapes = jax.eval_shape(lambda a: qfn(a, params=qfn.params),
                                batches[0])
        assert shapes[0].shape[1] == g.spec.num_classes
        q32 = lower_int8(g.model_bytes, calib, min_weight_bytes=256,
                         compute_dtype=jnp.float32, boundary_store="all")
        out = np.asarray(q32(batches[0], params=q32.params)[0], np.float32)
        assert np.isfinite(out).all()

    def test_all_policy_never_stores_pre_stft_conv_audio(self):
        """The DSP guard must also seed from the Conv1d-STFT spelling
        (no DFT node in the graph): the waveform tensor ahead of the
        framer conv is time-domain audio and 8-bit storage floors the
        whole spectrum."""
        import jax.numpy as jnp

        rng = np.random.default_rng(41)
        k, hop, s = 512, 160, 20000
        bins = 40
        t = (s - k) // hop + 1
        wst = rng.normal(0, 0.05, (2 * bins, 1, k)).astype(np.float32)
        gw = rng.normal(0, 0.05, (2 * bins * t, 16)).astype(np.float32)
        mb = fo.model(
            [
                fo.node("Mul", ["x", "gain"], ["a"]),  # pre-STFT gain
                fo.node("Conv", ["a", "wst"], ["c"], attrs=[
                    fo.attr_ints("strides", [hop]),
                    fo.attr_ints("kernel_shape", [k]),
                ]),
                fo.node("Flatten", ["c"], ["f"],
                        attrs=[fo.attr_int("axis", 1)]),
                fo.node("Gemm", ["f", "gw"], ["h"]),
                fo.node("Relu", ["h"], ["y"]),
            ],
            inputs=[fo.value_info("x", ["batch", 1, s])],
            outputs=[fo.value_info("y", ["batch", 16])],
            initializers=[fo.tensor("wst", wst), fo.tensor("gw", gw),
                          fo.tensor("gain", np.float32(0.9))],
        )
        x = rng.normal(0, 0.3, (2, 1, s)).astype(np.float32)
        calib = calibrate(mb, [x])
        assert "a" in calib.stats  # captured as a large intermediate
        qfn = lower_int8(mb, calib, compute_dtype=jnp.float32,
                         protect_outputs=False, boundary_store="all")
        assert qfn.quantized_nodes  # the Gemm quantized (guard not vacuous)
        assert "a" not in qfn.int8_boundary_tensors
        assert "x" not in qfn.int8_boundary_tensors

    def test_protected_output_paths_never_boundary_stored(self):
        """A tensor on an elementwise-only path to a graph output must
        not be int8-materialized when protect_outputs is on — the
        rounding noise would land on the reported scores, the exact
        thing the output-head guard exists to prevent."""
        import jax.numpy as jnp

        rng = np.random.default_rng(42)
        w1 = rng.normal(0, 0.15, (16, 16, 3, 3)).astype(np.float32)
        w2 = rng.normal(0, 0.15, (16, 16, 3, 3)).astype(np.float32)
        gw = rng.normal(0, 0.05, (16 * 16 * 16, 8)).astype(np.float32)
        mb = fo.model(
            [
                fo.node("Conv", ["x", "w1"], ["t"], attrs=[
                    fo.attr_ints("pads", [1, 1, 1, 1]),
                ]),
                fo.node("Sigmoid", ["t"], ["y1"]),      # score plane
                fo.node("Conv", ["t", "w2"], ["u"], attrs=[
                    fo.attr_ints("pads", [1, 1, 1, 1]),
                ]),
                fo.node("Relu", ["u"], ["r"]),
                fo.node("Flatten", ["r"], ["f"],
                        attrs=[fo.attr_int("axis", 1)]),
                fo.node("Gemm", ["f", "gw"], ["y2"]),
            ],
            inputs=[fo.value_info("x", ["batch", 16, 16, 16])],
            outputs=[fo.value_info("y1", ["batch", 16, 16, 16]),
                     fo.value_info("y2", ["batch", 8])],
            initializers=[fo.tensor("w1", w1), fo.tensor("w2", w2),
                          fo.tensor("gw", gw)],
        )
        x = rng.normal(0, 0.5, (2, 16, 16, 16)).astype(np.float32)
        calib = calibrate(mb, [x])
        q_prot = lower_int8(mb, calib, compute_dtype=jnp.float32,
                            protect_outputs=True, boundary_store="all")
        # t feeds both the quantized second conv AND the Sigmoid that IS
        # the y1 output — protected, so it must stay float.
        assert "t" in {n.inputs[0] for n in q_prot.graph.nodes
                       if n.outputs[0] in set(q_prot.quantized_nodes)}
        assert "t" not in q_prot.int8_boundary_tensors
        # Control: without output protection the same tensor stores int8.
        q_open = lower_int8(mb, calib, compute_dtype=jnp.float32,
                            protect_outputs=False, boundary_store="all")
        assert "t" in q_open.int8_boundary_tensors

    def test_unknown_policy_rejected(self):
        mb, x = self._mixed_consumer_graph()
        calib = calibrate(mb, [x])
        with pytest.raises(ValueError):
            lower_int8(mb, calib, boundary_store="eager")

    def test_storage_policy_stores_without_quantizing(self):
        """"storage" is the mixed-storage mode: NO node quantizes (weights
        and compute stay at compute_dtype) but the "all" walk still
        int8-materializes the large streams, every consumer dequantizing
        on read. The round-5 bf16-path byte-saving A/B rides this."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(34)
        w1 = rng.normal(0, 0.15, (16, 16, 3, 3)).astype(np.float32)
        w2 = rng.normal(0, 0.15, (16, 16, 3, 3)).astype(np.float32)
        nodes = [
            fo.node("Conv", ["x", "w1"], ["c1"], attrs=[
                fo.attr_ints("pads", [1, 1, 1, 1]),
            ]),
            fo.node("Relu", ["c1"], ["r"]),
            fo.node("GlobalAveragePool", ["r"], ["g"]),
            fo.node("Sigmoid", ["g"], ["s"]),
            fo.node("Mul", ["r", "s"], ["m"]),
            fo.node("Conv", ["m", "w2"], ["y"], attrs=[
                fo.attr_ints("pads", [1, 1, 1, 1]),
            ]),
        ]
        mb = fo.model(
            nodes,
            inputs=[fo.value_info("x", ["batch", 16, 32, 32])],
            outputs=[fo.value_info("y", ["batch", 16, 32, 32])],
            initializers=[fo.tensor("w1", w1), fo.tensor("w2", w2)],
        )
        x = rng.normal(0, 0.5, (2, 16, 32, 32)).astype(np.float32)
        calib = calibrate(mb, [x])
        q = lower_int8(mb, calib, compute_dtype=jnp.float32,
                       protect_outputs=False, boundary_store="storage")
        # Nothing quantizes: weights ship float, no node runs int8.
        assert q.quantized_nodes == []
        assert all(arr.dtype != np.int8 for arr in q.params.values())
        # But the large streams still store int8 (r AND the single-
        # consumer gated stream m — with no quantized reader anywhere,
        # frontier's sole-quantized-consumer exemption never applies).
        assert "r" in q.int8_boundary_tensors
        assert "m" in q.int8_boundary_tensors
        want_fn = lower(mb)
        want = np.asarray(want_fn(x, params=want_fn.params), np.float32)
        got = np.asarray(jax.jit(
            lambda p, a: q(a, params=p))(q.params, x), np.float32)
        # Only storage rounding separates the two paths.
        assert np.max(np.abs(got - want)) < 0.06 * np.max(np.abs(want))

    def test_fetch_dequant_accounted_in_cost_report(self):
        import jax

        from birda_tpu.onnx.quantize import int8_cost_report

        mb, x = self._mixed_consumer_graph()
        calib = calibrate(mb, [x])
        qfn = lower_int8(mb, calib, min_weight_bytes=1,
                         protect_outputs=False, boundary_store="tolerant")
        rep = int8_cost_report(
            qfn, jax.ShapeDtypeStruct(x.shape, np.float32))
        # The Add's read of boundary-stored u dequantizes on fetch.
        assert rep["fetch_dequant_elems"] >= x.size
        assert rep["epilogue_elems"] >= rep["fetch_dequant_elems"]


class TestComputeDtypeSuppression:
    def test_no_compute_cast_is_thread_local(self):
        """The integer-conv paths suppress bf16 input casts while they
        trace; under --jobs several threads trace through ONE shared
        evaluator, so the suppression must be per-thread — a plain
        save/restore would strip (or permanently lose) the compute dtype
        for a sibling thread's program."""
        import threading

        import jax.numpy as jnp

        from birda_tpu.onnx.lowering import _Evaluator
        from birda_tpu.onnx.proto import load_model

        mb, _ = conv_gemm_graph()
        ev = _Evaluator(load_model(mb).graph, compute_dtype=jnp.bfloat16)
        inside = threading.Event()
        release = threading.Event()
        seen = {}

        def holder():
            with ev._no_compute_cast():
                seen["holder"] = ev.compute_dtype
                inside.set()
                release.wait(5)
            seen["after"] = ev.compute_dtype

        th = threading.Thread(target=holder)
        th.start()
        assert inside.wait(5)
        # Main thread is unaffected while the holder suppresses.
        assert ev.compute_dtype == jnp.bfloat16
        release.set()
        th.join()
        assert seen["holder"] is None
        assert seen["after"] == jnp.bfloat16
        # Re-entrant on one thread; restores on exit.
        with ev._no_compute_cast():
            assert ev.compute_dtype is None
            with ev._no_compute_cast():
                assert ev.compute_dtype is None
            assert ev.compute_dtype is None
        assert ev.compute_dtype == jnp.bfloat16


class TestEndToEndParity:
    @pytest.mark.parametrize("spec", [fs.BIRDNET_V24_SPEC, fs.PERCH_V2_SPEC])
    def test_tiny_fullscale_parity_budget(self, spec):
        """int8 scores track the fp32 scores within the documented budget
        on the tiny full-scale graphs (same op mix as the real families)."""
        g = fs.cached_build(fs.tiny_spec(spec), seed=1)
        batches = list(calibration_signals(
            g.spec.sample_count, batch=4, n_batches=2))
        # The tiny graphs shrink channel counts below the production
        # min_weight_bytes; lower it so the whole backbone quantizes here.
        calib = calibrate(g.model_bytes, batches, min_weight_bytes=256)
        qfn = lower_int8(g.model_bytes, calib, min_weight_bytes=256)
        assert len(qfn.quantized_nodes) >= 20  # the backbone quantized
        # The guard must not fire on well-scaled backbone activations.
        assert "heavy-tailed-activation" not in qfn.skipped_nodes.values()
        # The class/embedding head matmuls stay float by default: their
        # quantization noise would land on the scores unabsorbed (measured
        # 14x drift cut on the full-depth graph).
        assert list(qfn.skipped_nodes.values()).count("output-head") == 2

        # Backbone-internal tensors materialize int8 at fusion boundaries;
        # the default "all"/frontier policy deliberately leaves
        # sole-quantized-reader tensors to quantize-at-consumer (measured
        # faster — docs/performance.md), so the tiny graph stores only a
        # few. Under "strict" every all-consumers-quantized tensor stores.
        assert len(qfn.int8_boundary_tensors) >= 1
        assert not {"predictions", "embeddings"} & set(
            qfn.int8_boundary_tensors)
        q_strict = lower_int8(g.model_bytes, calib, min_weight_bytes=256,
                              boundary_store="strict")
        assert len(q_strict.int8_boundary_tensors) >= 10
        ffn = lower(g.model_bytes)
        test = next(calibration_signals(g.spec.sample_count, batch=4,
                                        n_batches=1, seed=99))
        params_q = qfn.params
        params_f = ffn.params
        sq = np.asarray(qfn(test, params=params_q)[0], np.float32)
        sf = np.asarray(ffn(test, params=params_f)[0], np.float32)
        # Budget: scores within 0.05 absolute, top-1 index preserved.
        assert np.max(np.abs(sq - sf)) < 0.05
        assert np.array_equal(np.argmax(sq, -1), np.argmax(sf, -1))

    def test_int8_detections_track_fp32_through_analyze(self, tmp_path,
                                                        monkeypatch):
        """`--precision int8` end to end: analyze an audio file against a
        tiny full-scale ONNX graph, scales cached on first run and loaded
        on the second, detections tracking the fp32 run."""
        import csv

        from birda_tpu.config.types import Config, ModelConfig, ModelType
        from birda_tpu.models.zoo import synthetic_labels
        from birda_tpu.orchestrator import AnalyzeOptions, analyze_files
        from fixtures_audio import write_wav

        monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "config"))
        monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
        monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path / "data"))
        monkeypatch.setenv("BIRDA_NO_COMPILE_CACHE", "1")

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        model_file = tmp_path / "tiny-v24.onnx"
        model_file.write_bytes(g.model_bytes)
        labels_file = tmp_path / "labels.txt"
        labels_file.write_text(
            "".join(f"{s}\n" for s in synthetic_labels(g.spec.num_classes)))
        cfg = Config()
        cfg.models["tiny-onnx"] = ModelConfig(
            path=model_file, labels=labels_file,
            model_type=ModelType.BIRDNET_V24)
        cfg.defaults.model = "tiny-onnx"

        rate = 48_000
        t = np.arange(rate * 6) / rate
        audio = tmp_path / "rec.wav"
        write_wav(audio, (0.4 * np.sin(2 * np.pi * 2500 * t)).astype(
            np.float32), rate)

        def run(precision, outdir):
            opts = AnalyzeOptions(
                inputs=[audio], output_dir=tmp_path / outdir,
                device_flags={"cpu": True}, precision=precision,
                min_confidence=0.05,
            )
            assert analyze_files(opts, cfg) == 0
            with open(tmp_path / outdir / "rec.BirdNET.results.csv",
                      encoding="utf-8-sig") as f:
                return list(csv.DictReader(f))

        rows_f = run("fp32", "out_f")
        rows_q = run("int8", "out_q")
        cache = list((tmp_path / "cache").rglob("int8_calib/*.json"))
        assert len(cache) == 1  # synthetic-set scales were cached
        # Same segments detected with closely tracking confidences.
        key = lambda r: (r["Start (s)"], r["Scientific name"])  # noqa: E731
        fmap = {key(r): float(r["Confidence"]) for r in rows_f}
        qmap = {key(r): float(r["Confidence"]) for r in rows_q}
        assert fmap and set(fmap) == set(qmap)
        for k, v in fmap.items():
            assert abs(qmap[k] - v) < 0.05
        # Second int8 run loads the cached scales and agrees exactly.
        rows_q2 = run("int8", "out_q2")
        assert rows_q2 == rows_q

    def test_mixed_precision_through_analyze(self, tmp_path, monkeypatch):
        """`--precision mixed` (bf16 compute + calibrated int8 STORAGE of
        the large boundary streams, docs/performance.md "Mixed int8
        storage") end to end through the product: nothing quantizes, the
        streams store int8, detections track the fp32 run, and the
        precision payload reports mode "mixed"."""
        import csv

        from birda_tpu.config.types import Config, ModelConfig, ModelType
        from birda_tpu.models.zoo import synthetic_labels
        from birda_tpu.orchestrator import (
            AnalyzeOptions,
            analyze_files,
            load_model_graph,
        )
        from fixtures_audio import write_wav

        monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "config"))
        monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
        monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path / "data"))
        monkeypatch.setenv("BIRDA_NO_COMPILE_CACHE", "1")

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        model_file = tmp_path / "tiny-v24.onnx"
        model_file.write_bytes(g.model_bytes)
        labels_file = tmp_path / "labels.txt"
        labels_file.write_text(
            "".join(f"{s}\n" for s in synthetic_labels(g.spec.num_classes)))
        cfg = Config()
        cfg.models["tiny-onnx"] = ModelConfig(
            path=model_file, labels=labels_file,
            model_type=ModelType.BIRDNET_V24)
        cfg.defaults.model = "tiny-onnx"

        model = load_model_graph(cfg.models["tiny-onnx"], "tiny-onnx",
                                 precision="mixed", backend="cpu")
        info = model.precision_info
        assert info["mode"] == "mixed"
        assert info["boundary_store"] == "storage"
        assert info["quantized_nodes"] == 0  # compute never changes dtype
        # The tiny graph's streams sit below DEFAULT_MIN_ACT_ELEMS, so
        # nothing stores here (storage kicks in at full scale; the policy
        # itself is pinned on a storing graph in
        # TestBoundaryStorePolicies.test_storage_policy_stores_without_
        # quantizing).
        assert info["int8_boundary_tensors"] == 0
        assert "advisory" not in info  # compute-shape advisory is int8-only

        rate = 48_000
        t = np.arange(rate * 6) / rate
        audio = tmp_path / "rec.wav"
        write_wav(audio, (0.4 * np.sin(2 * np.pi * 2500 * t)).astype(
            np.float32), rate)

        def run(precision, outdir):
            opts = AnalyzeOptions(
                inputs=[audio], output_dir=tmp_path / outdir,
                device_flags={"cpu": True}, precision=precision,
                min_confidence=0.05,
            )
            assert analyze_files(opts, cfg) == 0
            with open(tmp_path / outdir / "rec.BirdNET.results.csv",
                      encoding="utf-8-sig") as f:
                return list(csv.DictReader(f))

        rows_f = run("fp32", "out_f")
        rows_m = run("mixed", "out_m")
        key = lambda r: (r["Start (s)"], r["Scientific name"])  # noqa: E731
        fmap = {key(r): float(r["Confidence"]) for r in rows_f}
        mmap = {key(r): float(r["Confidence"]) for r in rows_m}
        assert fmap and set(fmap) == set(mmap)
        for k, v in fmap.items():
            # Only storage rounding separates the paths (CPU compute is
            # fp32 either way): one int8 step through the gates.
            assert abs(mmap[k] - v) < 0.05

    def test_mixed_precision_cli_parse_and_api_validation(self, tmp_path):
        """The CLI accepts --precision mixed (with --calibration-audio) and
        the library API's validation admits "mixed"; bf16 still rejects
        --calibration-audio."""
        from click.testing import CliRunner

        import birda_tpu
        from birda_tpu.cli.main import cli
        from birda_tpu.errors import ConfigValidation

        runner = CliRunner()
        audio = tmp_path / "a.wav"
        audio.write_bytes(b"")
        r = runner.invoke(cli, [
            "analyze", str(audio), "--cpu", "--precision", "bf16",
            "--calibration-audio", str(audio),
        ])
        assert r.exit_code == 2
        assert "--precision int8/mixed" in r.output
        # mixed passes the parse-time gate (it then fails later on the
        # empty wav, which is fine — exit code 1, not a UsageError 2).
        r = runner.invoke(cli, [
            "analyze", str(audio), "--cpu", "--precision", "mixed",
            "--calibration-audio", str(audio),
        ])
        assert r.exit_code != 2

        with pytest.raises(ConfigValidation, match="precision"):
            birda_tpu.analyze([audio], precision="fp16")
        with pytest.raises(ConfigValidation, match="precision"):
            birda_tpu.analyze([audio], precision="storage")

    def test_int8_model_shards_over_the_mesh(self):
        """The int8-executed graph runs under the data-parallel sharded
        chunk runner (virtual 8-device mesh) with results matching the
        unsharded path — int8 convs/matmuls shard on the batch axis like
        any other op."""
        from birda_tpu.inference.classifier import BirdClassifier
        from birda_tpu.models.contracts import ModelFamily, contract_for
        from birda_tpu.models.zoo import onnx_model_int8, synthetic_labels
        from birda_tpu.parallel.mesh import make_mesh

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        x = next(calibration_signals(g.spec.sample_count, batch=2,
                                     n_batches=1))
        calib = calibrate(g.model_bytes, [x])
        contract = contract_for(ModelFamily.BIRDNET_V24)
        model = onnx_model_int8(
            g.model_bytes, contract,
            synthetic_labels(contract.num_classes), calib)

        mesh = make_mesh(8, backend="cpu")
        plain = BirdClassifier(model, device="cpu", min_confidence=0.0,
                               top_k=3)
        sharded = BirdClassifier(model, device="cpu", min_confidence=0.0,
                                 top_k=3, mesh=mesh)
        xs = np.random.default_rng(7).normal(
            0, 0.1, (8, contract.sample_count)).astype(np.float32)
        a = plain.predict_batch(xs)
        b = sharded.predict_batch(xs)
        for ra, rb in zip(a, b):
            assert ([p.index for p in ra.predictions]
                    == [p.index for p in rb.predictions])
            for pa, pb in zip(ra.predictions, rb.predictions):
                assert pa.confidence == pytest.approx(pb.confidence,
                                                      abs=1e-5)

    def test_int8_with_device_resample_chunk_runner(self):
        """Composite hot path: 44.1 kHz int16 chunk -> device dequant ->
        device polyphase resample -> int8 backbone -> top-k, one XLA
        program — the production stack for a non-native-rate recording
        under the quantized mode."""
        from birda_tpu.inference.classifier import BirdClassifier
        from birda_tpu.models.contracts import ModelFamily, contract_for
        from birda_tpu.models.zoo import onnx_model_int8, synthetic_labels

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        x = next(calibration_signals(g.spec.sample_count, batch=2,
                                     n_batches=1))
        calib = calibrate(g.model_bytes, [x])
        contract = contract_for(ModelFamily.BIRDNET_V24)
        model = onnx_model_int8(
            g.model_bytes, contract,
            synthetic_labels(contract.num_classes), calib)
        clf = BirdClassifier(model, device="cpu", min_confidence=0.0,
                             top_k=5)
        src_rate = 44_100
        runner = clf.chunk_runner(2, contract.sample_count,
                                  src_rate=src_rate)
        assert runner.resample_on_device
        rng = np.random.default_rng(31)
        chunk_f32 = rng.normal(0, 0.1, runner.chunk_samples).astype(
            np.float32)
        chunk = np.clip(chunk_f32 * 32767, -32768, 32767).astype(np.int16)
        results = runner.predict_chunk(chunk, 2)
        assert len(results) == 2
        for r in results:
            assert len(r.predictions) == 5
            assert all(0.0 <= p.confidence <= 1.0 for p in r.predictions)

    def test_precision_info_surfaces_in_pipeline_started_payload(self):
        """int8 observability: the model reports its quantization counts
        and the pipeline_started payload carries them (additive field —
        absent on fp32, so the pinned wire format is unchanged)."""
        from birda_tpu.models.contracts import ModelFamily, contract_for
        from birda_tpu.models.zoo import onnx_model_int8, synthetic_labels
        from birda_tpu.output import json_envelope as env

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        x = next(calibration_signals(g.spec.sample_count, batch=2,
                                     n_batches=1))
        calib = calibrate(g.model_bytes, [x])
        contract = contract_for(ModelFamily.BIRDNET_V24)
        model = onnx_model_int8(
            g.model_bytes, contract,
            synthetic_labels(contract.num_classes), calib)
        info = model.precision_info
        assert info["mode"] == "int8"
        assert info["quantized_nodes"] > 0

        p = env.pipeline_started_payload(1, "m", 0.1, {"requested": "cpu"},
                                         precision=info)
        assert p["precision"]["quantized_nodes"] == info["quantized_nodes"]
        # fp32 (None) leaves the wire format untouched.
        p0 = env.pipeline_started_payload(1, "m", 0.1, {"requested": "cpu"})
        assert "precision" not in p0

    def test_boundary_policy_env_knob(self, monkeypatch):
        """BIRDA_INT8_BOUNDARY re-tunes the storage policy without a code
        change (real-asset day-one escape hatch); the chosen policy is
        surfaced through precision_info."""
        from birda_tpu.models.contracts import ModelFamily, contract_for
        from birda_tpu.models.zoo import onnx_model_int8, synthetic_labels

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        x = next(calibration_signals(g.spec.sample_count, batch=2,
                                     n_batches=1))
        calib = calibrate(g.model_bytes, [x])
        contract = contract_for(ModelFamily.BIRDNET_V24)
        m_def = onnx_model_int8(g.model_bytes, contract,
                                synthetic_labels(contract.num_classes),
                                calib)
        assert m_def.precision_info["boundary_store"] == "all"
        monkeypatch.setenv("BIRDA_INT8_BOUNDARY", "strict")
        m_env = onnx_model_int8(g.model_bytes, contract,
                                synthetic_labels(contract.num_classes),
                                calib)
        assert m_env.precision_info["boundary_store"] == "strict"
        # strict stores strictly more on the tiny graph (sole-quantized
        # readers are the common case there).
        assert (m_env.precision_info["int8_boundary_tensors"]
                > m_def.precision_info["int8_boundary_tensors"])

    def test_int8_params_halve_the_footprint(self):
        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V30_SPEC), seed=1)
        x = next(calibration_signals(g.spec.sample_count, batch=2,
                                     n_batches=1))
        calib = calibrate(g.model_bytes, [x])
        # In the tiny graph the only >=4 KB weights are the head matmuls,
        # which the output guard protects by default — disable it here to
        # measure the weight compression itself.
        qfn = lower_int8(g.model_bytes, calib, protect_outputs=False)
        int8_names = {k for k, v in qfn.params.items()
                      if np.asarray(v).dtype == np.int8}
        assert int8_names  # big weights became int8
        ffn = lower(g.model_bytes)
        fbytes = sum(np.asarray(v).nbytes for v in ffn.params.values())
        qbytes = sum(np.asarray(v).nbytes for v in qfn.params.values())
        assert qbytes < 0.55 * fbytes


class TestCostReportAndAdvisory:
    """Static cost accounting + the compute-shaped throughput advisory
    (the selection-never-picks-a-known-worse-variant analogue, reference
    src/registry/selection.rs:160)."""

    def _report(self, mb, x):
        import jax

        from birda_tpu.onnx.quantize import int8_cost_report

        calib = calibrate(mb, [x], min_weight_bytes=1)
        qfn = lower_int8(mb, calib, min_weight_bytes=1)
        rep = int8_cost_report(
            qfn, jax.ShapeDtypeStruct(x.shape, np.float32))
        return qfn, rep

    def test_cost_report_exact_counts(self):
        """MAC/epilogue counts are exact on a graph small enough to count
        by hand: Conv(4->8, 3x3 on 8x8) -> Relu -> Flatten -> Gemm(288->16),
        batch 2, gemm head protected (output-head guard)."""
        mb, _ = conv_gemm_graph()
        x = np.random.default_rng(5).normal(
            0, 1, (2, 4, 8, 8)).astype(np.float32)
        qfn, rep = self._report(mb, x)
        # Only the conv quantizes (the gemm is the output head).
        assert set(qfn.quantized_nodes) == {"c"}
        # conv out: [2, 8, 6, 6] = 576 elems, reduction depth 4*3*3 = 36.
        assert rep["macs"] == 576 * 36
        assert rep["dequant_elems"] == 576
        # one quantize of the conv input x: 2*4*8*8 elems.
        assert rep["quantize_elems"] == 2 * 4 * 8 * 8
        assert rep["act_bytes"] > 0
        # eval_shape accounting leaves no accumulator behind.
        assert qfn._eval.cost is None

    def test_advisory_fires_on_compute_shaped_graph(self):
        """A deep-reduction matmul chain (K=1024, intensity hundreds of
        FLOP/B) draws the advisory; measured basis: Perch v2 int8 -3.6%."""
        import jax

        from birda_tpu.onnx.quantize import int8_throughput_advisory

        rng = np.random.default_rng(6)
        w1 = rng.normal(0, 0.03, (1024, 1024)).astype(np.float32)
        w2 = rng.normal(0, 0.03, (1024, 16)).astype(np.float32)
        mb = fo.model(
            [
                fo.node("MatMul", ["x", "w1"], ["h"]),
                fo.node("Relu", ["h"], ["r"]),
                fo.node("MatMul", ["r", "w2"], ["y"]),
            ],
            inputs=[fo.value_info("x", ["batch", 1024])],
            outputs=[fo.value_info("y", ["batch", 16])],
            initializers=[fo.tensor("w1", w1), fo.tensor("w2", w2)],
        )
        x = rng.normal(0, 1, (8, 1024)).astype(np.float32)
        calib = calibrate(mb, [x], min_weight_bytes=1)
        qfn = lower_int8(mb, calib, min_weight_bytes=1)
        assert "h" in qfn.quantized_nodes  # the deep matmul quantized
        adv = int8_throughput_advisory(
            qfn, jax.ShapeDtypeStruct((64, 1024), np.float32))
        assert adv is not None
        assert adv["intensity_flop_per_byte"] > adv["threshold"]
        assert "compute-shaped" in adv["message"]
        assert "--precision bf16" in adv["message"]

    def test_advisory_quiet_on_bandwidth_shaped_graph(self):
        """Shallow-reduction convs (K=36) stay under the threshold — the
        v2.4-shaped regime where int8 measured +4.7%."""
        import jax

        from birda_tpu.onnx.quantize import int8_throughput_advisory

        mb, _ = conv_gemm_graph()
        x = np.random.default_rng(7).normal(
            0, 1, (2, 4, 8, 8)).astype(np.float32)
        calib = calibrate(mb, [x], min_weight_bytes=1)
        qfn = lower_int8(mb, calib, min_weight_bytes=1)
        adv = int8_throughput_advisory(
            qfn, jax.ShapeDtypeStruct(x.shape, np.float32))
        assert adv is None

    def test_advisory_lands_in_precision_info(self):
        """onnx_model_int8 surfaces the advisory through precision_info,
        which rides the pipeline_started payload to GUI clients."""
        from birda_tpu.models import contracts
        from birda_tpu.models.zoo import onnx_model_int8, synthetic_labels

        rng = np.random.default_rng(8)
        # Deep enough that the intensity clears the recalibrated threshold
        # (100 since the boundary-storage pass — every measured family at
        # 6-47 FLOP/B is now int8-positive, so only far outliers warn).
        n = 1024
        w1 = rng.normal(0, 0.05, (n, n)).astype(np.float32)
        w2 = rng.normal(0, 0.05, (n, 5)).astype(np.float32)
        mb = fo.model(
            [
                fo.node("MatMul", ["x", "w1"], ["h"]),
                fo.node("Relu", ["h"], ["r"]),
                fo.node("MatMul", ["r", "w2"], ["y"]),
            ],
            inputs=[fo.value_info("x", ["batch", n])],
            outputs=[fo.value_info("y", ["batch", 5])],
            initializers=[fo.tensor("w1", w1), fo.tensor("w2", w2)],
        )
        x = rng.normal(0, 1, (4, n)).astype(np.float32)
        calib = calibrate(mb, [x], min_weight_bytes=1)
        cfg = contracts.ModelConfig(
            family=contracts.ModelFamily.CUSTOM, sample_rate=n,
            segment_duration=1.0, sample_count=n, num_classes=5,
            activation=contracts.ScoreActivation.SIGMOID, embedding_dim=None,
        )
        # min_weight_bytes default (4096) keeps w1 (256 KB) eligible.
        m = onnx_model_int8(mb, cfg, synthetic_labels(5), calib)
        assert m.precision_info["mode"] == "int8"
        adv = m.precision_info.get("advisory")
        assert adv is not None and adv["compute_shaped"] is True
        assert adv["intensity_flop_per_byte"] > 20

"""TensorFlow as an independent oracle for the in-graph DSP front-end.

The real BirdNET/Perch assets are TensorFlow exports: their in-graph
spectrogram front-ends were traced from ``tf.signal`` ops (the reference
executes the result through ONNX Runtime, ``src/inference/classifier.rs:281``).
``torch`` already oracles every op test; TF is the *producer's* DSP library,
so agreement here checks the conventions a real export bakes in — periodic
Hann, no-centering framing, rfft scaling, and the mel matrix emitted as a
traced constant.

The mel-matrix constant is the key case: ``tf.signal.linear_to_mel_weight_matrix``
is evaluated at trace time, so a tf2onnx export ships its OUTPUT as an
initializer. We therefore bake the TF matrix into the test graph — exactly
what a real export does — rather than comparing it to the ONNX
``MelWeightMatrix`` op (whose spec algorithm differs by design: integer-bin
snapping vs TF's continuous triangles).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import fixtures_onnx as fo  # noqa: E402
from test_onnx import run_model  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _tf_cpu_only():
    # Never let TF grab an accelerator; these are numerics checks.
    tf.config.set_visible_devices([], "GPU")
    yield


class TestStftVsTf:
    def test_stft_matches_tf_signal(self):
        rng = np.random.default_rng(7)
        sig = rng.normal(0, 1, (2, 4096)).astype(np.float32)
        frame, step = 512, 160
        win = tf.signal.hann_window(frame, periodic=True).numpy()

        mb = fo.model(
            [fo.node("STFT", ["sig", "step", "win"], ["y"])],
            inputs=[fo.value_info("sig", [2, 4096])],
            outputs=[fo.value_info("y", [2, 23, 257, 2])],
            initializers=[fo.tensor("step", np.array(step, np.int64)),
                          fo.tensor("win", win.astype(np.float32))],
            opset=17,
        )
        got = run_model(mb, sig)
        want = tf.signal.stft(sig, frame_length=frame, frame_step=step,
                              fft_length=frame).numpy()
        assert got.shape == (2, want.shape[1], want.shape[2], 2)
        ref = np.stack([want.real, want.imag], axis=-1)
        assert np.max(np.abs(got - ref)) < 2e-3  # fp32 rfft noise at 512-pt

    def test_hann_window_matches_tf(self):
        mb = fo.model(
            [fo.node("HannWindow", ["size"], ["w"])],
            inputs=[],
            outputs=[fo.value_info("w", [1024])],
            initializers=[fo.tensor("size", np.array(1024, np.int64))],
            opset=17,
        )
        got = run_model(mb)
        want = tf.signal.hann_window(1024, periodic=True).numpy()
        assert np.max(np.abs(got - want)) < 1e-6


class TestTfExportStyleMelFrontEnd:
    def test_full_chain_at_birdnet_scale(self):
        """stft -> |.|^2 -> mel matmul -> log, TF vs our lowering of the
        graph a TF export would produce (TF's mel matrix baked as an
        initializer), at BirdNET v2.4 dimensions (48 kHz, 3 s)."""
        sr, n = 48_000, 144_000
        frame, step, mels = 1024, 278, 128
        rng = np.random.default_rng(1)
        sig = (0.5 * rng.normal(0, 0.3, (1, n))).astype(np.float32)

        win = tf.signal.hann_window(frame, periodic=True).numpy()
        mel_w = tf.signal.linear_to_mel_weight_matrix(
            num_mel_bins=mels, num_spectrogram_bins=frame // 2 + 1,
            sample_rate=sr, lower_edge_hertz=0.0, upper_edge_hertz=15_000.0,
        ).numpy().astype(np.float32)

        n_frames = 1 + (n - frame) // step
        n_bins = frame // 2 + 1

        # The export-shaped graph: STFT, re^2+im^2 via Slice/Mul/Add,
        # MatMul with the traced mel constant, Add eps, Log.
        mb = fo.model(
            [
                fo.node("STFT", ["sig", "step", "win"], ["c"]),
                fo.node("Slice", ["c", "s0", "s1", "ax"], ["re"]),
                fo.node("Slice", ["c", "s1", "s2", "ax"], ["im"]),
                fo.node("Mul", ["re", "re"], ["re2"]),
                fo.node("Mul", ["im", "im"], ["im2"]),
                fo.node("Add", ["re2", "im2"], ["pow0"]),
                fo.node("Squeeze", ["pow0", "ax"], ["pow"]),
                fo.node("MatMul", ["pow", "mel_w"], ["mel"]),
                fo.node("Add", ["mel", "eps"], ["mel_e"]),
                fo.node("Log", ["mel_e"], ["logmel"]),
            ],
            inputs=[fo.value_info("sig", [1, n])],
            outputs=[fo.value_info("logmel", [1, n_frames, mels])],
            initializers=[
                fo.tensor("step", np.array(step, np.int64)),
                fo.tensor("win", win.astype(np.float32)),
                fo.tensor("s0", np.array([0], np.int64)),
                fo.tensor("s1", np.array([1], np.int64)),
                fo.tensor("s2", np.array([2], np.int64)),
                fo.tensor("ax", np.array([3], np.int64)),
                fo.tensor("mel_w", mel_w),
                fo.tensor("eps", np.array(1e-6, np.float32)),
            ],
            opset=17,
        )
        got = run_model(mb, sig)

        stft = tf.signal.stft(sig, frame_length=frame, frame_step=step,
                              fft_length=frame)
        power = tf.math.square(tf.abs(stft))
        mel = tf.matmul(power, mel_w)
        want = tf.math.log(mel + 1e-6).numpy()

        assert got.shape == want.shape == (1, n_frames, mels)
        # log-domain comparison: absolute tolerance is the honest metric.
        assert np.max(np.abs(got - want)) < 5e-3

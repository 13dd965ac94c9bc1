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

"""Score-parity harness: our ONNX->XLA lowering vs recorded upstream outputs.

The north-star check (SURVEY §6): per-segment sigmoid scores within 1e-3 of
the ONNX-Runtime-CPU reference. The real model assets cannot be downloaded
in this environment, so the harness activates when they are present:

- ``BIRDA_PARITY_MODEL``: path to an installed classifier ONNX file;
- ``BIRDA_PARITY_REFERENCE``: path to an ``.npz`` with ``inputs``
  [N, sample_count] float32 waveforms and ``scores`` [N, num_classes] —
  recorded once by running the same inputs through ONNX Runtime CPU
  (``scripts/record_parity_reference.py`` documents the recipe).

Until assets exist, a self-parity check pins the harness machinery itself:
a fixture graph's recorded outputs must reproduce through the lowering.
"""

import os

import numpy as np
import pytest

import fixtures_onnx as fo
from birda_tpu.onnx.lowering import lower

PARITY_TOLERANCE = 1e-3


def test_self_parity_fixture():
    """The harness machinery, end to end, on a fixture graph."""
    mb = fo.make_fixture_geomodel(num_species=32)
    fn = lower(mb)
    rng = np.random.default_rng(0)
    inputs = rng.normal(0, 30, (16, 3)).astype(np.float32)
    # "Recorded reference": numpy-evaluated ground truth of the same graph.
    from birda_tpu.onnx.proto import load_model

    m = load_model(mb)
    w = m.graph.initializers["W"].array
    b = m.graph.initializers["B"].array
    reference = 1 / (1 + np.exp(-(inputs @ w + b).astype(np.float64)))

    got = np.asarray(fn(inputs))
    assert np.max(np.abs(got - reference)) < PARITY_TOLERANCE


@pytest.mark.skipif(
    not (os.environ.get("BIRDA_PARITY_MODEL")
         and os.environ.get("BIRDA_PARITY_REFERENCE")),
    reason="real model assets not installed (set BIRDA_PARITY_MODEL and "
           "BIRDA_PARITY_REFERENCE)",
)
def test_real_model_parity():
    """Lowered upstream graph vs recorded ONNX-Runtime-CPU scores.

    On failure, when the recording carries per-node activations
    (``--record-nodes``), the message names the FIRST diverging node —
    no hand-bisecting a 500-node graph."""
    fn = lower(os.environ["BIRDA_PARITY_MODEL"])
    ref = np.load(os.environ["BIRDA_PARITY_REFERENCE"])
    inputs, scores = ref["inputs"], ref["scores"]
    out = fn(inputs)
    got = np.asarray(out[0] if isinstance(out, tuple) else out)
    max_err = float(np.max(np.abs(got - scores)))
    if max_err >= PARITY_TOLERANCE:
        from birda_tpu.onnx.parity import find_first_divergence, node_records

        recorded = node_records(ref)
        detail = ""
        if recorded:
            rows = int(ref["node_input_rows"]) if "node_input_rows" in ref.files else 1
            div = find_first_divergence(fn, inputs[:rows], recorded,
                                        tol=PARITY_TOLERANCE)
            if div is not None:
                detail = f"; {div.render()}"
        raise AssertionError(
            f"score parity failure: max |Δ| = {max_err} "
            f"(budget {PARITY_TOLERANCE}){detail}"
        )


class TestDivergenceBisect:
    """The per-node bisection machinery itself, on fixture graphs: plant a
    deliberate perturbation mid-graph and the harness must NAME that node
    (the tool that turns a real-asset parity failure into one fix)."""

    def _chain_model(self, w1, w2):
        """x -> Gemm(w1) -> Relu -> Gemm(w2) -> Sigmoid, all named."""
        return fo.model(
            [
                fo.node("Gemm", ["x", "w1"], ["h1"], name="fc1"),
                fo.node("Relu", ["h1"], ["h2"], name="act1"),
                fo.node("Gemm", ["h2", "w2"], ["h3"], name="fc2"),
                fo.node("Sigmoid", ["h3"], ["y"], name="out"),
            ],
            inputs=[fo.value_info("x", ["batch", 6])],
            outputs=[fo.value_info("y", ["batch", 4])],
            initializers=[fo.tensor("w1", w1), fo.tensor("w2", w2)],
        )

    def test_planted_perturbation_is_named(self):
        from birda_tpu.onnx.parity import (
            capture_activations,
            find_first_divergence,
        )

        rng = np.random.default_rng(5)
        w1 = rng.normal(size=(6, 5)).astype(np.float32)
        w2 = rng.normal(size=(5, 4)).astype(np.float32)
        x = rng.normal(size=(2, 6)).astype(np.float32)

        # "Recording": activations of the clean graph.
        clean = lower(self._chain_model(w1, w2))
        recorded = capture_activations(clean, x)

        # Perturb the SECOND Gemm's weight: h1/h2 still match, h3 is the
        # first diverging tensor and node 'fc2' must be named.
        w2_bad = w2.copy()
        w2_bad[0, 0] += 0.25
        broken = lower(self._chain_model(w1, w2_bad))
        div = find_first_divergence(broken, x, recorded, tol=1e-5)
        assert div is not None
        assert div.tensor == "h3"
        assert div.node_name == "fc2"
        assert div.op_type == "Gemm"
        assert "fc2" in div.render()

    def test_clean_graph_reports_none(self):
        from birda_tpu.onnx.parity import (
            capture_activations,
            find_first_divergence,
        )

        rng = np.random.default_rng(6)
        w1 = rng.normal(size=(6, 5)).astype(np.float32)
        w2 = rng.normal(size=(5, 4)).astype(np.float32)
        x = rng.normal(size=(3, 6)).astype(np.float32)
        fn = lower(self._chain_model(w1, w2))
        recorded = capture_activations(fn, x)
        assert find_first_divergence(fn, x, recorded, tol=1e-6) is None

    def test_partial_recording_localizes_to_span(self):
        """A recording covering only some tensors still bisects: with only
        h2/y recorded and fc1 perturbed, h2 is the first covered tensor
        past the fault."""
        from birda_tpu.onnx.parity import (
            capture_activations,
            find_first_divergence,
        )

        rng = np.random.default_rng(7)
        w1 = rng.normal(size=(6, 5)).astype(np.float32)
        w2 = rng.normal(size=(5, 4)).astype(np.float32)
        x = rng.normal(size=(2, 6)).astype(np.float32)
        clean = lower(self._chain_model(w1, w2))
        full = capture_activations(clean, x)
        partial = {"h2": full["h2"], "y": full["y"]}
        w1_bad = w1.copy()
        w1_bad[1, 1] -= 0.5
        broken = lower(self._chain_model(w1_bad, w2))
        div = find_first_divergence(broken, x, partial, tol=1e-5)
        assert div is not None and div.tensor == "h2"

    def test_npz_roundtrip_node_keys(self, tmp_path):
        """node: key extraction from an actual npz file (the recorder's
        on-disk format)."""
        from birda_tpu.onnx.parity import node_records

        p = tmp_path / "ref.npz"
        np.savez_compressed(
            p, inputs=np.zeros(3), scores=np.zeros(2),
            **{"node:h1": np.ones(4), "node:h2": np.full(2, 7.0)},
        )
        recs = node_records(np.load(p))
        assert set(recs) == {"h1", "h2"}
        assert np.array_equal(recs["h2"], np.full(2, 7.0))


@pytest.mark.skipif(
    not (os.environ.get("BIRDA_PARITY_MODEL")
         and os.environ.get("BIRDA_PARITY_REFERENCE")),
    reason="real model assets not installed (set BIRDA_PARITY_MODEL and "
           "BIRDA_PARITY_REFERENCE)",
)
def test_real_model_int8_budget():
    """Asset-gated int8 validation: the calibrated int8 mode against the
    recorded ONNX-Runtime-CPU scores. int8 is not a parity mode — the
    budget is the documented deployment one (drift plus top-1 agreement),
    the check TensorRT users run on their own calibration data."""
    from birda_tpu.onnx.quantize import calibrate, lower_int8

    ref = np.load(os.environ["BIRDA_PARITY_REFERENCE"])
    inputs, scores = ref["inputs"], ref["scores"]
    model_bytes = open(os.environ["BIRDA_PARITY_MODEL"], "rb").read()
    # Calibrate on the reference inputs themselves (they are the
    # representative recordings here).
    calib = calibrate(model_bytes, [inputs])
    qfn = lower_int8(model_bytes, calib)
    out = qfn(inputs, params=qfn.params)
    got = np.asarray(out[0] if isinstance(out, tuple) else out, np.float32)
    drift = float(np.max(np.abs(got - scores)))
    top1 = float(np.mean(np.argmax(got, -1) == np.argmax(scores, -1)))
    assert drift < 0.05, f"int8 drift {drift} over deployment budget"
    assert top1 >= 0.95, f"int8 top-1 agreement {top1} below 95%"

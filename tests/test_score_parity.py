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
    """Lowered upstream graph vs recorded ONNX-Runtime-CPU scores."""
    fn = lower(os.environ["BIRDA_PARITY_MODEL"])
    ref = np.load(os.environ["BIRDA_PARITY_REFERENCE"])
    inputs, scores = ref["inputs"], ref["scores"]
    out = fn(inputs)
    got = np.asarray(out[0] if isinstance(out, tuple) else out)
    max_err = float(np.max(np.abs(got - scores)))
    assert max_err < PARITY_TOLERANCE, (
        f"score parity failure: max |Δ| = {max_err} (budget {PARITY_TOLERANCE})"
    )


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

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

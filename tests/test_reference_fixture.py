"""Parse-and-execute the reference's committed ONNX fixture.

``/root/reference/tests/fixtures/fixture-geomodel.onnx`` is produced by the
Python ``onnx`` library (``onnx.helper`` + ``onnx.save``) — a third
independent protobuf producer besides ``torch.onnx.export``
(tests/test_torch_export.py) and our own encoder (``birda_tpu.onnx.encode``):
different field orderings, an ``ir_version`` record, ``doc_string``-free
nodes, and initializer tensors emitted by onnx's serializer. The reference
runs this file through ONNX Runtime in CI (``tests/geomodel_range_filter.rs``);
we run it through the wire parser + lowering and pin the math against a
numpy oracle computed from the graph's OWN parsed initializers.

Skips gracefully when the reference tree is absent (CI).
"""

from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path("/root/reference/tests/fixtures/fixture-geomodel.onnx")

pytestmark = pytest.mark.skipif(
    not FIXTURE.is_file(), reason="reference fixture not present"
)


@pytest.fixture(scope="module")
def fixture_bytes():
    return FIXTURE.read_bytes()


class TestReferenceGeomodelFixture:
    def test_parses_and_preflights_clean(self, fixture_bytes):
        from birda_tpu.onnx.preflight import preflight
        from birda_tpu.onnx.proto import load_model

        model = load_model(fixture_bytes)
        assert [n.op_type for n in model.graph.nodes] == ["Gemm", "Sigmoid"]
        assert set(model.graph.initializers) == {"W", "B"}
        assert preflight(fixture_bytes) == []

    def test_lowered_scores_match_numpy_oracle(self, fixture_bytes):
        from birda_tpu.onnx.lowering import lower
        from birda_tpu.onnx.proto import load_model

        model = load_model(fixture_bytes)
        inits = {k: t.array for k, t in model.graph.initializers.items()}
        w, b = np.asarray(inits["W"]), np.asarray(inits["B"])
        assert w.shape == (3, 5) and b.shape == (5,)

        fn = lower(fixture_bytes)
        # A mid-latitude query, per the generator's stated design intent:
        # scores spread across the 0.03 threshold, not all-high or all-low.
        x = np.asarray([[60.0, 25.0, 20.0]], np.float32)
        got = np.asarray(fn(x))
        want = 1.0 / (1.0 + np.exp(-(x @ w + b)))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
        spread = got[0]
        assert (spread > 0.03).any() and (spread < 0.03).any()

    def test_range_filter_end_to_end_on_fixture(self, fixture_bytes, tmp_path):
        from birda_tpu.inference.range_filter import RangeFilter

        p = tmp_path / "fixture-geomodel.onnx"
        p.write_bytes(fixture_bytes)
        labels = [f"Species s{i}_Common {i}" for i in range(5)]
        rf = RangeFilter.from_onnx(p, labels, threshold=0.03)
        scores = rf.predict_week(60.0, 25.0, 20)
        assert 0 < len(scores) < 5  # the designed spread
        assert all(s.score >= 0.03 for s in scores)

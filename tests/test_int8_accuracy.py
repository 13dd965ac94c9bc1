"""int8 recall-validation protocol (birda_tpu/onnx/int8_accuracy.py).

Always: the report machinery on synthetic data and on a real int8
lowering of a fixture graph. When the real assets land (same env
contract as tests/test_score_parity.py), the full day-one acceptance
runs: fp32-lowered asset vs int8-lowered asset on the recorded parity
inputs, against the documented criteria.
"""

import os

import numpy as np
import pytest

from birda_tpu.onnx.int8_accuracy import (
    Criteria,
    compare_scores,
    evaluate_model,
)


class TestCompareScores:
    def test_identical_scores_are_perfect(self):
        s = np.random.default_rng(0).uniform(0, 1, (20, 12))
        r = compare_scores(s, s)
        assert r.top1_agreement == 1.0
        assert r.top5_jaccard == 1.0
        assert r.max_abs_delta == 0.0
        assert all(x.fp32_only == 0 and x.int8_only == 0
                   for x in r.crossings)
        assert r.failures() == []

    def test_missed_detections_counted_per_direction(self):
        fp32 = np.zeros((4, 3))
        int8 = np.zeros((4, 3))
        fp32[0, 0] = 0.3   # fp32-only at thr 0.25 -> missed by int8
        int8[1, 1] = 0.3   # int8-only -> spurious
        fp32[2, 2] = 0.4
        int8[2, 2] = 0.4   # both
        r = compare_scores(fp32, int8, thresholds=(0.25,))
        x = r.crossings[0]
        assert (x.both, x.fp32_only, x.int8_only) == (1, 1, 1)
        assert x.missed_rate == 0.5
        assert x.spurious_rate == 0.5

    def test_worst_species_ranked_by_mean_delta(self):
        fp32 = np.zeros((10, 4))
        int8 = np.zeros((10, 4))
        int8[:, 2] += 0.05   # constant bias on class 2
        int8[0, 1] += 0.2    # single outlier on class 1
        r = compare_scores(fp32, int8)
        assert r.worst_species[0][0] == 2   # mean-ranked, not max-ranked
        assert r.worst_species[0][1] == pytest.approx(0.05)
        fails = r.failures(Criteria())
        assert any("class 2" in f for f in fails)

    def test_top1_and_jaccard_disagreement(self):
        fp32 = np.array([[0.9, 0.1], [0.9, 0.1]])
        int8 = np.array([[0.1, 0.9], [0.9, 0.1]])
        r = compare_scores(fp32, int8)
        assert r.top1_agreement == 0.5
        fails = r.failures(Criteria())
        assert any("top-1" in f for f in fails)

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            compare_scores(np.zeros((2, 3)), np.zeros((3, 3)))

    def test_missing_decision_threshold_is_a_failure(self):
        # Round-4 review: a report built without the criteria's
        # decision_threshold used to silently skip the missed/spurious
        # checks — an int8 model missing 20% of detections would pass.
        s = np.random.default_rng(1).uniform(0, 1, (20, 12))
        r = compare_scores(s, s, thresholds=(0.05, 0.25, 0.5))
        fails = r.failures(Criteria(decision_threshold=0.1))
        assert any("no crossing counts" in f for f in fails)
        # ... and with the threshold present, identical scores pass.
        r = compare_scores(s, s, thresholds=(0.05, 0.1, 0.25))
        assert r.failures(Criteria(decision_threshold=0.1)) == []


class TestEvaluateModelOnFixture:
    def test_full_protocol_on_synthetic_graph(self):
        """The whole harness — fp32 lowering, calibration, int8 lowering,
        report — on a conv+dense fixture whose int8 drift is known-small.
        This is the exact code path the real asset runs day one."""
        import fixtures_onnx as fo

        rng = np.random.default_rng(3)
        w1 = rng.normal(0, 0.5, (16, 24)).astype(np.float32)
        b1 = rng.normal(0, 0.1, 24).astype(np.float32)
        w2 = rng.normal(0, 0.5, (24, 8)).astype(np.float32)
        mb = fo.model(
            [
                fo.node("MatMul", ["x", "w1"], ["h0"]),
                fo.node("Add", ["h0", "b1"], ["h1"]),
                fo.node("Relu", ["h1"], ["h2"]),
                fo.node("MatMul", ["h2", "w2"], ["logits"]),
                fo.node("Sigmoid", ["logits"], ["scores"]),
            ],
            inputs=[fo.value_info("x", ["batch", 16])],
            outputs=[fo.value_info("scores", ["batch", 8])],
            initializers=[fo.tensor("w1", w1), fo.tensor("b1", b1),
                          fo.tensor("w2", w2)],
        )
        inputs = rng.normal(0, 1, (48, 16)).astype(np.float32)
        report = evaluate_model(mb, inputs, batch=16)
        assert report.n_segments == 48 and report.n_classes == 8
        # int8 of a well-conditioned graph passes its own acceptance.
        assert report.failures() == [], report.render()
        assert report.max_abs_delta < 0.05
        text = report.render()
        assert "top-1 agreement" in text and "thr 0.1" in text


@pytest.mark.skipif(
    not (os.environ.get("BIRDA_PARITY_MODEL")
         and os.environ.get("BIRDA_PARITY_REFERENCE")),
    reason="real model assets not installed (set BIRDA_PARITY_MODEL and "
           "BIRDA_PARITY_REFERENCE)",
)
def test_real_asset_int8_acceptance():
    """Day-one int8 acceptance on the real asset: fp32 lowering (itself
    parity-checked vs ORT by test_score_parity) vs int8 lowering on the
    recorded inputs, against the documented criteria. Failure output is
    the full report, not a bare assert."""
    inputs = np.load(os.environ["BIRDA_PARITY_REFERENCE"])["inputs"]
    report = evaluate_model(os.environ["BIRDA_PARITY_MODEL"], inputs)
    fails = report.failures(Criteria())
    assert not fails, report.render() + "\n" + "\n".join(fails)

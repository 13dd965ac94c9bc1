"""Inference layer tests: classifier, warmup registry, geomodel chain, mesh."""

import numpy as np
import pytest

from birda_tpu.inference.backend import available_backends, select_backend
from birda_tpu.inference.classifier import (
    BirdClassifier,
    InferenceOptions,
    PredictionResult,
    RangeFilterData,
)
from birda_tpu.inference.geomodel import (
    GeomodelScores,
    LocationScore,
    MappingSummary,
    SpeciesMapping,
    scientific_name,
)
from birda_tpu.inference.geomodel_filter import (
    FilterSettings,
    Prediction,
    UnmatchedPolicy,
    filter_predictions,
)
from birda_tpu.inference.range_filter import (
    RangeFilter,
    read_geomodel_labels,
    validate_geomodel_labels,
)
from birda_tpu.errors import GeomodelLabelCount, Inference, RuntimeInitialization
from birda_tpu.models.zoo import tiny_model


# ---------------------------------------------------------------------------
# Geomodel mapping / projection (reference geomodel.rs tests)
# ---------------------------------------------------------------------------

class TestScientificName:
    def test_birdnet_label(self):
        assert scientific_name("Parus major_Great Tit") == "Parus major"

    def test_bare_name(self):
        assert scientific_name("Parus major") == "Parus major"

    def test_fsd50k_label_not_truncated(self):
        # Underscore prefix without a space is NOT a binomial.
        assert (
            scientific_name("Accelerating_and_revving_and_vroom")
            == "Accelerating_and_revving_and_vroom"
        )


class TestSpeciesMapping:
    def test_localized_labels_map(self):
        geo = ["Parus major_Great Tit"]
        clf = ["Parus major_Talitiainen"]  # Finnish localization
        m = SpeciesMapping.build(geo, clf)
        assert m.classifier_label_for("Parus major_Great Tit") == "Parus major_Talitiainen"
        assert m.mapped_count() == 1
        assert m.unmatched_count() == 0

    def test_unmatched_counted(self):
        m = SpeciesMapping.build(["A a_X"], ["A a_X", "B b_Y"])
        assert m.mapped_count() == 1
        assert m.unmatched_count() == 1

    def test_collision_first_wins(self):
        m = SpeciesMapping.build(
            ["Parus major_Great Tit"],
            ["Parus major_First", "Parus major_Second"],
        )
        assert m.classifier_label_for("Parus major_GT") == "Parus major_First"


class TestProjection:
    def test_mapped_but_unreported_reads_zero(self):
        # "Out of range" (0.0) vs "no range data" (None) distinction.
        mapping = SpeciesMapping.build(["A a_X", "B b_Y"], ["A a_X", "B b_Y", "C c_Z"])
        scores = GeomodelScores.project(
            [LocationScore("A a_X", 0.9, 0)], mapping
        )
        assert scores.score_of("A a_X") == pytest.approx(0.9)
        assert scores.score_of("B b_Y") == 0.0
        assert scores.score_of("C c_Z") is None
        assert scores.in_range_count(0.01) == 1


# ---------------------------------------------------------------------------
# Filter policy matrix (reference geomodel_filter.rs table)
# ---------------------------------------------------------------------------

def scores_of(entries):
    labels = [s for s, _ in entries]
    mapping = SpeciesMapping.build(labels, labels)
    return GeomodelScores.project(
        [LocationScore(s, v, i) for i, (s, v) in enumerate(entries)], mapping
    )


class TestFilterMatrix:
    def setup_method(self):
        self.scores = scores_of([("A a_X", 0.8), ("B b_Y", 0.001)])
        self.preds = [
            Prediction("A a_X", 0.9, 0),    # mapped, in range
            Prediction("B b_Y", 0.8, 1),    # mapped, below threshold
            Prediction("C c_Z", 0.7, 2),    # no geomodel entry
        ]

    def run(self, unmatched, rerank):
        return filter_predictions(
            self.preds, self.scores,
            FilterSettings(threshold=0.01, unmatched=unmatched, rerank=rerank),
        )

    def test_keep_no_rerank(self):
        out = self.run(UnmatchedPolicy.KEEP, False)
        assert [p.species for p in out] == ["A a_X", "C c_Z"]
        assert out[0].confidence == pytest.approx(0.9)  # untouched

    def test_drop_no_rerank(self):
        out = self.run(UnmatchedPolicy.DROP, False)
        assert [p.species for p in out] == ["A a_X"]

    def test_rerank_scales_and_drops_unmatched(self):
        out = self.run(UnmatchedPolicy.KEEP, True)
        assert [p.species for p in out] == ["A a_X"]
        assert out[0].confidence == pytest.approx(0.9 * 0.8)

    def test_rerank_resorts(self):
        scores = scores_of([("A a_X", 0.1), ("B b_Y", 0.9)])
        preds = [Prediction("A a_X", 0.9, 0), Prediction("B b_Y", 0.5, 1)]
        out = filter_predictions(
            preds, scores,
            FilterSettings(0.01, UnmatchedPolicy.DROP, True),
        )
        # B: 0.5*0.9=0.45 beats A: 0.9*0.1=0.09
        assert [p.species for p in out] == ["B b_Y", "A a_X"]


# ---------------------------------------------------------------------------
# RangeFilter over a lowered ONNX geomodel
# ---------------------------------------------------------------------------

class TestRangeFilter:
    def test_fixture_geomodel_roundtrip(self, tmp_path):
        import fixtures_onnx as fo

        p = tmp_path / "geo.onnx"
        p.write_bytes(fo.make_fixture_geomodel(num_species=8))
        labels = [f"Geo sp{i} x_Common {i}" for i in range(8)]
        rf = RangeFilter.from_onnx(p, labels, threshold=0.0)
        scores = rf.predict(60.2, 24.9, 6, 15)
        assert len(scores) == 8
        assert all(0.0 <= s.score <= 1.0 for s in scores)
        # Same query, different species spreads (fixture weights ensure it).
        values = sorted(s.score for s in scores)
        assert values[0] < values[-1]

    def test_label_count_validated(self, tmp_path):
        import fixtures_onnx as fo

        p = tmp_path / "geo.onnx"
        p.write_bytes(fo.make_fixture_geomodel(num_species=8))
        with pytest.raises(GeomodelLabelCount):
            RangeFilter.from_onnx(p, ["only one"], threshold=0.0)

    def test_labels_file(self, tmp_path):
        f = tmp_path / "labels.txt"
        f.write_text("A a_X\n\nB b_Y\n")
        assert read_geomodel_labels(f) == ["A a_X", "B b_Y"]
        validate_geomodel_labels(["x", "y"], 2)
        with pytest.raises(GeomodelLabelCount):
            validate_geomodel_labels(["x"], 2)


# ---------------------------------------------------------------------------
# Classifier
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def clf():
    return BirdClassifier(
        tiny_model(), device="cpu", min_confidence=0.0, top_k=5
    )


class TestClassifier:
    def test_contract_surface(self, clf):
        assert clf.sample_rate == 48_000
        assert clf.sample_count == 144_000
        assert clf.segment_duration == 3.0

    def test_predict_batch_shapes(self, clf):
        x = np.random.default_rng(0).normal(0, 0.1, (3, 144_000)).astype(np.float32)
        results = clf.predict_batch(x)
        assert len(results) == 3
        for r in results:
            assert len(r.predictions) == 5  # top_k at min_confidence 0
            confs = [p.confidence for p in r.predictions]
            assert confs == sorted(confs, reverse=True)
            assert all(0 <= p.index < 6_522 for p in r.predictions)

    def test_min_confidence_thresholds(self, clf):
        x = np.zeros((1, 144_000), np.float32)
        hi = clf.predict_batch(x, InferenceOptions(min_confidence=1.1, top_k=5))
        assert hi[0].predictions == []

    def test_wrong_shape_rejected(self, clf):
        with pytest.raises(Inference):
            clf.predict_batch(np.zeros((2, 1000), np.float32))

    def test_warmup_registry(self, clf):
        r1 = clf.ensure_warm(2)
        assert r1 is not None and r1.batch_size == 2
        assert clf.ensure_warm(2) is None  # already warm
        r2 = clf.ensure_warm(4)
        assert r2 is not None

    def test_embeddings_path(self):
        c = BirdClassifier(
            tiny_model(), device="cpu", min_confidence=0.0, top_k=3,
            want_embeddings=True,
        )
        r = c.predict(np.zeros(144_000, np.float32))
        assert r.embeddings is not None
        assert r.embeddings.shape == (1_024,)

    def test_species_list_retain(self):
        m = tiny_model()
        keep = {m.labels[0], m.labels[10]}
        c = BirdClassifier(
            m, device="cpu", min_confidence=0.0, top_k=6_522,
            species_list=keep,
        )
        res = c.predict_batch(np.zeros((1, 144_000), np.float32))
        res = c.apply_range_filter(res)
        assert {p.species for p in res[0].predictions} <= keep

    def test_range_filter_applied(self):
        m = tiny_model()
        labels = m.labels
        mapping = SpeciesMapping.build(labels[:100], labels)
        scores = GeomodelScores.project(
            [LocationScore(labels[i], 0.5, i) for i in range(50)], mapping
        )
        rfd = RangeFilterData(
            scores=scores,
            settings=FilterSettings(0.01, UnmatchedPolicy.DROP, False),
            summary=MappingSummary.new(mapping, scores, 0.01),
        )
        c = BirdClassifier(
            m, device="cpu", min_confidence=0.0, top_k=6_522,
            range_filter_data=rfd,
        )
        res = c.apply_range_filter(
            c.predict_batch(np.zeros((1, 144_000), np.float32))
        )
        kept = {p.index for p in res[0].predictions}
        assert kept <= set(range(50))
        info = c.range_filter_info()
        assert info["mapped_species"] == 100
        assert info["species_in_range"] == 50


class TestBackendSelection:
    def test_cpu_available_in_tests(self):
        assert "cpu" in available_backends()

    def test_explicit_cpu(self):
        devices, status = select_backend("cpu")
        assert status.actual == "cpu"
        assert status.fallback_reason is None

    def test_auto_falls_back_with_reason(self):
        devices, status = select_backend("auto")
        if status.actual == "cpu":
            assert status.fallback_reason is not None

    def test_tpu_explicit_fails_without_tpu(self):
        if "tpu" in available_backends():
            pytest.skip("TPU present")
        with pytest.raises(RuntimeInitialization):
            select_backend("tpu")

    def test_cpu_confinement_explains_later_tpu_requests(self):
        """A CPU run confines the process to the CPU platform; a later
        explicit TPU request must fail with the WHY, not a bare miss."""
        import jax

        from birda_tpu.inference import backend as backend_mod

        jax.devices()  # freeze the platform set (cpu under conftest)
        select_backend("cpu")
        assert backend_mod._cpu_confined
        if "tpu" in available_backends():
            pytest.skip("TPU present")
        with pytest.raises(RuntimeInitialization, match="confined"):
            select_backend("tpu")


class TestMeshSharding:
    def test_sharded_classifier_matches_single(self):
        from birda_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, backend="cpu")
        m = tiny_model()
        plain = BirdClassifier(m, device="cpu", min_confidence=0.0, top_k=3)
        sharded = BirdClassifier(
            m, device="cpu", min_confidence=0.0, top_k=3, mesh=mesh
        )
        x = np.random.default_rng(1).normal(0, 0.1, (8, 144_000)).astype(np.float32)
        a = plain.predict_batch(x)
        b = sharded.predict_batch(x)
        for ra, rb in zip(a, b):
            assert [p.index for p in ra.predictions] == [p.index for p in rb.predictions]
            for pa, pb in zip(ra.predictions, rb.predictions):
                assert pa.confidence == pytest.approx(pb.confidence, abs=1e-5)

    def test_indivisible_batch_rejected(self):
        from birda_tpu.parallel.mesh import make_mesh, pad_to_multiple

        mesh = make_mesh(8, backend="cpu")
        assert pad_to_multiple(3, mesh) == 8
        assert pad_to_multiple(8, mesh) == 8
        assert pad_to_multiple(9, mesh) == 16
        m = tiny_model()
        c = BirdClassifier(m, device="cpu", min_confidence=0.0, top_k=3, mesh=mesh)
        with pytest.raises(Exception):
            c.predict_batch(np.zeros((3, 144_000), np.float32))


class TestChunkRunner:
    def test_parity_with_batch_path(self):
        m = tiny_model()
        clf = BirdClassifier(m, device="cpu", min_confidence=0.0, top_k=5)
        rng = np.random.default_rng(3)
        seg = clf.sample_count
        step = seg  # no overlap
        batch = 3
        chunk = rng.normal(0, 0.1, (batch - 1) * step + seg).astype(np.float32)
        windows = np.stack([chunk[i * step : i * step + seg] for i in range(batch)])

        batch_results = clf.predict_batch(windows)
        runner = clf.chunk_runner(batch, step, transport="float32")
        chunk_results = runner.predict_chunk(chunk, batch)
        for br, cr in zip(batch_results, chunk_results):
            assert [p.index for p in br.predictions] == [p.index for p in cr.predictions]
            for pb, pc in zip(br.predictions, cr.predictions):
                assert pb.confidence == pytest.approx(pc.confidence, abs=1e-5)

    def test_int16_transport_close(self):
        m = tiny_model()
        clf = BirdClassifier(m, device="cpu", min_confidence=0.0, top_k=5)
        rng = np.random.default_rng(4)
        seg = clf.sample_count
        chunk = rng.normal(0, 0.1, 2 * seg).astype(np.float32)
        f32 = clf.chunk_runner(2, seg, transport="float32").predict_chunk(chunk, 2)
        i16 = clf.chunk_runner(2, seg, transport="int16").predict_chunk(chunk, 2)
        for rf, ri in zip(f32, i16):
            for pf, pi in zip(rf.predictions, ri.predictions):
                assert pf.confidence == pytest.approx(pi.confidence, abs=1e-3)

    def test_overlap_windowing(self):
        m = tiny_model()
        clf = BirdClassifier(m, device="cpu", min_confidence=0.0, top_k=3)
        seg = clf.sample_count
        step = seg // 2
        rng = np.random.default_rng(5)
        chunk = rng.normal(0, 0.1, 2 * step + seg).astype(np.float32)
        windows = np.stack([chunk[i * step : i * step + seg] for i in range(3)])
        batch_results = clf.predict_batch(windows)
        chunk_results = clf.chunk_runner(3, step, transport="float32").predict_chunk(chunk, 3)
        for br, cr in zip(batch_results, chunk_results):
            assert [p.index for p in br.predictions] == [p.index for p in cr.predictions]

    def test_tail_chunk_padded(self):
        m = tiny_model()
        clf = BirdClassifier(m, device="cpu", min_confidence=0.0, top_k=3)
        seg = clf.sample_count
        runner = clf.chunk_runner(4, seg)
        short = np.zeros(seg + 100, np.float32)
        results = runner.predict_chunk(short, 2)
        assert len(results) == 2

    def test_runner_cached(self):
        m = tiny_model()
        clf = BirdClassifier(m, device="cpu", min_confidence=0.0, top_k=3)
        r1 = clf.chunk_runner(2, 144000)
        r2 = clf.chunk_runner(2, 144000)
        assert r1 is r2
        assert clf.chunk_runner(2, 144000, transport="float32") is not r1

    def test_chunk_runner_on_mesh(self):
        from birda_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, backend="cpu")
        m = tiny_model()
        plain = BirdClassifier(m, device="cpu", min_confidence=0.0, top_k=3)
        sharded = BirdClassifier(m, device="cpu", min_confidence=0.0, top_k=3,
                                 mesh=mesh)
        seg = plain.sample_count
        rng = np.random.default_rng(9)
        chunk = rng.normal(0, 0.1, 8 * seg).astype(np.float32)
        rp = plain.chunk_runner(8, seg, transport="float32").predict_chunk(chunk, 8)
        rs = sharded.chunk_runner(8, seg, transport="float32").predict_chunk(chunk, 8)
        for a, b in zip(rp, rs):
            assert [p.index for p in a.predictions] == [p.index for p in b.predictions]

    def test_chunk_runner_mesh_indivisible_batch(self):
        from birda_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, backend="cpu")
        c = BirdClassifier(tiny_model(), device="cpu", min_confidence=0.0,
                           top_k=3, mesh=mesh)
        with pytest.raises(ValueError):
            c.chunk_runner(3, 144000)

    def test_native_quantize_matches_numpy(self):
        from birda_tpu.native import audio as native_audio

        if not native_audio.available():
            pytest.skip("native library not built")
        rng = np.random.default_rng(11)
        x = rng.normal(0, 0.3, 100_000).astype(np.float32)
        q, amax = native_audio.quantize_int16(x)
        amax_np = float(np.max(np.abs(x)))
        q_np = np.clip(np.rint(x * (32767.0 / amax_np)), -32767, 32767).astype(np.int16)
        assert amax == pytest.approx(amax_np, rel=1e-6)
        assert np.array_equal(q, q_np)
        # Silent chunk yields zeros with zero scale.
        qz, az = native_audio.quantize_int16(np.zeros(1000, np.float32))
        assert az == 0.0
        assert not qz.any()


class TestChunkCapacity:
    def test_capacity_covers_source_step_rounding(self):
        """Regression (44.1 kHz -> 48 kHz, overlap 2.333 s, batch 512):
        per-window source-step rounding accumulates ~0.3 samples/window,
        so the host chunk outgrew a capacity derived from model-side
        numbers alone and every full batch hard-failed. The producer now
        passes its exact host chunk length."""
        from birda_tpu.models.zoo import tiny_model

        clf = BirdClassifier(tiny_model(), device="cpu",
                             min_confidence=0.0, top_k=3)
        overlap = 2.333
        step_model = clf.sample_count - int(round(overlap * clf.sample_rate))
        seg_src = int(round(3.0 * 44_100))
        ovl_src = int(round(overlap * 44_100))
        step_src = seg_src - ovl_src
        batch = 512
        host_chunk = (batch - 1) * step_src + seg_src
        runner = clf.chunk_runner(batch, step_model, src_rate=44_100,
                                  src_chunk_samples=host_chunk)
        assert runner.chunk_samples >= host_chunk
        # Cache key includes the geometry: a different host length is a
        # different runner, not a silently reused mismatched one.
        other = clf.chunk_runner(batch, step_model, src_rate=44_100,
                                 src_chunk_samples=host_chunk + 7)
        assert other is not runner

"""Model layer tests: melspec parity, contracts, backbone shapes."""

import numpy as np
import pytest

from birda_tpu.models import contracts
from birda_tpu.models.zoo import (
    TINY_BLOCKS,
    native_model,
    onnx_model,
    synthetic_labels,
    tiny_model,
)
from birda_tpu.ops.melspec import MelSpecConfig, melspec, melspec_reference


class TestMelSpec:
    def test_matches_fft_reference(self):
        # The DFT-as-matmul path must agree with a plain FFT implementation.
        cfg = MelSpecConfig(sample_rate=48_000, n_fft=512, hop=256, n_mels=64)
        rng = np.random.default_rng(0)
        x = rng.normal(0, 0.3, (2, 48_000)).astype(np.float32)
        got = np.asarray(melspec(x, cfg))
        want = melspec_reference(x, cfg)
        assert got.shape == want.shape
        # log-power comparisons: tolerate small absolute differences
        assert np.max(np.abs(got - want)) < 1e-2

    def test_frame_count(self):
        cfg = MelSpecConfig(n_fft=1024, hop=512)
        assert cfg.frames(144_000) == 1 + (144_000 - 1024) // 512

    def test_tone_lands_in_right_mel_bin(self):
        cfg = MelSpecConfig(sample_rate=48_000, n_fft=1024, hop=512,
                            n_mels=64, fmin=50.0, fmax=15_000.0, scale="power")
        t = np.arange(48_000) / 48_000
        for freq in (1000.0, 6000.0):
            x = np.sin(2 * np.pi * freq * t).astype(np.float32)[None]
            mel = np.asarray(melspec(x, cfg))[0].mean(axis=0)
            peak_bin = int(mel.argmax())
            # Verify against the reference filterbank's expected peak.
            ref = melspec_reference(x, cfg)[0].mean(axis=0)
            assert peak_bin == int(ref.argmax())


class TestBackbone:
    def test_tiny_model_contract(self):
        m = tiny_model(contracts.ModelFamily.BIRDNET_V24)
        x = np.zeros((2, 144_000), np.float32)
        out = m.apply(x)
        assert out["scores"].shape == (2, 6_522)
        assert out["embeddings"].shape == (2, 1_024)
        s = np.asarray(out["scores"])
        assert np.all((s >= 0) & (s <= 1))

    def test_deterministic_init(self):
        m1 = tiny_model(seed=7)
        m2 = tiny_model(seed=7)
        x = np.random.default_rng(0).normal(0, 0.1, (1, 144_000)).astype(np.float32)
        assert np.allclose(
            np.asarray(m1.apply(x)["scores"]), np.asarray(m2.apply(x)["scores"])
        )

    def test_softmax_family(self):
        m = native_model(
            contracts.ModelFamily.PERCH_V2, blocks=TINY_BLOCKS
        )
        x = np.zeros((1, 160_000), np.float32)
        s = np.asarray(m.apply(x)["scores"])
        assert s.shape == (1, 14_795)
        assert s.sum() == pytest.approx(1.0, abs=1e-3)

    def test_labels_match_class_count(self):
        m = tiny_model()
        assert len(m.labels) == m.num_classes
        assert "_" in m.labels[0]


class TestOnnxModelPath:
    def test_gemm_model_as_classifier(self):
        import fixtures_onnx as fo

        # A degenerate "classifier": [batch, 3] -> sigmoid scores. Exercises
        # the LoadedModel wrapper around lowered ONNX graphs.
        mb = fo.make_fixture_geomodel(num_species=5)
        cfg = contracts.ModelConfig(
            family=contracts.ModelFamily.CUSTOM,
            sample_rate=3, segment_duration=1.0, sample_count=3,
            num_classes=5, activation=contracts.ScoreActivation.SIGMOID,
            embedding_dim=None,
        )
        m = onnx_model(mb, cfg, synthetic_labels(5))
        out = m.apply(np.zeros((2, 3), np.float32))
        assert np.asarray(out["scores"]).shape == (2, 5)
        assert m.source == "onnx"

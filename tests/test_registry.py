"""Registry tests: schema, loader three-outcome policy, download protocol,
variant selection, license gate, cleanup."""

import hashlib
import json
from pathlib import Path

import pytest

from birda_tpu.config.types import Config, ModelConfig, ModelType
from birda_tpu.errors import (
    DownloadFailed,
    ModelNotFoundInRegistry,
    RegionNotFound,
    UpdateChecksumMismatch,
    VariantNotFound,
)
from birda_tpu.registry import cleanup, license as license_mod
from birda_tpu.registry.installer import (
    FileRef,
    apply_hf_mirror,
    download_verified,
)
from birda_tpu.registry.loader import load_embedded, load_registry
from birda_tpu.registry.schema import LicenseInfo, Registry
from birda_tpu.registry.selection import SystemProbe, select_variant


class TestEmbeddedRegistry:
    def test_parses(self):
        r = load_embedded()
        ids = [m.id for m in r.models]
        assert ids == ["birdnet-v24", "birdnet-v30", "bsg-fi-v44", "perch-v2"]
        assert r.range_filter is not None
        assert r.range_filter.species_count == 12_012
        assert r.range_filter.version == "3.0.2"

    def test_birdnet_v24_files(self):
        r = load_embedded()
        m = r.find_model("birdnet-v24")
        assert not m.has_variants
        assert len(m.files.languages) == 37
        assert m.language("fi") is not None
        assert not m.license.commercial_use  # CC-BY-NC-SA

    def test_v30_variants(self):
        r = load_embedded()
        m = r.find_model("birdnet-v30")
        assert m.has_variants
        full = [v for v in m.variants if v.region is None]
        assert {v.id for v in full} >= {"fp32", "fp16"}
        regional = [v for v in m.variants if v.region]
        assert len(regional) > 10
        assert all(v.model.sha256 for v in m.variants)

    def test_find_missing(self):
        with pytest.raises(ModelNotFoundInRegistry):
            load_embedded().find_model("ghost")


class TestLoaderPolicy:
    def test_no_cache_uses_embedded(self, tmp_path):
        r = load_registry(cache=tmp_path / "registry.json")
        assert r.registry_version >= 1

    def test_missing_cache_is_bootstrapped_onto_disk(self, tmp_path):
        # Reference loader.rs test_a_missing_registry_is_bootstrapped_
        # onto_disk: first load writes the bundled registry where updates
        # (and other processes) will look for it.
        cache = tmp_path / "nested" / "registry.json"
        r = load_registry(cache=cache)
        assert cache.exists()
        assert json.loads(cache.read_text())["registry_version"] == \
            r.registry_version

    def test_equal_version_rewrites_nothing(self, tmp_path):
        cache = tmp_path / "registry.json"
        load_registry(cache=cache)
        before = cache.stat().st_mtime_ns
        load_registry(cache=cache)
        assert cache.stat().st_mtime_ns == before

    def test_non_utf8_cache_is_repaired(self, tmp_path):
        # A UnicodeDecodeError used to escape both handlers and crash the
        # load; broken bytes are the corrupt-cache outcome (reference
        # loader.rs test_a_registry_whose_bytes_are_not_utf8_is_repaired).
        cache = tmp_path / "registry.json"
        cache.write_bytes(b"\xff\xfe broken")
        r = load_registry(cache=cache)
        assert r.models
        assert json.loads(cache.read_text())["models"]

    def test_corrupt_cache_replaced(self, tmp_path):
        cache = tmp_path / "registry.json"
        cache.write_text("{ not json")
        r = load_registry(cache=cache)
        assert r.models  # embedded used
        assert json.loads(cache.read_text())["models"]  # file repaired

    def test_old_cache_upgraded(self, tmp_path):
        cache = tmp_path / "registry.json"
        cache.write_text(json.dumps({
            "schema_version": "tpu-1.0", "registry_version": 0, "models": [],
        }))
        r = load_registry(cache=cache)
        assert r.models  # embedded won
        assert json.loads(cache.read_text())["registry_version"] >= 1

    def test_newer_cache_wins(self, tmp_path):
        cache = tmp_path / "registry.json"
        doc = json.loads(Path("birda_tpu/registry/registry.json").read_text())
        doc["registry_version"] = 999
        doc["models"] = doc["models"][:1]
        cache.write_text(json.dumps(doc))
        r = load_registry(cache=cache)
        assert len(r.models) == 1


class _FakeResponse:
    def __init__(self, data: bytes, status=200):
        self._data = data
        self.status_code = status
        self.headers = {"content-length": str(len(data))}

    def raise_for_status(self):
        if self.status_code != 200:
            raise IOError(f"http {self.status_code}")

    def iter_content(self, n):
        for i in range(0, len(self._data), n):
            yield self._data[i : i + n]

    def __enter__(self):
        return self

    def __exit__(self, *a):
        pass


class _FakeSession:
    def __init__(self, data: bytes, status=200):
        self.data = data
        self.status = status
        self.requests = []

    def get(self, url, **kw):
        self.requests.append(url)
        return _FakeResponse(self.data, self.status)


class TestDownload:
    def test_verified_download(self, tmp_path):
        data = b"model bytes here"
        ref = FileRef(
            url="https://example.com/m.onnx", filename="m.onnx",
            sha256=hashlib.sha256(data).hexdigest(),
        )
        out = download_verified(ref, tmp_path, session=_FakeSession(data))
        assert out.read_bytes() == data
        assert not list(tmp_path.glob("*.part"))

    def test_checksum_mismatch_leaves_nothing(self, tmp_path):
        ref = FileRef(url="https://example.com/m.onnx", filename="m.onnx",
                      sha256="0" * 64)
        with pytest.raises(UpdateChecksumMismatch):
            download_verified(ref, tmp_path, session=_FakeSession(b"wrong"))
        assert list(tmp_path.iterdir()) == []

    def test_existing_good_file_short_circuits(self, tmp_path):
        data = b"cached"
        (tmp_path / "m.onnx").write_bytes(data)
        ref = FileRef(url="https://example.com/m.onnx", filename="m.onnx",
                      sha256=hashlib.sha256(data).hexdigest())
        sess = _FakeSession(b"never fetched")
        out = download_verified(ref, tmp_path, session=sess)
        assert out.read_bytes() == data
        assert sess.requests == []

    def test_http_error(self, tmp_path):
        ref = FileRef(url="https://example.com/m.onnx", filename="m.onnx")
        with pytest.raises(DownloadFailed):
            download_verified(ref, tmp_path, session=_FakeSession(b"", 404))

    def test_hf_mirror(self, monkeypatch):
        monkeypatch.setenv("HF_ENDPOINT", "https://mirror.local")
        assert apply_hf_mirror(
            "https://huggingface.co/a/b"
        ) == "https://mirror.local/a/b"
        assert apply_hf_mirror("https://github.com/x") == "https://github.com/x"


class TestSelection:
    def setup_method(self):
        self.model = load_embedded().find_model("birdnet-v30")

    def test_tpu_prefers_fp32_full(self):
        v = select_variant(self.model, probe=SystemProbe(backend="tpu"))
        assert v.id == "fp32"
        assert v.region is None

    def test_explicit_variant(self):
        v = select_variant(self.model, explicit_variant="fp16",
                           probe=SystemProbe(backend="tpu"))
        assert v.id == "fp16"

    def test_region_selection(self):
        regions = {v.region for v in self.model.variants if v.region}
        region = sorted(regions)[0]
        v = select_variant(self.model, region=region,
                           probe=SystemProbe(backend="tpu"))
        assert v.region == region

    def test_unknown_region(self):
        with pytest.raises(RegionNotFound):
            select_variant(self.model, region="atlantis")

    def test_unknown_variant(self):
        with pytest.raises(VariantNotFound):
            select_variant(self.model, explicit_variant="int4")

    def test_arm_prefers_int8_when_present(self):
        probe = SystemProbe(backend="cpu", arch="aarch64")
        v = select_variant(self.model, probe=probe)
        assert v.id in ("int8-arm", "fp32")  # int8-arm if the registry has it


class TestLicense:
    def test_permissive_skips_prompt(self):
        lic = LicenseInfo(type="MIT", commercial_use=True)
        assert not license_mod.needs_prompt(lic)
        assert license_mod.prompt_license_acceptance("m", "M", lic)

    def test_restrictive_prompts_and_records(self, tmp_path, monkeypatch):
        monkeypatch.setattr(
            license_mod, "_acceptances_path", lambda: tmp_path / "acc.json"
        )
        lic = LicenseInfo(type="CC-BY-NC-SA-4.0", commercial_use=False)
        assert license_mod.needs_prompt(lic)
        ok = license_mod.prompt_license_acceptance(
            "m", "Model", lic, assume_yes=True
        )
        assert ok
        # Second time: recorded, no prompt needed.
        assert license_mod.is_accepted("m", lic)
        assert license_mod.prompt_license_acceptance("m", "Model", lic)


class TestCleanup:
    """Reference cleanup.rs semantics: scope is ONE entry's previous files —
    never a directory-wide sweep, which would delete downloads the user
    deliberately keeps un-configured."""

    def _cfg(self, tmp_path):
        cfg = Config()
        cfg.models["bn"] = ModelConfig(
            path=tmp_path / "old.onnx", labels=tmp_path / "shared-labels.txt",
            model_type=ModelType.BIRDNET_V24,
        )
        cfg.models["other"] = ModelConfig(
            path=tmp_path / "other.onnx",
            labels=tmp_path / "shared-labels.txt",
            model_type=ModelType.BIRDNET_V24,
        )
        return cfg

    def test_previous_files_of_the_reinstalled_key(self, tmp_path):
        cfg = self._cfg(tmp_path)
        orphans = cleanup.orphaned_files(cfg, "bn", keeping=[])
        # old.onnx is reclaimable; shared-labels.txt is still referenced by
        # the other entry and must be spared.
        assert orphans == [tmp_path / "old.onnx"]

    def test_spares_files_the_new_install_reuses(self, tmp_path):
        cfg = self._cfg(tmp_path)
        orphans = cleanup.orphaned_files(
            cfg, "bn", keeping=[tmp_path / "old.onnx"]
        )
        assert orphans == []

    def test_unknown_key_is_a_first_install(self, tmp_path):
        assert cleanup.orphaned_files(self._cfg(tmp_path), "new-key") == []

    def test_same_path_and_labels_lists_once(self, tmp_path):
        cfg = Config()
        one = tmp_path / "one.onnx"
        cfg.models["m"] = ModelConfig(
            path=one, labels=one, model_type=ModelType.BIRDNET_V24,
        )
        assert cleanup.orphaned_files(cfg, "m") == [one]

    def test_remove_orphans_missing_file_is_done_not_a_failure(self, tmp_path):
        present = tmp_path / "a.onnx"
        present.write_bytes(b"x")
        failures = cleanup.remove_orphans([present, tmp_path / "gone.onnx"])
        assert failures == []
        assert not present.exists()

    def test_remove_orphans_failure_does_not_skip_the_rest(self, tmp_path):
        # A directory cannot be unlink()ed -> one failure, the rest removed.
        blocker = tmp_path / "dir.onnx"
        blocker.mkdir()
        second = tmp_path / "b.onnx"
        second.write_bytes(b"x")
        failures = cleanup.remove_orphans([blocker, second])
        assert [p for p, _ in failures] == [blocker]
        assert not second.exists()


class TestUppercaseChecksums:
    def test_download_short_circuit_accepts_uppercase_expected(self, tmp_path):
        """Expected digests compare case-insensitively — a manifest or
        .sha256 sidecar may carry uppercase hex (reference
        update/checksum.rs test_verify_sha256_accepts_uppercase_expected)."""
        import hashlib

        from birda_tpu.registry.installer import download_verified
        from birda_tpu.registry.schema import FileRef

        data = b"asset bytes"
        (tmp_path / "a.onnx").write_bytes(data)
        ref = FileRef(url="https://nowhere.invalid/a.onnx", filename="a.onnx",
                      sha256=hashlib.sha256(data).hexdigest().upper())
        # An existing file with a matching (uppercase-pinned) hash is reused
        # without touching the network.
        assert download_verified(ref, tmp_path) == tmp_path / "a.onnx"


class TestGenRegistryConsistency:
    def test_committed_registry_matches_regeneration(self):
        """The committed registry must match regeneration from the upstream
        source (the reference pins this in CI, .github/workflows/ci.yml:83)."""
        import json
        import sys
        from pathlib import Path

        src = Path("/root/reference/registry.json")
        if not src.exists():
            pytest.skip("upstream registry source not available")
        sys.path.insert(0, "scripts")
        import gen_registry

        regenerated = gen_registry.transform(json.loads(src.read_text()))
        committed = json.loads(
            Path("birda_tpu/registry/registry.json").read_text()
        )
        regenerated["registry_version"] = gen_registry.next_registry_version(
            regenerated, committed)
        assert committed == regenerated

    def test_next_registry_version_rules(self):
        """Auto-bump on any content change (reference #329/#332: a
        model-level fix shipped without a bump and reached no cached
        user); same content keeps the version; saturates at u32::MAX."""
        import sys

        sys.path.insert(0, "scripts")
        import gen_registry

        base = {"registry_version": 3, "schema_version": "tpu-1.0",
                "models": [{"id": "m", "version": "2.4"}]}
        same = dict(base, registry_version=1)  # version field ignored
        assert gen_registry.next_registry_version(same, base) == 3
        changed = {"registry_version": 3, "schema_version": "tpu-1.0",
                   "models": [{"id": "m", "version": "2.4-changed"}]}
        assert gen_registry.next_registry_version(changed, base) == 4
        at_max = dict(base, registry_version=gen_registry.MAX_REGISTRY_VERSION)
        assert (gen_registry.next_registry_version(changed, at_max)
                == gen_registry.MAX_REGISTRY_VERSION)


class TestVerifyReadErrorSafety:
    def test_read_error_never_deletes_installed_files(self, tmp_path):
        """Reference #348: a read error (EISDIR here, the portable stand-in
        for EACCES/EIO on a failing disk) during the existing-file checksum
        pre-check must surface as an error without deleting the
        possibly-correct installed copy — removal-to-force-redownload loops
        forever on failing hardware."""
        from birda_tpu.registry.installer import download_verified
        from birda_tpu.registry.schema import FileRef

        ref = FileRef(url="https://example.invalid/m.onnx",
                      filename="m.onnx", sha256="0" * 64)
        # The "installed file" is a directory: sha256_file raises EISDIR.
        (tmp_path / "m.onnx").mkdir()
        (tmp_path / "m.onnx" / "inner").write_text("keep me")
        with pytest.raises(OSError):
            download_verified(ref, tmp_path)
        assert (tmp_path / "m.onnx" / "inner").read_text() == "keep me"


class TestLicenseSummaryContent:
    def test_every_obligation_is_rendered(self):
        """Reference #291: the summary is a pure function asserted on —
        a summary that silently drops the share-alike obligation must not
        pass a green suite."""
        from birda_tpu.registry.license import license_summary
        from birda_tpu.registry.schema import LicenseInfo

        lic = LicenseInfo(type="CC-BY-NC-SA-4.0", url="https://cc.example",
                          commercial_use=False, attribution_required=True,
                          share_alike=True)
        s = license_summary("BirdNET v2.4", lic, vendor="Cornell")
        assert "CC-BY-NC-SA-4.0" in s and "https://cc.example" in s
        assert "Commercial use: Not allowed" in s
        assert "Attribution required: Yes" in s
        assert "Share-alike required: Yes" in s
        assert "non-commercial purposes only" in s
        assert "attribution to Cornell" in s
        assert "Share derivatives under the same license" in s

    def test_permissive_license_has_no_obligations_block(self):
        from birda_tpu.registry.license import license_summary
        from birda_tpu.registry.schema import LicenseInfo

        s = license_summary("Perch", LicenseInfo(
            type="Apache-2.0", commercial_use=True))
        assert "you agree to" not in s
        assert "Commercial use: Allowed" in s

    def test_prompt_renders_share_alike(self, monkeypatch, tmp_path, capsys):
        import sys as _sys

        from birda_tpu.registry import license as license_mod
        from birda_tpu.registry.schema import LicenseInfo

        monkeypatch.setattr(
            license_mod, "_acceptances_path", lambda: tmp_path / "acc.json")
        monkeypatch.setattr(_sys.stdin, "isatty", lambda: True)
        lic = LicenseInfo(type="CC-BY-NC-SA-4.0", commercial_use=False,
                          share_alike=True)
        ok = license_mod.prompt_license_acceptance(
            "m", "Model M", lic, input_fn=lambda _: "y")
        assert ok
        err = capsys.readouterr().err
        assert "Share-alike required: Yes" in err


class TestInstallRollback:
    """A failed multi-file install removes the files IT created and only
    those (reference installer.rs:605-637, roll_back): a verified model
    with no labels would make presence-based checks lie."""

    def _model(self, model_bytes, labels_bytes, extra_fail=False):
        import hashlib

        from birda_tpu.registry.schema import RegistryModel

        doc = {
            "id": "m", "name": "M", "vendor": "t", "version": "1",
            "model_type": "birdnet-v24",
            "license": {"type": "MIT", "commercial_use": True},
            "files": {
                "model": {"url": "https://x/m.onnx", "filename": "m.onnx",
                          "sha256": hashlib.sha256(model_bytes).hexdigest()},
                "labels": {
                    "default_language": "en",
                    "languages": [{"code": "en", "name": "English",
                                   "url": "https://x/m-en.txt",
                                   "filename": "m-en.txt"}],
                },
            },
        }
        return RegistryModel.from_dict(doc)

    def test_failed_labels_rolls_back_created_model(self, tmp_path,
                                                    monkeypatch):
        from birda_tpu.errors import DownloadFailed
        from birda_tpu.registry import installer

        model_bytes = b"model-bytes"
        rm = self._model(model_bytes, b"labels")

        def fake_download(ref, dest, progress=None, session=None):
            p = dest / ref.filename
            if ref.filename.endswith(".txt"):
                raise DownloadFailed(ref.filename, "connection reset")
            p.write_bytes(model_bytes)
            return p

        monkeypatch.setattr(installer, "download_verified", fake_download)
        import pytest as _pytest

        with _pytest.raises(DownloadFailed):
            installer.install_model(rm, dest_dir=tmp_path)
        assert not (tmp_path / "m.onnx").exists()

    def test_preexisting_model_survives_failed_labels(self, tmp_path,
                                                      monkeypatch):
        """Only files THIS install created roll back: a reinstall whose
        labels fetch fails must not delete the working model already on
        disk."""
        from birda_tpu.errors import DownloadFailed
        from birda_tpu.registry import installer

        model_bytes = b"model-bytes"
        rm = self._model(model_bytes, b"labels")
        (tmp_path / "m.onnx").write_bytes(model_bytes)  # pre-existing

        def fake_download(ref, dest, progress=None, session=None):
            p = dest / ref.filename
            if ref.filename.endswith(".txt"):
                raise DownloadFailed(ref.filename, "connection reset")
            p.write_bytes(model_bytes)
            return p

        monkeypatch.setattr(installer, "download_verified", fake_download)
        import pytest as _pytest

        with _pytest.raises(DownloadFailed):
            installer.install_model(rm, dest_dir=tmp_path)
        assert (tmp_path / "m.onnx").exists()


class TestSelectionErrorsNotGuesses:
    def _model(self, variants, default=None):
        from birda_tpu.registry.schema import RegistryModel

        return RegistryModel.from_dict({
            "id": "m", "name": "M", "vendor": "t", "version": "1",
            "model_type": "birdnet-v24",
            "license": {"type": "MIT", "commercial_use": True},
            "default_variant": default,
            "variants": [
                {"id": vid,
                 "model": {"url": f"https://x/{vid}.onnx",
                           "filename": f"{vid}.onnx"},
                 "labels": {"url": f"https://x/{vid}.txt",
                            "filename": f"{vid}.txt"}}
                for vid in variants
            ],
        })

    def test_no_default_variant_errors_rather_than_guessing(self):
        """Nothing on the precision ladder matches and no default is
        declared: guessing would install whatever sorts first in the
        manifest (reference selection.rs:241-248)."""
        from birda_tpu.errors import VariantNotFound
        from birda_tpu.registry.selection import SystemProbe, select_variant

        m = self._model(["exotic-a", "exotic-b"], default=None)
        with pytest.raises(VariantNotFound, match="no default_variant"):
            select_variant(m, probe=SystemProbe.detect())

    def test_unknown_explicit_variant_names_valid_ids(self):
        from birda_tpu.errors import VariantNotFound
        from birda_tpu.registry.selection import SystemProbe, select_variant

        m = self._model(["fp32", "fp16"], default="fp32")
        with pytest.raises(VariantNotFound, match="fp32, fp16"):
            select_variant(m, explicit_variant="int4",
                           probe=SystemProbe.detect())

    def test_regional_only_family_without_region_is_an_error(self):
        """No global variant at all is a broken registry, not a region typo:
        installing whichever region sorts first would be a guess, and a
        "no region 'global'" message would send the user hunting for a
        region name that was never the problem (selection.rs:168-180)."""
        from birda_tpu.errors import VariantNotFound
        from birda_tpu.registry.schema import RegistryModel
        from birda_tpu.registry.selection import SystemProbe, select_variant

        m = RegistryModel.from_dict({
            "id": "m", "model_type": "birdnet-v24",
            "variants": [
                {"id": "fp32", "region": "nordic",
                 "model": {"url": "https://x/m.onnx", "filename": "m.onnx"},
                 "labels": {"url": "https://x/l.txt", "filename": "l.txt"}},
            ],
        })
        with pytest.raises(VariantNotFound, match="regional variants only"):
            select_variant(m, probe=SystemProbe.detect())

    def test_missing_default_for_region_is_an_error(self):
        """The declared default does not exist among the candidates:
        error naming it, not a silent substitute (selection.rs:249-256)."""
        from birda_tpu.errors import VariantNotFound
        from birda_tpu.registry.selection import SystemProbe, select_variant

        m = self._model(["exotic-a"], default="no-dft-fp32")
        with pytest.raises(VariantNotFound, match="no-dft-fp32"):
            select_variant(m, probe=SystemProbe.detect())

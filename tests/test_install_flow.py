"""Full install -> config -> analyze integration with a faked network.

Drives the reference's §3.2 call stack (models install: registry load,
variant selection, license gate, verified download, config update) plus the
§3.1 analyze stack over the installed model — end to end with no egress.
"""

import hashlib

import numpy as np
import pytest
from click.testing import CliRunner

import fixtures_onnx as fo
from birda_tpu.cli.main import cli


@pytest.fixture()
def home(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "config"))
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
    monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path / "data"))
    monkeypatch.setenv("BIRDA_NO_COMPILE_CACHE", "1")
    return tmp_path


class _Resp:
    def __init__(self, data):
        self._data = data
        self.headers = {"content-length": str(len(data))}

    def raise_for_status(self):
        pass

    def iter_content(self, n):
        for i in range(0, len(self._data), n):
            yield self._data[i : i + n]

    def __enter__(self):
        return self

    def __exit__(self, *a):
        pass


def test_install_then_analyze(home, tmp_path, monkeypatch):
    """Install a registry model (faked downloads), then analyze with it."""
    from birda_tpu.registry import installer, loader
    from birda_tpu.registry.schema import Registry

    # A miniature registry whose model is a real (fixture) ONNX classifier
    # with a waveform contract tiny enough to run: [batch, 3] -> 5 scores.
    model_bytes = fo.make_fixture_geomodel(num_species=5)
    labels_bytes = b"".join(f"Sp{i} x_Common {i}\n".encode() for i in range(5))
    registry_doc = {
        "schema_version": "tpu-1.0",
        "registry_version": 1,
        "models": [{
            "id": "mini",
            "name": "Mini",
            "description": "fixture",
            "vendor": "test",
            "version": "1.0",
            "model_type": "birdnet-v24",
            "license": {"type": "MIT", "commercial_use": True},
            "files": {
                "model": {
                    "url": "https://example.com/mini.onnx",
                    "filename": "mini.onnx",
                    "sha256": hashlib.sha256(model_bytes).hexdigest(),
                },
                "labels": {
                    "default_language": "en",
                    "languages": [{
                        "code": "en", "name": "English",
                        "url": "https://example.com/mini-en.txt",
                        "filename": "mini-en.txt",
                    }],
                },
            },
        }],
    }
    monkeypatch.setattr(
        loader, "load_registry",
        lambda cache=None: Registry.from_dict(registry_doc),
    )

    downloads = {
        "https://example.com/mini.onnx": model_bytes,
        "https://example.com/mini-en.txt": labels_bytes,
    }

    class FakeRequests:
        @staticmethod
        def get(url, **kw):
            return _Resp(downloads[url])

    import birda_tpu.registry.installer as inst_mod

    real_download = inst_mod.download_verified

    def patched_download(file_ref, dest_dir, progress=None, session=None):
        return real_download(file_ref, dest_dir, progress, FakeRequests)

    monkeypatch.setattr(inst_mod, "download_verified", patched_download)

    runner = CliRunner()
    r = runner.invoke(cli, ["models", "install", "mini", "--default"])
    assert r.exit_code == 0, r.output
    assert "Installed mini" in r.output

    # Assets landed sha-verified in the data dir.
    models_dir = home / "data" / "birda" / "models"
    assert (models_dir / "mini.onnx").read_bytes() == model_bytes
    assert (models_dir / "mini-en.txt").read_bytes() == labels_bytes

    # Config records the install.
    r = runner.invoke(cli, ["models", "list"])
    assert "mini (default)" in r.output
    r = runner.invoke(cli, ["models", "check"])
    assert r.exit_code == 0, r.output

    # The installed ONNX graph loads and predicts through the model layer.
    from birda_tpu.config import file as config_file
    from birda_tpu.orchestrator import resolve_model_config
    from birda_tpu.orchestrator import AnalyzeOptions

    cfg = config_file.load_default_config()
    mc, name = resolve_model_config(AnalyzeOptions(), cfg)
    assert name == "mini"
    # The fixture contract is [B,3] (not audio-sized); validate the graph
    # executes and labels wired through.
    from birda_tpu.models import contracts
    from birda_tpu.models.zoo import onnx_model
    from birda_tpu.inference.range_filter import read_geomodel_labels

    labels = read_geomodel_labels(mc.labels)
    assert labels == [f"Sp{i} x_Common {i}" for i in range(5)]
    m = onnx_model(
        mc.path,
        contracts.ModelConfig(
            family=contracts.ModelFamily.CUSTOM, sample_rate=3,
            segment_duration=1.0, sample_count=3, num_classes=5,
            activation=contracts.ScoreActivation.SIGMOID, embedding_dim=None,
        ),
        labels,
    )
    out = m.apply(np.zeros((2, 3), np.float32))
    assert np.asarray(out["scores"]).shape == (2, 5)


def test_install_unknown_model(home):
    runner = CliRunner()
    r = runner.invoke(cli, ["models", "install", "ghost"])
    assert r.exit_code == 1
    assert "not found in registry" in r.output


def test_install_bsg_records_extras(home, tmp_path, monkeypatch):
    """A BSG-style install must record calibration/migration/maps paths in
    config (the validator requires them for bsg-finland models)."""
    from birda_tpu.registry import loader
    from birda_tpu.registry.schema import Registry

    cal = b"species,coef,intercept\nA a_X,1.0,0.0\n"
    mig = b"species,start_day,end_day\nA a_X,1,366\n"
    maps = b"BSGM1" + bytes(48)  # header-only is fine for recording paths
    model_bytes = fo.make_fixture_geomodel(num_species=5)
    labels_bytes = b"A a_X\nB b_Y\nC c_Z\nD d_W\nE e_V\n"

    def ref(url, data, name):
        return {"url": url, "filename": name,
                "sha256": hashlib.sha256(data).hexdigest()}

    registry_doc = {
        "schema_version": "tpu-1.0", "registry_version": 1,
        "models": [{
            "id": "bsg-test", "name": "BSG", "description": "", "vendor": "",
            "version": "4.4", "model_type": "bsg-finland",
            "license": {"type": "MIT", "commercial_use": True},
            "files": {
                "model": ref("https://x/m.onnx", model_bytes, "bsg.onnx"),
                "labels": {
                    "default_language": "en",
                    "languages": [{"code": "en", "name": "English",
                                   "url": "https://x/l.txt",
                                   "filename": "bsg-en.txt"}],
                },
                "bsg_calibration": ref("https://x/cal.csv", cal, "bsg-cal.csv"),
                "bsg_migration": ref("https://x/mig.csv", mig, "bsg-mig.csv"),
                "bsg_distribution_maps": ref("https://x/maps.bin", maps,
                                             "bsg-maps.bin"),
            },
        }],
    }
    monkeypatch.setattr(loader, "load_registry",
                        lambda cache=None: Registry.from_dict(registry_doc))
    downloads = {
        "https://x/m.onnx": model_bytes, "https://x/l.txt": labels_bytes,
        "https://x/cal.csv": cal, "https://x/mig.csv": mig,
        "https://x/maps.bin": maps,
    }

    class FakeRequests:
        @staticmethod
        def get(url, **kw):
            return _Resp(downloads[url])

    import birda_tpu.registry.installer as inst_mod

    real_download = inst_mod.download_verified
    monkeypatch.setattr(
        inst_mod, "download_verified",
        lambda fr, d, progress=None, session=None:
            real_download(fr, d, progress, FakeRequests),
    )

    runner = CliRunner()
    r = runner.invoke(cli, ["models", "install", "bsg-test", "--default"])
    assert r.exit_code == 0, r.output

    from birda_tpu.config import file as config_file
    from birda_tpu.config.validate import validate_model_config

    cfg = config_file.load_default_config()
    mc = cfg.models["bsg-test"]
    assert mc.bsg_calibration is not None and mc.bsg_calibration.exists()
    assert mc.bsg_migration is not None and mc.bsg_migration.exists()
    assert mc.bsg_distribution_maps is not None
    validate_model_config("bsg-test", mc)  # would raise without the extras


def _fake_geomodel_registry(monkeypatch):
    """Registry with only a range_filter asset; returns the download map."""
    from birda_tpu.registry import loader
    from birda_tpu.registry.schema import Registry

    model_bytes = fo.make_fixture_geomodel(num_species=5)
    labels_bytes = b"".join(f"Geo{i} sp_Common {i}\n".encode()
                            for i in range(5))
    registry_doc = {
        "schema_version": "tpu-1.0", "registry_version": 1,
        "models": [],
        "range_filter": {
            "id": "birdnet-geomodel-v3",
            "name": "BirdNET Geomodel v3.0.2",
            "vendor": "Cornell Lab of Ornithology",
            "version": "3.0.2", "species_count": 5,
            "license": {"type": "CC-BY-SA-4.0", "commercial_use": True,
                        "share_alike": True},
            "model": {"url": "https://x/geo.onnx", "filename": "geo.onnx",
                      "sha256": hashlib.sha256(model_bytes).hexdigest(),
                      "size_bytes": len(model_bytes)},
            "labels": {"url": "https://x/geo.txt", "filename": "geo.txt",
                       "sha256": hashlib.sha256(labels_bytes).hexdigest(),
                       "size_bytes": len(labels_bytes)},
        },
    }
    monkeypatch.setattr(loader, "load_registry",
                        lambda cache=None: Registry.from_dict(registry_doc))
    downloads = {"https://x/geo.onnx": model_bytes,
                 "https://x/geo.txt": labels_bytes}

    class FakeRequests:
        @staticmethod
        def get(url, **kw):
            return _Resp(downloads[url])

    import birda_tpu.registry.installer as inst_mod

    real_download = inst_mod.download_verified
    monkeypatch.setattr(
        inst_mod, "download_verified",
        lambda fr, d, progress=None, session=None:
            real_download(fr, d, progress, FakeRequests),
    )
    return downloads


def test_install_geomodel_handle(home, tmp_path, monkeypatch):
    """``models install geomodel`` installs the shared range filter under
    its install handle (reference lib.rs:2104-2108, installer.rs:13) and
    records the paths in config defaults."""
    import json

    _fake_geomodel_registry(monkeypatch)
    runner = CliRunner()
    r = runner.invoke(cli, ["models", "install", "geomodel", "-y",
                            "--output-mode", "ndjson"])
    assert r.exit_code == 0, r.output
    doc = json.loads(
        [l for l in r.output.splitlines() if l.startswith("{")][0])
    p = doc["payload"]
    assert p["result_type"] == "model_installed"
    assert p["id"] == "geomodel"
    assert p["set_as_default"] is False
    assert p["model_path"].endswith("geo.onnx")

    from birda_tpu.config import file as config_file

    cfg = config_file.load_default_config()
    assert cfg.defaults.geomodel is not None
    assert cfg.defaults.geomodel.exists()
    assert cfg.defaults.geomodel_labels.exists()

    # models info resolves the handle too, as a range-filter, not a model.
    r = runner.invoke(cli, ["models", "info", "geomodel",
                            "--output-mode", "ndjson"])
    assert r.exit_code == 0, r.output
    doc = json.loads(
        [l for l in r.output.splitlines() if l.startswith("{")][0])
    assert doc["payload"]["model"]["model_type"] == "range-filter"
    assert doc["payload"]["model"]["source"] == "registry"


def test_install_structured_payload(home, tmp_path, monkeypatch):
    """A classifier install in ndjson mode emits ModelInstalledPayload;
    removing it emits ModelRemovedPayload with default promotion."""
    import json

    from birda_tpu.registry import loader
    from birda_tpu.registry.schema import Registry

    model_bytes = fo.make_fixture_geomodel(num_species=5)
    labels_bytes = b"".join(f"Sp{i} x_C{i}\n".encode() for i in range(5))

    def ref(url, data, name):
        return {"url": url, "filename": name,
                "sha256": hashlib.sha256(data).hexdigest()}

    registry_doc = {
        "schema_version": "tpu-1.0", "registry_version": 1,
        "models": [{
            "id": "mini", "name": "Mini", "description": "", "vendor": "",
            "version": "1.0", "model_type": "birdnet-v24",
            "license": {"type": "MIT", "commercial_use": True},
            "files": {
                "model": ref("https://x/m.onnx", model_bytes, "mini.onnx"),
                "labels": {
                    "default_language": "en",
                    "languages": [{"code": "en", "name": "English",
                                   "url": "https://x/l.txt",
                                   "filename": "mini-en.txt"}],
                },
            },
        }],
    }
    monkeypatch.setattr(loader, "load_registry",
                        lambda cache=None: Registry.from_dict(registry_doc))
    downloads = {"https://x/m.onnx": model_bytes,
                 "https://x/l.txt": labels_bytes}

    class FakeRequests:
        @staticmethod
        def get(url, **kw):
            return _Resp(downloads[url])

    import birda_tpu.registry.installer as inst_mod

    real_download = inst_mod.download_verified
    monkeypatch.setattr(
        inst_mod, "download_verified",
        lambda fr, d, progress=None, session=None:
            real_download(fr, d, progress, FakeRequests),
    )

    runner = CliRunner()
    r = runner.invoke(cli, ["models", "install", "mini", "--default",
                            "--output-mode", "ndjson"])
    assert r.exit_code == 0, r.output
    doc = json.loads(
        [l for l in r.output.splitlines() if l.startswith("{")][0])
    p = doc["payload"]
    assert p["result_type"] == "model_installed"
    assert p["id"] == "mini"
    assert p["set_as_default"] is True
    assert p["model_path"].endswith("mini.onnx")
    assert p["labels_path"].endswith("mini-en.txt")

    # Add a second model manually so removal promotes it to default.
    from birda_tpu.config import file as config_file
    from birda_tpu.config.types import Config, ModelConfig, ModelType

    other_model = tmp_path / "other.onnx"
    other_model.write_bytes(model_bytes)
    other_labels = tmp_path / "other.txt"
    other_labels.write_bytes(labels_bytes)

    def mutate(cfg: Config):
        cfg.models["other"] = ModelConfig(
            path=other_model, labels=other_labels,
            model_type=ModelType("birdnet-v24"),
        )

    config_file.update_config(mutate)

    r = runner.invoke(cli, ["models", "remove", "mini",
                            "--output-mode", "ndjson"])
    assert r.exit_code == 0, r.output
    doc = json.loads(
        [l for l in r.output.splitlines() if l.startswith("{")][0])
    p = doc["payload"]
    assert p["result_type"] == "model_removed"
    assert p["id"] == "mini"
    assert p["purge_requested"] is False
    # new_default serializes even when promotion happened — and names the
    # promoted model (reference json_envelope.rs:633-643).
    assert p["new_default"] == "other"


def test_remove_default_promotes_alphabetically(home, tmp_path):
    """Promotion picks the alphabetically first remaining key (reference
    lib.rs:1934 .keys().min()), not insertion order."""
    import json

    from birda_tpu.config import file as config_file
    from birda_tpu.config.types import Config, ModelConfig, ModelType

    runner = CliRunner()
    p = tmp_path / "m.onnx"
    p.write_bytes(b"x")
    l = tmp_path / "l.txt"
    l.write_text("l")

    def mutate(cfg: Config):
        # Insertion order: zulu, beta, alpha — alphabetical winner is alpha.
        for key in ("zulu", "beta", "alpha"):
            cfg.models[key] = ModelConfig(
                path=p, labels=l, model_type=ModelType("birdnet-v24"))
        cfg.defaults.model = "zulu"

    config_file.update_config(mutate)
    r = runner.invoke(cli, ["models", "remove", "zulu",
                            "--output-mode", "ndjson"])
    assert r.exit_code == 0, r.output
    doc = json.loads(
        [x for x in r.output.splitlines() if x.startswith("{")][0])
    assert doc["payload"]["new_default"] == "alpha"


def test_remove_purge_prompts_and_scopes_to_the_entry(home, tmp_path):
    """--purge confirms before deleting (reference lib.rs:1983-1992), and
    deletes only the removed entry's own files, sparing anything another
    entry references (lib.rs:2009-2027) and never sweeping the directory."""
    from birda_tpu.config import file as config_file
    from birda_tpu.config.types import Config, ModelConfig, ModelType

    runner = CliRunner()
    mine = tmp_path / "mine.onnx"
    mine.write_bytes(b"m")
    shared = tmp_path / "shared.txt"
    shared.write_text("labels")
    other = tmp_path / "other.onnx"
    other.write_bytes(b"o")
    # A registry-known filename nothing configures: the OLD sweep deleted it.
    bystander = tmp_path / "birdnet-v24.onnx"
    bystander.write_bytes(b"keep me")

    def mutate(cfg: Config):
        cfg.models["mine"] = ModelConfig(
            path=mine, labels=shared, model_type=ModelType("birdnet-v24"))
        cfg.models["other"] = ModelConfig(
            path=other, labels=shared, model_type=ModelType("birdnet-v24"))

    config_file.update_config(mutate)

    # Declining the prompt leaves everything alone.
    r = runner.invoke(cli, ["models", "remove", "mine", "--purge"], input="n\n")
    assert r.exit_code == 0, r.output
    assert "cancelled" in r.output.lower()
    assert mine.exists()

    # -y skips the prompt; only the entry's unshared file is deleted.
    r = runner.invoke(cli, ["models", "remove", "mine", "--purge", "-y"])
    assert r.exit_code == 0, r.output
    assert not mine.exists()
    assert shared.exists(), "a file another entry references must be spared"
    assert bystander.exists(), "unconfigured files are not ours to sweep"
    assert "Deleted" in r.output and "used by another model" in r.output


def test_reinstall_removes_the_superseded_files(home, tmp_path):
    """An install that overwrites a config entry reclaims the files the
    previous entry owned (reference lib.rs:2267-2305) — without this every
    upgrade leaks the previous download."""
    from birda_tpu.cli.main import cli as _cli  # noqa: F401
    from birda_tpu.config import file as config_file
    from birda_tpu.config.types import Config, ModelConfig, ModelType
    from birda_tpu.registry.cleanup import orphaned_files

    old_model = tmp_path / "old-name.onnx"
    old_model.write_bytes(b"old")
    old_labels = tmp_path / "old-labels.txt"
    old_labels.write_text("l")

    def mutate(cfg: Config):
        cfg.models["mini"] = ModelConfig(
            path=old_model, labels=old_labels,
            model_type=ModelType("birdnet-v24"))

    config_file.update_config(mutate)
    cfg = config_file.load_default_config()
    orphans = orphaned_files(
        cfg, "mini",
        keeping=[tmp_path / "new-name.onnx", tmp_path / "new-labels.txt"],
    )
    assert sorted(orphans) == sorted([old_model, old_labels])


def test_range_filter_autoinstall_failure_is_warning(home, monkeypatch,
                                                     caplog):
    """The geomodel auto-installs alongside range-filter-capable
    classifiers, and a failure there is a WARNING, not an error: the
    classifier itself installed fine and works without range filtering
    (reference lib.rs:2186-2196). Previously the error aborted the whole
    install after the classifier had already landed."""
    import logging

    from birda_tpu.errors import DownloadFailed
    from birda_tpu.registry import installer, loader
    from birda_tpu.registry.schema import Registry

    model_bytes = fo.make_fixture_geomodel(num_species=5)
    labels_bytes = b"".join(f"Sp{i} x_C{i}\n".encode() for i in range(5))
    registry_doc = {
        "schema_version": "tpu-1.0", "registry_version": 1,
        "models": [{
            "id": "mini", "name": "Mini", "description": "fixture",
            "vendor": "test", "version": "1.0",
            "model_type": "birdnet-v24",
            "license": {"type": "MIT", "commercial_use": True},
            "files": {
                "model": {"url": "https://example.com/mini.onnx",
                          "filename": "mini.onnx",
                          "sha256": hashlib.sha256(model_bytes).hexdigest()},
                "labels": {
                    "default_language": "en",
                    "languages": [{
                        "code": "en", "name": "English",
                        "url": "https://example.com/mini-en.txt",
                        "filename": "mini-en.txt"}],
                },
            },
        }],
        "range_filter": {
            "id": "birdnet-geomodel-v3", "name": "BirdNET Geomodel v3.0.2",
            "vendor": "Cornell", "version": "3.0.2", "species_count": 5,
            "license": {"type": "CC-BY-SA-4.0", "commercial_use": True},
            "model": {"url": "https://x/geo.onnx", "filename": "geo.onnx",
                      "sha256": "0" * 64},
            "labels": {"url": "https://x/geo.txt", "filename": "geo.txt",
                       "sha256": "0" * 64},
        },
    }
    monkeypatch.setattr(loader, "load_registry",
                        lambda cache=None: Registry.from_dict(registry_doc))
    downloads = {
        "https://example.com/mini.onnx": model_bytes,
        "https://example.com/mini-en.txt": labels_bytes,
    }

    class FakeRequests:
        @staticmethod
        def get(url, **kw):
            return _Resp(downloads[url])

    import birda_tpu.registry.installer as inst_mod

    real_download = inst_mod.download_verified
    monkeypatch.setattr(
        inst_mod, "download_verified",
        lambda fr, d, progress=None, session=None:
            real_download(fr, d, progress, FakeRequests),
    )

    def failing_range_filter(entry):
        raise DownloadFailed("https://x/geo.onnx", "connection reset")

    monkeypatch.setattr(inst_mod, "install_range_filter",
                        failing_range_filter)

    runner = CliRunner()
    with caplog.at_level(logging.WARNING, logger="birda"):
        r = runner.invoke(cli, ["models", "install", "mini", "--default"])
    assert r.exit_code == 0, r.output
    assert "Installed mini" in r.output
    assert any("models install geomodel" in rec.getMessage()
               for rec in caplog.records)

    # The classifier really is usable: it's in config as the default.
    from birda_tpu.config import file as config_file

    cfg = config_file.load_default_config()
    assert "mini" in cfg.models


def test_regional_install_gets_region_qualified_config_key(home, monkeypatch):
    """A global and a regional install of one family must not fight over
    one config key (reference installer.rs:86-95 config_key): regional
    installs register as `<id>-<region>`, and that key is what -m takes."""
    from birda_tpu.registry import loader
    from birda_tpu.registry.schema import Registry

    model_bytes = fo.make_fixture_geomodel(num_species=5)
    labels_bytes = b"".join(f"Sp{i} x_C{i}\n".encode() for i in range(5))

    def fref(url, data, name):
        return {"url": url, "filename": name,
                "sha256": hashlib.sha256(data).hexdigest()}

    def variant(vid, region=None, group=None):
        v = {
            "id": vid,
            "model": fref(f"https://x/{vid}-{region or 'global'}.onnx",
                          model_bytes, f"{vid}-{region or 'global'}.onnx"),
            "labels": fref(f"https://x/{vid}-{region or 'global'}.txt",
                           labels_bytes, f"{vid}-{region or 'global'}.txt"),
        }
        if region:
            v["region"] = region
            v["region_name"] = region.title()
            v["group_name"] = group or "Europe"
            v["group_order"] = 1
        return v

    registry_doc = {
        "schema_version": "tpu-1.0", "registry_version": 1,
        "models": [{
            "id": "vmod", "name": "VMod", "description": "fixture",
            "vendor": "test", "version": "1.0",
            "model_type": "birdnet-v24",
            "license": {"type": "MIT", "commercial_use": True},
            "default_variant": "fp32",
            "variants": [variant("fp32"),
                         variant("fp32", region="nordic")],
        }],
    }
    monkeypatch.setattr(loader, "load_registry",
                        lambda cache=None: Registry.from_dict(registry_doc))

    downloads = {
        "https://x/fp32-global.onnx": model_bytes,
        "https://x/fp32-global.txt": labels_bytes,
        "https://x/fp32-nordic.onnx": model_bytes,
        "https://x/fp32-nordic.txt": labels_bytes,
    }

    class FakeRequests:
        @staticmethod
        def get(url, **kw):
            return _Resp(downloads[url])

    import birda_tpu.registry.installer as inst_mod

    real_download = inst_mod.download_verified
    monkeypatch.setattr(
        inst_mod, "download_verified",
        lambda fr, d, progress=None, session=None:
            real_download(fr, d, progress, FakeRequests),
    )

    runner = CliRunner()
    r = runner.invoke(cli, ["models", "install", "vmod", "--default"])
    assert r.exit_code == 0, r.output
    assert "Installed vmod" in r.output
    r = runner.invoke(cli, ["models", "install", "vmod",
                            "--region", "nordic"])
    assert r.exit_code == 0, r.output
    assert "Installed vmod-nordic" in r.output

    from birda_tpu.config import file as config_file

    cfg = config_file.load_default_config()
    # Both coexist; the regional one did not clobber the global entry.
    assert "vmod" in cfg.models
    assert "vmod-nordic" in cfg.models
    assert cfg.models["vmod-nordic"].region == "nordic"
    assert cfg.models["vmod"].region is None
    assert cfg.defaults.model == "vmod"  # --default on the global only

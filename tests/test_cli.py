"""CLI integration tests: drive the click entry point end to end
(the analogue of the reference's assert_cmd suite)."""

import json

import numpy as np
import pytest
from click.testing import CliRunner

from birda_tpu.cli import validators as v
from birda_tpu.cli.main import cli
from birda_tpu.config import paths as config_paths

from fixtures_audio import write_wav


@pytest.fixture()
def home(tmp_path, monkeypatch):
    """Isolated config/cache/data dirs."""
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "config"))
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
    monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path / "data"))
    return tmp_path


@pytest.fixture()
def runner():
    return CliRunner()


def make_audio(tmp_path, secs=4.0, rate=48000, name="rec.wav"):
    p = tmp_path / name
    t = np.arange(int(rate * secs)) / rate
    write_wav(p, (0.4 * np.sin(2 * np.pi * 2000 * t)).astype(np.float32), rate)
    return p


def setup_synthetic_model(runner, home):
    """Register the synthetic tiny model as the default."""
    r = runner.invoke(cli, [
        "models", "add", "tiny",
        "--path", "synthetic:tiny", "--labels", "synthetic:tiny",
        "--type", "birdnet-v24", "--default",
    ])
    assert r.exit_code == 0, r.output


class TestValidators:
    def test_confidence(self):
        assert v.parse_confidence(" 0.5 ") == 0.5
        with pytest.raises(v.ValidationFailure):
            v.parse_confidence("1.5")
        with pytest.raises(v.ValidationFailure):
            v.parse_confidence("nan")

    def test_overlap(self):
        assert v.parse_overlap("2.5") == 2.5
        for bad in ("-1", "nan", "inf"):
            with pytest.raises(v.ValidationFailure):
                v.parse_overlap(bad)

    def test_batch_size(self):
        assert v.parse_batch_size("512") == 512
        with pytest.raises(v.ValidationFailure):
            v.parse_batch_size("0")
        with pytest.raises(v.ValidationFailure):
            v.parse_batch_size("513")

    def test_latitude(self):
        assert v.parse_latitude("-33.9") == -33.9
        with pytest.raises(v.ValidationFailure):
            v.parse_latitude("91")

    def test_stale_lock_timeout(self):
        assert v.parse_stale_lock_timeout("30") == 30
        assert v.parse_stale_lock_timeout("5m") == 300
        assert v.parse_stale_lock_timeout("2h") == 7200
        assert v.parse_stale_lock_timeout("1d") == 86400
        with pytest.raises(v.ValidationFailure):
            v.parse_stale_lock_timeout("-5s")

    def test_stale_lock_timeout_u64_bound_exact(self):
        # The reference's u64 checked_mul rejects anything ABOVE
        # 2**64 - 1; 2**64 itself must fail too (ADVICE r4 off-by-one).
        # The parser works in floats (fractional durations are legal), and
        # float(2**64 - 1) rounds to 2**64 — so the largest representable
        # accepted value below the bound is what we pin.
        assert v.parse_stale_lock_timeout(str(2**63)) == 2**63
        with pytest.raises(v.ValidationFailure):
            v.parse_stale_lock_timeout(str(2**64))


class TestConfigCommands:
    def test_init_show_path(self, runner, home):
        r = runner.invoke(cli, ["config", "init"])
        assert r.exit_code == 0
        assert "Created" in r.output
        r = runner.invoke(cli, ["config", "path"])
        assert r.exit_code == 0
        assert str(home / "config") in r.output
        r = runner.invoke(cli, ["config", "show"])
        assert r.exit_code == 0
        assert "min_confidence" in r.output

    def test_set_valid(self, runner, home):
        r = runner.invoke(cli, ["config", "set", "defaults.latitude", "-33.9"])
        assert r.exit_code == 0, r.output
        r = runner.invoke(cli, ["config", "show"])
        assert "-33.9" in r.output

    def test_set_invalid_value(self, runner, home):
        r = runner.invoke(cli, ["config", "set", "defaults.batch_size", "100000"])
        assert r.exit_code == 1
        r = runner.invoke(cli, ["config", "set", "defaults.latitude", "95"])
        assert r.exit_code == 1

    def test_set_unknown_key(self, runner, home):
        r = runner.invoke(cli, ["config", "set", "defaults.bogus", "1"])
        assert r.exit_code == 1


class TestModelsCommands:
    def test_list_empty(self, runner, home):
        r = runner.invoke(cli, ["models", "list"])
        assert r.exit_code == 0
        assert "No models configured" in r.output

    def test_add_and_list(self, runner, home):
        setup_synthetic_model(runner, home)
        r = runner.invoke(cli, ["models", "list"])
        assert "tiny (default)" in r.output

    def test_add_duplicate_fails(self, runner, home):
        setup_synthetic_model(runner, home)
        r = runner.invoke(cli, [
            "models", "add", "tiny", "--path", "x", "--labels", "y",
            "--type", "birdnet-v24",
        ])
        assert r.exit_code == 1

    def test_remove(self, runner, home):
        setup_synthetic_model(runner, home)
        r = runner.invoke(cli, ["models", "remove", "tiny"])
        assert r.exit_code == 0
        r = runner.invoke(cli, ["models", "list"])
        assert "No models configured" in r.output

    def test_remove_purge_eof_cancels_gracefully(self, runner, home):
        """ADVICE r4: a scripted human-mode `models remove --purge` with
        closed stdin must cancel with exit 0 ('Removal cancelled.'), like
        the reference's read-a-line prompt — not click's Abort (exit 1)."""
        setup_synthetic_model(runner, home)
        r = runner.invoke(cli, ["models", "remove", "tiny", "--purge"],
                          input="")
        assert r.exit_code == 0, r.output
        assert "Removal cancelled." in r.output
        r = runner.invoke(cli, ["models", "list"])
        assert "tiny" in r.output  # nothing was removed

    def test_list_available(self, runner, home):
        r = runner.invoke(cli, ["models", "list-available"])
        assert r.exit_code == 0
        assert "birdnet-v24" in r.output
        assert "perch-v2" in r.output

    def test_info_registry_model(self, runner, home):
        r = runner.invoke(cli, ["models", "info", "birdnet-v24", "--languages"])
        assert r.exit_code == 0
        assert "fi - " in r.output  # 37 languages listed
        assert "(default)" in r.output
        r = runner.invoke(cli, ["models", "info", "birdnet-v24"])
        assert "Commercial use: No" in r.output

    def test_regions(self, runner, home):
        r = runner.invoke(cli, ["models", "regions", "birdnet-v30"])
        assert r.exit_code == 0
        assert "species" in r.output
        r = runner.invoke(cli, ["models", "regions", "birdnet-v24"])
        assert r.exit_code == 1
        assert "no regional variants" in r.output


class TestProviders:
    def test_human(self, runner, home):
        r = runner.invoke(cli, ["providers"])
        assert r.exit_code == 0
        assert "Available execution providers:" in r.output
        assert "cpu: CPU (always available)" in r.output
        # The usage footer telling users how to select providers
        # (reference providers_command_test.rs::shows_usage_help).
        assert "Usage:" in r.output
        assert "--cpu" in r.output
        assert "--gpu" in r.output
        assert "Explicit providers" in r.output

    def test_bounded_when_accelerator_unreachable(self, runner, home,
                                                  monkeypatch):
        # A dead device attachment must not hang the listing command
        # (in-process jax init retries for ~28 minutes on a dead tunnel):
        # the subprocess probe is hard-bounded and the TPU line explains.
        import time

        monkeypatch.setenv("BIRDA_PROVIDER_PROBE_TIMEOUT", "0.2")
        t0 = time.monotonic()
        r = runner.invoke(cli, ["providers"])
        assert time.monotonic() - t0 < 30
        assert r.exit_code == 0
        assert "cpu: CPU (always available)" in r.output
        # 0.2 s is shorter than any jax import: the probe always times
        # out here, so the TPU line must carry the bounded-probe note.
        assert "tpu: not available (probe timed out" in r.output

    def test_json(self, runner, home):
        r = runner.invoke(cli, ["providers", "--output-mode", "ndjson"])
        assert r.exit_code == 0
        doc = json.loads(r.output.splitlines()[0])
        assert doc["event"] == "result"
        assert doc["payload"]["result_type"] == "providers"
        # ProviderInfo entries (id/name/description), reference
        # json_envelope.rs:462-472 — not bare platform strings.
        cpu = [p for p in doc["payload"]["providers"] if p["id"] == "cpu"]
        assert cpu and cpu[0]["name"] == "CPU"
        assert "description" in cpu[0]


class TestAnalyze:
    def test_no_inputs(self, runner, home):
        r = runner.invoke(cli, ["analyze"])
        assert r.exit_code != 0

    def test_no_model_configured(self, runner, home, tmp_path):
        audio = make_audio(tmp_path)
        r = runner.invoke(cli, ["analyze", str(audio), "--cpu"])
        assert r.exit_code == 1
        assert "no model specified" in r.output

    def test_analyze_wav_to_csv(self, runner, home, tmp_path):
        setup_synthetic_model(runner, home)
        audio = make_audio(tmp_path)
        out = tmp_path / "out"
        r = runner.invoke(cli, [
            "analyze", str(audio), "--cpu", "-o", str(out),
            "--min-confidence", "0",
        ])
        assert r.exit_code == 0, r.output
        csv_path = out / "rec.BirdNET.results.csv"
        assert csv_path.exists()
        lines = csv_path.read_text(encoding="utf-8-sig").splitlines()
        assert len(lines) > 1

    def test_format_comma_separated_table_alias_and_case(self, runner, home,
                                                         tmp_path):
        # Reference args.rs:306 (value_delimiter = ',') + types.rs:358-365:
        # one -f may carry a comma list, 'table' aliases raven, and parsing
        # is case-insensitive.
        setup_synthetic_model(runner, home)
        audio = make_audio(tmp_path)
        out = tmp_path / "out"
        r = runner.invoke(cli, [
            "analyze", str(audio), "--cpu", "-o", str(out),
            "-f", "CSV,table", "--min-confidence", "0",
        ])
        assert r.exit_code == 0, r.output
        assert (out / "rec.BirdNET.results.csv").exists()
        assert (out / "rec.BirdNET.selection.table.txt").exists()

    def test_format_unknown_value_names_the_valid_set(self, runner, home):
        r = runner.invoke(cli, ["analyze", "-f", "bogus", "--cpu", "x.wav"])
        assert r.exit_code == 2
        assert "bogus" in r.output and "kaleidoscope" in r.output

    def test_analyze_ndjson_stdout(self, runner, home, tmp_path):
        setup_synthetic_model(runner, home)
        audio = make_audio(tmp_path)
        r = runner.invoke(cli, [
            "analyze", str(audio), "--cpu", "--stdout",
            "--output-mode", "ndjson", "--min-confidence", "0",
        ])
        assert r.exit_code == 0, r.output
        events = [json.loads(l)["event"] for l in r.output.splitlines() if l.startswith("{")]
        assert "pipeline_started" in events
        assert "detections" in events
        assert "pipeline_completed" in events

    def test_week_month_conflict(self, runner, home, tmp_path):
        audio = make_audio(tmp_path)
        r = runner.invoke(cli, [
            "analyze", str(audio), "--week", "5", "--month", "6", "--day", "1",
        ])
        assert r.exit_code != 0

    def test_skip_existing(self, runner, home, tmp_path):
        setup_synthetic_model(runner, home)
        audio = make_audio(tmp_path)
        out = tmp_path / "out"
        args = ["analyze", str(audio), "--cpu", "-o", str(out),
                "--min-confidence", "0"]
        assert runner.invoke(cli, args).exit_code == 0
        csv_path = out / "rec.BirdNET.results.csv"
        mtime = csv_path.stat().st_mtime_ns
        assert runner.invoke(cli, args).exit_code == 0
        assert csv_path.stat().st_mtime_ns == mtime  # skipped, not rewritten
        assert runner.invoke(cli, args + ["--force"]).exit_code == 0
        assert csv_path.stat().st_mtime_ns != mtime

    def test_invalid_flag_value(self, runner, home, tmp_path):
        audio = make_audio(tmp_path)
        r = runner.invoke(cli, ["analyze", str(audio), "--batch-size", "100000"])
        assert r.exit_code != 0
        assert "512" in r.output


class TestSpeciesCommand:
    def test_requires_time(self, runner, home):
        r = runner.invoke(cli, ["species", "--lat", "60", "--lon", "24"])
        assert r.exit_code != 0

    def test_week_conflicts_with_month_day(self, runner, home):
        # Reference args.rs test_species_command_week_month_conflict: one
        # time spelling at a time, same rule as analyze.
        r = runner.invoke(cli, ["species", "--lat", "60", "--lon", "24",
                                "--week", "24", "--month", "6", "--day", "1"])
        assert r.exit_code == 2
        assert "conflicts" in r.output

    def test_geomodel_missing_is_fatal(self, runner, home):
        r = runner.invoke(cli, [
            "species", "--lat", "60", "--lon", "24", "--week", "24",
        ])
        assert r.exit_code == 1
        assert "not installed" in r.output.lower() or "geomodel" in r.output.lower()

    def test_with_fixture_geomodel(self, runner, home, tmp_path):
        import fixtures_onnx as fo

        geo = tmp_path / "geo.onnx"
        geo.write_bytes(fo.make_fixture_geomodel(num_species=8))
        labels = tmp_path / "geo-labels.txt"
        labels.write_text("".join(f"Geo sp{i} x_Common {i}\n" for i in range(8)))
        # Point config at the fixture geomodel.
        from birda_tpu.config import file as config_file
        from birda_tpu.config.types import Config

        cfg = Config()
        cfg.defaults.geomodel = geo
        cfg.defaults.geomodel_labels = labels
        config_file.save_config(cfg, config_paths.config_file_path())

        out = tmp_path / "species.txt"
        r = runner.invoke(cli, [
            "species", "--lat", "60", "--lon", "24", "--week", "24",
            "--threshold", "0.0", "-o", str(out),
        ])
        assert r.exit_code == 0, r.output
        assert out.exists()
        assert len(out.read_text().splitlines()) == 8


class TestParallelJobs:
    def test_jobs_flag(self, runner, home, tmp_path):
        setup_synthetic_model(runner, home)
        for i in range(4):
            make_audio(tmp_path, name=f"rec{i}.wav", secs=3.0)
        out = tmp_path / "out"
        r = runner.invoke(cli, [
            "analyze", str(tmp_path), "--cpu", "-o", str(out),
            "--min-confidence", "0", "-j", "3",
        ])
        assert r.exit_code == 0, r.output
        for i in range(4):
            assert (out / f"rec{i}.BirdNET.results.csv").exists()


class TestStructuredCommandResults:
    def check(self, runner, args, result_type):
        r = runner.invoke(cli, args + ["--output-mode", "ndjson"])
        assert r.exit_code in (0, 1), r.output
        lines = [l for l in r.output.splitlines() if l.startswith("{")]
        assert lines, r.output
        doc = json.loads(lines[0])
        assert doc["event"] == "result"
        assert doc["payload"]["result_type"] == result_type
        return doc["payload"]

    def test_config_show(self, runner, home):
        p = self.check(runner, ["config", "show"], "config")
        assert "defaults" in p["config"]

    def test_config_path(self, runner, home):
        # ConfigPathPayload: config_path + exists (json_envelope.rs:617-626)
        p = self.check(runner, ["config", "path"], "config_path")
        assert p["config_path"].endswith("config.toml")
        assert isinstance(p["exists"], bool)

    def test_models_list(self, runner, home):
        setup_synthetic_model(runner, home)
        p = self.check(runner, ["models", "list"], "model_list")
        assert p["models"][0]["id"] == "tiny"
        assert p["models"][0]["is_default"]

    def test_models_available(self, runner, home):
        p = self.check(runner, ["models", "list-available"], "available_models")
        assert any(m["id"] == "birdnet-v24" for m in p["models"])

    def test_models_check(self, runner, home):
        setup_synthetic_model(runner, home)
        # synthetic: path doesn't exist on disk -> check fails, but payload emits
        p = self.check(runner, ["models", "check"], "model_check")
        assert len(p["models"]) == 1

    def test_clip_structured(self, runner, home, tmp_path):
        rate = 48000
        x = (0.4 * np.sin(2 * np.pi * 1000 * np.arange(rate * 10) / rate)).astype(np.float32)
        write_wav(tmp_path / "rec.wav", x, rate)
        det = tmp_path / "rec.wav.BirdNET.results.csv"
        det.write_text(
            "Start (s),End (s),Scientific name,Common name,Confidence,File\n"
            "1.0,2.0,Parus major,Great Tit,0.9,rec.wav\n"
        )
        r = runner.invoke(cli, [
            "clip", str(det), "-o", str(tmp_path / "clips"),
            "--output-mode", "ndjson",
        ])
        assert r.exit_code == 0, r.output
        doc = json.loads([l for l in r.output.splitlines() if l.startswith("{")][0])
        assert doc["payload"]["result_type"] == "clip_extraction"
        assert doc["payload"]["total_clips"] == 1

    def test_species_structured(self, runner, home, tmp_path):
        import fixtures_onnx as fo
        from birda_tpu.config import file as config_file
        from birda_tpu.config.types import Config

        geo = tmp_path / "geo.onnx"
        geo.write_bytes(fo.make_fixture_geomodel(num_species=5))
        labels = tmp_path / "geo-labels.txt"
        labels.write_text("".join(f"Geo s{i} x_C{i}\n" for i in range(5)))
        cfg = Config()
        cfg.defaults.geomodel = geo
        cfg.defaults.geomodel_labels = labels
        config_file.save_config(cfg, config_paths.config_file_path())
        out = tmp_path / "sp.txt"
        r = runner.invoke(cli, [
            "species", "--lat", "60", "--lon", "24", "--week", "10",
            "--threshold", "0", "-o", str(out), "--output-mode", "ndjson",
        ])
        assert r.exit_code == 0, r.output
        doc = json.loads([l for l in r.output.splitlines() if l.startswith("{")][0])
        assert doc["payload"]["result_type"] == "species_list"
        assert doc["payload"]["species_count"] == 5
        # Entries ride inline with scientific/common split; no file is
        # written in structured mode (reference species.rs:150-186).
        sp = doc["payload"]["species"]
        assert len(sp) == 5
        assert sp[0]["scientific_name"].startswith("Geo s")
        assert "frequency" in sp[0]
        assert "output_file" not in doc["payload"]
        assert not out.exists()
        # lat/lon/week/threshold are reported as used.
        assert doc["payload"]["week"] == 10
        assert doc["payload"]["threshold"] == 0.0

    def test_version(self, runner, home):
        from birda_tpu import __version__

        p = self.check(runner, ["version"], "version")
        assert p["version"] == __version__
        r = runner.invoke(cli, ["version"])
        assert __version__ in r.output

    def test_models_info_registry_failure_surfaces(self, runner, home,
                                                   monkeypatch):
        """A corrupt registry must report its own error, not 'model not
        found' (only ModelNotFoundInRegistry falls through)."""
        from birda_tpu.errors import RegistryParse
        from birda_tpu.registry import loader

        def boom(cache=None):
            raise RegistryParse("cache corrupted")

        monkeypatch.setattr(loader, "load_registry", boom)
        r = runner.invoke(cli, ["models", "info", "whatever"])
        assert r.exit_code == 1
        assert "cache corrupted" in r.output
        assert "model not found" not in r.output

    def test_models_info_structured(self, runner, home):
        setup_synthetic_model(runner, home)
        p = self.check(runner, ["models", "info", "tiny"], "model_info")
        m = p["model"]
        assert m["id"] == "tiny"
        assert m["source"] == "configured"
        assert m["path"] == "synthetic:tiny"
        # A registry model reports the registry card, path-less.
        p = self.check(runner, ["models", "info", "birdnet-v24"],
                       "model_info")
        assert p["model"]["source"] == "registry"
        assert "path" not in p["model"]

    def test_models_check_geomodel_and_leftovers(self, runner, home):
        from birda_tpu.registry.installer import models_dir

        setup_synthetic_model(runner, home)
        # A .part file from a dead pid is a leftover; one from a live pid
        # (ours) is an in-progress download and must not be reported.
        mdir = models_dir()
        mdir.mkdir(parents=True, exist_ok=True)
        dead = mdir / "big.onnx.999999.part"
        dead.write_bytes(b"x")
        import os

        live = mdir / f"big2.onnx.{os.getpid()}.part"
        live.write_bytes(b"x")
        # A leftover v2.4 meta model is obsolete (superseded by the
        # geomodel) — reported, never auto-deleted (installer.rs:393).
        meta = mdir / "birdnet-v24-meta.onnx"
        meta.write_bytes(b"old")
        p = self.check(runner, ["models", "check"], "model_check")
        # The embedded registry carries the geomodel asset: reported once,
        # not installed in this sandbox (reference lib.rs:2343-2364).
        assert p["geomodel"]["installed"] is False
        assert p["geomodel"]["species_count"] == 12012
        assert p["geomodel"]["obsolete_files"] == [str(meta)]
        assert p["leftover_downloads"] == [str(dead)]
        r = runner.invoke(cli, ["models", "check"])
        assert "no longer used and can be deleted" in r.output

    def test_clip_failed_files(self, runner, home, tmp_path):
        """Per-file clip failures ride failed_files as {file, error}
        (reference json_envelope.rs:718-747)."""
        rate = 48000
        x = (0.4 * np.sin(2 * np.pi * 1000 * np.arange(rate * 10) / rate)
             ).astype(np.float32)
        write_wav(tmp_path / "rec.wav", x, rate)
        good = tmp_path / "rec.wav.BirdNET.results.csv"
        good.write_text(
            "Start (s),End (s),Scientific name,Common name,Confidence,File\n"
            "1.0,2.0,Parus major,Great Tit,0.9,rec.wav\n"
        )
        bad = tmp_path / "ghost.wav.BirdNET.results.csv"
        bad.write_text(
            "Start (s),End (s),Scientific name,Common name,Confidence,File\n"
            "1.0,2.0,Parus major,Great Tit,0.9,ghost.wav\n"
        )
        r = runner.invoke(cli, [
            "clip", str(good), str(bad), "-o", str(tmp_path / "clips"),
            "--output-mode", "ndjson",
        ])
        assert r.exit_code == 0, r.output
        events = [json.loads(l) for l in r.output.splitlines()
                  if l.startswith("{")]
        # NDJSON streams a per-file `error` event for ghost.wav as it
        # happens (#319) ahead of the final result.
        assert any(e["event"] == "error" for e in events)
        doc = [e for e in events if e["event"] == "result"][0]
        p = doc["payload"]
        assert p["total_clips"] == 1
        assert p["total_files"] == 1
        assert p["output_dir"] == str(tmp_path / "clips")
        c = p["clips"][0]
        assert c["scientific_name"] == "Parus major"
        assert c["confidence"] == 0.9
        assert c["source_audio"].endswith("rec.wav")
        assert c["output_file"].endswith(".wav")
        f = p["failed_files"][0]
        assert f["file"] == str(bad)
        assert "error" in f and "ghost" in f["error"]


class TestGeomodelFlags:
    """--geomodel-path/--geomodel-labels-path routes (reference args.rs
    global geomodel flags), the deprecated --meta-model-path, and -y."""

    def _fixture_geomodel(self, tmp_path, n=8):
        import fixtures_onnx as fo

        geo = tmp_path / "geo.onnx"
        geo.write_bytes(fo.make_fixture_geomodel(num_species=n))
        labels = tmp_path / "geo-labels.txt"
        labels.write_text(
            "".join(f"Geo sp{i} x_Common {i}\n" for i in range(n)))
        return geo, labels

    def test_analyze_geomodel_path_requires_labels(self, runner, home,
                                                   tmp_path):
        audio = make_audio(tmp_path)
        r = runner.invoke(cli, [
            "analyze", str(audio), "--cpu", "--geomodel-path", "x.onnx",
        ])
        assert r.exit_code != 0
        assert "must be given together" in r.output

    def test_species_geomodel_path_requires_labels(self, runner, home):
        r = runner.invoke(cli, [
            "species", "--lat", "60", "--lon", "24", "--week", "24",
            "--geomodel-path", "x.onnx",
        ])
        assert r.exit_code != 0
        assert "must be given together" in r.output

    def test_species_geomodel_override_without_config(self, runner, home,
                                                      tmp_path):
        geo, labels = self._fixture_geomodel(tmp_path)
        out = tmp_path / "species.txt"
        r = runner.invoke(cli, [
            "species", "--lat", "60", "--lon", "24", "--week", "24",
            "--threshold", "0.0", "-o", str(out),
            "--geomodel-path", str(geo),
            "--geomodel-labels-path", str(labels),
        ])
        assert r.exit_code == 0, r.output
        assert len(out.read_text().splitlines()) == 8

    def test_analyze_geomodel_override_and_meta_model_and_yes(
            self, runner, home, tmp_path):
        setup_synthetic_model(runner, home)
        geo, labels = self._fixture_geomodel(tmp_path)
        audio = make_audio(tmp_path)
        out = tmp_path / "out"
        r = runner.invoke(cli, [
            "analyze", str(audio), "--cpu", "-o", str(out), "-y",
            "--lat", "60", "--lon", "24", "--week", "24",
            "--geomodel-path", str(geo),
            "--geomodel-labels-path", str(labels),
            "--meta-model-path", "legacy.onnx",  # deprecated: warn + ignore
        ])
        assert r.exit_code == 0, r.output
        assert (out / "rec.BirdNET.results.csv").exists()

    def test_meta_model_path_hidden_from_help(self, runner):
        r = runner.invoke(cli, ["analyze", "--help"])
        assert r.exit_code == 0
        assert "--meta-model-path" not in r.output
        assert "--geomodel-path" in r.output


class TestModelsCheckPreflight:
    def _add_onnx_model(self, runner, tmp_path, model_bytes, name="m"):
        onnx = tmp_path / f"{name}.onnx"
        onnx.write_bytes(model_bytes)
        labels = tmp_path / f"{name}-labels.txt"
        labels.write_text("Aaa_Bbb\n" * 64)
        r = runner.invoke(cli, [
            "models", "add", name, "--path", str(onnx),
            "--labels", str(labels), "--type", "birdnet-v24",
        ])
        assert r.exit_code == 0, r.output

    def test_check_reports_all_unsupported_elements(self, runner, home,
                                                    tmp_path):
        import fixtures_onnx as fo

        bad = fo.model(
            [fo.node("NonZero", ["x"], ["a"]),
             fo.node("NonMaxSuppression", ["a"], ["y"])],
            inputs=[fo.value_info("x", [1, 8])],
            outputs=[fo.value_info("y", [1, 8])],
        )
        self._add_onnx_model(runner, tmp_path, bad)
        r = runner.invoke(cli, ["models", "check"])
        assert r.exit_code == 1
        # BOTH unsupported ops in one report — no fix-one-retry loop.
        assert "NonZero" in r.output and "NonMaxSuppression" in r.output

    def test_check_passes_supported_graph(self, runner, home, tmp_path):
        import fixtures_onnx as fo

        self._add_onnx_model(runner, tmp_path, fo.make_fixture_geomodel())
        r = runner.invoke(cli, ["models", "check"])
        assert r.exit_code == 0, r.output
        assert "OK" in r.output

    def test_no_graph_flag_skips_preflight(self, runner, home, tmp_path):
        import fixtures_onnx as fo

        bad = fo.model(
            [fo.node("STFT", ["x"], ["y"])],
            inputs=[fo.value_info("x", [1, 8])],
            outputs=[fo.value_info("y", [1, 8])],
        )
        self._add_onnx_model(runner, tmp_path, bad)
        r = runner.invoke(cli, ["models", "check", "--no-graph"])
        assert r.exit_code == 0, r.output


class TestCalibrationAudioPreflight:
    def test_calibration_audio_requires_int8(self, runner, tmp_path):
        """--calibration-audio without --precision int8 would be silently
        ignored; make the no-op explicit at parse time."""
        audio = tmp_path / "a.wav"
        audio.write_bytes(b"")
        r = runner.invoke(cli, [
            "analyze", str(audio), "--cpu",
            "--calibration-audio", str(audio),
        ])
        assert r.exit_code == 2
        assert "--precision int8" in r.output


class TestStdoutPreflight:
    def test_stdout_requires_exactly_one_input(self, runner, home, tmp_path):
        setup_synthetic_model(runner, home)
        a = make_audio(tmp_path, name="a.wav")
        b = make_audio(tmp_path, name="b.wav")
        r = runner.invoke(cli, ["analyze", str(a), str(b), "--cpu", "--stdout"])
        assert r.exit_code == 1
        assert "exactly one input file" in r.output


class TestHelpBoundsPinned:
    """Reference #341/#312: every bound a constant owns that is also stated
    in help text is pinned against that constant, per flag — a page-wide
    search would let --range-threshold cover for --min-confidence."""

    @staticmethod
    def _flag_help(runner, command, flag):
        r = runner.invoke(cli, [command, "--help"])
        assert r.exit_code == 0
        block, collecting = [], False
        for line in r.output.splitlines():
            stripped = line.strip()
            starts_option = stripped.startswith("-")
            if collecting and starts_option:
                break
            if f"{flag} " in line and starts_option:
                collecting = True
            if collecting:
                block.append(line)
        assert block, f"{flag} not found in {command} --help"
        return " ".join(block)

    def test_analyze_flag_bounds(self, runner):
        from birda_tpu.cli.validators import HELP_RANGES

        cases = [
            ("--min-confidence", HELP_RANGES["confidence"]),
            ("--batch-size", HELP_RANGES["batch_size"]),
            ("--lat", HELP_RANGES["latitude"]),
            ("--lon", HELP_RANGES["longitude"]),
            ("--week", HELP_RANGES["week"]),
            ("--month", HELP_RANGES["month"]),
            ("--day", HELP_RANGES["day"]),
            ("--day-of-year", HELP_RANGES["day_of_year"]),
            ("--range-threshold", HELP_RANGES["confidence"]),
        ]
        for flag, bound in cases:
            assert bound in self._flag_help(runner, "analyze", flag), flag

    def test_species_flag_bounds(self, runner):
        from birda_tpu.cli.validators import HELP_RANGES

        cases = [
            ("--lat", HELP_RANGES["latitude"]),
            ("--lon", HELP_RANGES["longitude"]),
            ("--week", HELP_RANGES["week"]),
            ("--month", HELP_RANGES["month"]),
            ("--day", HELP_RANGES["day"]),
            ("--threshold", HELP_RANGES["confidence"]),
        ]
        for flag, bound in cases:
            assert bound in self._flag_help(runner, "species", flag), flag

    def test_help_range_matches_validator(self):
        # The stated range and the enforced range come from one constant:
        # the boundary value passes, one past it fails, for each axis.
        import birda_tpu.cli.validators as v

        assert v.parse_week("48") == 48
        with pytest.raises(v.ValidationFailure):
            v.parse_week("49")
        assert v.parse_batch_size("512") == 512
        with pytest.raises(v.ValidationFailure):
            v.parse_batch_size("513")
        assert v.parse_confidence("1.0") == 1.0
        with pytest.raises(v.ValidationFailure):
            v.parse_confidence("1.01")


class TestLastResortErrorChain:
    def test_escaping_birda_error_prints_chain_not_traceback(
            self, home, monkeypatch, capsys):
        """A typed error escaping ANY command must reach the user as the
        cause chain (reference main.rs:43-52), never a traceback — the
        per-command handlers render the errors they expect, this is the
        wrapper for the ones they don't."""
        from birda_tpu.cli import main as cli_main
        from birda_tpu.errors import ConfigParse

        def exploding(*a, **kw):
            raise ConfigParse("config.toml", "boom at line 3")

        monkeypatch.setattr(cli_main.cli, "main", exploding)
        with pytest.raises(SystemExit) as ei:
            cli_main.main(["version"])
        assert ei.value.code == 1
        err = capsys.readouterr().err
        assert err.startswith("Error: ")
        assert "boom at line 3" in err
        assert "Traceback" not in err

    def test_bat_region_choice_validated_at_cli(self, runner, home):
        """--bat is a closed enum at the CLI layer (click.Choice), so a
        typo fails before any model loads."""
        r = runner.invoke(cli, ["analyze", "--bat", "narnia", "x.wav"])
        assert r.exit_code == 2
        assert "narnia" in r.output


class TestClipCliContract:
    """The clap contract on `clip` (reference clip.rs:17,48-54): --start
    and --end pair up, direct mode needs a source, and times/paddings are
    validated at parse (NaN/inf used to reach the extractor)."""

    def _wav(self, tmp_path):
        import numpy as np

        p = tmp_path / "a.wav"
        rate = 48000
        write_wav(p, np.zeros(rate * 5, np.float32), rate)
        return p

    def test_lone_start_is_usage_error(self, runner, home, tmp_path):
        """A lone --start used to fall silently into CSV mode, which then
        tried to parse the audio file as a detection CSV."""
        r = runner.invoke(cli, ["clip", "--start", "3", "x.csv"])
        assert r.exit_code == 2
        assert "must be given together" in r.output

    def test_direct_mode_requires_source(self, runner, home):
        r = runner.invoke(cli, ["clip", "--start", "1", "--end", "3"])
        assert r.exit_code == 2
        assert "requires --audio" in r.output

    def test_direct_mode_audio_flag(self, runner, home, tmp_path):
        """The reference's canonical direct invocation — `--audio <file>
        --start --end` with no positional FILES — used to die on click's
        required FILES argument."""
        wav = self._wav(tmp_path)
        r = runner.invoke(cli, [
            "clip", "--audio", str(wav), "--start", "1", "--end", "3",
            "-o", str(tmp_path / "clips"),
        ])
        assert r.exit_code == 0, r.output
        assert "Extracted 1 clip(s)" in r.output

    def test_direct_mode_audio_and_files_conflict(self, runner, home,
                                                  tmp_path):
        wav = self._wav(tmp_path)
        r = runner.invoke(cli, [
            "clip", str(wav), "--audio", str(wav),
            "--start", "1", "--end", "3",
        ])
        assert r.exit_code == 2
        assert "not both" in r.output

    def test_non_finite_time_rejected_at_parse(self, runner, home, tmp_path):
        wav = self._wav(tmp_path)
        for bad in ("nan", "inf", "-1"):
            r = runner.invoke(cli, [
                "clip", "--audio", str(wav), "--start", bad, "--end", "3",
            ])
            assert r.exit_code == 2, (bad, r.output)
            assert "finite non-negative" in r.output

    def test_padding_bounds_at_parse(self, runner, home):
        for bad, msg in (("nan", "finite non-negative"),
                         ("-0.5", "finite non-negative"),
                         ("301", "cannot exceed")):
            r = runner.invoke(cli, ["clip", "--pre", bad, "x.csv"])
            assert r.exit_code == 2, (bad, r.output)
            assert msg in r.output


class TestGeomodelDiscoverability:
    """Mirror of the reference's geomodel_discoverability suite (#287):
    the geomodel lives in registry.range_filter, not registry.models, so
    every dispatch and listing over models needs its own branch for it."""

    def test_info_geomodel_shows_licence_terms(self, runner, home):
        """The only place the CC BY-SA share-alike obligation surfaces
        before the user commits to the download."""
        r = runner.invoke(cli, ["models", "info", "geomodel"])
        assert r.exit_code == 0, r.output
        assert "BirdNET Geomodel" in r.output
        assert "CC-BY-SA-4.0" in r.output
        assert "Share-alike required: Yes" in r.output

    def test_info_geomodel_shows_coverage_and_size(self, runner, home):
        r = runner.invoke(cli, ["models", "info", "geomodel"])
        assert r.exit_code == 0, r.output
        assert "12012" in r.output
        assert "Download size" in r.output
        # The label alone proves nothing: human_size(None) renders
        # "unknown size" under the same label — the size must RESOLVE.
        assert "unknown size" not in r.output

    def test_info_geomodel_languages_flag_handled(self, runner, home):
        r = runner.invoke(cli, ["models", "info", "geomodel", "--languages"])
        assert r.exit_code == 0, r.output
        assert "no label language variants" in r.output

    def test_info_rejects_registry_asset_id(self, runner, home):
        """One canonical handle: `models install` accepts only "geomodel",
        so `models info` must reject the internal asset id too — or the
        two commands would disagree on what the user should type."""
        r = runner.invoke(cli, ["models", "info", "birdnet-geomodel-v3"])
        assert r.exit_code == 1
        assert "birdnet-geomodel-v3" in r.output
        assert "Range filter:" not in r.output

    def test_list_available_mentions_range_filter(self, runner, home):
        r = runner.invoke(cli, ["models", "list-available"])
        assert r.exit_code == 0, r.output
        assert "Range filter" in r.output
        assert "geomodel" in r.output

    def test_list_available_license_restriction_notes(self, runner, home):
        """license_line names whichever restrictions apply on EVERY entry
        (reference registry/mod.rs:117-139): birdnet-v24 must show both
        non-commercial and share-alike, the geomodel share-alike only."""
        r = runner.invoke(cli, ["models", "list-available"])
        assert "non-commercial, share-alike" in r.output
        assert "CC-BY-SA-4.0 (share-alike)" in r.output

    def test_list_available_json_sibling_field(self, runner, home):
        r = runner.invoke(cli, ["models", "list-available",
                                "--output-mode", "json"])
        assert r.exit_code == 0, r.output
        doc = json.loads(r.output)
        p = doc[0]["payload"] if isinstance(doc, list) else doc["payload"]
        rf = p["available_range_filter"]
        assert rf["id"] == "geomodel"  # the install handle a user types
        assert rf["share_alike"] is True
        assert rf["species_count"] == 12012
        assert isinstance(rf["size_bytes"], int) and rf["size_bytes"] > 0
        # The additive claim: the geomodel must NOT leak into models —
        # a consumer building a -m picker would offer an entry that
        # fails on use.
        assert p["models"], "precondition: classifier list populated"
        assert not any(m["id"] in ("geomodel", "birdnet-geomodel-v3")
                       for m in p["models"])


class TestGlobalOutputMode:
    def test_global_flag_before_subcommand(self, runner, home):
        """--output-mode is a top-level arg in the reference (args.rs:64):
        `birda --output-mode json models list-available` must route to
        the models command — previously the analyze-prepend heuristic
        turned it into an analyze run over inputs named "models" and
        "list-available"."""
        import subprocess
        import sys as _sys

        r = subprocess.run(
            [_sys.executable, "-m", "birda_tpu.cli.main",
             "--output-mode", "json", "models", "list-available"],
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 0, r.stderr
        doc = json.loads(r.stdout)
        p = doc[0]["payload"] if isinstance(doc, list) else doc["payload"]
        assert p["result_type"] == "available_models"

    def test_env_route_reaches_subcommands(self, runner, home, monkeypatch):
        """BIRDA_OUTPUT_MODE is the reference's global env route; every
        structured subcommand must read it, not just analyze."""
        monkeypatch.setenv("BIRDA_OUTPUT_MODE", "json")
        r = runner.invoke(cli, ["models", "list-available"])
        assert r.exit_code == 0, r.output
        doc = json.loads(r.output)
        p = doc[0]["payload"] if isinstance(doc, list) else doc["payload"]
        assert p["result_type"] == "available_models"


class TestDefaultVerbosityTimingMetrics:
    def test_summary_visible_without_v(self, home, tmp_path):
        """The reference's default filter is info (lib.rs init_logging:
        "info,ort=off"), so a bare run reports Processing/Complete/
        segments-per-sec without -v (cli_output_integration.rs::
        test_timing_metrics_in_output). Ours used to default to WARNING —
        a successful run printed nothing at all."""
        import subprocess
        import sys as _sys

        wav = make_audio(tmp_path, name="t.wav")
        r = subprocess.run(
            [_sys.executable, "-m", "birda_tpu.cli.main",
             "models", "add", "tiny", "--path", "synthetic:tiny",
             "--labels", "synthetic:tiny", "--type", "birdnet-v24",
             "--default"],
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 0, r.stderr
        r = subprocess.run(
            [_sys.executable, "-m", "birda_tpu.cli.main",
             "analyze", str(wav), "--output-dir", str(tmp_path / "out"),
             "--cpu", "--min-confidence", "0"],
            capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr
        assert "Processing:" in r.stderr
        assert "segments/sec" in r.stderr
        assert "Complete:" in r.stderr
        # stdout stays clean for the JSON protocol (no stray prints).
        assert "segments/sec" not in r.stdout


class TestConfigSetClearsAndPathArms:
    """Reference handle_config_set semantics (lib.rs:1432+): an empty
    value clears every arm (None for optionals, the field default
    otherwise) — the only route to "unset" short of hand-editing — and
    the geomodel path arms exist so a local copy is settable."""

    def test_empty_clears_optional(self, runner, home):
        r = runner.invoke(cli, ["config", "set", "defaults.day_of_year",
                                "200"])
        assert r.exit_code == 0, r.output
        r = runner.invoke(cli, ["config", "set", "defaults.day_of_year", ""])
        assert r.exit_code == 0, r.output
        from birda_tpu.config import file as config_file

        cfg = config_file.load_default_config()
        assert cfg.defaults.day_of_year is None  # back to mtime auto-detect

    def test_empty_resets_defaulted_field(self, runner, home):
        r = runner.invoke(cli, ["config", "set", "defaults.min_confidence",
                                "0.9"])
        assert r.exit_code == 0, r.output
        r = runner.invoke(cli, ["config", "set", "defaults.min_confidence",
                                ""])
        assert r.exit_code == 0, r.output
        from birda_tpu.config import file as config_file
        from birda_tpu.config.types import DefaultsConfig

        cfg = config_file.load_default_config()
        assert cfg.defaults.min_confidence == DefaultsConfig().min_confidence

    def test_geomodel_path_arms(self, runner, home, tmp_path):
        geo = tmp_path / "geo.onnx"
        labels = tmp_path / "geo.txt"
        r = runner.invoke(cli, ["config", "set", "defaults.geomodel",
                                str(geo)])
        assert r.exit_code == 0, r.output
        r = runner.invoke(cli, ["config", "set", "defaults.geomodel_labels",
                                str(labels)])
        assert r.exit_code == 0, r.output
        from birda_tpu.config import file as config_file

        cfg = config_file.load_default_config()
        assert cfg.defaults.geomodel == geo
        assert cfg.defaults.geomodel_labels == labels
        # And both clear.
        runner.invoke(cli, ["config", "set", "defaults.geomodel", ""])
        runner.invoke(cli, ["config", "set", "defaults.geomodel_labels", ""])
        cfg = config_file.load_default_config()
        assert cfg.defaults.geomodel is None
        assert cfg.defaults.geomodel_labels is None

    def test_empty_model_clears_default(self, runner, home):
        setup_synthetic_model(runner, home)
        r = runner.invoke(cli, ["config", "set", "defaults.model", ""])
        assert r.exit_code == 0, r.output
        from birda_tpu.config import file as config_file

        cfg = config_file.load_default_config()
        assert cfg.defaults.model is None


class TestModelGalleryRegional:
    """Mirror of the reference's model_gallery_regional suite: the regions
    listing is a memory-footprint decision aid, info carries the exact
    upstream identity + our build revision, and selection errors fire
    BEFORE any license prompt or download."""

    def test_regions_grouped_by_continent(self, runner, home):
        r = runner.invoke(cli, ["models", "regions", "birdnet-v30"])
        assert r.exit_code == 0, r.output
        assert "Europe:" in r.output
        assert "Asia:" in r.output
        assert "nordic" in r.output

    def test_regions_report_species_and_sizes(self, runner, home):
        r = runner.invoke(cli, ["models", "regions", "birdnet-v30"])
        assert "species" in r.output
        assert "MB" in r.output

    def test_regions_unknown_model_named(self, runner, home):
        r = runner.invoke(cli, ["models", "regions", "not-a-model"])
        assert r.exit_code == 1
        assert "not-a-model" in r.output

    def test_perch_publishes_regions_too(self, runner, home):
        r = runner.invoke(cli, ["models", "regions", "perch-v2"])
        assert r.exit_code == 0, r.output
        assert "nordic" in r.output

    def test_install_unknown_region_rejected_before_download(self, runner,
                                                             home):
        """Selection precedes the license gate (reference lib.rs:2110-2172):
        the rejection must name the typo AND the valid regions — and fire
        without -y, not stall at a license prompt."""
        r = runner.invoke(cli, ["models", "install", "birdnet-v30",
                                "--region", "atlantis"])
        assert r.exit_code == 1
        assert "atlantis" in r.output
        assert "nordic" in r.output
        assert "License" not in r.output

    def test_install_unknown_variant_rejected(self, runner, home):
        r = runner.invoke(cli, ["models", "install", "birdnet-v30",
                                "--variant", "int4", "-y"])
        assert r.exit_code == 1
        assert "int4" in r.output
        # The rejection names the valid ids (reference
        # selection.rs:195-201 + model_gallery_regional.rs).
        assert "fp32" in r.output

    def test_install_region_on_regionless_model_rejected(self, runner, home):
        """Silently ignoring --region would install the GLOBAL model while
        the user believed they asked for a regional one."""
        r = runner.invoke(cli, ["models", "install", "birdnet-v24",
                                "--region", "nordic", "-y"])
        assert r.exit_code == 1
        assert "no regional variants" in r.output

    def test_install_variant_on_single_file_model_rejected(self, runner,
                                                           home):
        r = runner.invoke(cli, ["models", "install", "birdnet-v24",
                                "--variant", "fp16", "-y"])
        assert r.exit_code == 1
        assert "single file" in r.output

    def test_info_shows_exact_upstream_version_and_build(self, runner, home):
        """"3.0" would be a lie: the published weights are preview3.1, and
        GA will be different weights under a version string that must not
        collide; build is our conversion revision of those weights."""
        r = runner.invoke(cli, ["models", "info", "birdnet-v30"])
        assert "3.0-preview3.1" in r.output
        assert "build 1" in r.output

    def test_info_reports_variants_and_regional_count(self, runner, home):
        r = runner.invoke(cli, ["models", "info", "birdnet-v30"])
        assert "Variants:" in r.output
        assert "Regional models: 39" in r.output

    def test_info_legacy_entry_files_and_languages(self, runner, home):
        r = runner.invoke(cli, ["models", "info", "birdnet-v24"])
        assert "Files:" in r.output
        assert "languages available" in r.output

    def test_languages_flag_fails_on_variant_entry(self, runner, home):
        r = runner.invoke(cli, ["models", "info", "birdnet-v30",
                                "--languages"])
        assert r.exit_code == 1
        assert "language variants" in r.output


class TestClipStructuredFailureContract:
    """The #319 failure channels (reference clip_integration_test.rs):
    json stays ONE document even on total failure (failed_files inside
    the result, exit 1); ndjson additionally streams per-file error
    events; direct mode applies padding and the reference clip naming."""

    def _bad_csv(self, tmp_path, name="rec.wav.BirdNET.results.csv"):
        p = tmp_path / name
        p.write_text("Start (s),End (s),Scientific name,Common name,"
                     "Confidence\nabc,3.0,Parus major,Great Tit,0.85\n")
        return p

    def test_json_total_failure_single_document(self, runner, home,
                                                tmp_path):
        bad = self._bad_csv(tmp_path)
        r = runner.invoke(cli, ["clip", str(bad), "-o",
                                str(tmp_path / "clips"),
                                "--output-mode", "json"])
        assert r.exit_code == 1
        docs = json.loads(r.output)  # must parse as ONE array document
        assert len(docs) == 1
        assert docs[0]["event"] == "result"
        assert docs[0]["payload"]["result_type"] == "clip_extraction"
        assert len(docs[0]["payload"]["failed_files"]) == 1

    def test_ndjson_total_failure_streams_error_events(self, runner, home,
                                                       tmp_path):
        bad = self._bad_csv(tmp_path)
        r = runner.invoke(cli, ["clip", str(bad), "-o",
                                str(tmp_path / "clips"),
                                "--output-mode", "ndjson"])
        assert r.exit_code == 1
        evs = [json.loads(l) for l in r.output.splitlines() if l.strip()]
        assert any(e["event"] == "error" for e in evs)
        res = [e for e in evs if e["event"] == "result"][0]
        assert len(res["payload"]["failed_files"]) == 1

    def test_json_partial_failure_exits_zero_single_doc(self, runner, home,
                                                        tmp_path):
        wav = make_audio(tmp_path, name="good.wav", secs=5.0)
        good = tmp_path / "good.wav.BirdNET.results.csv"
        good.write_text("Start (s),End (s),Scientific name,Common name,"
                        "Confidence\n0.0,3.0,Parus major,Great Tit,0.85\n")
        bad = self._bad_csv(tmp_path, "bad.wav.BirdNET.results.csv")
        r = runner.invoke(cli, ["clip", str(good), str(bad), "-o",
                                str(tmp_path / "clips"),
                                "--output-mode", "json",
                                "--pre", "0", "--post", "0"])
        assert r.exit_code == 0, r.output
        docs = json.loads(r.output)
        assert len(docs) == 1
        p = docs[0]["payload"]
        assert p["total_clips"] == 1
        assert len(p["failed_files"]) == 1

    def test_direct_mode_applies_padding_and_reference_naming(self, runner,
                                                              home,
                                                              tmp_path):
        """The generic clip is named after the RAW requested range while
        the extraction uses the padded one (reference command.rs:190-198)."""
        wav = make_audio(tmp_path, name="a.wav", secs=5.0)
        out = tmp_path / "clips"
        r = runner.invoke(cli, ["clip", "--audio", str(wav),
                                "--start", "2", "--end", "3",
                                "--pre", "1", "--post", "0.5",
                                "-o", str(out)])
        assert r.exit_code == 0, r.output
        clips = list(out.rglob("*.wav"))
        assert len(clips) == 1
        assert clips[0].parent.name == "detection_2-3"
        assert "1.0-3.5" in clips[0].name  # the padded extraction range


class TestRegionsTileIsInstallPick:
    def test_tile_shows_default_variant_size(self, runner, home):
        """Each region tile is represented by the variant an install
        would pick, not the first in manifest order (reference
        types.rs:173-189): Perch lists int8-arm (42 MB) before the
        default no-dft-fp32 (62 MB) for every region — first-in-order
        would advertise a download size the install doesn't fetch."""
        r = runner.invoke(cli, ["models", "regions", "perch-v2"])
        assert r.exit_code == 0, r.output
        nordic = [l for l in r.output.splitlines() if "nordic" in l][0]
        assert "62.0 MB" in nordic, nordic

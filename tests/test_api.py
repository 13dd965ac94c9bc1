"""Library API tests: birda_tpu.analyze returns detections in memory
through the same orchestrator/pipeline path as the CLI."""

from pathlib import Path

import numpy as np
import pytest

from birda_tpu.config.types import Config, ModelConfig, ModelType
from fixtures_audio import write_wav


@pytest.fixture()
def home(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "config"))
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
    monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path / "data"))
    monkeypatch.setenv("BIRDA_NO_COMPILE_CACHE", "1")
    return tmp_path


def synthetic_config():
    cfg = Config()
    cfg.models["tiny"] = ModelConfig(
        path=Path("synthetic:tiny"), labels=Path("synthetic:tiny"),
        model_type=ModelType.BIRDNET_V24,
    )
    cfg.defaults.model = "tiny"
    return cfg


def make_audio(tmp_path, name="rec.wav", secs=4.0, rate=48000):
    p = tmp_path / name
    t = np.arange(int(rate * secs)) / rate
    write_wav(p, (0.4 * np.sin(2 * np.pi * 2000 * t)).astype(np.float32), rate)
    return p


class TestLibraryApi:
    def test_lazy_toplevel_exports(self):
        import birda_tpu

        assert callable(birda_tpu.analyze)
        assert birda_tpu.Detection.__name__ == "Detection"
        assert "analyze" in dir(birda_tpu)
        with pytest.raises(AttributeError):
            birda_tpu.not_a_thing

    def test_analyze_returns_in_memory_detections(self, home, tmp_path):
        import birda_tpu

        audio = make_audio(tmp_path)
        before = sorted(tmp_path.iterdir())
        res = birda_tpu.analyze(
            [audio], device="cpu", min_confidence=0.0,
            config=synthetic_config(),
        )
        assert res.exit_code == 0
        assert len(res.files) == 1
        f = res.files[0]
        assert f.ok and f.path == audio
        assert f.detections, "min_confidence=0 must yield detections"
        d = f.detections[0]
        assert d.end_time > d.start_time >= 0.0
        assert 0.0 <= d.confidence <= 1.0
        assert d.scientific_name
        # Library mode writes NO output files (lock files are transient).
        assert sorted(tmp_path.iterdir()) == before
        # Run-level flattening helper.
        assert len(res.detections) == sum(
            len(x.detections) for x in res.files)

    def test_per_file_isolation_and_error_capture(self, home, tmp_path):
        import birda_tpu

        good = make_audio(tmp_path, "good.wav")
        bad = tmp_path / "bad.wav"
        bad.write_bytes(b"RIFFxxxxWAVEjunk" + b"\x00" * 64)
        res = birda_tpu.analyze(
            [bad, good], device="cpu", min_confidence=0.0,
            config=synthetic_config(),
        )
        by_name = {f.path.name: f for f in res.files}
        assert by_name["good.wav"].ok and by_name["good.wav"].detections
        assert not by_name["bad.wav"].ok
        assert by_name["bad.wav"].error
        # Reference semantics: nonzero exit only when NO file processed.
        assert res.exit_code == 0
        res_all_bad = birda_tpu.analyze(
            [bad], device="cpu", config=synthetic_config())
        assert res_all_bad.exit_code == 1

    def test_bad_device_is_typed(self, home, tmp_path):
        import birda_tpu
        from birda_tpu.errors import ConfigValidation

        with pytest.raises(ConfigValidation, match="device"):
            birda_tpu.analyze([tmp_path / "x.wav"], device="quantum",
                              config=synthetic_config())

    def test_matches_cli_csv_scores(self, home, tmp_path):
        # The library path must produce the same detections as a
        # file-writing run (same orchestrator, same chunk runner).
        import birda_tpu
        from birda_tpu.orchestrator import AnalyzeOptions, analyze_files
        from birda_tpu.pipeline.coordinator import OutputFormat

        audio = make_audio(tmp_path)
        res = birda_tpu.analyze([audio], device="cpu", min_confidence=0.1,
                                config=synthetic_config())
        out = tmp_path / "out"
        analyze_files(
            AnalyzeOptions(inputs=[audio], output_dir=out,
                           formats=[OutputFormat.CSV], min_confidence=0.1,
                           device_flags={"cpu": True}),
            synthetic_config(),
        )
        csv = (out / "rec.BirdNET.results.csv").read_text(
            encoding="utf-8-sig").strip().splitlines()
        rows = [line.split(",") for line in csv[1:]]
        got = [(d.start_time, d.scientific_name, round(d.confidence, 4))
               for d in res.detections]
        want = [(float(r[0]), r[2], float(r[4])) for r in rows]
        assert sorted(got) == sorted(want)

    def test_species_list_in_memory(self, home, tmp_path, monkeypatch):
        import fixtures_onnx as fo

        import birda_tpu
        from birda_tpu.config import file as config_file
        from birda_tpu.config.types import Config

        geo = tmp_path / "geo.onnx"
        geo.write_bytes(fo.make_fixture_geomodel(num_species=50))
        labels = tmp_path / "geo-labels.txt"
        labels.write_text("".join(f"Genus{i} sp{i}_Common {i}\n"
                                  for i in range(50)))
        entries = birda_tpu.species(
            60.0, 24.0, week=24, threshold=0.0,
            geomodel_path=geo, geomodel_labels_path=labels)
        assert entries and all(e.score >= 0.0 for e in entries)
        e = entries[0]
        assert e.scientific_name.startswith("Genus")
        assert e.label.count("_") == 1
        # freq sort is descending
        scores = [x.score for x in entries]
        assert scores == sorted(scores, reverse=True)

    def test_species_validation_typed(self, home):
        import birda_tpu
        from birda_tpu.errors import ConfigValidation

        with pytest.raises(ConfigValidation, match="week"):
            birda_tpu.species(60.0, 24.0)
        with pytest.raises(ConfigValidation, match="together"):
            birda_tpu.species(60.0, 24.0, week=1, geomodel_path="g.onnx")

    def test_clip_from_results_csv(self, home, tmp_path):
        import birda_tpu

        audio = make_audio(tmp_path, "rec.wav", secs=6.0)
        csv = tmp_path / "rec.BirdNET.results.csv"
        csv.write_text(
            "Start (s),End (s),Scientific name,Common name,Confidence,File\n"
            f"0.0,3.0,Parus major,Great Tit,0.9,{audio}\n"
            f"3.0,6.0,Parus major,Great Tit,0.2,{audio}\n")
        out = tmp_path / "clips"
        summary = birda_tpu.clip([csv], out, min_confidence=0.5)
        assert summary.total_clips == 1
        wavs = list(out.glob("**/*.wav"))
        assert len(wavs) == 1


class TestLibraryApiHardening:
    """Review-pass fixes: the library is the fourth validation route and
    must enforce the same bounds as CLI flags, env vars, and config.toml."""

    def test_bounds_validated_like_the_cli(self, home, tmp_path):
        import birda_tpu
        from birda_tpu.errors import ConfigValidation

        audio = make_audio(tmp_path)
        cases = [
            dict(week=53), dict(lat=500.0), dict(lon=-500.0),
            dict(min_confidence=1.5), dict(batch_size=100000),
            dict(month=13), dict(day=32), dict(day_of_year=367),
            dict(range_threshold=2.0), dict(precision="fp16"),
            dict(range_unmatched="discard"),
        ]
        for kw in cases:
            with pytest.raises(ConfigValidation):
                birda_tpu.analyze([audio], config=synthetic_config(),
                                  device="cpu", **kw)
        with pytest.raises(ConfigValidation):
            birda_tpu.species(60.0, 24.0, week=53)

    def test_bare_string_input_is_one_path(self, home, tmp_path):
        import birda_tpu

        audio = make_audio(tmp_path)
        res = birda_tpu.analyze(str(audio), device="cpu",
                                min_confidence=0.0,
                                config=synthetic_config())
        assert len(res.files) == 1 and res.files[0].ok

    def test_dropped_inputs_surface_as_errors(self, home, tmp_path):
        import birda_tpu

        good = make_audio(tmp_path)
        missing = tmp_path / "typo.wav"
        not_audio = tmp_path / "notes.txt"
        not_audio.write_text("field notes")
        res = birda_tpu.analyze([good, missing, not_audio], device="cpu",
                                min_confidence=0.0,
                                config=synthetic_config())
        by_name = {f.path.name: f for f in res.files}
        assert by_name["rec.wav"].ok
        assert by_name["typo.wav"].error == "input path does not exist"
        assert by_name["notes.txt"].error == "not a supported audio file"

    def test_skipped_file_is_not_ok(self, home, tmp_path):
        import birda_tpu
        from birda_tpu.locking.file_lock import FileLock

        audio = make_audio(tmp_path)
        lock = FileLock.acquire(audio, tmp_path)  # foreign live lock
        try:
            res = birda_tpu.analyze([audio], device="cpu",
                                    config=synthetic_config())
        finally:
            lock.release()
        f = res.files[0]
        assert f.skipped and not f.ok and f.error is None

    def test_month_day_route_activates_range_filter(self, home, tmp_path):
        # The CLI's --month/--day route exists on the library too.
        import fixtures_onnx as fo

        import birda_tpu
        from birda_tpu.models.zoo import tiny_model

        labels = tiny_model().labels
        geo = tmp_path / "geo.onnx"
        geo.write_bytes(fo.make_fixture_geomodel(num_species=50))
        geo_labels = tmp_path / "geo-labels.txt"
        geo_labels.write_text("".join(f"{l}\n" for l in labels[:50]))
        cfg = synthetic_config()
        cfg.defaults.geomodel = geo
        cfg.defaults.geomodel_labels = geo_labels
        audio = make_audio(tmp_path)
        res = birda_tpu.analyze(
            [audio], device="cpu", min_confidence=0.0, config=cfg,
            lat=60.0, lon=24.0, month=6, day=15,
            range_threshold=0.0, range_unmatched="drop")
        assert res.files[0].ok

    def test_force_false_never_resume_skips_library_runs(self, home,
                                                         tmp_path):
        # A prior CLI run left a CSV next to the audio; the library writes
        # no files, so output existence must not skip the request.
        import birda_tpu

        audio = make_audio(tmp_path)
        (tmp_path / "rec.BirdNET.results.csv").write_text("stale")
        res = birda_tpu.analyze([audio], device="cpu", min_confidence=0.0,
                                force=False, config=synthetic_config())
        assert res.files[0].ok and res.files[0].detections

    def test_vendor_named_in_license_prompt(self, monkeypatch, tmp_path,
                                            capsys):
        import sys as _sys

        from birda_tpu.registry import license as license_mod
        from birda_tpu.registry.schema import LicenseInfo

        monkeypatch.setattr(
            license_mod, "_acceptances_path", lambda: tmp_path / "acc.json")
        monkeypatch.setattr(_sys.stdin, "isatty", lambda: True)
        lic = LicenseInfo(type="CC-BY-NC-SA-4.0", commercial_use=False,
                          attribution_required=True, share_alike=True)
        license_mod.prompt_license_acceptance(
            "m", "Model M", lic, input_fn=lambda _: "y", vendor="Cornell")
        assert "attribution to Cornell" in capsys.readouterr().err

"""BSG post-processing + bat custom classifier + geomodel resolution tests."""

import numpy as np
import pytest

from birda_tpu.config.geomodel import resolve_geomodel, require_geomodel
from birda_tpu.config.types import Config
from birda_tpu.errors import (
    BsgCalibration,
    BsgDistributionMaps,
    GeomodelNotInstalled,
    GeomodelPathsIncomplete,
)
from birda_tpu.inference.bsg import (
    BsgPostProcessor,
    DistributionMaps,
    MigrationWindow,
    load_calibration,
    load_migration,
)
from birda_tpu.inference.geomodel_filter import Prediction
from birda_tpu.models.custom import CustomClassifier, read_labels
from birda_tpu.registry.loader import load_embedded


def write_calibration(path, rows):
    path.write_text(
        "species,coef,intercept\n"
        + "\n".join(f"{s},{c},{i}" for s, c, i in rows)
        + "\n"
    )


class TestCalibration:
    def test_platt_scaling(self, tmp_path):
        p = tmp_path / "cal.csv"
        # Identity calibration: coef=1, intercept=0 -> unchanged.
        write_calibration(p, [("Parus major_Talitiainen", 1.0, 0.0),
                              ("Turdus merula_Mustarastas", 2.0, 1.0)])
        proc = BsgPostProcessor(load_calibration(p))
        preds = [
            Prediction("Parus major_Talitiainen", 0.8, 0),
            Prediction("Turdus merula_Mustarastas", 0.5, 1),
            Prediction("Corvus corax_Korppi", 0.6, 2),  # uncalibrated passes
        ]
        out = proc.calibrate(preds)
        assert out[0].confidence == pytest.approx(0.8, abs=1e-6)
        # logit(0.5)=0 -> sigmoid(1.0) = 0.731
        assert out[1].confidence == pytest.approx(0.7310586, abs=1e-5)
        assert out[2].confidence == 0.6

    def test_bad_header(self, tmp_path):
        p = tmp_path / "cal.csv"
        p.write_text("a,b,c\n1,2,3\n")
        with pytest.raises(BsgCalibration):
            load_calibration(p)

    def test_empty(self, tmp_path):
        p = tmp_path / "cal.csv"
        p.write_text("species,coef,intercept\n")
        with pytest.raises(BsgCalibration):
            load_calibration(p)


class TestMigration:
    def test_window(self, tmp_path):
        p = tmp_path / "mig.csv"
        p.write_text("species,start_day,end_day\nA a_X,100,200\nB b_Y,300,60\n")
        mig = load_migration(p)
        assert mig["a a"].contains(150)
        assert not mig["a a"].contains(250)
        # Wrapping window (winter presence).
        assert mig["b b"].contains(350)
        assert mig["b b"].contains(30)
        assert not mig["b b"].contains(150)


class TestDistributionMaps:
    def make_maps(self, tmp_path):
        # 2x2 grid over Finland-ish box; species present only in the north.
        grids = {"Parus major": bytes([1, 1, 0, 0])}
        p = tmp_path / "maps.bin"
        DistributionMaps.write(p, 2, 2, 59.0, 70.0, 19.0, 32.0, grids)
        return DistributionMaps.load(p)

    def test_presence_lookup(self, tmp_path):
        maps = self.make_maps(tmp_path)
        assert maps.present("Parus major_Great Tit", 69.0, 25.0) is True   # north
        assert maps.present("Parus major_Great Tit", 60.0, 25.0) is False  # south
        assert maps.present("Parus major_Great Tit", 40.0, 25.0) is False  # outside
        assert maps.present("Corvus corax_Raven", 69.0, 25.0) is None      # no map

    def test_bad_magic(self, tmp_path):
        p = tmp_path / "maps.bin"
        p.write_bytes(b"NOPE")
        with pytest.raises(BsgDistributionMaps):
            DistributionMaps.load(p)

    def test_truncated_grid_is_load_error(self, tmp_path):
        # A file cut mid-grid must fail at load (slicing never raises on a
        # short tail; unchecked it IndexErrors much later in present()).
        p = tmp_path / "maps.bin"
        DistributionMaps.write(
            p, 2, 2, 59.0, 70.0, 19.0, 32.0,
            {"Parus major": bytes([1, 1, 0, 0])},
        )
        p.write_bytes(p.read_bytes()[:-2])
        with pytest.raises(BsgDistributionMaps, match="truncated"):
            DistributionMaps.load(p)

    def test_full_process(self, tmp_path):
        cal = tmp_path / "cal.csv"
        write_calibration(cal, [("Parus major_Talitiainen", 1.0, 0.0)])
        mig = tmp_path / "mig.csv"
        mig.write_text("species,start_day,end_day\nParus major_X,1,366\n")
        maps_path = tmp_path / "maps.bin"
        DistributionMaps.write(
            maps_path, 1, 1, 59.0, 70.0, 19.0, 32.0, {"Parus major": b"\x01"}
        )
        proc = BsgPostProcessor.from_paths(cal, mig, maps_path)
        assert proc.has_sdm
        preds = [Prediction("Parus major_Talitiainen", 0.9, 0)]
        out = proc.process(preds, 62.0, 25.0, 150)
        assert len(out) == 1
        out = proc.process(preds, 45.0, 25.0, 150)  # outside the box
        assert out == []


class TestCustomClassifier:
    def test_linear_head(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(16, 4)).astype(np.float32)

        def head(emb):
            import jax

            return jax.nn.sigmoid(emb @ w)

        labels = [f"Bat sp{i}_Bat {i}" for i in range(4)]
        c = CustomClassifier(head, labels, min_confidence=0.0, top_k=2)
        emb = rng.normal(size=(3, 16)).astype(np.float32)
        preds = c.predict_batch(emb)
        assert len(preds) == 3
        assert all(len(p) == 2 for p in preds)
        want = 1 / (1 + np.exp(-(emb @ w)))
        assert preds[0][0].confidence == pytest.approx(
            float(want[0].max()), abs=1e-5
        )

    def test_from_onnx(self, tmp_path):
        import fixtures_onnx as fo

        head_path = tmp_path / "bat.onnx"
        head_path.write_bytes(fo.make_fixture_geomodel(num_species=6))
        labels_path = tmp_path / "labels.txt"
        labels_path.write_text("\n".join(f"Bat{i} x_B{i}" for i in range(6)))
        c = CustomClassifier.from_onnx(head_path, labels_path,
                                       min_confidence=0.0, top_k=3)
        preds = c.predict_batch(np.zeros((1, 3), np.float32))
        assert len(preds[0]) == 3

    def test_reclassify(self):
        from birda_tpu.inference.classifier import PredictionResult

        def head(emb):
            import jax.numpy as jnp

            return jnp.tile(jnp.asarray([[0.9, 0.1]]), (emb.shape[0], 1))

        c = CustomClassifier(head, ["Bat a_A", "Bat b_B"],
                             min_confidence=0.5, top_k=2)
        results = [
            PredictionResult(
                predictions=[Prediction("Bird x_X", 0.8, 0)],
                embeddings=np.zeros(8, np.float32),
            )
        ]
        out = c.reclassify(results)
        assert [p.species for p in out[0].predictions] == ["Bat a_A"]

    def test_read_labels(self, tmp_path):
        p = tmp_path / "l.txt"
        p.write_text("A a_X\n\nB b_Y\n")
        assert read_labels(p) == ["A a_X", "B b_Y"]


class TestGeomodelResolution:
    def test_explicit_paths(self, tmp_path):
        reg = load_embedded()
        cfg = Config()
        m = tmp_path / "geo.onnx"
        l = tmp_path / "geo-labels.txt"
        m.write_bytes(b"x")
        l.write_text("A a_X\n")
        cfg.defaults.geomodel = m
        cfg.defaults.geomodel_labels = l
        resolved = resolve_geomodel(cfg, reg)
        assert resolved.model_path == m

    def test_incomplete_explicit(self, tmp_path):
        reg = load_embedded()
        cfg = Config()
        cfg.defaults.geomodel = tmp_path / "geo.onnx"
        with pytest.raises(GeomodelPathsIncomplete):
            resolve_geomodel(cfg, reg)

    def test_missing_explicit_degrades_with_the_path_in_the_reason(
            self, tmp_path):
        # Reference geomodel.rs:147-157: a configured path pointing outside
        # the models directory is Unavailable (warn-and-continue on the
        # analyze path), never papered over by downloading elsewhere.
        from birda_tpu.config.geomodel import GeomodelUnavailable

        reg = load_embedded()
        cfg = Config()
        cfg.defaults.geomodel = tmp_path / "ghost.onnx"
        cfg.defaults.geomodel_labels = tmp_path / "ghost.txt"
        r = resolve_geomodel(cfg, reg)
        assert isinstance(r, GeomodelUnavailable)
        assert "ghost.onnx" in r.reason and "defaults.geomodel" in r.reason

    def test_explicit_path_is_taken_on_trust_no_checksum(self, tmp_path):
        # A user's own copy may legitimately be a different build; its
        # checksum is not ours to police (geomodel.rs:124-128) — even when
        # the filename matches the registry's.
        reg = load_embedded()
        cfg = Config()
        m = tmp_path / reg.range_filter.model.filename
        l = tmp_path / reg.range_filter.labels.filename
        m.write_bytes(b"definitely not the pinned bytes")
        l.write_text("A a_X\n")
        cfg.defaults.geomodel = m
        cfg.defaults.geomodel_labels = l
        r = resolve_geomodel(cfg, reg)
        assert r.model_path == m and r.verified

    def test_corrupt_managed_copy_is_not_loaded(self, monkeypatch, tmp_path):
        # The copy birda manages re-verifies on every resolve; a mismatch
        # means re-download, not "load the corrupt bytes with a warning"
        # (geomodel.rs:116-138).
        from birda_tpu.config.geomodel import GeomodelUnavailable
        from birda_tpu.registry import installer

        monkeypatch.setattr(installer, "models_dir", lambda: tmp_path)
        reg = load_embedded()
        (tmp_path / reg.range_filter.model.filename).write_bytes(b"corrupt")
        (tmp_path / reg.range_filter.labels.filename).write_text("A a_X\n")
        r = resolve_geomodel(Config(), reg)
        assert isinstance(r, GeomodelUnavailable)

    def test_unavailable_carries_the_install_hint(self, monkeypatch, tmp_path):
        from birda_tpu.config.geomodel import GeomodelUnavailable
        from birda_tpu.registry import installer

        monkeypatch.setattr(installer, "models_dir", lambda: tmp_path / "none")
        reg = load_embedded()
        r = resolve_geomodel(Config(), reg)
        assert isinstance(r, GeomodelUnavailable)
        assert "models install geomodel" in r.reason
        with pytest.raises(GeomodelNotInstalled):
            require_geomodel(Config(), reg)

    def test_corrupt_managed_reason_names_verification(self, monkeypatch,
                                                       tmp_path):
        """ADVICE r4: with a corrupt managed copy and no download allowed,
        the reason must say the installed copy failed verification — not
        promise a download that never happens, nor claim 'not installed'
        when a (corrupt) copy exists."""
        from birda_tpu.config.geomodel import GeomodelUnavailable
        from birda_tpu.registry import installer

        monkeypatch.setattr(installer, "models_dir", lambda: tmp_path)
        reg = load_embedded()
        (tmp_path / reg.range_filter.model.filename).write_bytes(b"corrupt")
        (tmp_path / reg.range_filter.labels.filename).write_text("A a_X\n")
        r = resolve_geomodel(Config(), reg)
        assert isinstance(r, GeomodelUnavailable)
        assert "failed checksum verification" in r.reason
        assert "not installed" not in r.reason

    def test_interactive_prompt_yes_downloads(self, monkeypatch, tmp_path,
                                              capsys):
        """Reference geomodel.rs::prompt_for_download: a terminal user is
        offered the download on stderr (name, sizes, licence); 'y' runs the
        install, anything else degrades with 'download declined'."""
        import io

        import birda_tpu.config.geomodel as gm
        from birda_tpu.registry import installer

        monkeypatch.setattr(installer, "models_dir",
                            lambda: tmp_path / "none")
        reg = load_embedded()
        installed = []
        monkeypatch.setattr(
            installer, "install_range_filter",
            lambda entry, progress=None, session=None: (
                installed.append(entry.id),
                (tmp_path / "m.onnx", tmp_path / "l.txt"),
            )[1],
        )
        monkeypatch.setattr("sys.stdin", io.StringIO("y\n"))
        r = resolve_geomodel(Config(), reg, interactive=True)
        assert installed and not isinstance(r, gm.GeomodelUnavailable)
        err = capsys.readouterr().err
        assert "Download it now? [y/N]" in err
        assert "Range filtering needs" in err

    def test_interactive_prompt_declined(self, monkeypatch, tmp_path):
        import io

        from birda_tpu.config.geomodel import GeomodelUnavailable
        from birda_tpu.registry import installer

        monkeypatch.setattr(installer, "models_dir",
                            lambda: tmp_path / "none")
        reg = load_embedded()
        monkeypatch.setattr("sys.stdin", io.StringIO("\n"))
        r = resolve_geomodel(Config(), reg, interactive=True)
        assert isinstance(r, GeomodelUnavailable)
        assert "download declined" in r.reason

    def test_interactive_prompt_closed_stdin_declines(self, monkeypatch,
                                                      tmp_path):
        """A CLOSED stdin (ValueError from readline, not just EOF) must
        decline gracefully, not crash resolve_geomodel — an embedding app
        may close stdin entirely."""
        import io

        from birda_tpu.config.geomodel import GeomodelUnavailable
        from birda_tpu.registry import installer

        monkeypatch.setattr(installer, "models_dir",
                            lambda: tmp_path / "none")
        reg = load_embedded()
        closed = io.StringIO()
        closed.close()
        monkeypatch.setattr("sys.stdin", closed)
        r = resolve_geomodel(Config(), reg, interactive=True)
        assert isinstance(r, GeomodelUnavailable)
        assert "download declined" in r.reason

    def test_interactive_prompt_corrupt_copy_wording(self, monkeypatch,
                                                     tmp_path, capsys):
        """A corrupt birda-managed copy prompts with 'failed checksum
        verification', never 'not installed' — a user who just installed
        it would read 'not installed' as the install silently failing."""
        import io

        from birda_tpu.config.geomodel import GeomodelUnavailable
        from birda_tpu.registry import installer

        monkeypatch.setattr(installer, "models_dir", lambda: tmp_path)
        reg = load_embedded()
        (tmp_path / reg.range_filter.model.filename).write_bytes(b"corrupt")
        (tmp_path / reg.range_filter.labels.filename).write_text("A a_X\n")
        monkeypatch.setattr("sys.stdin", io.StringIO("\n"))
        r = resolve_geomodel(Config(), reg, interactive=True)
        assert isinstance(r, GeomodelUnavailable)
        err = capsys.readouterr().err
        assert "failed checksum verification" in err
        assert "not installed" not in err


class TestBsgAnalyzeWiring:
    def test_calibration_applies_through_analyze(self, tmp_path, monkeypatch):
        """The analyze flow runs BSG post-processing (reference
        processor.rs:284-318): a strong negative calibration intercept must
        visibly lower every confidence vs the uncalibrated run."""
        import csv as _csv
        from pathlib import Path

        import numpy as np

        from birda_tpu.config.types import Config, ModelConfig, ModelType
        from birda_tpu.models.zoo import tiny_model
        from birda_tpu.orchestrator import AnalyzeOptions, analyze_files
        from fixtures_audio import write_wav

        monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "config"))
        monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
        monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path / "data"))
        monkeypatch.setenv("BIRDA_NO_COMPILE_CACHE", "1")

        # Calibrate EVERY label the tiny model can emit, pushing scores down.
        labels = tiny_model().labels
        cal = tmp_path / "cal.csv"
        cal.write_text("species,coef,intercept\n" + "".join(
            f"{lab},1.0,-3.0\n" for lab in labels))

        rate = 48_000
        t = np.arange(rate * 4) / rate
        audio = tmp_path / "rec.wav"
        write_wav(audio, (0.4 * np.sin(2 * np.pi * 2000 * t)).astype(
            np.float32), rate)

        def run(with_bsg, outdir):
            cfg = Config()
            cfg.models["m"] = ModelConfig(
                path=Path("synthetic:tiny"), labels=Path("synthetic:tiny"),
                model_type=(ModelType.BSG_FINLAND if with_bsg
                            else ModelType.BIRDNET_V24),
                bsg_calibration=cal if with_bsg else None,
            )
            cfg.defaults.model = "m"
            opts = AnalyzeOptions(
                inputs=[audio], output_dir=tmp_path / outdir,
                device_flags={"cpu": True}, min_confidence=0.0,
            )
            assert analyze_files(opts, cfg) == 0
            with open(tmp_path / outdir / "rec.BirdNET.results.csv",
                      encoding="utf-8-sig") as f:
                return [float(r["Confidence"])
                        for r in _csv.DictReader(f)]

        plain = run(False, "out_plain")
        calibrated = run(True, "out_bsg")
        assert plain and calibrated
        # logit shift of -3 must lower every calibrated confidence.
        assert max(calibrated) < max(plain)
        assert all(c < 0.55 for c in calibrated) or \
            np.mean(calibrated) < np.mean(plain) - 0.1

    def test_sdm_migration_window_drops_through_analyze(self, tmp_path,
                                                        monkeypatch):
        """SDM engages when location + day resolve: a migration window
        excluding the given day drops every mapped species."""
        import csv as _csv
        from pathlib import Path

        import numpy as np

        from birda_tpu.config.types import Config, ModelConfig, ModelType
        from birda_tpu.models.zoo import tiny_model
        from birda_tpu.orchestrator import AnalyzeOptions, analyze_files
        from fixtures_audio import write_wav

        monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "config"))
        monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
        monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path / "data"))
        monkeypatch.setenv("BIRDA_NO_COMPILE_CACHE", "1")

        labels = tiny_model().labels
        cal = tmp_path / "cal.csv"
        cal.write_text("species,coef,intercept\n" + "".join(
            f"{lab},1.0,0.0\n" for lab in labels))
        mig = tmp_path / "mig.csv"
        # Every species only present days 200-210; we analyze day 1.
        mig.write_text("species,start_day,end_day\n" + "".join(
            f"{lab},200,210\n" for lab in labels))

        rate = 48_000
        t = np.arange(rate * 4) / rate
        audio = tmp_path / "rec.wav"
        write_wav(audio, (0.4 * np.sin(2 * np.pi * 2000 * t)).astype(
            np.float32), rate)

        cfg = Config()
        cfg.models["m"] = ModelConfig(
            path=Path("synthetic:tiny"), labels=Path("synthetic:tiny"),
            model_type=ModelType.BSG_FINLAND,
            bsg_calibration=cal, bsg_migration=mig,
        )
        cfg.defaults.model = "m"
        opts = AnalyzeOptions(
            inputs=[audio], output_dir=tmp_path / "out_sdm",
            device_flags={"cpu": True}, min_confidence=0.0,
            lat=61.0, lon=25.0, day_of_year=1,
        )
        assert analyze_files(opts, cfg) == 0
        with open(tmp_path / "out_sdm" / "rec.BirdNET.results.csv",
                  encoding="utf-8-sig") as f:
            rows = list(_csv.DictReader(f))
        assert rows == []  # every mapped species outside its window

"""Config system tests: TOML roundtrip, validation rules, activation rules."""


import pytest

from birda_tpu.config.bat import BatConfig, BatRegion
from birda_tpu.config.file import load_config, save_config, update_config
from birda_tpu.config.range_filter import (
    build_range_filter_request,
    supports_range_filter,
    validate_threshold,
    wants_range_filter,
)
from birda_tpu.config.types import (
    Config,
    DefaultsConfig,
    InferenceDevice,
    ModelConfig,
    ModelType,
    OutputMode,
)
from birda_tpu.config.validate import get_model, validate_config, validate_model_config
from birda_tpu.errors import (
    BsgConfig,
    ConfigParse,
    ConfigValidation,
    InvalidLatitude,
    InvalidRangeThreshold,
    ModelFileNotFound,
    ModelNotFound,
)
from birda_tpu.inference.geomodel_filter import UnmatchedPolicy
from birda_tpu.pipeline.coordinator import OutputFormat


def model_cfg(tmp_path, mtype=ModelType.BIRDNET_V24, **kw):
    p = tmp_path / "model.onnx"
    l = tmp_path / "labels.txt"
    p.write_bytes(b"x")
    l.write_text("A a_X\n")
    return ModelConfig(path=p, labels=l, model_type=mtype, **kw)


class TestRoundtrip:
    def test_defaults_roundtrip(self, tmp_path):
        cfg = Config()
        cfg.defaults.model = None
        path = tmp_path / "config.toml"
        save_config(cfg, path)
        loaded = load_config(path)
        assert loaded.defaults.min_confidence == 0.1
        assert loaded.defaults.formats == [OutputFormat.CSV]
        assert loaded.inference.device == InferenceDevice.AUTO
        assert loaded.output.default_format == OutputMode.HUMAN

    def test_full_roundtrip(self, tmp_path):
        cfg = Config()
        cfg.models["bn24"] = model_cfg(tmp_path, registry_id="birdnet-v24",
                                       installed_version="2.4")
        cfg.defaults.model = "bn24"
        cfg.defaults.latitude = 60.2
        cfg.defaults.longitude = 24.9
        cfg.defaults.batch_size = 64
        cfg.defaults.csv_columns.include = ["lat", "lon"]
        cfg.defaults.formats = [OutputFormat.CSV, OutputFormat.PARQUET]
        path = tmp_path / "config.toml"
        save_config(cfg, path)
        loaded = load_config(path)
        assert loaded.defaults.model == "bn24"
        assert loaded.models["bn24"].registry_id == "birdnet-v24"
        assert loaded.defaults.csv_columns.include == ["lat", "lon"]
        assert loaded.defaults.formats == [OutputFormat.CSV, OutputFormat.PARQUET]

    def test_missing_file_gives_defaults(self, tmp_path):
        cfg = load_config(tmp_path / "nope.toml")
        assert cfg.defaults.min_confidence == 0.1

    def test_parse_error(self, tmp_path):
        p = tmp_path / "bad.toml"
        p.write_text("this is { not toml")
        with pytest.raises(ConfigParse):
            load_config(p)

    def test_new_file_mode_0600(self, tmp_path):
        import stat

        path = tmp_path / "config.toml"
        save_config(Config(), path)
        assert stat.S_IMODE(path.stat().st_mode) == 0o600

    def test_deprecated_keys_parsed_never_written(self, tmp_path):
        p = tmp_path / "config.toml"
        p.write_text(
            '[defaults]\nmeta_model = "/old/meta.onnx"\n'
            '[output]\ncombined_prefix = "old"\n'
        )
        cfg = load_config(p)
        assert set(cfg.deprecated_keys()) == {
            "defaults.meta_model", "output.combined_prefix",
        }
        save_config(cfg, p)
        text = p.read_text()
        assert "meta_model" not in text
        assert "combined_prefix" not in text

    def test_update_config_locked_rmw(self, tmp_path):
        path = tmp_path / "config.toml"
        save_config(Config(), path)

        def set_lat(cfg):
            cfg.defaults.latitude = 42.0

        update_config(set_lat, path)
        assert load_config(path).defaults.latitude == 42.0

    def test_symlinked_config_replaced_at_target(self, tmp_path):
        target = tmp_path / "real.toml"
        save_config(Config(), target)
        link = tmp_path / "config.toml"
        link.symlink_to(target)
        update_config(lambda c: setattr(c.defaults, "latitude", 1.0), link)
        assert link.is_symlink()
        assert load_config(target).defaults.latitude == 1.0


class TestValidation:
    def test_valid_default(self):
        validate_config(Config())

    @pytest.mark.parametrize("value", [-0.1, 1.5, float("nan")])
    def test_bad_min_confidence(self, value):
        cfg = Config()
        cfg.defaults.min_confidence = value
        with pytest.raises(ConfigValidation):
            validate_config(cfg)

    @pytest.mark.parametrize("value", [-1.0, float("nan"), float("inf")])
    def test_bad_overlap(self, value):
        cfg = Config()
        cfg.defaults.overlap = value
        with pytest.raises(ConfigValidation):
            validate_config(cfg)

    def test_overlap_large_finite_accepted(self):
        cfg = Config()
        cfg.defaults.overlap = 1e15  # policy: bound lives with segment length
        validate_config(cfg)

    @pytest.mark.parametrize("value,ok", [(0, False), (1, True), (512, True), (513, False)])
    def test_batch_size_bounds(self, value, ok):
        cfg = Config()
        cfg.defaults.batch_size = value
        if ok:
            validate_config(cfg)
        else:
            with pytest.raises(ConfigValidation):
                validate_config(cfg)

    @pytest.mark.parametrize("value,ok", [(0, False), (1, True), (366, True), (367, False)])
    def test_day_of_year_bounds(self, value, ok):
        cfg = Config()
        cfg.defaults.day_of_year = value
        if ok:
            validate_config(cfg)
        else:
            with pytest.raises(ConfigValidation):
                validate_config(cfg)

    def test_empty_formats_rejected(self):
        cfg = Config()
        cfg.defaults.formats = []
        with pytest.raises(ConfigValidation):
            validate_config(cfg)

    def test_missing_default_model(self):
        cfg = Config()
        cfg.defaults.model = "ghost"
        with pytest.raises(ConfigValidation):
            validate_config(cfg)

    def test_bad_latitude(self):
        cfg = Config()
        cfg.defaults.latitude = 91.0
        with pytest.raises(InvalidLatitude):
            validate_config(cfg)

    @pytest.mark.parametrize("value", [-0.1, 1.1, float("nan")])
    def test_bad_range_threshold(self, value):
        cfg = Config()
        cfg.defaults.range_threshold = value
        with pytest.raises(InvalidRangeThreshold):
            validate_config(cfg)

    def test_unknown_csv_column(self):
        cfg = Config()
        cfg.defaults.csv_columns.include = ["bogus"]
        with pytest.raises(ConfigValidation):
            validate_config(cfg)

    def test_model_validation(self, tmp_path):
        m = model_cfg(tmp_path)
        validate_model_config("m", m)
        m2 = ModelConfig(path=tmp_path / "ghost.onnx", labels=m.labels,
                         model_type=ModelType.BIRDNET_V24)
        with pytest.raises(ModelFileNotFound):
            validate_model_config("m2", m2)

    def test_bsg_requires_extras(self, tmp_path):
        m = model_cfg(tmp_path, mtype=ModelType.BSG_FINLAND)
        with pytest.raises(BsgConfig):
            validate_model_config("bsg", m)

    def test_get_model(self, tmp_path):
        cfg = Config()
        cfg.models["m"] = model_cfg(tmp_path)
        assert get_model(cfg, "m") is cfg.models["m"]
        with pytest.raises(ModelNotFound):
            get_model(cfg, "ghost")


class TestRangeFilterActivation:
    def test_supports_matrix(self):
        assert supports_range_filter(False, ModelType.BIRDNET_V24)
        assert supports_range_filter(False, ModelType.PERCH_V2)
        assert not supports_range_filter(False, ModelType.BSG_FINLAND)
        assert not supports_range_filter(True, ModelType.BIRDNET_V24)

    def test_wants_needs_coords_and_time(self):
        cfg = Config()
        mt = ModelType.BIRDNET_V24
        assert not wants_range_filter(cfg, mt, lat=60.0, lon=24.0)  # no time
        assert not wants_range_filter(cfg, mt, week=24)              # no coords
        assert wants_range_filter(cfg, mt, lat=60.0, lon=24.0, week=24)
        assert wants_range_filter(cfg, mt, lat=60.0, lon=24.0, month=6, day=15)

    def test_config_coords_used(self):
        cfg = Config()
        cfg.defaults.latitude = 60.0
        cfg.defaults.longitude = 24.0
        assert wants_range_filter(cfg, ModelType.BIRDNET_V24, week=24)

    def test_build_request_week_from_date(self):
        cfg = Config()
        req = build_range_filter_request(
            cfg, ModelType.BIRDNET_V24, lat=60.0, lon=24.0, month=6, day=15
        )
        assert req.week == 22
        assert req.threshold == 0.01
        assert req.unmatched == UnmatchedPolicy.KEEP

    def test_validate_threshold_cli_precedence(self):
        cfg = Config()
        cfg.defaults.range_threshold = 0.5
        validate_threshold(None, cfg)
        with pytest.raises(InvalidRangeThreshold):
            validate_threshold(1.5, cfg)


class TestBat:
    def test_filenames(self):
        assert BatRegion.UK.model_filename == "BattyBirdNET-UK-256kHz_fp32.onnx"
        assert (BatRegion.USA_EAST_HIGH.model_filename
                == "BattyBirdNET-USA-EAST-256kHz-high_fp32.onnx")
        assert BatRegion.UK.labels_filename == "BattyBirdNET-UK-256kHz_Labels.txt"

    def test_resolve(self, tmp_path):
        (tmp_path / BatRegion.EU.model_filename).write_bytes(b"x")
        (tmp_path / BatRegion.EU.labels_filename).write_text("Bat b_Bat\n")
        cfg = BatConfig.resolve(BatRegion.EU, tmp_path)
        assert cfg.region == BatRegion.EU
        with pytest.raises(ModelFileNotFound):
            BatConfig.resolve(BatRegion.UK, tmp_path)

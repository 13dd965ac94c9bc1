"""Analysis orchestration (the reference's ``src/lib.rs`` core).

Glues every layer together for an analyze run: model resolution (named >
ad-hoc > default), device resolution, range-filter/species-list precedence,
smart batch-size defaults, warmup reporting, the per-file loop with
skip/lock/stale-reclaim/error-isolation semantics, and the run summary with
realtime-factor aggregates.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import numpy as np

from . import constants
from .config import geomodel as geomodel_cfg
from .config import range_filter as rf_cfg
from .config.types import Config, InferenceDevice, ModelConfig, ModelType
from .config.validate import get_model, validate_model_config
from .errors import BirdaError, ClassifierBuild, ConfigValidation, FileLocked
from .inference.classifier import (
    BirdClassifier,
    RangeFilterData,
)
from .inference.geomodel import GeomodelScores, MappingSummary, SpeciesMapping
from .inference.geomodel_filter import FilterSettings
from .inference.range_filter import RangeFilter, read_geomodel_labels
from .locking.file_lock import FileLock
from .models import contracts
from .models.zoo import LoadedModel, native_model, onnx_model, tiny_model
from .output import json_envelope as env
from .output.json_envelope import FileStatus, PipelineStatus
from .pipeline.config import ProcessingConfig
from .pipeline.coordinator import (
    OutputFormat,
    ProcessCheck,
    collect_input_files,
    output_dir_for,
    should_process,
)
from .pipeline.processor import process_file

logger = logging.getLogger(__name__)

ADHOC_MODEL_NAME = "ad-hoc"
PROCESSING_ERROR_CODE = "processing_error"

_MODEL_TYPE_TO_FAMILY = {
    ModelType.BIRDNET_V24: contracts.ModelFamily.BIRDNET_V24,
    ModelType.BIRDNET_V30: contracts.ModelFamily.BIRDNET_V30,
    ModelType.PERCH_V2: contracts.ModelFamily.PERCH_V2,
    ModelType.BSG_FINLAND: contracts.ModelFamily.BSG_FI_V44,
}


@dataclass
class AnalyzeOptions:
    """Parsed analyze inputs (CLI flags + env already merged by the CLI)."""

    inputs: list[Path] = field(default_factory=list)
    model: Optional[str] = None
    model_path: Optional[Path] = None
    labels_path: Optional[Path] = None
    model_type: Optional[ModelType] = None
    bat: Optional[str] = None
    formats: Optional[list[OutputFormat]] = None
    output_dir: Optional[Path] = None
    min_confidence: Optional[float] = None
    overlap: Optional[float] = None
    batch_size: Optional[int] = None
    combine: bool = False
    force: bool = False
    fail_fast: bool = False
    no_csv_bom: bool = False
    device_flags: dict = field(default_factory=dict)  # {"cpu": bool, "tpu": ..}
    lat: Optional[float] = None
    lon: Optional[float] = None
    week: Optional[int] = None
    month: Optional[int] = None
    day: Optional[int] = None
    day_of_year: Optional[int] = None
    range_threshold: Optional[float] = None
    rerank: bool = False
    range_unmatched: Optional[str] = None
    slist: Optional[Path] = None
    stale_lock_timeout: Optional[float] = None
    stdout_mode: bool = False
    #: Concurrent per-file workers. The device serializes compute either
    #: way; extra workers overlap one file's decode/IO with another's
    #: inference (the reference's single decode thread is its documented
    #: scaling ceiling, SURVEY §3.1).
    jobs: int = 1
    dual_output_mode: bool = False
    top_k: int = constants.DEFAULT_TOP_K
    geomodel_path: Optional[Path] = None
    geomodel_labels_path: Optional[Path] = None
    allow_download: bool = False
    #: Slice the loaded model to this regional label file (subset of the
    #: full labels) — softmax-exact regional behavior from the full graph.
    region_labels: Optional[Path] = None
    #: Decode workers per file: 0 = auto (parallel span decode for long
    #: files when not already running cross-file workers), 1 = reference
    #: behavior (single decode thread), N = explicit.
    decode_workers: int = 0
    #: Inference precision for ONNX-lowered graphs: "fp32" is bit-faithful
    #: (the ≤1e-3 parity route); "bf16" runs matmuls/convs in bf16 with
    #: fp32 accumulation and bf16 activations (+25% on bandwidth-bound
    #: graphs, ≤5e-3 score drift — the TensorRT-fp16-engine analogue);
    #: "mixed" keeps bf16 compute but int8-materializes the large
    #: fusion-boundary streams from a calibration pass (+10% over bf16 on
    #: bandwidth-bound graphs, ~4e-3 extra drift — docs/performance.md
    #: "Mixed int8 storage"); "int8" additionally executes the heavy
    #: matmuls/convs as int8 with int32 accumulation from a calibration
    #: pass — the TensorRT-int8 analogue (:mod:`birda_tpu.onnx.quantize`).
    precision: str = "fp32"
    #: Representative audio (file or directory) to calibrate int8
    #: activation scales on; None = the built-in synthetic calibration set
    #: (pink noise + chirps), whose scales are cached per graph digest.
    calibration_audio: Optional[Path] = None
    #: Route the detection stream to the reporter (no output files) for
    #: ANY number of inputs — the library API's collection mode. Unlike
    #: ``stdout_mode`` there is no single-input preflight: the reporter
    #: receives per-file ``detections`` events keyed by path, so
    #: interleaving under ``--jobs`` is well-defined.
    stream_detections: bool = False
    #: Devices to shard the segment batch over (data parallelism). None =
    #: every local device of the actual backend (multi-chip hosts shard
    #: automatically); 1 disables sharding. The batch axis is the
    #: reference's entire device-parallelism story
    #: (``processor.rs:242-258``); here it shards over ICI via a 1-D
    #: ``jax.sharding.Mesh`` (SURVEY §7.9). ``BIRDA_NO_SHARD`` is the
    #: environment kill switch.
    devices: Optional[int] = None
    #: stdin is a terminal AND output is human-mode: a missing geomodel may
    #: be offered for download on stderr (reference ``geomodel.rs:158``).
    #: The CLI computes this; the library API never prompts.
    interactive: bool = False


@dataclass
class RunStats:
    files_processed: int = 0
    files_failed: int = 0
    files_skipped: int = 0
    total_detections: int = 0
    total_segments: int = 0
    total_audio_secs: float = 0.0
    started: float = field(default_factory=time.monotonic)

    @property
    def duration_secs(self) -> float:
        return time.monotonic() - self.started

    @property
    def realtime_factor(self) -> float:
        d = self.duration_secs
        return self.total_audio_secs / d if d > 0 else 0.0

    @property
    def segments_per_sec(self) -> float:
        d = self.duration_secs
        return self.total_segments / d if d > 0 else 0.0


# ---------------------------------------------------------------------------
# Resolution helpers
# ---------------------------------------------------------------------------

def _apply_model_overrides(mc: ModelConfig,
                           options: AnalyzeOptions) -> ModelConfig:
    """CLI path overrides patch a named/default model (reference
    ``lib.rs:227``): ``-m birdnet-v24 --model-path /tmp/patched.onnx``
    keeps the entry's type/BSG wiring but swaps the graph (and/or labels).
    Returns a copy — the caller's Config object is never mutated."""
    if options.model_path is None and options.labels_path is None:
        return mc
    import dataclasses

    return dataclasses.replace(
        mc,
        path=options.model_path if options.model_path is not None else mc.path,
        labels=(options.labels_path if options.labels_path is not None
                else mc.labels),
    )


def resolve_model_config(options: AnalyzeOptions, config: Config
                         ) -> tuple[ModelConfig, str]:
    """Priority: -m name > ad-hoc (--model-path + --model-type) > config
    default (reference ``lib.rs:91-169``)."""
    if options.model is not None:
        mc = get_model(config, options.model)
        if options.model_type is not None:
            logger.warning(
                "--model-type is ignored when -m is provided "
                "(using model type from config)"
            )
        return _apply_model_overrides(mc, options), options.model

    if options.model_type is not None and options.model_path is not None:
        if options.labels_path is None:
            raise ConfigValidation(
                "--labels-path required when using --model-path with --model-type"
            )
        return (
            ModelConfig(
                path=options.model_path,
                labels=options.labels_path,
                model_type=options.model_type,
            ),
            ADHOC_MODEL_NAME,
        )

    if config.defaults.model is not None:
        mc = get_model(config, config.defaults.model)
        if options.model_type is not None:
            logger.warning(
                "--model-type is ignored when using default model '%s' "
                "(provide both --model-path and --model-type to use "
                "ad-hoc mode)",
                config.defaults.model,
            )
        return _apply_model_overrides(mc, options), config.defaults.model

    if options.model_path is not None:
        raise ConfigValidation(
            "--model-type required when using --model-path without -m"
        )
    raise ConfigValidation(
        "no model specified (use -m, set defaults.model in config, or provide "
        "--model-path with --labels-path and --model-type)"
    )


def resolve_decode_workers(options: AnalyzeOptions) -> int:
    """0 = auto: split one file's decode across cores unless ``--jobs`` is
    already using them for cross-file parallelism (SURVEY §3.1 — the
    reference's single decode thread is its documented scaling ceiling)."""
    if options.decode_workers > 0:
        return options.decode_workers
    if options.jobs > 1:
        return 1
    import os

    return max(1, min(4, os.cpu_count() or 1))


def load_model_graph(mc: ModelConfig, name: str,
                     precision: str = "fp32",
                     backend: Optional[str] = None,
                     calibration_audio: Optional[Path] = None) -> LoadedModel:
    """Turn a config entry into a runnable graph.

    ``path`` semantics: a real ``.onnx`` file goes through the ONNX->XLA
    lowering; the ``synthetic:`` scheme (framework extension) builds the
    native flax architecture with deterministic weights — ``synthetic:tiny``
    for CI-sized runs, ``synthetic:full`` for benchmarking.

    ``backend`` is the *actual* backend the classifier will run on; mixed
    precision degrades gracefully when it doesn't support the request
    (XLA:CPU has no bf16 dot support — reference-style warn-and-continue
    rather than a crash deep inside the first batch).
    """
    family = _MODEL_TYPE_TO_FAMILY[mc.model_type]
    path_str = str(mc.path)
    if path_str.startswith("synthetic:"):
        flavor = path_str.split(":", 1)[1] or "tiny"
        if flavor == "full":
            return native_model(family)
        return tiny_model(family)
    validate_model_config(name, mc)
    labels = read_geomodel_labels(mc.labels)  # same one-label-per-line format
    on_cpu = backend == "cpu"
    if precision in ("bf16", "mixed", "int8") and on_cpu:
        logger.warning(
            "--precision %s requested but the actual backend is CPU; "
            "non-quantized compute runs fp32 there", precision,
        )
    try:
        if precision in ("int8", "mixed"):
            return _load_int8_model(mc, family, labels, calibration_audio,
                                    on_cpu=on_cpu,
                                    storage_only=precision == "mixed")
        dtype = None
        if precision == "bf16" and not on_cpu:
            import jax.numpy as jnp

            dtype = jnp.bfloat16
        return onnx_model(mc.path, contracts.contract_for(family), labels,
                          dtype=dtype)
    except BirdaError:
        raise
    except Exception as e:  # noqa: BLE001 — parse/lowering errors -> typed
        raise ClassifierBuild(f"cannot load model graph {mc.path}: {e}") from e


def _load_int8_model(mc: ModelConfig, family, labels: list[str],
                     calibration_audio: Optional[Path],
                     on_cpu: bool = False,
                     storage_only: bool = False) -> LoadedModel:
    """Calibrated int8 execution of a float graph (the TensorRT-int8
    engine analogue — reference ``src/inference/classifier.rs:994-1057``
    caches those engines; we cache the calibration scales).

    Scales from the built-in synthetic calibration set are cached per graph
    digest under the cache dir, so repeat runs skip the calibration pass
    the way a TensorRT cache load skips the engine build. Explicit
    ``--calibration-audio`` always recalibrates (representative audio is
    the user's statement that the synthetic set isn't).

    ``storage_only=True`` is ``--precision mixed``: no node quantizes
    (compute stays ``compute_dtype``); the calibration scales only back
    int8 *storage* of the large fusion-boundary streams
    (docs/performance.md "Mixed int8 storage on the bf16 path").
    """
    import jax.numpy as jnp

    from .models.zoo import onnx_model_int8
    from .onnx.quantize import cached_calibration, calibrate

    contract = contracts.contract_for(family)
    data = Path(mc.path).read_bytes()

    if calibration_audio is not None:
        batches = _calibration_batches_from_audio(
            calibration_audio, contract.sample_rate, contract.sample_count,
        )
        logger.info("calibrating int8 activation scales on %s...",
                    calibration_audio)
        calib = calibrate(data, batches)
    else:
        calib, from_cache = cached_calibration(data, contract.sample_count)
        logger.info(
            "int8 calibration scales %s",
            "loaded from cache" if from_cache else "computed and cached",
        )
    compute = jnp.float32 if on_cpu else jnp.bfloat16
    return onnx_model_int8(data, contract, labels, calib,
                           compute_dtype=compute,
                           storage_only=storage_only)


def _calibration_batches_from_audio(path: Path, sample_rate: int,
                                    sample_count: int,
                                    batch: int = 8, max_batches: int = 4):
    """Segment representative audio into calibration batches through the
    same decode + resample stack the analysis itself uses."""
    from .audio.decode import StreamingDecoder
    from .ops.resample import resample_numpy
    from .pipeline.coordinator import collect_input_files

    files = collect_input_files([Path(path)])
    if not files:
        raise ConfigValidation(
            f"--calibration-audio {path}: no audio files found"
        )
    rows: list[np.ndarray] = []
    batches: list[np.ndarray] = []
    for f in files:
        with StreamingDecoder(f) as dec:
            src_rate = dec.sample_rate
            src_seg = int(round(sample_count * src_rate / sample_rate))
            while len(batches) < max_batches:
                seg = dec.next_segment(src_seg, 0)
                if seg is None:
                    break
                x = seg.samples
                if src_rate != sample_rate:
                    x = resample_numpy(x, src_rate, sample_rate)
                if x.shape[0] < sample_count:
                    x = np.pad(x, (0, sample_count - x.shape[0]))
                rows.append(x[:sample_count].astype(np.float32))
                if len(rows) == batch:
                    batches.append(np.stack(rows))
                    rows = []
        if len(batches) >= max_batches:
            break
    if rows and not batches:
        # Short clip: cycle its segments to fill one batch rather than fail.
        orig = list(rows)
        while len(rows) < batch:
            rows.append(orig[(len(rows) - len(orig)) % len(orig)])
        batches.append(np.stack(rows[:batch]))
    if not batches:
        raise ConfigValidation(
            f"--calibration-audio {path}: could not decode any segments"
        )
    return batches


def resolve_mesh(options: AnalyzeOptions, devices: list,
                 actual_backend: str):
    """Build the production data-parallel mesh (or None for single-device).

    Shards the segment batch over every *addressable* device of the actual
    backend by default — the TPU-native form of the reference's batch
    parallelism (its only on-device parallelism,
    ``src/pipeline/processor.rs:242-258``). In a joined pod the selector
    returns the GLOBAL device list, but hosts process *different files*
    (lock-file work sharing), so the SPMD lockstep a global mesh requires
    does not hold — each host shards over its own local devices and the
    pod scales at the file level, like the reference's multi-host story.

    ``options.devices=1`` or ``BIRDA_NO_SHARD`` disables sharding;
    ``options.devices=N`` caps the mesh at N local devices.
    """
    import os

    if os.environ.get("BIRDA_NO_SHARD"):
        if options.devices is not None and options.devices > 1:
            logger.warning(
                "BIRDA_NO_SHARD is set; ignoring --devices %d",
                options.devices,
            )
        logger.info("batch sharding disabled by BIRDA_NO_SHARD")
        return None
    import jax

    local = [d for d in devices if d.process_index == jax.process_index()]
    if options.devices is None and actual_backend == "cpu":
        # XLA's "multiple CPU devices" are virtual host devices sharing the
        # same cores (xla_force_host_platform_device_count) — sharding over
        # them validates the mesh path but speeds nothing up, so CPU runs
        # shard only on explicit --devices N opt-in.
        return None
    if options.devices is not None:
        if options.devices < 1:
            raise ConfigValidation(
                f"--devices must be >= 1 (got {options.devices})")
        if options.devices > len(local):
            raise ConfigValidation(
                f"--devices {options.devices} requested but only "
                f"{len(local)} local {actual_backend} device(s) are "
                "available"
            )
        local = local[: options.devices]
    if len(local) <= 1:
        return None
    from .parallel.mesh import mesh_over

    mesh = mesh_over(local)
    logger.info(
        "data parallelism: batch sharded over %d %s devices (disable "
        "with --devices 1 or BIRDA_NO_SHARD=1)",
        mesh.devices.size, actual_backend,
    )
    return mesh


def resolve_device(options: AnalyzeOptions, config: Config) -> str:
    """First set device flag wins, else the config, mapped to the backend
    names the selector understands."""
    flags = options.device_flags or {}
    for flag_name, device in (
        ("gpu", "auto"),   # accelerator-preferring alias
        ("tpu", "tpu"),
        ("cpu", "cpu"),
    ):
        if flags.get(flag_name):
            return device
    cfg = config.inference.device
    if cfg == InferenceDevice.TPU:
        return "tpu"
    if cfg == InferenceDevice.CPU:
        return "cpu"
    return "auto"


def determine_default_batch_size(model_type: ModelType, actual_backend: str) -> int:
    """Smart default keyed on (model family, ACTUAL backend) —
    reference ``lib.rs:256-288`` with the TPU tiers from constants."""
    bs = constants.batch_size
    if actual_backend == "cpu":
        return bs.CPU
    if actual_backend == "tpu":
        if model_type in (ModelType.BIRDNET_V24, ModelType.BSG_FINLAND):
            return bs.TPU_BIRDNET_V24
        if model_type == ModelType.BIRDNET_V30:
            return bs.TPU_BIRDNET_V30
        return bs.TPU_PERCH_V2
    return bs.OTHER_ACCEL


def resolve_species_filter(options: AnalyzeOptions, config: Config,
                           has_range_filter: bool) -> Optional[set[str]]:
    """Priority: range filter (dynamic) > species list (static) > none."""
    if has_range_filter:
        if options.slist is not None:
            logger.warning(
                "Ignoring --slist: range filtering takes precedence when "
                "coordinates and a date are given. Drop --lat/--lon to use "
                "the species list instead."
            )
        return None
    slist_path = options.slist or config.defaults.species_list_file
    if slist_path is not None:
        from .utils.species_list import read_species_list

        species = set(read_species_list(slist_path))
        logger.info("Species list filter enabled: %d species loaded", len(species))
        return species
    return None


def build_range_filter_data(
    request: rf_cfg.RangeFilterRequest,
    installed: geomodel_cfg.InstalledRangeFilter,
    classifier_labels: list[str],
) -> RangeFilterData:
    """Query the geomodel ONCE and project scores into the classifier's
    label space (reference ``classifier.rs:117-188``)."""
    geomodel_labels = read_geomodel_labels(installed.labels_path)
    rf = RangeFilter.from_onnx(
        installed.model_path, geomodel_labels,
        threshold=constants.range_filter.GEOMODEL_QUERY_THRESHOLD,
    )
    location_scores = rf.predict_week(
        request.latitude, request.longitude, request.week
    )
    mapping = SpeciesMapping.build(geomodel_labels, classifier_labels)
    scores = GeomodelScores.project(location_scores, mapping)
    settings = FilterSettings(
        threshold=request.threshold,
        unmatched=request.unmatched,
        rerank=request.rerank,
    )
    return RangeFilterData(
        scores=scores,
        settings=settings,
        summary=MappingSummary.new(mapping, scores, request.threshold),
    )


# ---------------------------------------------------------------------------
# The analyze run
# ---------------------------------------------------------------------------

def analyze_files(options: AnalyzeOptions, config: Config, reporter=None) -> int:
    """Full analyze flow; returns a process exit code."""
    # Persistent XLA compilation cache: the TensorRT engine-cache analogue —
    # repeat runs load compiled programs in ~100 ms instead of rebuilding.
    import os

    if not os.environ.get("BIRDA_NO_COMPILE_CACHE"):
        from .config import paths as config_paths
        from .inference.classifier import enable_persistent_cache

        try:
            enable_persistent_cache(config_paths.xla_cache_dir())
        except Exception as e:  # noqa: BLE001 — cache is an optimization
            logger.debug("persistent compile cache unavailable: %s", e)

    # Multi-host pod membership (BIRDA_COORDINATOR env contract) must be
    # established before any backend use; no-op on single hosts.
    from .parallel.mesh import initialize_multihost

    if initialize_multihost():
        # Honest scaling story: a pod divides WORK at the file level (the
        # lock-file protocol arbitrates, with pod rank in lock bodies);
        # each host shards its segment batch over its own local devices
        # (resolve_mesh below). A pod-global mesh would require every host
        # to run the same batch in lockstep — the opposite of what the
        # per-file division does.
        logger.info(
            "pod joined: files divide across hosts via lock files; each "
            "host shards batches over its local devices"
        )

    # Preflight (reference validate_analyze_args_preflight, lib.rs:462-470):
    # --stdout streams one file's detections; several would interleave.
    # Like the reference, this counts CLI inputs (a directory expanding to
    # many files streams them sequentially), so stdout mode also forces
    # jobs=1 below — concurrent workers would interleave the stream.
    if options.stdout_mode and len(options.inputs) != 1:
        raise ConfigValidation("--stdout requires exactly one input file")
    if options.stdout_mode and options.jobs > 1:
        logger.warning("--stdout streams sequentially; ignoring --jobs %d",
                       options.jobs)
        options.jobs = 1

    mc, model_name = resolve_model_config(options, config)

    bat_config = None
    custom_classifier = None
    if options.bat is not None:
        from .config.bat import BatConfig, BatRegion
        from .models.custom import CustomClassifier
        from .registry.installer import models_dir

        try:
            region = BatRegion(options.bat)
        except ValueError:
            # Typed at this layer too, not just click.Choice: the library
            # API (api.py bat=...) reaches here without the CLI validator.
            raise ConfigValidation(
                f"unknown bat region '{options.bat}' (valid: "
                f"{', '.join(r.value for r in BatRegion)})"
            ) from None
        bat_config = BatConfig.resolve(region, models_dir() / "bat")
        custom_classifier = CustomClassifier.from_onnx(
            bat_config.classifier_path, bat_config.labels_path,
            min_confidence=(
                options.min_confidence
                if options.min_confidence is not None
                else config.defaults.min_confidence
            ),
            top_k=options.top_k,
        )

    files = collect_input_files(options.inputs)
    if not files:
        from .errors import NoValidAudioFiles

        raise NoValidAudioFiles()

    # Range filter wiring: validated before resolution, resolved before the
    # classifier, degrading to unfiltered when the geomodel is unavailable.
    rf_cfg.validate_threshold(options.range_threshold, config)
    bat_mode = options.bat is not None
    range_request = None
    installed_geomodel = None
    if rf_cfg.wants_range_filter(
        config, mc.model_type, bat_mode,
        options.lat, options.lon, options.week, options.month, options.day,
    ):
        from .inference.geomodel_filter import UnmatchedPolicy
        from .registry.loader import load_registry

        range_request = rf_cfg.build_range_filter_request(
            config, mc.model_type, bat_mode,
            options.lat, options.lon, options.week, options.month, options.day,
            options.range_threshold,
            UnmatchedPolicy(options.range_unmatched)
            if options.range_unmatched else None,
            options.rerank,
        )
        cfg_for_geo = geomodel_cfg.config_with_override(
            config, options.geomodel_path, options.geomodel_labels_path
        )
        installed_geomodel = geomodel_cfg.resolve_geomodel(
            cfg_for_geo, load_registry(),
            allow_download=options.allow_download,
            interactive=options.interactive,
        )
        if isinstance(installed_geomodel, geomodel_cfg.GeomodelUnavailable):
            # Coordinates in config enable range filtering implicitly, so
            # erroring here would break existing pipelines on upgrade —
            # degrade with the resolver's reason (reference lib.rs:219-222).
            logger.warning(
                "Range filtering disabled: %s", installed_geomodel.reason
            )
            range_request = None
            installed_geomodel = None

    device = resolve_device(options, config)
    # The actual backend is resolved before lowering so mixed precision can
    # degrade to what the hardware supports (bf16 dots don't exist on
    # XLA:CPU) instead of crashing in the first batch.
    from .inference.backend import select_backend

    backend_devices, backend_status = select_backend(device)
    mesh = resolve_mesh(options, backend_devices, backend_status.actual)
    model = load_model_graph(
        mc, model_name, precision=options.precision,
        backend=backend_status.actual,
        calibration_audio=options.calibration_audio,
    )
    if options.region_labels is not None:
        # Regional view of the full graph (gather for sigmoid heads,
        # gather+renormalize for softmax — the upstream regional graphs'
        # exact semantics, Perch manifest notes) without installing the
        # region-sliced asset.
        from .models.regional import slice_to_region

        region_labels = read_geomodel_labels(options.region_labels)
        model = slice_to_region(
            model, region_labels, region=options.region_labels.stem
        )

    species_list = resolve_species_filter(
        options, config, has_range_filter=range_request is not None
    )

    min_confidence = (
        options.min_confidence
        if options.min_confidence is not None
        else config.defaults.min_confidence
    )

    range_filter_data = None
    if range_request is not None and installed_geomodel is not None:
        range_filter_data = build_range_filter_data(
            range_request, installed_geomodel, model.labels
        )

    # BSG post-processing: calibration always, SDM when (lat, lon, day)
    # resolve. Coordinates follow the range filter's when one is active,
    # else the bare --lat/--lon; day_of_year comes from the flag/config or
    # per-file mtime auto-detection inside process_file
    # (reference lib.rs:1004-1020, processor.rs:476-495).
    bsg_processor = None
    bsg_params = None
    if mc.bsg_calibration is not None:
        from .inference.bsg import BsgPostProcessor

        bsg_processor = BsgPostProcessor.from_paths(
            mc.bsg_calibration, mc.bsg_migration, mc.bsg_distribution_maps
        )
        doy = (options.day_of_year if options.day_of_year is not None
               else config.defaults.day_of_year)
        if range_request is not None:
            bsg_params = (range_request.latitude, range_request.longitude,
                          doy)
        elif options.lat is not None and options.lon is not None:
            bsg_params = (options.lat, options.lon, doy)

    classifier = BirdClassifier(
        model,
        device=device,
        min_confidence=min_confidence,
        top_k=options.top_k,
        range_filter_data=range_filter_data,
        species_list=species_list,
        want_embeddings=custom_classifier is not None,
        mesh=mesh,
    )

    batch_size = (
        options.batch_size
        if options.batch_size is not None
        else config.defaults.batch_size
        if config.defaults.batch_size is not None
        else determine_default_batch_size(
            mc.model_type, classifier.backend_status.actual
        )
    )
    if mesh is not None:
        from .parallel.mesh import pad_to_multiple

        padded = pad_to_multiple(batch_size, mesh)
        if padded != batch_size:
            logger.info(
                "batch size %d padded to %d (multiple of the %d-device mesh)",
                batch_size, padded, mesh.devices.size,
            )
            batch_size = padded

    overlap = (
        options.overlap if options.overlap is not None
        else config.defaults.overlap
    )
    formats = options.formats or config.defaults.formats

    if reporter is not None:
        sharding_info = None
        if mesh is not None:
            sharding_info = {
                "devices": int(mesh.devices.size),
                "axis": "data",
                "backend": backend_status.actual,
            }
        reporter.pipeline_started(
            len(files), model_name, min_confidence,
            classifier.backend_status.to_json_dict(),
            classifier.range_filter_info(),
            precision=model.precision_info,
            sharding=sharding_info,
        )

    # Warm the steady-state program up front so the first real file does not
    # absorb the compile (reference warmup spinner, lib.rs:561-597). The
    # production path is the chunk runner keyed (batch, step): warm the
    # common case (model-rate sources at the configured overlap); other
    # (rate, effective-batch) variants compile lazily per file. Bat mode
    # skips this: its window contract (constants.bat) differs from the
    # bird geometry, so warming the bird-shaped program would burn a
    # remote compile the bat path never executes.
    if options.bat is None:
        step_model = max(
            1,
            classifier.sample_count
            - int(round(overlap * classifier.sample_rate)),
        )
        runner = classifier.chunk_runner(batch_size, step_model)
        try:
            report = runner.ensure_warm()
        except BirdaError:
            raise
        except Exception as e:
            # Warmup is the graph's first trace/compile: a graph the
            # lowering accepts but jax rejects (bad ranks, dtype clashes)
            # surfaces here. Fold it into the typed tree so main prints a
            # cause chain, not a traceback (reference: every build failure
            # is an Error variant, classifier.rs:250).
            raise ClassifierBuild(str(e)) from e
        if report is not None:
            what = "compiled" if report.was_build else "loaded from cache"
            logger.info(
                "warmup batch %d %s in %.2fs", batch_size, what,
                report.seconds,
            )

    stats = process_all_files(
        classifier, files, options, config, batch_size, overlap, formats,
        model_name, min_confidence, custom_classifier, reporter,
        range_request, bsg_processor, bsg_params,
    )

    if options.combine and not options.stdout_mode:
        _combine_outputs(files, options, formats)

    _report_summary(stats, reporter)
    if stats.files_failed > 0 and stats.files_processed == 0:
        return 1
    return 0


def _emit_file_started(reporter, classifier, input_path, index, overlap,
                       bat_mode: bool) -> None:
    """The protocol's file_started event with a duration-based segment
    estimate — bat mode uses its own window contract (constants.bat)."""
    if reporter is None:
        return
    est_segments = 0
    duration = None
    try:
        from .audio.decode import get_audio_duration

        duration = get_audio_duration(input_path)
        if bat_mode:
            seg = constants.bat.SEGMENT_DURATION
            step = max(seg - constants.bat.OVERLAP, 1e-9)
        else:
            seg = classifier.segment_duration
            step = max(seg - overlap, 1e-9)
        import math

        est_segments = (
            1 if duration <= seg
            else math.ceil((duration - seg) / step) + 1
        ) if duration > 0 else 0
    except BirdaError:
        pass
    reporter.file_started(str(input_path), index, est_segments, duration)


def process_all_files(
    classifier, files, options, config, batch_size, overlap, formats,
    model_name, min_confidence, custom_classifier, reporter,
    range_request=None, bsg_processor=None, bsg_params=None,
) -> RunStats:
    stats = RunStats()
    range_filter_params = None
    if range_request is not None:
        range_filter_params = (
            range_request.latitude, range_request.longitude, range_request.week
        )

    if options.jobs > 1 and len(files) > 1 and not options.fail_fast:
        return _process_files_parallel(
            classifier, files, options, config, batch_size, overlap, formats,
            model_name, min_confidence, custom_classifier, reporter,
            range_filter_params, stats, bsg_processor, bsg_params,
        )

    for index, input_path in enumerate(files):
        output_dir = output_dir_for(input_path, options.output_dir)

        # Stale-lock reclamation before the skip check (lib.rs:668-681).
        if (
            options.stale_lock_timeout is not None
            and FileLock.is_locked(input_path, output_dir)
            and FileLock.is_stale(input_path, output_dir, options.stale_lock_timeout)
        ):
            logger.info("Reclaiming stale lock for %s", input_path)
            try:
                FileLock.remove_stale(input_path, output_dir)
            except BirdaError as e:
                logger.warning("could not reclaim stale lock: %s", e)

        # Streamed-detection runs (stdout or the library API) write no
        # output files, so output-existence resume is meaningless there.
        check = should_process(
            input_path, output_dir, formats,
            force=options.force,
            stdout_mode=options.stdout_mode or options.stream_detections,
        )
        if check == ProcessCheck.SKIP_EXISTS:
            stats.files_skipped += 1
            if reporter is not None:
                reporter.file_skipped(str(input_path), FileStatus.SKIPPED)
            continue
        if check == ProcessCheck.SKIP_LOCKED:
            stats.files_skipped += 1
            if reporter is not None:
                reporter.file_skipped(str(input_path), FileStatus.LOCKED)
            continue

        pcfg = ProcessingConfig(
            input_path=input_path,
            output_dir=output_dir,
            formats=formats,
            min_confidence=min_confidence,
            overlap=overlap,
            batch_size=batch_size,
            csv_columns=list(config.defaults.csv_columns.include),
            csv_bom_enabled=not options.no_csv_bom,
            model_name=model_name,
            range_filter_params=range_filter_params,
            reporter=reporter if (options.stdout_mode or options.dual_output_mode or options.stream_detections) else None,
            progress_reporter=reporter,
            dual_output_mode=options.dual_output_mode,
            custom_classifier=custom_classifier,
            bat_mode=options.bat is not None,
            decode_workers=resolve_decode_workers(options),
            bsg_processor=bsg_processor,
            bsg_params=bsg_params,
        )
        _emit_file_started(reporter, classifier, input_path, index, overlap,
                           options.bat is not None)
        start = time.monotonic()
        try:
            result = process_file(classifier, pcfg)
        except FileLocked:
            # Check-to-use race: another worker took the file between our
            # check and the acquire — a graceful skip, not an error
            # (lib.rs:821-843, issue #344).
            stats.files_skipped += 1
            if reporter is not None:
                reporter.file_skipped(str(input_path), FileStatus.LOCKED)
            continue
        except BirdaError as e:
            stats.files_failed += 1
            logger.error("Failed to process %s: %s", input_path, e)
            if reporter is not None:
                reporter.file_completed_failure(
                    str(input_path), PROCESSING_ERROR_CODE, str(e)
                )
            if options.fail_fast:
                raise
            continue
        except Exception as e:  # noqa: BLE001 — per-file isolation is the
            # contract (SURVEY §5): one hostile file must not kill a batch
            # run even when it trips a non-typed failure path.
            stats.files_failed += 1
            logger.error("Failed to process %s: %s: %s", input_path,
                         type(e).__name__, e)
            logger.debug("unhandled per-file exception", exc_info=True)
            if reporter is not None:
                reporter.file_completed_failure(
                    str(input_path), PROCESSING_ERROR_CODE,
                    f"{type(e).__name__}: {e}",
                )
            if options.fail_fast:
                raise
            continue

        stats.files_processed += 1
        stats.total_detections += result.detections
        stats.total_segments += result.segments
        stats.total_audio_secs += result.audio_duration_secs
        if reporter is not None:
            reporter.file_completed_success(
                str(input_path), result.detections,
                int((time.monotonic() - start) * 1000),
            )
    return stats


def _process_files_parallel(
    classifier, files, options, config, batch_size, overlap, formats,
    model_name, min_confidence, custom_classifier, reporter,
    range_filter_params, stats: RunStats,
    bsg_processor=None, bsg_params=None,
) -> RunStats:
    """``--jobs N``: per-file worker threads.

    Per-file semantics (lock, skip check, outputs) are unchanged — the lock
    layer already arbitrates concurrent workers, exactly as it does between
    processes on a shared filesystem. Reporter events may interleave across
    files; every event carries its file path, which the NDJSON protocol
    requires consumers to key on anyway.
    """
    import threading
    from concurrent.futures import ThreadPoolExecutor

    lock = threading.Lock()

    def work(index_path):
        index, input_path = index_path
        output_dir = output_dir_for(input_path, options.output_dir)

        if (
            options.stale_lock_timeout is not None
            and FileLock.is_locked(input_path, output_dir)
            and FileLock.is_stale(input_path, output_dir, options.stale_lock_timeout)
        ):
            try:
                FileLock.remove_stale(input_path, output_dir)
            except BirdaError:
                pass

        # Streamed-detection runs (stdout or the library API) write no
        # output files, so output-existence resume is meaningless there.
        check = should_process(
            input_path, output_dir, formats,
            force=options.force,
            stdout_mode=options.stdout_mode or options.stream_detections,
        )
        if check != ProcessCheck.PROCESS:
            with lock:
                stats.files_skipped += 1
            if reporter is not None:
                reporter.file_skipped(
                    str(input_path),
                    FileStatus.LOCKED if check == ProcessCheck.SKIP_LOCKED
                    else FileStatus.SKIPPED,
                )
            return

        pcfg = ProcessingConfig(
            input_path=input_path,
            output_dir=output_dir,
            formats=formats,
            min_confidence=min_confidence,
            overlap=overlap,
            batch_size=batch_size,
            csv_columns=list(config.defaults.csv_columns.include),
            csv_bom_enabled=not options.no_csv_bom,
            model_name=model_name,
            range_filter_params=range_filter_params,
            reporter=reporter if (options.stdout_mode or options.dual_output_mode or options.stream_detections) else None,
            progress_reporter=None,  # interleaved bars are worse than none
            dual_output_mode=options.dual_output_mode,
            custom_classifier=custom_classifier,
            bat_mode=options.bat is not None,
            decode_workers=resolve_decode_workers(options),
            bsg_processor=bsg_processor,
            bsg_params=bsg_params,
        )
        # The protocol's lifecycle events fire on this path too (only the
        # interactive progress BARS are suppressed above): NDJSON consumers
        # key file_completed on a matching file_started.
        _emit_file_started(reporter, classifier, input_path, index, overlap,
                           options.bat is not None)
        start = time.monotonic()
        try:
            result = process_file(classifier, pcfg)
        except FileLocked:
            with lock:
                stats.files_skipped += 1
            if reporter is not None:
                reporter.file_skipped(str(input_path), FileStatus.LOCKED)
            return
        except BirdaError as e:
            with lock:
                stats.files_failed += 1
            logger.error("Failed to process %s: %s", input_path, e)
            if reporter is not None:
                reporter.file_completed_failure(
                    str(input_path), PROCESSING_ERROR_CODE, str(e)
                )
            return
        except Exception as e:  # noqa: BLE001 — same per-file isolation as
            # the sequential loop; a worker's unhandled exception must not
            # take down the pool (--fail-fast never reaches this path: the
            # parallel loop is only selected when fail_fast is off).
            with lock:
                stats.files_failed += 1
            logger.error("Failed to process %s: %s: %s", input_path,
                         type(e).__name__, e)
            logger.debug("unhandled per-file exception", exc_info=True)
            if reporter is not None:
                reporter.file_completed_failure(
                    str(input_path), PROCESSING_ERROR_CODE,
                    f"{type(e).__name__}: {e}",
                )
            return
        with lock:
            stats.files_processed += 1
            stats.total_detections += result.detections
            stats.total_segments += result.segments
            stats.total_audio_secs += result.audio_duration_secs
        if reporter is not None:
            reporter.file_completed_success(
                str(input_path), result.detections,
                int((time.monotonic() - start) * 1000),
            )

    # Not `with pool: pool.map(...)`: executor.map submits every file
    # upfront and __exit__ does shutdown(wait=True) WITHOUT cancelling,
    # so a Ctrl+C (SystemExit from the SIGINT handler, which has already
    # released the live locks) would keep processing the whole queue —
    # now-unlocked files a second process may concurrently pick up.
    # cancel_futures drops the not-yet-started files; in-flight ones
    # finish (their per-file isolation handles the rest).
    pool = ThreadPoolExecutor(max_workers=options.jobs)
    try:
        futures = [pool.submit(work, item) for item in enumerate(files)]
        for f in futures:
            f.result()
    finally:
        pool.shutdown(wait=True, cancel_futures=True)
    return stats


def _combine_outputs(files, options, formats):
    """Combine per-file outputs into single tables (``--combine``)."""
    from .constants import combined_filenames
    from .pipeline.coordinator import output_path_for

    out_root = options.output_dir or output_dir_for(files[0], None)
    if OutputFormat.PARQUET in formats:
        from .output.parquet import combine_parquet_files

        parts = [
            p for f in files
            if (p := output_path_for(f, output_dir_for(f, options.output_dir),
                                     OutputFormat.PARQUET)).exists()
        ]
        if parts:
            combine_parquet_files(parts, Path(out_root) / combined_filenames.PARQUET)
    for fmt, combined_name, has_header in (
        (OutputFormat.CSV, combined_filenames.CSV, True),
        (OutputFormat.RAVEN, combined_filenames.RAVEN, True),
        (OutputFormat.KALEIDOSCOPE, combined_filenames.KALEIDOSCOPE, True),
    ):
        if fmt not in formats:
            continue
        parts = [
            p for f in files
            if (p := output_path_for(f, output_dir_for(f, options.output_dir),
                                     fmt)).exists()
        ]
        if not parts:
            continue
        combined = Path(out_root) / combined_name
        selection_id = 0
        with open(combined, "w", encoding="utf-8") as out:
            if fmt == OutputFormat.CSV and not options.no_csv_bom:
                # The per-file CSVs open with a BOM for Excel (reference
                # csv.rs:29-31); the combined table is the file most
                # likely to be opened in Excel, so it keeps the same
                # semantics. Parts are read as utf-8-sig (BOM stripped),
                # so exactly one BOM lands at the front.
                from .constants import UTF8_BOM

                out.write(UTF8_BOM.decode("utf-8"))
            for i, part in enumerate(parts):
                text = part.read_text(encoding="utf-8-sig")
                lines = text.splitlines(keepends=True)
                if i > 0 and has_header and lines:
                    lines = lines[1:]
                if fmt == OutputFormat.RAVEN:
                    # Selection ids restart at 1 per file; renumber so the
                    # combined table stays a valid Raven selection table.
                    renumbered = []
                    for j, line in enumerate(lines):
                        if (i == 0 and j == 0) or "\t" not in line:
                            renumbered.append(line)
                            continue
                        selection_id += 1
                        _, rest = line.split("\t", 1)
                        renumbered.append(f"{selection_id}\t{rest}")
                    lines = renumbered
                out.writelines(lines)


def _report_summary(stats: RunStats, reporter=None):
    status = (
        PipelineStatus.SUCCESS if stats.files_failed == 0
        else PipelineStatus.PARTIAL_SUCCESS if stats.files_processed > 0
        else PipelineStatus.FAILED
    )
    # The reference's two summary lines, info-level = visible by default
    # (lib.rs:619, lib.rs:638).
    logger.info(
        "Complete: %d processed, %d skipped, %d errors, %d total "
        "detections in %.2fs",
        stats.files_processed, stats.files_skipped, stats.files_failed,
        stats.total_detections, stats.duration_secs,
    )
    if stats.files_processed > 0:
        logger.info(
            "Performance: %.1f segments/sec overall, %.1fx realtime "
            "(%.1fs total audio)",
            stats.segments_per_sec, stats.realtime_factor,
            stats.total_audio_secs,
        )
    if stats.files_failed > 0:
        logger.warning("%d file(s) had errors", stats.files_failed)
    if reporter is not None:
        reporter.pipeline_completed(
            env.pipeline_completed_payload(
                status,
                stats.files_processed,
                stats.files_failed,
                stats.files_skipped,
                stats.total_detections,
                stats.total_segments,
                int(stats.duration_secs * 1000),
                stats.realtime_factor,
            )
        )

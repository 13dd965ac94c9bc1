"""CLI entry point (reference ``src/cli/args.rs`` + ``src/lib.rs::run``).

``birda <files...>`` analyzes directly (no subcommand word needed, like the
reference); ``config``/``models``/``providers``/``clip``/``species``/
``update`` are subcommands. Every analyze option is also reachable through a
``BIRDA_*`` environment variable, with CLI > env > config > smart default
precedence.
"""

from __future__ import annotations

import logging
import os
import signal
import sys
from pathlib import Path
from typing import Optional

import click

from .. import __version__, constants
from ..config import file as config_file
from ..config import paths as config_paths
from ..config.bat import BatRegion
from ..config.types import Config, InferenceDevice, ModelConfig, ModelType, OutputMode
from ..errors import BirdaError
from ..locking.file_lock import cleanup_all_locks
from ..orchestrator import AnalyzeOptions, analyze_files
from ..output import json_envelope as env
from ..output.json_envelope import ErrorSeverity, ResultType
from ..output.reporter import create_reporter
from ..pipeline.coordinator import OutputFormat
from . import validators as v

logger = logging.getLogger(__name__)

SUBCOMMANDS = {
    "config", "models", "providers", "clip", "update", "species", "analyze",
    "version",
}


def _parse_formats(ctx, param, value):
    """Parse ``-f``/``--format`` occurrences, each possibly comma-separated
    (reference args.rs:306 ``value_delimiter = ','``), into OutputFormat
    members — case-insensitive, 'table' aliases raven (types.rs:358-365)."""
    out = []
    for occurrence in value:
        for name in occurrence.split(","):
            name = name.strip()
            if not name:
                continue
            try:
                out.append(OutputFormat(name))
            except ValueError:
                raise click.BadParameter(
                    f"'{name}' is not one of "
                    + ", ".join(f.value for f in OutputFormat)
                    + " (or 'table' for raven)"
                ) from None
    return tuple(out)


def _validator(fn):
    """Adapt a validators.py parser to a click callback."""

    def callback(ctx, param, value):
        if value is None:
            return None
        try:
            return fn(value)
        except v.ValidationFailure as e:
            raise click.BadParameter(str(e)) from e

    return callback


def init_logging(verbose: int, quiet: bool):
    """Verbosity ladder -v/-vv/-vvv; logs to stderr, stdout stays clean for
    the JSON protocol (reference ``lib.rs:1102-1127``).

    The DEFAULT filter is info, same as the reference's ``"info,ort=off"``:
    a bare ``birda rec.wav`` run reports "Processing:", the per-file
    timing, and the "Complete:"/segments-per-sec summary without needing
    -v. Python has no trace level, so -vv/-vvv both map to DEBUG and the
    extra rungs only progressively unsilence jax below."""
    if quiet:
        level = logging.WARNING  # reference: "warn,ort=off"
    elif verbose >= 1:
        level = logging.DEBUG
    else:
        level = logging.INFO
    logging.basicConfig(
        level=level,
        stream=sys.stderr,
        format="%(levelname)s %(name)s: %(message)s",
    )
    if verbose < 3:
        logging.getLogger("jax").setLevel(logging.ERROR)


def print_error_chain(e: BirdaError):
    """Deduplicated cause-chain printing (reference ``main.rs:43-52``)."""
    chain = e.cause_chain()
    sys.stderr.write(f"Error: {chain[0]}\n")
    for cause in chain[1:]:
        sys.stderr.write(f"  caused by: {cause}\n")


@click.group(invoke_without_command=True)
@click.version_option(__version__, prog_name="birda")
@click.pass_context
def cli(ctx):
    if ctx.invoked_subcommand is None and not ctx.args:
        # First-run smart help: setup guide when no models are configured,
        # usage reminder otherwise (reference src/cli/help.rs:8).
        from .help import smart_help

        try:
            cfg = config_file.load_default_config()
        except BirdaError:
            cfg = Config()
        click.echo(smart_help(cfg))


@cli.command("analyze", context_settings={"show_default": True})
@click.argument("inputs", nargs=-1, type=click.Path(path_type=Path))
@click.option("-m", "--model", envvar="BIRDA_MODEL", help="Configured model name.")
@click.option("--model-path", type=click.Path(path_type=Path),
              envvar="BIRDA_MODEL_PATH", help="Ad-hoc model graph path.")
@click.option("--labels-path", type=click.Path(path_type=Path),
              envvar="BIRDA_LABELS_PATH")
@click.option("--model-type", type=click.Choice([t.value for t in ModelType]),
              envvar="BIRDA_MODEL_TYPE")
@click.option("--bat", envvar="BIRDA_BAT",
              type=click.Choice([r.value for r in BatRegion]),
              help="Bat region (enables BattyBirdNET two-stage mode).")
@click.option("-f", "--format", "formats", multiple=True,
              callback=_parse_formats, envvar="BIRDA_FORMAT",
              help="Output formats, comma-separated: "
                   + ", ".join(f.value for f in OutputFormat)
                   + " ('table' = raven).")
@click.option("-o", "--output-dir", type=click.Path(path_type=Path),
              envvar="BIRDA_OUTPUT_DIR")
@click.option("-c", "--min-confidence", callback=_validator(v.parse_confidence),
              envvar="BIRDA_MIN_CONFIDENCE",
              help=f"Minimum confidence {v.HELP_RANGES['confidence']}.")
@click.option("--overlap", callback=_validator(v.parse_overlap),
              envvar="BIRDA_OVERLAP")
@click.option("-b", "--batch-size", callback=_validator(v.parse_batch_size),
              envvar="BIRDA_BATCH_SIZE",
              help=f"Inference batch size {v.HELP_RANGES['batch_size']}.")
@click.option("--combine", is_flag=True, envvar="BIRDA_COMBINE")
@click.option("--force", is_flag=True)
@click.option("--fail-fast", is_flag=True)
@click.option("-q", "--quiet", is_flag=True)
@click.option("-v", "--verbose", count=True)
@click.option("--no-csv-bom", is_flag=True, envvar="BIRDA_NO_CSV_BOM")
@click.option("--gpu", is_flag=True, help="Prefer the accelerator; warn on fallback.")
@click.option("--tpu", is_flag=True, help="Require TPU (fail if unavailable).")
@click.option("--cpu", is_flag=True, help="Force CPU inference.")
@click.option("--lat", callback=_validator(v.parse_latitude),
              envvar="BIRDA_LATITUDE",
              help=f"Latitude {v.HELP_RANGES['latitude']}.")
@click.option("--lon", callback=_validator(v.parse_longitude),
              envvar="BIRDA_LONGITUDE",
              help=f"Longitude {v.HELP_RANGES['longitude']}.")
@click.option("--week", callback=_validator(v.parse_week), envvar="BIRDA_WEEK",
              help=f"BirdNET calendar week {v.HELP_RANGES['week']}.")
@click.option("--month", callback=_validator(v.parse_month), envvar="BIRDA_MONTH",
              help=f"Month {v.HELP_RANGES['month']}.")
@click.option("--day", callback=_validator(v.parse_day), envvar="BIRDA_DAY",
              help=f"Day of month {v.HELP_RANGES['day']}.")
@click.option("--day-of-year", callback=_validator(v.parse_day_of_year),
              envvar="BIRDA_DAY_OF_YEAR",
              help=f"Day of year {v.HELP_RANGES['day_of_year']}.")
@click.option("--range-threshold", callback=_validator(v.parse_confidence),
              envvar="BIRDA_RANGE_THRESHOLD",
              help=f"Range-filter score threshold {v.HELP_RANGES['confidence']}.")
@click.option("--rerank", is_flag=True, envvar="BIRDA_RERANK")
@click.option("--range-unmatched", type=click.Choice(["keep", "drop"]),
              envvar="BIRDA_RANGE_UNMATCHED")
@click.option("--slist", type=click.Path(path_type=Path), envvar="BIRDA_SLIST")
@click.option("--stale-lock-timeout",
              callback=_validator(v.parse_stale_lock_timeout),
              envvar="BIRDA_STALE_LOCK_TIMEOUT")
@click.option("-j", "--jobs", type=int, default=1, envvar="BIRDA_JOBS",
              help="Concurrent per-file workers (overlap decode with inference).")
@click.option("--no-progress", is_flag=True, envvar="BIRDA_NO_PROGRESS")
@click.option("--stdout", "stdout_mode", is_flag=True,
              help="Stream detections to stdout; write no files.")
@click.option("--output-mode", type=click.Choice(["human", "json", "ndjson"]),
              envvar="BIRDA_OUTPUT_MODE")
@click.option("--accept-license", is_flag=True)
@click.option("--decode-workers", type=click.IntRange(0, 64), default=0,
              envvar="BIRDA_DECODE_WORKERS",
              help="Decode threads per file (seek-based span decoding). "
                   "0 = auto, 1 = single decode thread.")
@click.option("--devices", type=click.IntRange(1, 4096), default=None,
              envvar="BIRDA_DEVICES",
              help="Accelerator devices to shard each batch over (data "
                   "parallelism). Default: all local devices; 1 disables "
                   "sharding (BIRDA_NO_SHARD=1 also disables it).")
@click.option("--precision",
              type=click.Choice(["fp32", "bf16", "mixed", "int8"]),
              default="fp32", envvar="BIRDA_PRECISION",
              help="ONNX graph precision: fp32 = bit-faithful scores; "
                   "bf16 = +25%% throughput, scores drift up to ~5e-3 "
                   "(fp32 accumulation either way); mixed = bf16 compute "
                   "with calibrated int8 STORAGE of the large fusion-"
                   "boundary streams (+10%% over bf16 on bandwidth-bound "
                   "graphs, ~4e-3 extra drift); int8 = calibrated "
                   "quantization of the heavy matmuls/convs with int32 "
                   "accumulation (the TensorRT-int8 analogue).")
@click.option("--calibration-audio", type=click.Path(path_type=Path),
              envvar="BIRDA_CALIBRATION_AUDIO",
              help="Representative audio (file or directory) to calibrate "
                   "int8 activation scales on (--precision int8/mixed); "
                   "default is a built-in synthetic set whose scales are "
                   "cached per graph.")
@click.option("--region-labels", type=click.Path(path_type=Path),
              envvar="BIRDA_REGION_LABELS",
              help="Slice the model to this regional label file (subset of "
                   "the full labels; softmax models renormalize — the "
                   "upstream regional graphs' exact semantics).")
@click.option("--profile", "profile_dir", type=click.Path(path_type=Path),
              envvar="BIRDA_PROFILE",
              help="Write a jax profiler trace to this directory.")
@click.option("--geomodel-path", type=click.Path(path_type=Path),
              envvar="BIRDA_GEOMODEL_PATH",
              help="BirdNET Geomodel v3.0.2 ONNX file (overrides config). "
                   "Must be given together with --geomodel-labels-path.")
@click.option("--geomodel-labels-path", type=click.Path(path_type=Path),
              envvar="BIRDA_GEOMODEL_LABELS_PATH",
              help="Geomodel labels file. Must be given together with "
                   "--geomodel-path.")
@click.option("--meta-model-path", type=click.Path(path_type=Path),
              envvar="BIRDA_META_MODEL_PATH", hidden=True)
@click.option("-y", "--yes", is_flag=True,
              help="Assume yes for prompts (geomodel download offer, "
                   "license acceptance).")
def analyze(inputs, model, model_path, labels_path, model_type, bat, formats,
            output_dir, min_confidence, overlap, batch_size, combine, force,
            fail_fast, quiet, verbose, no_csv_bom, gpu, tpu, cpu, lat, lon,
            week, month, day, day_of_year, range_threshold, rerank,
            range_unmatched, slist, stale_lock_timeout, jobs, no_progress,
            stdout_mode, output_mode, accept_license, decode_workers,
            devices, precision, calibration_audio, region_labels, profile_dir,
            geomodel_path, geomodel_labels_path, meta_model_path, yes):
    """Analyze audio files for bird detections."""
    init_logging(verbose, quiet)
    if not inputs:
        raise click.UsageError("no input files given")

    # Week/month/day conflicts (the reference encodes these in clap groups).
    if week is not None and (month is not None or day is not None):
        raise click.UsageError("--week conflicts with --month/--day")
    if (month is None) != (day is None):
        raise click.UsageError("--month and --day must be given together")
    # clap `requires` pairing (reference args.rs geomodel_path block).
    if (geomodel_path is None) != (geomodel_labels_path is None):
        raise click.UsageError(
            "--geomodel-path and --geomodel-labels-path must be given together"
        )
    if meta_model_path is not None:
        logger.warning(
            "--meta-model-path is deprecated and ignored; range filtering "
            "uses the BirdNET Geomodel v3.0.2. Use --geomodel-path and "
            "--geomodel-labels-path to point at a specific copy."
        )
    if stdout_mode and (combine or output_dir is not None or formats):
        raise click.UsageError(
            "--stdout conflicts with --combine/--output-dir/--format"
        )
    if calibration_audio is not None and precision not in ("int8", "mixed"):
        raise click.UsageError(
            "--calibration-audio only applies with --precision int8/mixed"
        )

    try:
        config = _load_validated_config()
    except BirdaError as e:
        # Config errors must render as the cause chain (and as a protocol
        # error event when a structured mode was requested on the command
        # line), not a raw traceback.
        if output_mode in ("json", "ndjson"):
            r = create_reporter(output_mode)
            r.error("config_invalid", ErrorSeverity.FATAL, str(e))
            r.finish()
        print_error_chain(e)
        sys.exit(1)

    mode = OutputMode(output_mode) if output_mode else config.output.default_format
    if stdout_mode and not mode.is_structured:
        mode = OutputMode.NDJSON  # --stdout implies the streaming protocol
    dual = mode.is_structured and output_dir is not None and not stdout_mode
    if mode.is_structured:
        reporter = create_reporter(mode.value)
    else:
        from ..output.progress import HumanReporter

        reporter = HumanReporter(enabled=not (no_progress or quiet))

    _install_sigint_cleanup(reporter, len(inputs))

    options = AnalyzeOptions(
        inputs=list(inputs),
        model=model,
        model_path=model_path,
        labels_path=labels_path,
        model_type=ModelType(model_type) if model_type else None,
        bat=bat,
        formats=[OutputFormat(f) for f in formats] or None,
        output_dir=output_dir,
        min_confidence=min_confidence,
        overlap=overlap,
        batch_size=batch_size,
        combine=combine,
        force=force,
        fail_fast=fail_fast,
        no_csv_bom=no_csv_bom,
        device_flags={"gpu": gpu, "tpu": tpu, "cpu": cpu},
        lat=lat, lon=lon, week=week, month=month, day=day,
        day_of_year=day_of_year,
        range_threshold=range_threshold,
        rerank=rerank,
        range_unmatched=range_unmatched,
        slist=slist,
        stale_lock_timeout=stale_lock_timeout,
        jobs=max(1, jobs),
        stdout_mode=stdout_mode,
        dual_output_mode=dual,
        allow_download=accept_license or yes,
        interactive=sys.stdin.isatty() and not mode.is_structured,
        geomodel_path=geomodel_path,
        geomodel_labels_path=geomodel_labels_path,
        region_labels=region_labels,
        decode_workers=decode_workers,
        devices=devices,
        precision=precision,
        calibration_audio=calibration_audio,
    )
    profiling = False
    if profile_dir is not None:
        import jax

        jax.profiler.start_trace(str(profile_dir))
        profiling = True
    try:
        code = analyze_files(options, config, reporter)
    except BirdaError as e:
        if reporter is not None:
            reporter.error("analysis_failed", ErrorSeverity.FATAL, str(e))
            reporter.finish()
        print_error_chain(e)
        sys.exit(1)
    finally:
        if profiling:
            import jax

            jax.profiler.stop_trace()
    if reporter is not None:
        reporter.finish()
    sys.exit(code)


def _load_validated_config() -> Config:
    """Load + validate, with validation gated so repair commands stay
    reachable with a broken file (validation runs for consumers only)."""
    from ..config.validate import validate_config

    config = config_file.load_default_config()
    for key in config.deprecated_keys():
        logger.warning("config key '%s' is deprecated and ignored", key)
    validate_config(config)
    return config


def _install_sigint_cleanup(reporter, total_files):
    def handler(signum, frame):
        from ..locking.config_lock import cleanup_all_config_locks

        removed = cleanup_all_locks() + cleanup_all_config_locks()
        if removed:
            sys.stderr.write(f"\nReleased {removed} lock(s)\n")
        if reporter is not None:
            reporter.cancelled(env.CancelReason.USER_INTERRUPT, 0, total_files)
            reporter.finish()
        sys.exit(130)

    try:
        signal.signal(signal.SIGINT, handler)
    except ValueError:
        pass  # not the main thread (tests)


# ---------------------------------------------------------------------------
# config subcommand
# ---------------------------------------------------------------------------

@cli.group()
def config():
    """Manage configuration."""


@config.command("init")
def config_init():
    path = config_paths.config_file_path()
    if path.exists():
        click.echo(f"Config already exists: {path}")
        return
    config_file.save_config(Config(), path)
    click.echo(f"Created {path}")


@config.command("show")
@click.option("--output-mode", type=click.Choice(["human", "json", "ndjson"]),
              envvar="BIRDA_OUTPUT_MODE")
def config_show(output_mode):
    from ..utils import toml_writer

    cfg = config_file.load_default_config()
    if output_mode in ("json", "ndjson"):
        reporter = create_reporter(output_mode)
        reporter.result(env.config_payload(
            str(config_paths.config_file_path()), cfg.to_dict()
        ))
        reporter.finish()
        return
    click.echo(toml_writer.dumps(cfg.to_dict()))


@config.command("path")
@click.option("--output-mode", type=click.Choice(["human", "json", "ndjson"]),
              envvar="BIRDA_OUTPUT_MODE")
def config_path(output_mode):
    path = config_paths.config_file_path()
    if output_mode in ("json", "ndjson"):
        reporter = create_reporter(output_mode)
        reporter.result(env.config_path_payload(str(path), path.exists()))
        reporter.finish()
        return
    click.echo(str(path))


# ignore_unknown_options so values beginning with a hyphen are accepted:
# without it `config set defaults.latitude -33.9` reads -33.9 as a flag and
# every southern/western coordinate is unreachable (reference args.rs:157).
@config.command("set", context_settings={"ignore_unknown_options": True})
@click.argument("key")
@click.argument("value")
def config_set(key, value):
    """Set a configuration value by dotted path."""
    try:
        config_file.update_config(lambda cfg: _apply_config_set(cfg, key, value))
    except BirdaError as e:
        print_error_chain(e)
        sys.exit(1)
    click.echo(f"Set {key} = {value}")


def _apply_config_set(cfg: Config, key: str, value: str):
    from ..config.types import DefaultsConfig
    from ..errors import InvalidConfigKey

    d = cfg.defaults
    # An EMPTY value clears the key on every arm (reference
    # handle_config_set, lib.rs:1432+): back to None for the optional
    # fields, back to the field default otherwise. It is the only route
    # to "unset" short of hand-editing config.toml — e.g. returning
    # day_of_year to auto-detect-from-mtime.
    empty = value == ""
    fresh = DefaultsConfig()
    try:
        if key == "defaults.model":
            d.model = None if empty else value
        elif key == "defaults.min_confidence":
            d.min_confidence = (fresh.min_confidence if empty
                                else v.parse_confidence(value))
        elif key == "defaults.overlap":
            d.overlap = fresh.overlap if empty else v.parse_overlap(value)
        elif key == "defaults.batch_size":
            d.batch_size = None if empty else v.parse_batch_size(value)
        elif key == "defaults.latitude":
            d.latitude = None if empty else v.parse_latitude(value)
        elif key == "defaults.longitude":
            d.longitude = None if empty else v.parse_longitude(value)
        elif key == "defaults.range_threshold":
            d.range_threshold = (fresh.range_threshold if empty
                                 else v.parse_confidence(value))
        elif key == "defaults.range_unmatched":
            from ..inference.geomodel_filter import UnmatchedPolicy

            d.range_unmatched = (fresh.range_unmatched if empty
                                 else UnmatchedPolicy(value))
        elif key == "defaults.day_of_year":
            d.day_of_year = None if empty else v.parse_day_of_year(value)
        elif key == "defaults.geomodel":
            # Path arms (reference lib.rs:1520-1533): where `models
            # install geomodel` records the shared range filter; settable
            # by hand for a local copy.
            d.geomodel = None if empty else Path(value)
        elif key == "defaults.geomodel_labels":
            d.geomodel_labels = None if empty else Path(value)
        elif key == "defaults.species_list_file":
            d.species_list_file = None if empty else Path(value)
        elif key == "defaults.formats":
            d.formats = (list(fresh.formats) if empty else
                         [OutputFormat(f.strip()) for f in value.split(",")])
        elif key == "inference.device":
            from ..config.types import InferenceConfig

            cfg.inference.device = (InferenceConfig().device if empty
                                    else InferenceDevice(value))
        elif key == "output.default_format":
            from ..config.types import OutputConfig

            cfg.output.default_format = (OutputConfig().default_format
                                         if empty else OutputMode(value))
        else:
            raise InvalidConfigKey(key)
    except (v.ValidationFailure, ValueError) as e:
        # ValueError covers the enum-valued keys (inference.device,
        # output.default_format, defaults.range_unmatched, defaults.formats):
        # an unknown value must be a clean config error, not a traceback.
        from ..errors import ConfigValidation

        raise ConfigValidation(str(e)) from e


# ---------------------------------------------------------------------------
# models subcommand
# ---------------------------------------------------------------------------

@cli.group()
def models():
    """Manage models."""


@models.command("list")
@click.option("--output-mode", type=click.Choice(["human", "json", "ndjson"]),
              envvar="BIRDA_OUTPUT_MODE")
def models_list(output_mode):
    cfg = config_file.load_default_config()
    if output_mode in ("json", "ndjson"):
        reporter = create_reporter(output_mode)
        reporter.result(env.model_list_payload([
            env.model_entry(
                id=name, model_type=m.model_type.value,
                is_default=cfg.defaults.model == name,
                path=str(m.path), labels_path=str(m.labels),
            )
            for name, m in cfg.models.items()
        ]))
        reporter.finish()
        return
    if not cfg.models:
        click.echo("No models configured. Run 'birda models install <id>'.")
        return
    for name, m in cfg.models.items():
        default = " (default)" if cfg.defaults.model == name else ""
        click.echo(f"{name}{default}: {m.model_type.value} at {m.path}")


def _license_line(license_info) -> str:
    """License id plus whichever restrictions apply (reference
    registry/mod.rs::license_line): listing non-commercial and share-alike
    separately for classifiers vs the range filter taught a falsehood —
    birdnet-v24 and bsg-fi-v44 are share-alike too."""
    notes = []
    if not license_info.commercial_use:
        notes.append("non-commercial")
    if license_info.share_alike:
        notes.append("share-alike")
    if not notes:
        return license_info.type
    return f"{license_info.type} ({', '.join(notes)})"


@models.command("list-available")
@click.option("--output-mode", type=click.Choice(["human", "json", "ndjson"]),
              envvar="BIRDA_OUTPUT_MODE")
def models_list_available(output_mode):
    from ..registry.loader import load_registry

    reg = load_registry()
    if output_mode in ("json", "ndjson"):
        rf = None
        if reg.range_filter is not None:
            from ..registry.installer import GEOMODEL_INSTALL_ID

            e = reg.range_filter
            sizes = (e.model.size_bytes, e.labels.size_bytes)
            rf = env.available_range_filter_entry(
                # The install handle ("geomodel"), not the asset id: it is
                # the string a user can type (json_envelope.rs:513-520).
                id=GEOMODEL_INSTALL_ID, name=e.name or e.id,
                version=e.version,
                vendor=e.vendor, license=e.license.type,
                commercial_use=e.license.commercial_use,
                share_alike=e.license.share_alike,
                species_count=e.species_count,
                # Partial totals would understate the download; both files
                # are required, so only a full sum is reported.
                size_bytes=(sum(sizes) if all(s is not None for s in sizes)
                            else None),
            )
        reporter = create_reporter(output_mode)
        reporter.result(env.available_models_payload(
            models=[
                env.available_model_entry(
                    id=m.id, name=m.name, description=m.description,
                    vendor=m.vendor, version=m.version,
                    model_type=m.model_type, recommended=m.recommended,
                    license=m.license.type,
                    commercial_use=m.license.commercial_use,
                )
                for m in reg.models
            ],
            available_range_filter=rf,
        ))
        reporter.finish()
        return
    for m in reg.models:
        rec = " [recommended]" if m.recommended else ""
        variants = f" ({len(m.variants)} variants)" if m.has_variants else ""
        click.echo(f"{m.id}{rec}: {m.name} v{m.version}{variants}")
        click.echo(f"    {m.description}")
        click.echo(f"    License: {_license_line(m.license)}")
    if reg.range_filter is not None:
        # The geomodel lives in registry.range_filter, not registry.models,
        # so every loop over models skips it; listing it here is what makes
        # the asset every error message tells users to install actually
        # discoverable (reference registry/mod.rs:83-98, #287 lineage).
        from ..registry.installer import GEOMODEL_INSTALL_ID

        e = reg.range_filter
        click.echo()
        click.echo("Range filter (shared by all classifiers):")
        click.echo(f"  {GEOMODEL_INSTALL_ID}")
        click.echo(f"    {e.name or e.id}")
        click.echo(f"    Vendor: {e.vendor}")
        click.echo(f"    License: {_license_line(e.license)}")
        click.echo(f"    Covers {e.species_count} species")


@models.command("add")
@click.argument("name")
@click.option("--path", "path_", type=click.Path(path_type=Path), required=True)
@click.option("--labels", type=click.Path(path_type=Path), required=True)
@click.option("--type", "type_", type=click.Choice([t.value for t in ModelType]),
              required=True)
@click.option("--default", "set_default", is_flag=True)
def models_add(name, path_, labels, type_, set_default):
    def mutate(cfg: Config):
        from ..errors import ModelAlreadyExists

        if name in cfg.models:
            raise ModelAlreadyExists(name)
        cfg.models[name] = ModelConfig(
            path=path_, labels=labels, model_type=ModelType(type_)
        )
        if set_default or cfg.defaults.model is None:
            cfg.defaults.model = name

    try:
        config_file.update_config(mutate)
    except BirdaError as e:
        print_error_chain(e)
        sys.exit(1)
    click.echo(f"Added model '{name}'")


@models.command("check")
@click.option("--output-mode", type=click.Choice(["human", "json", "ndjson"]),
              envvar="BIRDA_OUTPUT_MODE")
@click.option("--no-graph", is_flag=True,
              help="Skip the ONNX graph preflight (file-existence checks "
                   "only).")
def models_check(output_mode, no_graph):
    """Validate configured models: files exist, and (for ONNX models) the
    graph passes the whole-graph supportability preflight — every
    unsupported op/attribute/dtype reported at once, not just the first."""
    from ..config.validate import validate_model_config

    cfg = config_file.load_default_config()
    failures = 0
    results = []
    for name, m in cfg.models.items():
        try:
            validate_model_config(name, m)
            issues = [] if no_graph else _graph_preflight(m)
            if issues:
                failures += 1
                results.append(env.model_check_entry(
                    id=name, valid=False,
                    error=f"{len(issues)} unsupported graph element(s)",
                    unsupported=issues,
                ))
                if output_mode not in ("json", "ndjson"):
                    click.echo(f"{name}: FAILED — {len(issues)} unsupported "
                               "graph element(s):")
                    for issue in issues:
                        click.echo(f"    - {issue}")
                continue
            results.append(env.model_check_entry(id=name, valid=True))
            if output_mode not in ("json", "ndjson"):
                click.echo(f"{name}: OK")
        except BirdaError as e:
            failures += 1
            results.append(env.model_check_entry(id=name, valid=False,
                                                 error=str(e)))
            if output_mode not in ("json", "ndjson"):
                click.echo(f"{name}: FAILED — {e}")
    geomodel = _check_geomodel_info()
    leftovers = _find_leftover_downloads()
    if output_mode in ("json", "ndjson"):
        reporter = create_reporter(output_mode)
        reporter.result(env.model_check_payload(
            models=results, geomodel=geomodel,
            leftover_downloads=leftovers or None,
        ))
        reporter.finish()
    else:
        if geomodel is not None:
            if geomodel["installed"]:
                click.echo(f"BirdNET Geomodel v{geomodel['version']}: OK "
                           f"({geomodel['species_count']} species)")
            else:
                click.echo(
                    f"BirdNET Geomodel v{geomodel['version']}: not installed "
                    "(run 'birda models install geomodel' to enable range "
                    "filtering)"
                )
            for p in geomodel.get("obsolete_files") or ():
                click.echo(f"{p} is no longer used and can be deleted")
        for p in leftovers:
            click.echo(f"leftover partial download: {p}")
    sys.exit(1 if failures else 0)


def _check_geomodel_info() -> Optional[dict]:
    """Shared range-filter status for ``models check`` (reference
    ``lib.rs:2343-2364``): reported once, since every classifier shares it.
    None when the registry predates the geomodel."""
    from ..config.geomodel import default_geomodel_paths
    from ..registry.installer import find_obsolete_files, models_dir
    from ..registry.loader import load_registry

    try:
        reg = load_registry()
    except BirdaError:
        return None
    entry = reg.range_filter
    if entry is None:
        return None
    paths = default_geomodel_paths(reg)
    installed = (paths is not None and paths[0].exists()
                 and paths[1].exists())
    try:
        obsolete = [str(p) for p in find_obsolete_files(models_dir())]
    except OSError:
        obsolete = []
    return env.geomodel_info(
        version=entry.version, installed=installed,
        species_count=entry.species_count,
        model_path=str(paths[0]) if installed else None,
        labels_path=str(paths[1]) if installed else None,
        obsolete_files=obsolete or None,
    )


def _find_leftover_downloads() -> list[str]:
    """Partial-download files (``<name>.<pid>.part``) whose writing process
    is gone — an interrupted download holding disk invisibly. Reported,
    never auto-deleted (reference ``lib.rs:1664-1669``)."""
    from ..registry.installer import models_dir

    out = []
    try:
        parts = sorted(models_dir().glob("*.part"))
    except OSError:
        return out
    for p in parts:
        bits = p.name.split(".")
        pid = None
        if len(bits) >= 3 and bits[-2].isdigit():
            pid = int(bits[-2])
        if pid is not None and _pid_alive(pid):
            continue  # a live download in progress, not a leftover
        out.append(str(p))
    return out


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _graph_preflight(m) -> list[str]:
    """Run the ONNX supportability preflight on a configured model's graph
    file; returns rendered findings (empty = fully supported). Non-ONNX
    paths (``synthetic:`` scheme, missing suffix match) are skipped."""
    path = m.path
    if not str(path).endswith(".onnx") or not Path(path).is_file():
        return []
    from ..errors import OnnxExternalData
    from ..onnx.preflight import preflight

    try:
        return [f.render() for f in preflight(str(path))]
    except OnnxExternalData as e:
        return [str(e)]
    except Exception as e:  # noqa: BLE001 — unparseable graph is a finding
        return [f"graph failed to parse: {e}"]


@models.command("info")
@click.argument("model_id")
@click.option("--languages", is_flag=True)
@click.option("--output-mode", type=click.Choice(["human", "json", "ndjson"]),
              envvar="BIRDA_OUTPUT_MODE")
def models_info(model_id, languages, output_mode):
    """Dispatch order matches the reference (``lib.rs:1735-1820``): the
    geomodel install handle first, then the registry, then the configured
    models — so an installed registry model reports its registry card, and
    ``models info geomodel`` works on a registry that has the asset even
    though it is not a configured model."""
    from ..registry.installer import GEOMODEL_INSTALL_ID
    from ..registry.loader import load_registry

    structured = output_mode in ("json", "ndjson")

    def emit(details: dict):
        reporter = create_reporter(output_mode)
        reporter.result(env.model_info_payload(details))
        reporter.finish()

    if model_id == GEOMODEL_INSTALL_ID:
        from ..errors import RangeFilterAssetMissing

        try:
            reg = load_registry()
            entry = reg.range_filter
            if entry is None:
                raise RangeFilterAssetMissing("not present in this registry")
        except BirdaError as e:
            print_error_chain(e)
            sys.exit(1)
        if structured:
            # "range-filter", not a classifier type: a consumer needs the
            # distinction so it does not offer this as a -m model.
            emit(env.model_details(
                id=GEOMODEL_INSTALL_ID, model_type="range-filter",
                source="registry",
            ))
            return
        click.echo(f"Range filter: {entry.name or entry.id}")
        if languages:
            # One English labels file, no variants: say so rather than
            # render an empty list that looks like a lookup failure
            # (reference lib.rs:1755-1764).
            click.echo()
            click.echo("The range filter has no label language variants. "
                       "Species names in output come from the active "
                       "classifier's own labels.")
            return
        # The "what am I about to download?" rendering (reference
        # registry/mod.rs::show_range_filter_info): the full license
        # obligations — the geomodel's CC BY-SA share-alike differs from
        # the classifiers' CC BY-NC-SA — and a RESOLVED download size.
        from ..config.geomodel import human_size, total_download_size

        click.echo(f"ID: {GEOMODEL_INSTALL_ID}")
        click.echo(f"Version: {entry.version}")
        click.echo(f"Vendor: {entry.vendor}")
        click.echo()
        click.echo("Description:")
        click.echo(f"  Scores {entry.species_count} species by location and "
                   "time of year. Shared by every")
        click.echo("  classifier; it is not selectable with -m.")
        click.echo()
        click.echo("License:")
        click.echo(f"  Type: {entry.license.type}")
        click.echo(f"  URL: {entry.license.url}")
        click.echo(
            f"  Commercial use: "
            f"{'Yes' if entry.license.commercial_use else 'No'}")
        click.echo(
            f"  Attribution required: "
            f"{'Yes' if entry.license.attribution_required else 'No'}")
        click.echo(
            f"  Share-alike required: "
            f"{'Yes' if entry.license.share_alike else 'No'}")
        click.echo()
        click.echo("Files:")
        click.echo(f"  Model: {entry.model.url}")
        click.echo(f"  Labels: {entry.labels.url}")
        click.echo(f"  Download size: {human_size(total_download_size(entry))}")
        click.echo()
        click.echo(f"To install: birda models install {GEOMODEL_INSTALL_ID}")
        return

    from ..errors import ModelNotFoundInRegistry

    try:
        # Only a genuine not-in-registry falls through to the configured
        # models; a registry-layer failure (corrupt cache, bad schema)
        # surfaces its real cause instead of masquerading as "not found".
        rm = load_registry().find_model(model_id)
    except ModelNotFoundInRegistry:
        rm = None
    except BirdaError as e:
        print_error_chain(e)
        sys.exit(1)
    if rm is not None:
        if structured:
            emit(env.model_details(
                id=rm.id, model_type=rm.model_type, source="registry",
            ))
            return
        if languages:
            # Language list only (reference registry/mod.rs::show_languages);
            # a variant family has no translations to list — saying that is
            # more use than printing an empty list (ModelHasNoLanguages).
            from ..errors import ModelHasNoLanguages

            if rm.files is None:
                print_error_chain(ModelHasNoLanguages(rm.id))
                sys.exit(1)
            click.echo(f"Model: {rm.name}")
            click.echo()
            click.echo("Available label languages:")
            click.echo()
            for lang in rm.files.languages:
                marker = (" (default)"
                          if lang.code == rm.files.default_language else "")
                click.echo(f"  {lang.code} - {lang.name}{marker}")
            click.echo()
            click.echo("To install with specific language:")
            click.echo(f"  birda models install {rm.id} --language <code>")
            return
        # Full rendering (reference registry/mod.rs::show_info).
        from ..config.geomodel import human_size

        click.echo(f"Model: {rm.name}")
        click.echo(f"ID: {rm.id}")
        if rm.build is not None:
            # Upstream identity + OUR conversion revision of those weights:
            # showing only the first would let two different files answer
            # to one version string.
            click.echo(f"Version: {rm.version} (build {rm.build})")
        else:
            click.echo(f"Version: {rm.version}")
        click.echo(f"Vendor: {rm.vendor}")
        click.echo()
        click.echo("Description:")
        click.echo(f"  {rm.description}")
        click.echo()
        click.echo("License:")
        click.echo(f"  Type: {rm.license.type}")
        click.echo(f"  URL: {rm.license.url}")
        click.echo(f"  Commercial use: "
                   f"{'Yes' if rm.license.commercial_use else 'No'}")
        click.echo(f"  Attribution required: "
                   f"{'Yes' if rm.license.attribution_required else 'No'}")
        click.echo(f"  Share-alike required: "
                   f"{'Yes' if rm.license.share_alike else 'No'}")
        click.echo()
        if rm.files is not None:
            click.echo("Files:")
            click.echo(f"  Model: {rm.files.model.url}")
            langs = rm.files.languages
            default_lang = next(
                (l.name for l in langs if l.code == rm.files.default_language),
                "Unknown",
            )
            if len(langs) == 1:
                click.echo(f"  Labels: {default_lang} only")
            else:
                click.echo(f"  Labels: {len(langs)} languages available "
                           f"(default: {default_lang})")
            click.echo()
        if rm.has_variants:
            global_variants = [v for v in rm.variants if v.region is None]
            regions = sorted({v.region for v in rm.variants if v.region})
            click.echo("Variants: "
                       + ", ".join(v.id for v in global_variants))
            default_v = next(
                (v for v in global_variants if v.id == rm.default_variant),
                None,
            )
            if default_v is not None:
                count = (f"{default_v.classes} species" if default_v.classes
                         else "species count not published")
                click.echo(f"  Global model: {count}, "
                           f"{human_size(default_v.model.size_bytes)}")
            click.echo(f"  Regional models: {len(regions)} "
                       f"(birda models regions {rm.id})")
            click.echo()
        click.echo(f"To install: birda models install {rm.id}")
        return

    cfg = config_file.load_default_config()
    if model_id in cfg.models:
        m = cfg.models[model_id]
        if structured:
            emit(env.model_details(
                id=model_id, model_type=m.model_type.value,
                path=str(m.path), labels_path=str(m.labels),
                source="configured",
            ))
            return
        click.echo(f"{model_id} (configured)")
        click.echo(f"  type: {m.model_type.value}")
        click.echo(f"  path: {m.path}")
        click.echo(f"  labels: {m.labels}")
        if m.installed_version:
            click.echo(f"  installed version: {m.installed_version}")
        return
    from ..errors import ModelNotFound

    print_error_chain(ModelNotFound(model_id))
    sys.exit(1)


@models.command("remove")
@click.argument("name")
@click.option("--purge", is_flag=True)
@click.option("-y", "--yes", is_flag=True,
              help="Assume yes for the --purge confirmation prompt.")
@click.option("--output-mode", type=click.Choice(["human", "json", "ndjson"]),
              envvar="BIRDA_OUTPUT_MODE")
def models_remove(name, purge, yes, output_mode):
    structured = output_mode in ("json", "ndjson")
    removed_entry = []
    promoted = []  # new default model id when removal promoted one

    # Confirm before deleting files (skip in structured mode). Prompted
    # BEFORE the lock: the prompt waits on the user, and holding the config
    # lock across that would block every other config write for as long as
    # the user takes to answer (reference lib.rs:1983-1992).
    if purge and not structured and not yes:
        # click.confirm raises Abort (exit 1, "Aborted!") on EOF/closed
        # stdin; the reference reads a line and treats empty/non-'y' as a
        # graceful cancel with exit 0 (lib.rs:1983-1992) — a scripted
        # human-mode run without input must cancel, not error.
        try:
            confirmed = click.confirm(
                f"This will delete model files for '{name}' from disk. "
                "Continue?",
                default=False,
            )
        except click.exceptions.Abort:
            confirmed = False
        if not confirmed:
            click.echo("Removal cancelled.")
            return

    def mutate(cfg: Config):
        from ..errors import ModelNotFound

        if name not in cfg.models:
            raise ModelNotFound(name)
        removed_entry.append(cfg.models.pop(name))
        if cfg.defaults.model == name:
            # Promotion is alphabetical, not insertion order (reference
            # lib.rs:1934 `.keys().min()`): deterministic across config
            # files that list the same models in different orders.
            cfg.defaults.model = min(cfg.models, default=None)
            if cfg.defaults.model is not None:
                promoted.append(cfg.defaults.model)

    try:
        config_file.update_config(mutate)
    except BirdaError as e:
        if structured:
            reporter = create_reporter(output_mode)
            reporter.error("model_remove_failed", ErrorSeverity.FATAL, str(e))
            reporter.finish()
        print_error_chain(e)
        sys.exit(1)

    first_error = None
    if purge:
        # Delete only the files THIS entry owned, skipping anything another
        # entry still references — never a directory-wide sweep (reference
        # lib.rs:2009-2051). Files are deleted after the config save, outside
        # the lock: the config stays consistent even if a delete fails.
        from ..registry.cleanup import owned_paths, referenced_model_paths

        still_referenced = referenced_model_paths(
            config_file.load_default_config()
        )
        for file in owned_paths(removed_entry[0]):
            if file in still_referenced:
                if not structured:
                    click.echo(f"  Skipped (used by another model): {file}")
                continue
            try:
                if file.exists():
                    file.unlink()
                    if not structured:
                        click.echo(f"  Deleted: {file}")
                elif not structured:
                    click.echo(f"  Skipped (not found): {file}")
            except OSError as e:
                if not structured:
                    click.echo(f"  Failed to delete: {file}")
                if first_error is None:
                    first_error = (file, e)

    if structured:
        # Emitted before any deletion error surfaces, so a machine consumer
        # knows the config change succeeded even though cleanup failed.
        reporter = create_reporter(output_mode)
        reporter.result(env.model_removed_payload(
            id=name, purge_requested=purge,
            new_default=promoted[0] if promoted else None,
        ))
        reporter.finish()
    else:
        click.echo(f"Removed model '{name}'")
        if promoted:
            click.echo(f"New default model: {promoted[0]}")
        else:
            cfg_after = config_file.load_default_config()
            if cfg_after.defaults.model is None and not cfg_after.models:
                click.echo(
                    "Warning: no models remaining. Set a new default with "
                    "`birda models install`."
                )
    if first_error is not None:
        from ..errors import FileDeletionFailed

        e = FileDeletionFailed(str(first_error[0]), str(first_error[1]))
        e.__cause__ = first_error[1]
        print_error_chain(e)
        sys.exit(1)


@models.command("regions")
@click.argument("model_id")
def models_regions(model_id):
    """List regional tiles grouped by continent (reference
    registry/mod.rs::show_regions): a user picking a region is choosing
    between memory footprints, so each tile carries its species count and
    download size. Each region lists once, not once per hardware variant —
    regions are what a user picks; the variant is picked for them."""
    from ..config.geomodel import human_size
    from ..errors import RegionsNotSupported
    from ..registry.loader import load_registry

    try:
        rm = load_registry().find_model(model_id)
        regional = [vv for vv in rm.variants if vv.region]
        if not regional:
            raise RegionsNotSupported(model_id)
    except BirdaError as e:
        print_error_chain(e)
        sys.exit(1)
    # Each tile is represented by the variant an INSTALL would pick (the
    # default variant), not the first in manifest order — those differ:
    # Perch lists int8-arm before no-dft-fp32 for every region while the
    # default is no-dft-fp32, so first-in-order would advertise a 42 MB
    # download for a tile whose default install actually fetches 62 MB
    # (reference types.rs:173-189).
    seen = {}
    for vv in regional:
        seen.setdefault(vv.region, vv)
        if rm.default_variant is not None and vv.id == rm.default_variant:
            seen[vv.region] = vv
    tiles = sorted(
        seen.values(),
        key=lambda vv: (vv.group_order, vv.group_name or "Other", vv.region),
    )
    click.echo(f"Regional variants of {rm.name}:")
    click.echo()
    current_group = None
    for vv in tiles:
        group = vv.group_name or "Other"
        if group != current_group:
            if current_group is not None:
                click.echo()
            click.echo(f"{group}:")
            current_group = group
        count = (f"{vv.classes} species" if vv.classes
                 else "species count not published")
        click.echo(f"  {vv.region:<24} {count:>28}   "
                   f"{human_size(vv.model.size_bytes)}")
    click.echo()
    click.echo("A regional model scores only the species of that region, "
               "which cuts")
    click.echo("memory use and latency. It is otherwise the same model.")
    click.echo()
    click.echo(f"To install: birda models install {model_id} --region <slug>")


@models.command("install")
@click.argument("model_id")
@click.option("-l", "--language", default=None,
              help="Label language code (default: the model's own default). "
                   "A language the model lacks is an error, not a fallback.")
@click.option("--region")
@click.option("--variant")
@click.option("-d", "--default", "set_default", is_flag=True)
@click.option("--accept-license", is_flag=True)
@click.option("-y", "--yes", is_flag=True,
              help="Assume yes for prompts (license acceptance).")
@click.option("--output-mode", type=click.Choice(["human", "json", "ndjson"]),
              envvar="BIRDA_OUTPUT_MODE")
def models_install(model_id, language, region, variant, set_default,
                   accept_license, yes, output_mode):
    accept_license = accept_license or yes
    from ..registry import installer, license as license_mod
    from ..registry.loader import load_registry
    from ..registry.selection import select_variant

    structured = output_mode in ("json", "ndjson")
    reg = load_registry()

    # The shared range filter installs under its own handle, since it is
    # used by every classifier rather than belonging to any one of them
    # (reference lib.rs:2104-2108, handle_geomodel_install:2391).
    if model_id == installer.GEOMODEL_INSTALL_ID:
        from ..errors import RangeFilterAssetMissing

        try:
            entry = reg.range_filter
            if entry is None:
                raise RangeFilterAssetMissing("not present in this registry")
            if not license_mod.prompt_license_acceptance(
                entry.id, entry.name or entry.id, entry.license,
                assume_yes=accept_license,
                vendor=getattr(entry, "vendor", "") or "",
            ):
                click.echo("License not accepted; aborting.")
                sys.exit(1)
            model_path, labels_path = installer.install_range_filter(entry)

            def mutate(cfg: Config):
                cfg.defaults.geomodel = model_path
                cfg.defaults.geomodel_labels = labels_path

            config_file.update_config(mutate)
        except BirdaError as e:
            if structured:
                reporter = create_reporter(output_mode)
                reporter.error("model_install_failed", ErrorSeverity.FATAL,
                               str(e))
                reporter.finish()
            print_error_chain(e)
            sys.exit(1)
        if structured:
            reporter = create_reporter(output_mode)
            reporter.result(env.model_installed_payload(
                id=installer.GEOMODEL_INSTALL_ID, set_as_default=False,
                model_path=str(model_path), labels_path=str(labels_path),
            ))
            reporter.finish()
            return
        click.echo(f"{entry.name or entry.id} installed.")
        click.echo(f"  {model_path}")
        click.echo(f"  {labels_path}")
        click.echo(f"Range filtering covers {entry.species_count} species.")
        return

    try:
        rm = reg.find_model(model_id)
        # Variant/region resolution BEFORE the license gate (reference
        # lib.rs:2110-2172 orders selection first): a typo'd --region must
        # fail naming the known regions, not stall at a license prompt.
        chosen = None
        if rm.has_variants:
            chosen = select_variant(rm, explicit_variant=variant, region=region)
        else:
            # Silently ignoring these would install the GLOBAL model while
            # the user believed they asked for a regional/variant one
            # (reference lib.rs:2150-2158).
            if region is not None:
                from ..errors import RegionsNotSupported

                raise RegionsNotSupported(model_id)
            if variant is not None:
                from ..errors import VariantNotFound

                raise VariantNotFound(
                    f"{variant} for {model_id} (none, this model publishes "
                    "a single file)"
                )
        if not license_mod.prompt_license_acceptance(
            rm.id, rm.name, rm.license, assume_yes=accept_license,
            vendor=rm.vendor,
        ):
            click.echo("License not accepted; aborting.")
            sys.exit(1)

        # Download progress bar on stderr (reference shows indicatif bars;
        # the NDJSON download_progress payload covers structured mode).
        bar_state = {}

        def progress(done, total):
            if not sys.stderr.isatty():
                return
            from tqdm import tqdm

            bar = bar_state.get("bar")
            if bar is None or bar_state.get("total") != total:
                if bar is not None:
                    bar.close()
                bar = tqdm(total=total, unit="B", unit_scale=True,
                           file=sys.stderr, leave=False)
                bar_state["bar"] = bar
                bar_state["total"] = total
                bar_state["done"] = 0
            bar.update(done - bar_state["done"])
            bar_state["done"] = done

        try:
            installed = installer.install_model(
                rm, language=language, variant=chosen, progress=progress
            )
        finally:
            if bar_state.get("bar") is not None:
                bar_state["bar"].close()
        # The geomodel auto-installs alongside range-filter-capable models
        # (single authority: config.range_filter.supports_range_filter —
        # do not re-derive the family list here).
        from ..config.range_filter import supports_range_filter

        if reg.range_filter is not None and supports_range_filter(
            bat_mode=False, model_type=ModelType(rm.model_type)
        ):
            try:
                installer.install_range_filter(reg.range_filter)
            except BirdaError as e:
                # A failure here is a warning, not an error: the
                # classifier itself installed fine and works without
                # range filtering (reference lib.rs:2186-2196).
                logging.getLogger("birda").warning(
                    "Could not install the BirdNET Geomodel v3.0.2 range "
                    "filter: %s. Run 'birda models install geomodel' to "
                    "retry.", e,
                )

        became_default = []
        # Regional installs get an `<id>-<region>` config key so a global
        # and a regional install of the same family — or two regional
        # ones — never fight over one entry (reference installer.rs:86-95,
        # InstallProvenance::config_key). The key is what the user types
        # with -m.
        config_key = (f"{model_id}-{installed.region}"
                      if installed.region else model_id)

        orphans = []

        def mutate(cfg: Config):
            from ..registry.cleanup import orphaned_files

            # Collected before the insert overwrites the entry that names
            # them, and deleted only after the config is saved: a crash in
            # between leaves a config that points exclusively at files which
            # exist. Published filenames never change, so an upgrade writes
            # new files beside the old ones — without this every upgrade
            # leaks the previous download (reference lib.rs:2267-2305).
            keeping = [installed.model_path, installed.labels_path]
            keeping.extend(p for p in installed.extra.values() if p)
            orphans[:] = orphaned_files(cfg, config_key, keeping)

            cfg.models[config_key] = ModelConfig(
                path=installed.model_path,
                labels=installed.labels_path,
                model_type=ModelType(rm.model_type),
                registry_id=rm.id,
                installed_version=rm.version,
                variant=installed.variant,
                region=installed.region,
                bsg_calibration=installed.extra.get("bsg_calibration"),
                bsg_migration=installed.extra.get("bsg_migration"),
                bsg_distribution_maps=installed.extra.get("bsg_distribution_maps"),
            )
            if set_default or cfg.defaults.model is None:
                cfg.defaults.model = config_key
                became_default.append(config_key)

        config_file.update_config(mutate)
        from ..registry.cleanup import remove_orphans

        for path, err in remove_orphans(orphans):
            logger.warning(
                "Could not remove the superseded model file %s: %s", path, err
            )
    except BirdaError as e:
        if structured:
            reporter = create_reporter(output_mode)
            reporter.error("model_install_failed", ErrorSeverity.FATAL, str(e))
            reporter.finish()
        print_error_chain(e)
        sys.exit(1)
    if structured:
        reporter = create_reporter(output_mode)
        reporter.result(env.model_installed_payload(
            id=config_key, set_as_default=bool(became_default),
            model_path=str(installed.model_path),
            labels_path=str(installed.labels_path),
        ))
        reporter.finish()
        return
    click.echo(f"Installed {config_key}")


# ---------------------------------------------------------------------------
# providers / species / clip / update
# ---------------------------------------------------------------------------

@cli.command()
@click.option("--output-mode", type=click.Choice(["human", "json", "ndjson"]),
              envvar="BIRDA_OUTPUT_MODE")
def version(output_mode):
    """Show the birda version (VersionPayload in structured modes —
    the consumer GUIs use this to gate protocol features)."""
    if output_mode in ("json", "ndjson"):
        reporter = create_reporter(output_mode)
        reporter.result(env.version_payload(__version__))
        reporter.finish()
        return
    click.echo(f"birda {__version__}")


@cli.command()
@click.option("--output-mode", type=click.Choice(["human", "json", "ndjson"]),
              envvar="BIRDA_OUTPUT_MODE")
def providers(output_mode):
    """Show available inference backends."""
    # Bounded: a listing command must answer in seconds even when the
    # device attachment is unreachable — in-process jax init would retry
    # for ~28 minutes on a dead tunnel, and even a CPU device query
    # initializes every platform. The probe runs in a throwaway
    # subprocess with a hard timeout (BIRDA_PROVIDER_PROBE_TIMEOUT secs).
    import os

    from ..inference.backend import available_backends_bounded, provider_metadata

    timeout = float(os.environ.get("BIRDA_PROVIDER_PROBE_TIMEOUT", "60"))
    avail, note = available_backends_bounded(timeout)
    if output_mode in ("json", "ndjson"):
        reporter = create_reporter(output_mode)
        reporter.result(env.providers_payload([
            env.provider_info(**provider_metadata(p)) for p in avail
        ]))
        reporter.finish()
        return
    # Header + usage footer mirror the reference's rendering
    # (lib.rs:1202-1226), with the flag ladder redesigned to this
    # backend's tpu/cpu/auto surface (SURVEY §2.1 row 2).
    click.echo("Available execution providers:")
    click.echo()
    for name in ("tpu", "cpu"):
        if name in avail:
            mark = provider_metadata(name)["description"]
        else:
            mark = "not available" + (f" ({note})" if note else "")
        click.echo(f"  {name}: {mark}")
    click.echo()
    click.echo("Usage:")
    click.echo("  (default)      Auto-select (TPU if available, "
               "silent CPU fallback)")
    click.echo("  --cpu          Force CPU only")
    click.echo("  --gpu          Prefer the accelerator; warn on fallback")
    click.echo()
    click.echo("Explicit providers (fail if unavailable):")
    click.echo("  --tpu          Require the TPU")


@cli.command()
@click.option("-o", "--output", type=click.Path(path_type=Path))
@click.option("--lat", callback=_validator(v.parse_latitude), required=True,
              help=f"Latitude {v.HELP_RANGES['latitude']}.")
@click.option("--lon", callback=_validator(v.parse_longitude), required=True,
              help=f"Longitude {v.HELP_RANGES['longitude']}.")
@click.option("--week", callback=_validator(v.parse_week),
              help=f"BirdNET calendar week {v.HELP_RANGES['week']}.")
@click.option("--month", callback=_validator(v.parse_month),
              help=f"Month {v.HELP_RANGES['month']}.")
@click.option("--day", callback=_validator(v.parse_day),
              help=f"Day of month {v.HELP_RANGES['day']}.")
@click.option("--threshold", callback=_validator(v.parse_confidence),
              help=f"Occurrence-score threshold {v.HELP_RANGES['confidence']}.")
@click.option("--sort", type=click.Choice(["freq", "alpha"]), default="freq")
@click.option("-m", "--model")
@click.option("--geomodel-path", type=click.Path(path_type=Path),
              envvar="BIRDA_GEOMODEL_PATH",
              help="Geomodel ONNX override; requires --geomodel-labels-path.")
@click.option("--geomodel-labels-path", type=click.Path(path_type=Path),
              envvar="BIRDA_GEOMODEL_LABELS_PATH")
@click.option("-y", "--yes", is_flag=True,
              help="Assume yes for prompts (geomodel download offer).")
@click.option("--output-mode", type=click.Choice(["human", "json", "ndjson"]),
              envvar="BIRDA_OUTPUT_MODE")
def species(output, lat, lon, week, month, day, threshold, sort, model,
            geomodel_path, geomodel_labels_path, yes, output_mode):
    """Generate a species list from the range filter."""
    from .species import (compute_species_list, generate_species_list,
                          split_species_label)

    if week is None and (month is None or day is None):
        raise click.UsageError("provide --week, or --month with --day")
    if week is not None and (month is not None or day is not None):
        # Same mutual exclusion as analyze (reference args.rs
        # test_species_command_week_month_conflict).
        raise click.UsageError("--week conflicts with --month/--day")
    if (geomodel_path is None) != (geomodel_labels_path is None):
        raise click.UsageError(
            "--geomodel-path and --geomodel-labels-path must be given together"
        )
    structured = output_mode in ("json", "ndjson")
    try:
        if structured:
            # Entries ride the payload inline; no file is written in
            # structured mode (reference species.rs:150-186).
            result = compute_species_list(
                lat=lat, lon=lon, week=week, month=month, day=day,
                threshold=threshold, sort=sort, model_name=model,
                geomodel_path=geomodel_path,
                geomodel_labels_path=geomodel_labels_path,
                allow_download=yes,
            )
        else:
            path, count = generate_species_list(
                output=output, lat=lat, lon=lon, week=week, month=month,
                day=day, threshold=threshold, sort=sort, model_name=model,
                geomodel_path=geomodel_path,
                geomodel_labels_path=geomodel_labels_path,
                allow_download=yes,
                interactive=sys.stdin.isatty(),
            )
    except BirdaError as e:
        if structured:
            reporter = create_reporter(output_mode)
            reporter.error("species_list_failed", ErrorSeverity.FATAL, str(e))
            reporter.finish()
        print_error_chain(e)
        sys.exit(1)
    if structured:
        entries = []
        for label, score in result.entries:
            sci, common = split_species_label(label)
            entries.append(env.species_entry(
                scientific_name=sci, common_name=common, frequency=score,
            ))
        reporter = create_reporter(output_mode)
        reporter.result(env.species_list_payload(
            lat=lat, lon=lon, week=result.week, threshold=result.threshold,
            species=entries, output_file=None,
        ))
        reporter.finish()
        return
    click.echo(f"Wrote {count} species to {path}")


@cli.command()
@click.argument("files", nargs=-1, type=click.Path(path_type=Path))
@click.option("-o", "--output", type=click.Path(path_type=Path),
              default=Path(constants.clipper.DEFAULT_OUTPUT_DIR))
@click.option("--audio", type=click.Path(path_type=Path),
              help="Source audio (direct mode; auto-detected in CSV mode).")
@click.option("--base-dir", type=click.Path(path_type=Path))
@click.option("--pre", callback=_validator(v.parse_padding),
              default=constants.clipper.DEFAULT_PRE_PADDING)
@click.option("--post", callback=_validator(v.parse_padding),
              default=constants.clipper.DEFAULT_POST_PADDING)
@click.option("--confidence", callback=_validator(v.parse_confidence), default=0.0)
@click.option("--species", "species_")
@click.option("--start", callback=_validator(v.parse_time), default=None)
@click.option("--end", callback=_validator(v.parse_time), default=None)
@click.option("--output-mode", type=click.Choice(["human", "json", "ndjson"]),
              envvar="BIRDA_OUTPUT_MODE")
def clip(files, output, audio, base_dir, pre, post, confidence, species_,
         start, end, output_mode):
    """Extract audio clips from detection results."""
    from ..clipper.command import ClipArgs, execute

    # clap's pairing contract (reference clip.rs:48-54): a lone --start
    # used to fall silently into CSV mode, which then tried to parse the
    # audio files as detection CSVs.
    if (start is None) != (end is None):
        raise click.UsageError("--start and --end must be given together")
    if start is not None:
        # Direct mode. The reference's surface is `--audio <file> --start
        # --end` with no positional FILES (clip.rs:17, 48); ours also
        # accepts positional audio files (multi-file direct extraction,
        # clipper/command.py) — but mixing both spellings is ambiguous.
        if audio is not None and files:
            raise click.UsageError(
                "direct mode takes either --audio or positional FILES, "
                "not both"
            )
        if audio is not None:
            files = (audio,)
        if not files:
            raise click.UsageError("--start/--end requires --audio")
    elif not files:
        raise click.UsageError("Missing argument 'FILES...'.")

    args = ClipArgs(
        files=list(files), output=output, audio=audio, base_dir=base_dir,
        pre=pre, post=post, confidence=confidence or 0.0, species=species_,
        start=start, end=end,
    )
    structured = output_mode in ("json", "ndjson")
    reporter = create_reporter(output_mode) if structured else None
    from ..errors import ClipBatchAllFailed

    all_failed = False
    try:
        # Per-file error events stream in NDJSON mode only: plain json is
        # a single document, and error objects ahead of it would make
        # stdout N+1 top-level objects (reference command.rs:110-125).
        summary = execute(
            args, reporter=(reporter if output_mode == "ndjson" else None)
        )
    except ClipBatchAllFailed as e:
        # Total failure still emits the one result document listing every
        # failure, THEN exits non-zero (#319 contract: a machine consumer
        # tells "no detections" apart from "every file failed").
        summary = e.summary
        all_failed = True
        if not structured:
            print_error_chain(e)
    except BirdaError as e:
        if structured:
            reporter.error("clip_extraction_failed", ErrorSeverity.FATAL, str(e))
            reporter.finish()
        print_error_chain(e)
        sys.exit(1)
    if structured:
        reporter.result(env.clip_extraction_payload(
            output_dir=str(args.output),
            total_clips=summary.total_clips,
            total_files=summary.processed_files,
            clips=[
                env.clip_extraction_entry(
                    source_audio=c["source_audio"],
                    scientific_name=c["species"],
                    confidence=c["confidence"],
                    start_time=c["start"], end_time=c["end"],
                    output_file=c["path"],
                )
                for c in summary.clips
            ],
            failed_files=[
                env.clip_extraction_failure(file=f["file"],
                                            error=f["message"])
                for f in summary.failures
            ],
        ))
        reporter.finish()
        if all_failed:
            sys.exit(1)
        return
    click.echo(
        f"Extracted {summary.total_clips} clip(s) from "
        f"{summary.processed_files} file(s)"
    )
    if summary.failures:
        logger.warning("%d detection file(s) failed to process",
                       len(summary.failures))
    if all_failed:
        sys.exit(1)


@cli.command()
@click.option("--check", is_flag=True, help="Only check, don't install.")
def update(check):
    """Check for and install updates."""
    from ..update import check_for_update, perform_update

    try:
        info = check_for_update()
        if info is None:
            click.echo("birda is up to date")
            return
        click.echo(f"Update available: {info.version}")
        if not check:
            perform_update(info)
            click.echo("Updated. Restart birda to use the new version.")
    except BirdaError as e:
        print_error_chain(e)
        sys.exit(1)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    # Global `--output-mode` before the subcommand (reference args.rs:64:
    # it is a top-level arg, so `birda --output-mode json models
    # list-available` is the canonical structured spelling). Without this
    # the analyze-prepend below would misroute that invocation into an
    # analyze run over inputs named "models" and "list-available". The
    # value travels via BIRDA_OUTPUT_MODE — the same env route the
    # reference reads — so every subcommand's own --output-mode picks it
    # up, and an explicit per-command flag still wins (click gives flags
    # precedence over envvars).
    while argv and (argv[0] == "--output-mode"
                    or argv[0].startswith("--output-mode=")):
        if argv[0] == "--output-mode":
            if len(argv) < 2:
                break  # let click report the missing value
            os.environ["BIRDA_OUTPUT_MODE"] = argv[1]
            argv = argv[2:]
        else:
            os.environ["BIRDA_OUTPUT_MODE"] = argv[0].split("=", 1)[1]
            argv = argv[1:]
    # `birda file.wav` == `birda analyze file.wav` (the reference's
    # no-subcommand analyze path).
    if argv and argv[0] not in SUBCOMMANDS and not argv[0] in ("--help", "-h", "--version"):
        argv = ["analyze", *argv]
    try:
        return cli.main(args=argv, standalone_mode=True)
    except BirdaError as e:
        # The last-resort cause-chain printer (reference main.rs:43-52):
        # per-command handlers render errors they expect, but a typed
        # error escaping any command (e.g. a corrupt config surfacing
        # from `config show`, a corrupt registry cache from
        # `models install`) must never reach the user as a traceback.
        print_error_chain(e)
        sys.exit(1)


if __name__ == "__main__":
    main()

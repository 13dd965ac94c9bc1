"""NDJSON event envelope, spec version 1.1.

GUI-compatible port of the reference protocol
(``src/output/json_envelope.rs``): every CLI output event is wrapped in
``{spec_version, timestamp, event, payload}``, with snake_case event names,
a ``result_type`` discriminator for command results, and Option fields
omitted (never null). Field names and shapes follow the reference exactly —
the envelope is part of the public API surface.
"""

from __future__ import annotations

import datetime
import json
from enum import Enum
from typing import Optional

SPEC_VERSION = "1.1"


class EventType(str, Enum):
    PIPELINE_STARTED = "pipeline_started"
    FILE_STARTED = "file_started"
    PROGRESS = "progress"
    FILE_COMPLETED = "file_completed"
    PIPELINE_COMPLETED = "pipeline_completed"
    RESULT = "result"
    ERROR = "error"
    CANCELLED = "cancelled"
    DETECTIONS = "detections"


class ResultType(str, Enum):
    ANALYSIS = "analysis"
    MODEL_LIST = "model_list"
    MODEL_INFO = "model_info"
    CLIP_EXTRACTION = "clip_extraction"
    SPECIES_LIST = "species_list"
    CONFIG = "config"
    PROVIDERS = "providers"
    VERSION = "version"
    AVAILABLE_MODELS = "available_models"
    MODEL_CHECK = "model_check"
    CONFIG_PATH = "config_path"
    MODEL_REMOVED = "model_removed"
    MODEL_INSTALLED = "model_installed"


class ErrorSeverity(str, Enum):
    FATAL = "fatal"
    WARNING = "warning"


class FileStatus(str, Enum):
    PROCESSED = "processed"
    FAILED = "failed"
    SKIPPED = "skipped"
    LOCKED = "locked"


class PipelineStatus(str, Enum):
    SUCCESS = "success"
    PARTIAL_SUCCESS = "partial_success"
    FAILED = "failed"


class CancelReason(str, Enum):
    USER_INTERRUPT = "user_interrupt"
    TIMEOUT = "timeout"


def _clean(d: dict) -> dict:
    """Drop None values (serde ``skip_serializing_if = Option::is_none``)."""
    return {k: v for k, v in d.items() if v is not None}


def envelope(event: EventType, payload: dict) -> dict:
    return {
        "spec_version": SPEC_VERSION,
        "timestamp": datetime.datetime.now(datetime.timezone.utc)
        .isoformat()
        .replace("+00:00", "Z"),
        "event": event.value,
        "payload": payload,
    }


def envelope_line(event: EventType, payload: dict) -> str:
    """One NDJSON line."""
    return json.dumps(envelope(event, payload), separators=(",", ":"))


# ---------------------------------------------------------------------------
# Payload builders (field names match the reference structs)
# ---------------------------------------------------------------------------

def pipeline_started_payload(
    total_files: int,
    model: str,
    min_confidence: float,
    execution_provider: dict,
    range_filter: Optional[dict] = None,
    precision: Optional[dict] = None,
) -> dict:
    # ``precision`` is an additive extension field (absent on the default
    # fp32 path, so the spec-1.1 wire format golden is unchanged): reduced-
    # precision runs report their mode and, for int8, the quantization
    # counts the way execution_provider reports requested/actual.
    return _clean({
        "total_files": total_files,
        "model": model,
        "min_confidence": min_confidence,
        "execution_provider": execution_provider,
        "range_filter": range_filter,
        "precision": precision,
    })


def file_started_payload(
    file: str, index: int, estimated_segments: int,
    duration_seconds: Optional[float] = None,
) -> dict:
    return _clean({
        "file": file,
        "index": index,
        "estimated_segments": estimated_segments,
        "duration_seconds": duration_seconds,
    })


def batch_progress(current: int, total: int) -> dict:
    return {
        "current": current,
        "total": total,
        "percent": 100.0 * current / total if total else 0.0,
    }


def file_progress(path: str, segments_done: int, segments_total: int) -> dict:
    return {
        "path": path,
        "segments_done": segments_done,
        "segments_total": segments_total,
        "percent": 100.0 * segments_done / segments_total if segments_total else 0.0,
    }


def progress_payload(
    batch: Optional[dict] = None,
    file: Optional[dict] = None,
    download: Optional[dict] = None,
) -> dict:
    return _clean({"batch": batch, "file": file, "download": download})


def download_progress(operation: str, model: str, file: str,
                      downloaded_bytes: int, total_bytes: int) -> dict:
    return {
        "operation": operation,
        "model": model,
        "file": file,
        "downloaded_bytes": downloaded_bytes,
        "total_bytes": total_bytes,
        "percent": 100.0 * downloaded_bytes / total_bytes if total_bytes else 0.0,
    }


def file_completed_payload(
    file: str,
    status: FileStatus,
    detections: Optional[int] = None,
    duration_ms: Optional[int] = None,
    error: Optional[dict] = None,
) -> dict:
    return _clean({
        "file": file,
        "status": status.value,
        "detections": detections,
        "duration_ms": duration_ms,
        "error": error,
    })


def pipeline_completed_payload(
    status: PipelineStatus,
    files_processed: int,
    files_failed: int,
    files_skipped: int,
    total_detections: int,
    total_segments: int,
    duration_ms: int,
    realtime_factor: float,
) -> dict:
    return {
        "status": status.value,
        "files_processed": files_processed,
        "files_failed": files_failed,
        "files_skipped": files_skipped,
        "total_detections": total_detections,
        "total_segments": total_segments,
        "duration_ms": duration_ms,
        "realtime_factor": realtime_factor,
    }


def error_payload(code: str, severity: ErrorSeverity, message: str,
                  suggestion: Optional[str] = None) -> dict:
    return _clean({
        "code": code,
        "severity": severity.value,
        "message": message,
        "suggestion": suggestion,
    })


def cancelled_payload(reason: CancelReason, files_completed: int,
                      files_total: int) -> dict:
    return {
        "reason": reason.value,
        "files_completed": files_completed,
        "files_total": files_total,
    }


def detection_info(d) -> dict:
    """DetectionInfo from a Detection (full label + split names)."""
    return {
        # Reference-faithful reconstruction (json_envelope.rs:418) — for an
        # underscore-less label both halves are the label, so "Dog" emits
        # as "Dog_Dog" there too; consumers key on the reference format.
        "species": f"{d.scientific_name}_{d.common_name}",
        "common_name": d.common_name,
        "scientific_name": d.scientific_name,
        "confidence": d.confidence,
        "start_time": d.start_time,
        "end_time": d.end_time,
    }


def detections_payload(file: str, detections: list,
                       bsg: Optional[dict] = None) -> dict:
    return _clean({
        "file": file,
        "detections": [detection_info(d) for d in detections],
        "bsg": bsg,
    })


def bsg_metadata(calibration_applied: bool, sdm_applied: bool,
                 latitude: Optional[float] = None,
                 longitude: Optional[float] = None,
                 day_of_year: Optional[int] = None) -> dict:
    return _clean({
        "calibration_applied": calibration_applied,
        "sdm_applied": sdm_applied,
        "latitude": latitude,
        "longitude": longitude,
        "day_of_year": day_of_year,
    })


def result_payload(result_type: ResultType, **fields) -> dict:
    return {"result_type": result_type.value, **_clean(fields)}

"""Golden-pin of the NDJSON event protocol, spec 1.1.

GUI clients parse these lines (reference ``src/output/json_envelope.rs``);
a silently renamed field or changed separator breaks them. The golden file
freezes the exact wire bytes of one event of each kind (timestamps
normalized to a sentinel, since they are the only run-varying field).
"""

import json
import re
from pathlib import Path

from birda_tpu.output import json_envelope as env
from birda_tpu.output.types import Detection

GOLDEN = Path(__file__).parent / "golden" / "protocol.ndjson"
TS = re.compile(r'"timestamp":"[^"]*"')


def canonical_lines() -> str:
    d = Detection(
        file_path=Path("/data/rec.wav"), start_time=3.0, end_time=6.0,
        scientific_name="Turdus merula", common_name="Common Blackbird",
        confidence=0.9125,
    )
    lines = [
        env.envelope_line(env.EventType.PIPELINE_STARTED, env.pipeline_started_payload(
            total_files=2, model="birdnet-v24", min_confidence=0.1,
            execution_provider={"requested": "tpu", "actual": "tpu",
                                "fallback_reason": None},
            range_filter={"geomodel_version": "3.0.2", "species_in_range": 212,
                          "total_species": 6522, "mapped_species": 6381,
                          "unmatched_species": 141,
                          "unmatched_policy": "keep", "threshold": 0.03},
        )),
        env.envelope_line(env.EventType.FILE_STARTED, env.file_started_payload(
            file="/data/rec.wav", index=0, estimated_segments=40,
            duration_seconds=120.0,
        )),
        env.envelope_line(env.EventType.PROGRESS, env.progress_payload(
            batch=env.batch_progress(1, 2),
            file=env.file_progress("/data/rec.wav", 16, 40),
        )),
        env.envelope_line(env.EventType.DETECTIONS, env.detections_payload(
            file="/data/rec.wav", detections=[d],
            bsg=env.bsg_metadata(calibration_applied=True, sdm_applied=False,
                                 latitude=60.2, longitude=24.9),
        )),
        env.envelope_line(env.EventType.FILE_COMPLETED, env.file_completed_payload(
            file="/data/rec.wav", status=env.FileStatus.PROCESSED,
            detections=17, duration_ms=912,
        )),
        env.envelope_line(env.EventType.ERROR, env.error_payload(
            code="audio_decode_error", severity=env.ErrorSeverity.WARNING,
            message="failed to decode audio from /data/bad.wav: truncated",
            suggestion="re-export the file",
        )),
        env.envelope_line(env.EventType.PIPELINE_COMPLETED, env.pipeline_completed_payload(
            status=env.PipelineStatus.SUCCESS, files_processed=2,
            files_failed=0, files_skipped=0, total_detections=31,
            total_segments=80, duration_ms=2450, realtime_factor=97.9,
        )),
        env.envelope_line(env.EventType.RESULT, env.species_list_payload(
            lat=60.17, lon=24.94, week=24, threshold=0.03,
            species=[env.species_entry(
                scientific_name="Turdus merula",
                common_name="Common Blackbird", frequency=0.81,
            )],
            output_file=None,
        )),
    ]
    return "\n".join(TS.sub('"timestamp":"<TS>"', ln) for ln in lines) + "\n"


class TestProtocolGolden:
    def test_wire_bytes_pinned(self):
        got = canonical_lines()
        want = GOLDEN.read_text()
        assert got == want, (
            "NDJSON protocol drifted from spec 1.1 golden:\n--- got ---\n"
            f"{got}\n--- want ---\n{want}"
        )

    def test_golden_spec_facts(self):
        """The golden itself must satisfy the spec-1.1 contract, so it can't
        drift to match a broken emitter."""
        for line in GOLDEN.read_text().splitlines():
            doc = json.loads(line)
            assert doc["spec_version"] == "1.1"
            assert set(doc) == {"spec_version", "timestamp", "event",
                                "payload"}
        events = [json.loads(ln)["event"] for ln in
                  GOLDEN.read_text().splitlines()]
        assert events == [
            "pipeline_started", "file_started", "progress", "detections",
            "file_completed", "error", "pipeline_completed", "result",
        ]
        # Compact separators (no spaces) — GUI parsers read line-delimited.
        assert '", "' not in GOLDEN.read_text()

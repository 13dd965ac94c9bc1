"""Golden-pin of the 12 ``result_type`` command payloads, spec 1.1.

The event-stream golden (``test_protocol_golden.py``) freezes the pipeline
events; this file freezes the command *results* — the payloads GUI clients
parse from ``models list``, ``providers``, ``species``, ``clip`` and
friends (reference ``src/output/json_envelope.rs:163-742``: one struct per
result type; ``analysis`` is an enum-only discriminator with no struct,
there and here). Every CLI command builds its result envelope through the
typed builders in ``output/json_envelope.py``, so a field rename or shape
change in any of them cannot pass CI without a deliberate golden update.
"""

import json
import re
from pathlib import Path

from birda_tpu.output import json_envelope as env

GOLDEN = Path(__file__).parent / "golden" / "results.ndjson"
TS = re.compile(r'"timestamp":"[^"]*"')


def canonical_lines() -> str:
    payloads = [
        env.model_list_payload([
            env.model_entry(id="birdnet-v24", model_type="birdnet-v24",
                            is_default=True,
                            path="/models/birdnet-v24.onnx",
                            labels_path="/models/birdnet-v24-labels.txt"),
            env.model_entry(id="perch-v2", model_type="perch-v2",
                            is_default=False,
                            path="/models/perch-v2.onnx",
                            labels_path="/models/perch-v2-labels.txt"),
        ]),
        env.model_info_payload(env.model_details(
            id="birdnet-v24", model_type="birdnet-v24",
            path="/models/birdnet-v24.onnx",
            labels_path="/models/birdnet-v24-labels.txt",
            source="configured",
        )),
        env.model_info_payload(env.model_details(
            id="geomodel", model_type="range-filter", source="registry",
        )),
        env.providers_payload([
            env.provider_info(id="tpu", name="TPU",
                              description="TPU (Google TPU via XLA)"),
            env.provider_info(id="cpu", name="CPU",
                              description="CPU (always available)"),
        ]),
        env.config_payload(
            "/home/u/.config/birda/config.toml",
            {"defaults": {"model": "birdnet-v24", "min_confidence": 0.1}},
        ),
        env.config_path_payload("/home/u/.config/birda/config.toml", True),
        env.available_models_payload(
            models=[env.available_model_entry(
                id="birdnet-v24", name="BirdNET v2.4",
                description="Global bird sound classifier",
                vendor="Cornell Lab of Ornithology", version="2.4",
                model_type="birdnet-v24", recommended=True,
                license="CC-BY-NC-SA-4.0", commercial_use=False,
            )],
            available_range_filter=env.available_range_filter_entry(
                id="geomodel", name="BirdNET Geomodel v3.0.2",
                version="3.0.2", vendor="Cornell Lab of Ornithology",
                license="CC-BY-SA-4.0", commercial_use=True,
                share_alike=True, species_count=12012,
                size_bytes=15728640,
            ),
        ),
        env.model_check_payload(
            models=[
                env.model_check_entry(id="birdnet-v24", valid=True),
                env.model_check_entry(
                    id="broken", valid=False,
                    error="2 unsupported graph element(s)",
                    unsupported=["node 3 (Foo): unsupported op type Foo",
                                 "node 9 (Bar): unsupported op type Bar"],
                ),
            ],
            geomodel=env.geomodel_info(
                version="3.0.2", installed=True, species_count=12012,
                model_path="/data/birdnet-geomodel-v3.onnx",
                labels_path="/data/birdnet-geomodel-v3-labels.txt",
            ),
            leftover_downloads=["/data/birdnet-v30.onnx.12345.part"],
        ),
        env.model_removed_payload(id="birdnet-v24", purge_requested=True,
                                  new_default="perch-v2"),
        env.model_installed_payload(
            id="birdnet-v24", set_as_default=True,
            model_path="/models/birdnet-v24.onnx",
            labels_path="/models/birdnet-v24-labels.txt",
        ),
        env.species_list_payload(
            lat=60.17, lon=24.94, week=24, threshold=0.03,
            species=[
                env.species_entry(scientific_name="Turdus merula",
                                  common_name="Common Blackbird",
                                  frequency=0.81),
                env.species_entry(scientific_name="Parus major",
                                  common_name="Great Tit", frequency=0.77),
            ],
            output_file=None,
        ),
        env.clip_extraction_payload(
            output_dir="clips",
            total_clips=1, total_files=2,
            clips=[env.clip_extraction_entry(
                source_audio="/data/rec.wav",
                scientific_name="Turdus merula", confidence=0.91,
                start_time=2.5, end_time=6.5,
                output_file="clips/Turdus_merula_0.91_2.5s_6.5s.wav",
            )],
            failed_files=[env.clip_extraction_failure(
                file="/data/bad.csv",
                error="failed to parse detection file",
            )],
        ),
        env.version_payload("0.3.0"),
    ]
    lines = [env.envelope_line(env.EventType.RESULT, p) for p in payloads]
    return "\n".join(TS.sub('"timestamp":"<TS>"', ln) for ln in lines) + "\n"


class TestResultsGolden:
    def test_wire_bytes_pinned(self):
        got = canonical_lines()
        want = GOLDEN.read_text()
        assert got == want, (
            "result payloads drifted from spec 1.1 golden:\n--- got ---\n"
            f"{got}\n--- want ---\n{want}"
        )

    def test_every_result_type_covered(self):
        """All ResultType values except the enum-only ``analysis``
        discriminator appear in the golden, so adding a ResultType without
        pinning its payload fails here."""
        pinned = {json.loads(ln)["payload"]["result_type"]
                  for ln in GOLDEN.read_text().splitlines()}
        expected = {rt.value for rt in env.ResultType} - {"analysis"}
        assert pinned == expected

    def test_golden_spec_facts(self):
        text = GOLDEN.read_text()
        for line in text.splitlines():
            doc = json.loads(line)
            assert doc["spec_version"] == "1.1"
            assert doc["event"] == "result"
            assert set(doc) == {"spec_version", "timestamp", "event",
                                "payload"}
            # Option fields are omitted, never serialized as null — with
            # the reference's one pinned exception: ModelRemovedPayload's
            # new_default has no skip_serializing_if (json_envelope.rs:633).
            payload = doc["payload"]
            if payload["result_type"] != "model_removed":
                assert None not in payload.values()
        # Compact separators (no spaces) — GUI parsers read line-delimited.
        assert '", "' not in text

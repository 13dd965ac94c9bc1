"""Output writer tests: exact formats for CSV/Raven/Audacity/Kaleidoscope,
Parquet schema/roundtrip, JSON result file, NDJSON envelope protocol."""

import io
import json
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from birda_tpu.errors import NoInputFilesToCombine
from birda_tpu.output.audacity import AudacityWriter
from birda_tpu.output.csv import CsvWriter, escape_csv
from birda_tpu.output.json_envelope import (
    EventType,
    FileStatus,
    SPEC_VERSION,
    envelope,
)
from birda_tpu.output.json_file import JsonResultWriter
from birda_tpu.output.kaleidoscope import KaleidoscopeWriter
from birda_tpu.output.parquet import ParquetWriter, build_schema, combine_parquet_files
from birda_tpu.output.raven import RavenWriter, generate_species_code
from birda_tpu.output.reporter import JsonReporter, ProgressThrottler
from birda_tpu.output.types import Detection


def make_detection(conf=0.8542, start=0.0, end=3.0, path="/path/to/audio.wav",
                   label="Passer domesticus_House Sparrow"):
    return Detection.from_label(label, conf, start, end, path)


class TestCsv:
    def test_golden_row(self, tmp_path):
        p = tmp_path / "out.csv"
        with CsvWriter(p, include_bom=True) as w:
            w.write_detection(make_detection())
        raw = p.read_bytes()
        assert raw.startswith(b"\xef\xbb\xbf")
        lines = raw.decode("utf-8-sig").splitlines()
        assert lines[0] == "Start (s),End (s),Scientific name,Common name,Confidence,File"
        assert lines[1] == "0.0,3.0,Passer domesticus,House Sparrow,0.8542,/path/to/audio.wav"

    def test_no_bom(self, tmp_path):
        p = tmp_path / "out.csv"
        with CsvWriter(p, include_bom=False) as w:
            w.write_detection(make_detection())
        assert not p.read_bytes().startswith(b"\xef\xbb\xbf")

    def test_metadata_columns(self, tmp_path):
        p = tmp_path / "out.csv"
        d = make_detection()
        d.metadata.lat = 60.2
        d.metadata.week = 24
        d.metadata.model = "birdnet-v24"
        with CsvWriter(p, include_columns=["lat", "week", "model", "lon"]) as w:
            w.write_detection(d)
        lines = p.read_text(encoding="utf-8-sig").splitlines()
        assert lines[0].endswith(",lat,week,model,lon")
        assert lines[1].endswith(",60.2,24,birdnet-v24,")  # lon empty, col present

    def test_escaping(self):
        assert escape_csv("plain") == "plain"
        assert escape_csv("a,b") == '"a,b"'
        assert escape_csv('say "hi"') == '"say ""hi"""'

    def test_escaped_species(self, tmp_path):
        p = tmp_path / "out.csv"
        with CsvWriter(p, include_bom=False) as w:
            w.write_detection(make_detection(label='Genus sp_Weird, "bird"'))
        line = p.read_text().splitlines()[1]
        assert '"Weird, ""bird"""' in line


class TestRaven:
    def test_golden_row(self, tmp_path):
        p = tmp_path / "out.txt"
        with RavenWriter(p) as w:
            w.write_detection(make_detection())
        lines = p.read_text().splitlines()
        assert lines[0].split("\t") == [
            "Selection", "View", "Channel", "Begin Time (s)", "End Time (s)",
            "Low Freq (Hz)", "High Freq (Hz)", "Common Name", "Species Code",
            "Confidence", "Begin Path", "File Offset (s)",
        ]
        assert lines[1] == (
            "1\tSpectrogram 1\t1\t0.0\t3.0\t150\t15000\tHouse_Sparrow\t"
            "houspa\t0.8542\t/path/to/audio.wav\t0.0"
        )

    def test_selection_ids_increment(self, tmp_path):
        p = tmp_path / "out.txt"
        with RavenWriter(p) as w:
            w.write_detection(make_detection())
            w.write_detection(make_detection(start=3.0, end=6.0))
        lines = p.read_text().splitlines()
        assert lines[1].split("\t")[0] == "1"
        assert lines[2].split("\t")[0] == "2"

    def test_species_code(self):
        assert generate_species_code("House Sparrow") == "houspa"
        assert generate_species_code("Wren") == "wren"
        assert generate_species_code("") == "unkn"
        assert generate_species_code("Great Spotted Woodpecker") == "grewoo"


class TestAudacity:
    def test_golden_row(self, tmp_path):
        p = tmp_path / "out.txt"
        with AudacityWriter(p) as w:
            w.write_detection(make_detection())
        assert p.read_text().splitlines() == ["0.0\t3.0\tHouse Sparrow\t0.8542"]


class TestKaleidoscope:
    def test_golden_row(self, tmp_path):
        p = tmp_path / "out.csv"
        with KaleidoscopeWriter(p) as w:
            w.write_detection(make_detection(path="/data/site1/audio.wav"))
        lines = p.read_text().splitlines()
        assert lines[0] == "INDIR,FOLDER,IN FILE,OFFSET,DURATION,TOP1MATCH,TOP1DIST"
        assert lines[1] == "/data,site1,audio.wav,0.0,3.0,House_Sparrow,0.8542"

    def test_bare_filename(self, tmp_path):
        p = tmp_path / "out.csv"
        with KaleidoscopeWriter(p) as w:
            w.write_detection(make_detection(path="audio.wav"))
        assert p.read_text().splitlines()[1] == ",,audio.wav,0.0,3.0,House_Sparrow,0.8542"


class TestJsonFile:
    def test_document_shape(self, tmp_path):
        p = tmp_path / "out.json"
        w = JsonResultWriter(
            p, source_file="audio.wav", model="birdnet-v24",
            min_confidence=0.1, overlap=0.0, audio_duration=120.0,
            lat=60.2, lon=24.9, week=24,
        )
        w.write_detection(make_detection())
        w.write_detection(make_detection(label="Parus major_Great Tit"))
        w.finalize()
        doc = json.loads(p.read_text())
        assert doc["source_file"] == "audio.wav"
        assert doc["model"] == "birdnet-v24"
        assert doc["settings"] == {
            "min_confidence": 0.1, "overlap": 0.0,
            "lat": 60.2, "lon": 24.9, "week": 24,
        }
        assert doc["summary"] == {
            "total_detections": 2,
            "unique_species": 2,
            "audio_duration_seconds": 120.0,
        }
        assert doc["detections"][0]["scientific_name"] == "Passer domesticus"
        assert doc["analysis_date"].endswith("Z")

    def test_optional_settings_skipped(self, tmp_path):
        p = tmp_path / "out.json"
        w = JsonResultWriter(p, "a.wav", "m", 0.1, 0.0, 1.0)
        w.finalize()
        doc = json.loads(p.read_text())
        assert "lat" not in doc["settings"]


class TestParquet:
    def test_schema(self):
        s = build_schema(["lat", "week", "bogus"])
        assert [f.name for f in s] == [
            "start_s", "end_s", "scientific_name", "common_name",
            "confidence", "file", "lat", "week",
        ]
        assert str(s.field("lat").type) == "double"
        assert str(s.field("week").type) == "uint8"

    def test_roundtrip(self, tmp_path):
        p = tmp_path / "out.parquet"
        with ParquetWriter(p, ["lat", "model"]) as w:
            d = make_detection()
            d.metadata.lat = 60.2
            d.metadata.model = "m"
            w.write_detection(d)
            w.write_detection(make_detection(label="Parus major_Great Tit"))
        t = pq.read_table(str(p))
        assert t.num_rows == 2
        assert t.column("scientific_name").to_pylist() == [
            "Passer domesticus", "Parus major",
        ]
        assert t.column("lat").to_pylist() == [60.2, None]

    def test_batching_over_1000(self, tmp_path):
        p = tmp_path / "big.parquet"
        with ParquetWriter(p) as w:
            for i in range(2500):
                w.write_detection(make_detection(start=float(i)))
        assert pq.read_table(str(p)).num_rows == 2500

    def test_combine(self, tmp_path):
        files = []
        for i in range(3):
            f = tmp_path / f"part{i}.parquet"
            with ParquetWriter(f) as w:
                w.write_detection(make_detection(start=float(i)))
            files.append(f)
        out = tmp_path / "combined.parquet"
        combine_parquet_files(files, out)
        t = pq.read_table(str(out))
        assert t.num_rows == 3

    def test_combine_empty_raises(self, tmp_path):
        with pytest.raises(NoInputFilesToCombine):
            combine_parquet_files([], tmp_path / "x.parquet")

    def test_combine_failure_leaves_no_output(self, tmp_path):
        # A mid-combine failure must not leave a footer-complete (readable
        # but silently truncated) table at the final path — nor a .part.
        from birda_tpu.errors import ParquetFileOpen

        good = tmp_path / "good.parquet"
        with ParquetWriter(good) as w:
            w.write_detection(make_detection(start=1.0))
        corrupt = tmp_path / "corrupt.parquet"
        corrupt.write_bytes(b"not parquet at all")
        out = tmp_path / "combined.parquet"
        with pytest.raises(ParquetFileOpen):
            combine_parquet_files([good, corrupt], out)
        assert not out.exists()
        assert not list(tmp_path.glob(".combined.parquet.*")), "leftover .part"


class TestEnvelope:
    def test_envelope_shape(self):
        doc = envelope(EventType.PIPELINE_STARTED, {"a": 1})
        assert doc["spec_version"] == SPEC_VERSION == "1.1"
        assert doc["event"] == "pipeline_started"
        assert doc["timestamp"].endswith("Z")
        assert doc["payload"] == {"a": 1}

    def test_ndjson_stream(self):
        buf = io.StringIO()
        r = JsonReporter(buf)
        r.pipeline_started(
            3, "birdnet-v24", 0.1,
            {"requested": "auto", "actual": "tpu"},
        )
        r.file_started("a.wav", 0, 100, 300.0)
        r.file_completed_success("a.wav", 7, 1234)
        r.detections("a.wav", [make_detection()])
        lines = [json.loads(l) for l in buf.getvalue().splitlines()]
        assert [l["event"] for l in lines] == [
            "pipeline_started", "file_started", "file_completed", "detections",
        ]
        det = lines[3]["payload"]["detections"][0]
        assert det["species"] == "Passer domesticus_House Sparrow"
        assert lines[2]["payload"]["status"] == "processed"

    def test_buffered_json_mode(self):
        buf = io.StringIO()
        r = JsonReporter(buf, buffered=True)
        r.file_skipped("a.wav", FileStatus.LOCKED)
        assert buf.getvalue() == ""
        r.finish()
        docs = json.loads(buf.getvalue())
        assert len(docs) == 1
        assert docs[0]["payload"]["status"] == "locked"

    def test_throttler(self):
        t = ProgressThrottler()
        assert t.should_emit(0.0)       # always at 0
        assert not t.should_emit(5.0)   # <10% delta, <500ms
        assert t.should_emit(15.0)      # >=10% delta
        assert not t.should_emit(16.0)
        assert t.should_emit(100.0)     # always at 100


class TestEveryRecognisedColumn:
    """The reference pins that every name in csv_columns.RECOGNISED reaches
    both writers (constants.rs:131-158 invariant)."""

    def full_metadata_detection(self):
        d = make_detection()
        d.metadata.lat = 60.2
        d.metadata.lon = 24.9
        d.metadata.week = 24
        d.metadata.model = "birdnet-v24"
        d.metadata.overlap = 1.5
        d.metadata.sensitivity = 1.25
        d.metadata.min_conf = 0.1
        d.metadata.species_list = "my_list.txt"
        return d

    def test_every_recognised_column_is_written(self, tmp_path):
        from birda_tpu.constants import csv_columns

        p = tmp_path / "out.csv"
        cols = list(csv_columns.RECOGNISED)
        with CsvWriter(p, include_columns=cols, include_bom=False) as w:
            w.write_detection(self.full_metadata_detection())
        header, row = p.read_text().splitlines()
        assert header.split(",")[6:] == cols
        values = row.split(",")[6:]
        assert values == ["60.2", "24.9", "24", "birdnet-v24", "1.5",
                          "1.25", "0.1", "my_list.txt"]

    def test_every_recognised_column_reaches_the_parquet_writer(self, tmp_path):
        from birda_tpu.constants import csv_columns

        p = tmp_path / "out.parquet"
        cols = list(csv_columns.RECOGNISED)
        with ParquetWriter(p, cols) as w:
            w.write_detection(self.full_metadata_detection())
        t = pq.read_table(str(p))
        assert [f.name for f in t.schema][6:] == cols
        row = t.to_pylist()[0]
        assert row["lat"] == 60.2
        assert row["week"] == 24
        assert row["species_list"] == "my_list.txt"


class TestReviewRegressions:
    def test_fmt_opt_matches_rust_display(self):
        """Rust's {} Display prints whole floats without '.0'."""
        from birda_tpu.output.csv import _fmt_opt

        assert _fmt_opt(45.0) == "45"
        assert _fmt_opt(-7.0) == "-7"
        assert _fmt_opt(2.333) == "2.333"
        assert _fmt_opt(24) == "24"
        assert _fmt_opt("x") == "x"

    def test_writer_abort_on_error_removes_partial_output(self, tmp_path):
        """An exception inside the writer context closes the handle AND
        removes the partial file, so output-existence resume retries the
        failed file instead of skipping it as done."""
        from birda_tpu.output.csv import CsvWriter
        from birda_tpu.output.parquet import ParquetWriter

        for cls, name in [(CsvWriter, "x.csv"), (ParquetWriter, "x.parquet")]:
            p = tmp_path / name
            with pytest.raises(RuntimeError):
                with cls(p):
                    raise RuntimeError("mid-write failure")
            assert not p.exists(), cls.__name__

    def test_writer_success_keeps_output(self, tmp_path):
        from birda_tpu.output.csv import CsvWriter

        p = tmp_path / "ok.csv"
        with CsvWriter(p):
            pass
        assert p.exists()


class TestSigintReentrancy:
    def test_json_reporter_lock_is_reentrant(self):
        """The SIGINT handler runs ON the main thread and emits through the
        reporter (cancelled()/finish()); if the interrupt lands while the
        main thread is inside _emit holding the lock, a non-reentrant lock
        deadlocks the handler forever. Pin the RLock property directly."""
        buf = io.StringIO()
        r = JsonReporter(buf)
        assert r._lock.acquire(blocking=False)
        try:
            # Same-thread reacquire must succeed (RLock); with a plain
            # Lock this returns False — the deadlock in miniature.
            assert r._lock.acquire(blocking=False)
            r._lock.release()
        finally:
            r._lock.release()

    def test_emit_inside_held_lock_completes(self):
        """End-to-end shape of the SIGINT case: an emit while the same
        thread already holds the reporter lock must complete, not block."""
        buf = io.StringIO()
        r = JsonReporter(buf)
        with r._lock:
            r.file_skipped("a.wav", FileStatus.LOCKED)
        assert "locked" in buf.getvalue()

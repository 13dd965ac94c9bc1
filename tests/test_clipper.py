"""Clipper tests: parsing, grouping, extraction, writing, command flow."""

import numpy as np
import pytest

from birda_tpu.clipper.command import (
    ClipArgs,
    execute,
    find_source_audio,
    validate_float_args,
)
from birda_tpu.clipper.extractor import ClipExtractor, prealloc_cap, validate_time_range
from birda_tpu.clipper.grouper import group_detections
from birda_tpu.clipper.parser import ParsedDetection, parse_detection_file
from birda_tpu.clipper.writer import WavWriter, generate_filename, sanitize_filename
from birda_tpu.errors import (
    ClipBatchAllFailed,
    EmptyExtraction,
    InvalidConfidence,
    InvalidDetectionFormat,
    InvalidPadding,
    InvalidTimeRange,
    SourceAudioNotFound,
)

from fixtures_audio import write_wav


CSV_HEADER = "Start (s),End (s),Scientific name,Common name,Confidence,File\n"


def make_csv(path, rows):
    path.write_text(
        "﻿" + CSV_HEADER
        + "".join(f"{s},{e},{sci},{com},{c},audio.wav\n" for s, e, sci, com, c in rows)
    )


class TestParser:
    def test_parse(self, tmp_path):
        p = tmp_path / "r.csv"
        make_csv(p, [(0.0, 3.0, "Parus major", "Great Tit", 0.9),
                     (3.0, 6.0, "Parus major", "Great Tit", 0.5)])
        dets = parse_detection_file(p)
        assert len(dets) == 2
        assert dets[0].scientific_name == "Parus major"

    def test_nonfinite_rows_skipped(self, tmp_path):
        p = tmp_path / "r.csv"
        make_csv(p, [(0.0, 3.0, "A a", "X", 0.9),
                     (float("nan"), 3.0, "B b", "Y", 0.9),
                     (0.0, float("inf"), "C c", "Z", 0.9),
                     (0.0, 3.0, "D d", "W", float("nan"))])
        dets = parse_detection_file(p)
        assert [d.scientific_name for d in dets] == ["A a"]

    def test_confidence_overflowing_f32_is_skipped(self, tmp_path):
        # 1e40 is finite in f64 but overflows the reference's f32 confidence
        # field to +inf; the row skips instead of out-comparing every
        # threshold (reference parser.rs test_parse_skips_a_confidence_
        # that_overflows_f32).
        p = tmp_path / "r.csv"
        make_csv(p, [(0.0, 3.0, "A a", "X", 1e40),
                     (5.0, 8.0, "B b", "Y", 0.9)])
        dets = parse_detection_file(p)
        assert [d.scientific_name for d in dets] == ["B b"]

    def test_empty_file_returns_empty_list(self, tmp_path):
        # Reference parser.rs test_empty_file_returns_empty_vec: a fully
        # empty file is a zero-detection input, not a format error.
        p = tmp_path / "r.csv"
        p.write_text("")
        assert parse_detection_file(p) == []

    def test_end_before_start_is_hard_error(self, tmp_path):
        p = tmp_path / "r.csv"
        make_csv(p, [(3.0, 1.0, "A a", "X", 0.9)])
        with pytest.raises(InvalidTimeRange):
            parse_detection_file(p)

    def test_missing_columns(self, tmp_path):
        p = tmp_path / "r.csv"
        p.write_text("a,b,c\n1,2,3\n")
        with pytest.raises(InvalidDetectionFormat):
            parse_detection_file(p)

    def test_quoted_fields(self, tmp_path):
        p = tmp_path / "r.csv"
        p.write_text(CSV_HEADER + '0.0,3.0,"Genus, sp","Weird ""bird""",0.5,a.wav\n')
        dets = parse_detection_file(p)
        assert dets[0].scientific_name == "Genus, sp"
        assert dets[0].common_name == 'Weird "bird"'


class TestGrouper:
    def d(self, start, end, sci="A a", conf=0.5):
        return ParsedDetection(start, end, sci, "X", conf)

    def test_merge_overlapping_padded(self):
        groups = group_detections(
            [self.d(10, 13), self.d(14, 17)], pre_padding=1.0, post_padding=1.0
        )
        # 9-14 and 13-18 overlap -> one group 9-18.
        assert len(groups) == 1
        assert groups[0].start == 9.0
        assert groups[0].end == 18.0
        assert groups[0].detection_count == 2

    def test_no_merge_across_species(self):
        groups = group_detections(
            [self.d(10, 13, "A a"), self.d(11, 14, "B b")], 0.0, 0.0
        )
        assert len(groups) == 2

    def test_start_clamped_to_zero(self):
        groups = group_detections([self.d(1.0, 4.0)], pre_padding=5.0, post_padding=0.0)
        assert groups[0].start == 0.0

    def test_max_confidence_tracked(self):
        groups = group_detections(
            [self.d(10, 13, conf=0.3), self.d(12, 15, conf=0.8)], 0.0, 0.0
        )
        assert groups[0].max_confidence == 0.8

    def test_sorted_by_start(self):
        groups = group_detections(
            [self.d(20, 23, "B b"), self.d(5, 8, "A a")], 0.0, 0.0
        )
        assert [g.start for g in groups] == [5.0, 20.0]


class TestExtractor:
    def test_extract_window(self, tmp_path):
        rate = 48000
        x = (np.arange(rate * 20) / (rate * 20)).astype(np.float32)
        audio = tmp_path / "a.wav"
        write_wav(audio, x, rate, fmt="f32")
        from birda_tpu.clipper.grouper import DetectionGroup

        g = DetectionGroup("A a", "X", 2.0, 5.0, 0.9, 1)
        clip = ClipExtractor().extract_clip(audio, g)
        assert clip.sample_rate == rate
        assert len(clip.samples) == rate * 3
        assert np.max(np.abs(clip.samples - x[rate * 2 : rate * 5])) < 1e-6

    def test_seek_path_matches(self, tmp_path):
        # Start past the 10 s seek threshold exercises the seek branch.
        rate = 48000
        x = (np.arange(rate * 20) / (rate * 20)).astype(np.float32)
        audio = tmp_path / "a.wav"
        write_wav(audio, x, rate, fmt="f32")
        from birda_tpu.clipper.grouper import DetectionGroup

        g = DetectionGroup("A a", "X", 15.0, 17.0, 0.9, 1)
        clip = ClipExtractor().extract_clip(audio, g)
        assert np.max(np.abs(clip.samples - x[rate * 15 : rate * 17])) < 1e-6

    def test_beyond_eof(self, tmp_path):
        audio = tmp_path / "a.wav"
        write_wav(audio, np.zeros(4800, np.float32), 48000)
        from birda_tpu.clipper.grouper import DetectionGroup

        g = DetectionGroup("A a", "X", 100.0, 105.0, 0.9, 1)
        with pytest.raises(EmptyExtraction):
            ClipExtractor().extract_clip(audio, g)

    def test_invalid_ranges(self):
        with pytest.raises(InvalidTimeRange):
            validate_time_range(float("nan"), 1.0)
        with pytest.raises(InvalidTimeRange):
            validate_time_range(-1.0, 1.0)
        with pytest.raises(InvalidTimeRange):
            validate_time_range(5.0, 5.0)

    def test_prealloc_cap_hostile_rate(self):
        assert prealloc_cap(2**32 - 1) == 60 * 256_000
        assert prealloc_cap(48000) == 60 * 48000
        assert prealloc_cap(0) == 0


class TestWriter:
    def test_sanitize(self):
        assert sanitize_filename("Parus major") == "Parus major"
        assert sanitize_filename("a/b:c*d") == "a_b_c_d"
        assert sanitize_filename("../../etc") == "_____etc" or ".." not in sanitize_filename("../../etc")

    def test_filename(self):
        assert generate_filename("Parus major", 0.854, 10.5, 13.5) == \
            "Parus major_85p_10.5-13.5.wav"

    def test_oversized_clip_is_typed_error_not_corrupt_wav(self, tmp_path):
        # Past the RIFF 32-bit size field, the native writer's uint32 cast
        # would silently emit a corrupt header; the guard must raise the
        # typed per-clip error instead. broadcast_to keeps this virtual.
        from birda_tpu.clipper.writer import MAX_WAV16_SAMPLES
        from birda_tpu.errors import WavWriteFailed

        w = WavWriter(tmp_path / "clips")
        huge = np.broadcast_to(np.float32(0.0), (MAX_WAV16_SAMPLES + 1,))
        with pytest.raises(WavWriteFailed, match="4 GiB"):
            w.write_clip(huge, 48000, "Parus major", 0.9, 0.0, 1.0)
        assert not (tmp_path / "clips").exists()  # nothing written

    def test_write_clip_roundtrip(self, tmp_path):
        w = WavWriter(tmp_path / "clips")
        x = (0.5 * np.sin(np.arange(4800) * 0.1)).astype(np.float32)
        path = w.write_clip(x, 48000, "Parus major", 0.9, 0.0, 0.1)
        assert path.parent.name == "Parus major"
        from birda_tpu.audio.decode import decode_audio_file

        dec = decode_audio_file(path)
        assert dec.sample_rate == 48000
        assert np.max(np.abs(dec.samples - x)) < 1e-3


class TestCommand:
    def test_validate_floats(self):
        with pytest.raises(InvalidPadding):
            validate_float_args(ClipArgs(files=[], pre=float("nan")))
        with pytest.raises(InvalidPadding):
            validate_float_args(ClipArgs(files=[], post=301.0))
        with pytest.raises(InvalidConfidence):
            validate_float_args(ClipArgs(files=[], confidence=1.5))

    def test_find_source_by_suffix(self, tmp_path):
        audio = tmp_path / "rec.wav"
        audio.write_bytes(b"")
        det = tmp_path / "rec.wav.BirdNET.results.csv"
        det.write_bytes(b"")
        assert find_source_audio(det) == audio

    def test_find_source_other_extension(self, tmp_path):
        audio = tmp_path / "rec.flac"
        audio.write_bytes(b"")
        det = tmp_path / "rec.wav.BirdNET.results.csv"
        det.write_bytes(b"")
        assert find_source_audio(det) == audio

    def test_find_source_missing(self, tmp_path):
        det = tmp_path / "rec.wav.BirdNET.results.csv"
        det.write_bytes(b"")
        with pytest.raises(SourceAudioNotFound):
            find_source_audio(det)

    def test_csv_mode_end_to_end(self, tmp_path):
        rate = 48000
        x = (0.4 * np.sin(2 * np.pi * 1000 * np.arange(rate * 30) / rate)).astype(np.float32)
        audio = tmp_path / "rec.wav"
        write_wav(audio, x, rate)
        det = tmp_path / "rec.wav.BirdNET.results.csv"
        make_csv(det, [(10.0, 13.0, "Parus major", "Great Tit", 0.9),
                       (20.0, 23.0, "Corvus corax", "Raven", 0.4)])
        args = ClipArgs(files=[det], output=tmp_path / "clips", confidence=0.5)
        summary = execute(args)
        assert summary.total_clips == 1  # raven below threshold
        assert summary.processed_files == 1
        clips = list((tmp_path / "clips" / "Parus major").glob("*.wav"))
        assert len(clips) == 1

    def test_direct_mode(self, tmp_path):
        rate = 48000
        write_wav(tmp_path / "a.wav", np.zeros(rate * 5, np.float32), rate)
        args = ClipArgs(files=[tmp_path / "a.wav"], output=tmp_path / "clips",
                        start=1.0, end=2.0, species="test")
        summary = execute(args)
        assert summary.total_clips == 1

    def test_all_failed_raises(self, tmp_path):
        det = tmp_path / "ghost.wav.BirdNET.results.csv"
        make_csv(det, [(0.0, 3.0, "A a", "X", 0.9)])  # audio missing
        with pytest.raises(ClipBatchAllFailed):
            execute(ClipArgs(files=[det], output=tmp_path / "clips"))

    def test_partial_failure_continues(self, tmp_path):
        rate = 48000
        write_wav(tmp_path / "good.wav", np.zeros(rate * 10, np.float32), rate)
        good = tmp_path / "good.wav.BirdNET.results.csv"
        make_csv(good, [(1.0, 2.0, "A a", "X", 0.9)])
        bad = tmp_path / "ghost.wav.BirdNET.results.csv"
        make_csv(bad, [(0.0, 3.0, "B b", "Y", 0.9)])
        summary = execute(
            ClipArgs(files=[good, bad], output=tmp_path / "clips")
        )
        assert summary.processed_files == 1
        assert len(summary.failures) == 1


class TestDirectModeIsolation:
    def test_one_bad_file_warns_batch_continues(self, tmp_path):
        """Multi-file direct extraction follows the batch contract: a bad
        file is a warning + failures entry; the batch fails only if ALL
        fail (single-file direct mode is the reference's surface; multi-
        file is our extension and inherits CSV-mode semantics)."""
        import numpy as np

        from birda_tpu.clipper.command import ClipArgs, execute
        from birda_tpu.errors import ClipBatchAllFailed
        from fixtures_audio import write_wav

        rate = 32_000
        good = tmp_path / "good.wav"
        t = np.arange(rate * 5) / rate
        write_wav(good, (0.3 * np.sin(2 * np.pi * 900 * t)).astype(
            np.float32), rate)
        bad = tmp_path / "bad.wav"
        bad.write_bytes(b"RIFFxxxxWAVEgarbage")

        args = ClipArgs(files=[good, bad], output=tmp_path / "clips",
                        start=1.0, end=2.0)
        summary = execute(args)
        assert summary.processed_files == 1
        assert summary.total_clips == 1
        assert len(summary.failures) == 1
        assert "bad.wav" in summary.failures[0]["file"]

        args_all_bad = ClipArgs(files=[bad], output=tmp_path / "clips2",
                                start=1.0, end=2.0)
        import pytest as _pytest

        with _pytest.raises(ClipBatchAllFailed):
            execute(args_all_bad)


class TestFileProducedNothing:
    def test_csv_file_that_extracts_nothing_fails(self, tmp_path):
        """A file whose detections all lie beyond EOF had work to do and
        produced nothing — a FAILED file, distinct from the legitimate
        zero-clip run of an all-below-threshold file (#319, reference
        command.rs:367-379 + clip_integration_test.rs)."""
        import numpy as np

        from birda_tpu.clipper.command import ClipArgs, execute
        from birda_tpu.errors import ClipBatchAllFailed

        from fixtures_audio import write_wav

        rate = 48000
        write_wav(tmp_path / "rec.wav", np.zeros(rate * 5, np.float32), rate)
        det = tmp_path / "rec.wav.BirdNET.results.csv"
        det.write_text(
            "Start (s),End (s),Scientific name,Common name,Confidence\n"
            "100.0,105.0,Parus major,Great Tit,0.85\n"
        )
        with pytest.raises(ClipBatchAllFailed) as ei:
            execute(ClipArgs(files=[det], output=tmp_path / "clips",
                             pre=0.0, post=0.0))
        # The summary rides the exception and names the empty file.
        assert "no clips extracted" in ei.value.summary.failures[0]["message"]
        assert not list((tmp_path / "clips").rglob("*.wav"))

    def test_all_below_threshold_is_legitimate_zero(self, tmp_path):
        """The early-return half of the distinction: no detections above
        the threshold is a processed file with zero clips, not a failure."""
        import numpy as np

        from birda_tpu.clipper.command import ClipArgs, execute

        from fixtures_audio import write_wav

        rate = 48000
        write_wav(tmp_path / "rec.wav", np.zeros(rate * 5, np.float32), rate)
        det = tmp_path / "rec.wav.BirdNET.results.csv"
        det.write_text(
            "Start (s),End (s),Scientific name,Common name,Confidence\n"
            "1.0,2.0,Parus major,Great Tit,0.10\n"
        )
        summary = execute(ClipArgs(files=[det], output=tmp_path / "clips",
                                   confidence=0.5))
        assert summary.processed_files == 1
        assert summary.total_clips == 0
        assert not summary.failures

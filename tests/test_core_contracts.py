"""Unit tests for the foundation layer: constants, date math, labels, fs."""

import os
import stat

import pytest

from birda_tpu import constants
from birda_tpu.errors import BirdaError, InvalidLatitude, SpeciesListRead
from birda_tpu.models import contracts
from birda_tpu.output.types import Detection
from birda_tpu.utils import date as date_utils
from birda_tpu.utils import species_list as sl
from birda_tpu.utils.fs import NewFileMode, write_atomic


class TestDateMath:
    # Pinned to the reference's own unit tests (src/utils/date.rs tests).
    def test_jan_1(self):
        assert date_utils.date_to_week(1, 1) == 1

    def test_dec_31(self):
        assert date_utils.date_to_week(12, 31) == 48

    def test_jun_15(self):
        assert date_utils.date_to_week(6, 15) == 22

    def test_jul_1(self):
        assert date_utils.date_to_week(7, 1) == 24

    def test_clamped_to_48(self):
        for m in range(1, 13):
            for d in (1, 15, constants.calendar.DAYS_IN_MONTH[m - 1]):
                assert 1 <= date_utils.date_to_week(m, d) <= 48

    def test_week_start_days(self):
        # Week 1 starts Jan 1; start days are strictly increasing and the
        # truncated start day lands in the week or the one before (the
        # reference's f32 truncation has the same boundary property).
        assert date_utils.week_to_start_day(1) == 1
        prev = 0
        for week in range(1, 49):
            day = date_utils.week_to_start_day(week)
            assert day > prev
            prev = day
            m, d = date_utils.day_of_year_to_date(day)
            assert date_utils.date_to_week(m, d) in (week, week - 1)

    def test_day_of_year_saturates(self):
        assert date_utils.day_of_year_to_date(400) == (12, 31)
        assert date_utils.day_of_year_to_date(366) == (12, 31)

    def test_auto_detect(self, tmp_path):
        f = tmp_path / "x.wav"
        f.write_bytes(b"")
        doy = date_utils.auto_detect_day_of_year(f)
        assert 1 <= doy <= 366


class TestDetectionLabels:
    def test_from_label(self):
        d = Detection.from_label("Passer domesticus_House Sparrow", 0.95, 0.0, 3.0, "t.wav")
        assert d.scientific_name == "Passer domesticus"
        assert d.common_name == "House Sparrow"
        assert d.confidence == 0.95

    def test_no_underscore(self):
        d = Detection.from_label("Unknown Species", 0.5, 0.0, 3.0, "t.wav")
        assert d.scientific_name == "Unknown Species"
        assert d.common_name == "Unknown Species"

    def test_sort_order(self):
        a = Detection.from_label("A_a", 0.5, 0.0, 3.0, "t.wav")
        b = Detection.from_label("B_b", 0.9, 0.0, 3.0, "t.wav")
        c = Detection.from_label("C_c", 0.1, 3.0, 6.0, "t.wav")
        assert sorted([c, a, b], key=lambda d: d.sort_key()) == [b, a, c]


class TestModelContracts:
    def test_birdnet_v24(self):
        c = contracts.BIRDNET_V24
        assert c.sample_count == 144_000 == c.sample_rate * 3
        assert c.num_classes == 6_522
        assert c.embedding_dim == 1_024

    def test_birdnet_v30(self):
        c = contracts.BIRDNET_V30
        assert c.sample_count == 160_000
        assert c.num_classes == 11_560

    def test_perch_softmax_no_context(self):
        c = contracts.PERCH_V2
        assert c.activation == contracts.ScoreActivation.SOFTMAX
        assert not c.supports_batch_context

    def test_bat_window_contract(self):
        assert constants.bat.SEGMENT_DURATION == pytest.approx(0.5625)
        assert constants.bat.OVERLAP == pytest.approx(0.140625)

    def test_sample_count_validated(self):
        with pytest.raises(ValueError):
            contracts.ModelConfig(
                family=contracts.ModelFamily.CUSTOM,
                sample_rate=48_000,
                segment_duration=3.0,
                sample_count=100,
                num_classes=10,
                activation=contracts.ScoreActivation.SIGMOID,
            )

    def test_segment_estimate(self):
        sc = contracts.SegmentContract(48_000, 3.0, 0.0)
        assert sc.estimate_segments(9.0) == 3
        assert sc.estimate_segments(10.0) == 4  # tail zero-padded window
        assert sc.estimate_segments(1.0) == 1
        assert sc.estimate_segments(0.0) == 0
        sc2 = contracts.SegmentContract(48_000, 3.0, 1.5)
        assert sc2.step == 1.5
        assert sc2.estimate_segments(6.0) == 3


class TestSpeciesList:
    def test_read_and_match(self, tmp_path):
        f = tmp_path / "list.txt"
        f.write_text("# comment\nPasser domesticus_House Sparrow\n\nTurdus merula\n")
        entries = sl.read_species_list(f)
        assert len(entries) == 2
        allowed = sl.species_set(entries)
        assert sl.label_matches("Passer domesticus_House Sparrow", allowed)
        assert sl.label_matches("TURDUS MERULA_Blackbird", allowed)
        assert not sl.label_matches("Corvus corax_Raven", allowed)

    def test_missing_file(self, tmp_path):
        with pytest.raises(SpeciesListRead):
            sl.read_species_list(tmp_path / "nope.txt")


class TestAtomicWrite:
    def test_basic(self, tmp_path):
        p = tmp_path / "f.txt"
        write_atomic(p, b"hello")
        assert p.read_bytes() == b"hello"

    def test_replaces_preserving_mode(self, tmp_path):
        p = tmp_path / "f.txt"
        p.write_bytes(b"old")
        os.chmod(p, 0o640)
        write_atomic(p, b"new")
        assert p.read_bytes() == b"new"
        assert stat.S_IMODE(p.stat().st_mode) == 0o640

    def test_owner_only_new_file(self, tmp_path):
        p = tmp_path / "secret.toml"
        write_atomic(p, b"x", mode=NewFileMode.OWNER_ONLY)
        assert stat.S_IMODE(p.stat().st_mode) == 0o600

    def test_creates_parents(self, tmp_path):
        p = tmp_path / "a" / "b" / "f.txt"
        write_atomic(p, b"deep")
        assert p.read_bytes() == b"deep"

    def test_follows_live_symlink(self, tmp_path):
        target = tmp_path / "real.txt"
        target.write_bytes(b"old")
        link = tmp_path / "link.txt"
        link.symlink_to(target)
        write_atomic(link, b"new")
        assert target.read_bytes() == b"new"
        assert link.is_symlink()  # the link survives; the target was replaced

    def test_dangling_symlink_not_followed(self, tmp_path):
        link = tmp_path / "dangling.txt"
        link.symlink_to(tmp_path / "missing" / "far.txt")
        write_atomic(link, b"data")
        # The link itself was replaced by a regular file.
        assert not (tmp_path / "missing").exists()

    def test_failure_leaves_no_temp(self, tmp_path):
        p = tmp_path / "f.txt"
        p.write_bytes(b"old")

        def boom(f):
            raise RuntimeError("fill failed")

        from birda_tpu.utils.fs import write_atomic_with

        with pytest.raises(RuntimeError):
            write_atomic_with(p, boom)
        assert p.read_bytes() == b"old"
        assert [x.name for x in tmp_path.iterdir()] == ["f.txt"]


class TestErrors:
    def test_cause_chain_dedup(self):
        try:
            try:
                raise ValueError("root cause")
            except ValueError as e:
                raise InvalidLatitude(123.0) from e
        except BirdaError as err:
            chain = err.cause_chain()
        assert any("latitude" in m for m in chain)
        assert "root cause" in chain

    def test_cause_chain_drops_embedded_cause(self):
        """A wrapper whose message embeds the cause ("failed to X: <cause>")
        prints one line, not two (reference main.rs:43-52 dedup)."""
        from birda_tpu.errors import ClassifierBuild

        try:
            try:
                raise ValueError("Gemm requires rank-2 inputs")
            except ValueError as e:
                raise ClassifierBuild(str(e)) from e
        except BirdaError as err:
            chain = err.cause_chain()
        assert len(chain) == 1
        assert "rank-2" in chain[0]

    def test_message_formatting(self):
        assert "123" in str(InvalidLatitude(123.0))

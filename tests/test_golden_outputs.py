"""Golden-file writer tests: byte-identical output pinning.

The goldens in ``tests/golden/`` are hand-derived from the reference
writers' exact formats — CSV header/BOM/4-decimal (``src/output/csv.rs:43``),
Raven selection-table columns and species-code generator
(``src/output/raven.rs:28-90``), Audacity ``_``->``, `` tab labels
(``src/output/audacity.rs:26``), Kaleidoscope INDIR/FOLDER decomposition
(``src/output/kaleidoscope.rs:27``) — so a writer regression cannot pass
unnoticed.
"""

from pathlib import Path


from birda_tpu.output.audacity import AudacityWriter
from birda_tpu.output.csv import CsvWriter
from birda_tpu.output.kaleidoscope import KaleidoscopeWriter
from birda_tpu.output.raven import RavenWriter
from birda_tpu.output.types import Detection, DetectionMetadata

GOLDEN = Path(__file__).parent / "golden"


def detections():
    """Canonical list exercising the format edge cases: comma in a path
    (CSV quoting), quote in a name (doubling), underscore in a common name
    (Audacity expansion), spaces (Raven/Kaleidoscope underscores), one-word
    and multi-word species codes, sub-4-decimal confidences."""
    return [
        Detection(
            file_path=Path("/data/rec, take1.wav"),
            start_time=0.0, end_time=3.0,
            scientific_name="Turdus merula",
            common_name="Common Blackbird",
            confidence=0.9876543,
        ),
        Detection(
            file_path=Path("clips/morning.flac"),
            start_time=7.5, end_time=10.5,
            scientific_name='Pica "magpie" pica',
            common_name="Eurasian Magpie",
            confidence=0.25,
        ),
        Detection(
            file_path=Path("/a/b/c.wav"),
            start_time=120.0, end_time=123.0,
            scientific_name="Parus major",
            common_name="Great_Tit",
            confidence=0.0301,
        ),
        Detection(
            file_path=Path("/a/b/c.wav"),
            start_time=120.0, end_time=123.0,
            scientific_name="Sitta europaea",
            common_name="Nuthatch",
            confidence=0.55555,
            metadata=DetectionMetadata(
                lat=60.2, lon=24.9, week=23, model="birdnet-v24",
                overlap=1.5, min_conf=0.1, species_list="finland.txt",
            ),
        ),
    ]


def _run(writer):
    writer.write_header()
    for d in detections():
        writer.write_detection(d)
    writer.finalize()


def _assert_golden(tmp_path, name, make_writer):
    out = tmp_path / name
    _run(make_writer(out))
    got = out.read_bytes()
    want = (GOLDEN / name).read_bytes()
    assert got == want, (
        f"{name} drifted from the golden bytes:\n--- got ---\n"
        f"{got.decode('utf-8', 'replace')}\n--- want ---\n"
        f"{want.decode('utf-8', 'replace')}"
    )


class TestGolden:
    def test_csv(self, tmp_path):
        _assert_golden(tmp_path, "results.csv", lambda p: CsvWriter(p))

    def test_csv_no_bom(self, tmp_path):
        _assert_golden(tmp_path, "results_nobom.csv",
                       lambda p: CsvWriter(p, include_bom=False))

    def test_csv_metadata_columns(self, tmp_path):
        cols = ["lat", "lon", "week", "model", "overlap", "min_conf",
                "species_list"]
        _assert_golden(tmp_path, "results_meta.csv",
                       lambda p: CsvWriter(p, include_columns=cols))

    def test_raven(self, tmp_path):
        _assert_golden(tmp_path, "results.raven.txt", RavenWriter)

    def test_audacity(self, tmp_path):
        _assert_golden(tmp_path, "results.audacity.txt", AudacityWriter)

    def test_kaleidoscope(self, tmp_path):
        _assert_golden(tmp_path, "results.kaleidoscope.csv",
                       KaleidoscopeWriter)

    def test_goldens_match_reference_format_facts(self):
        """Spot-assert reference format facts inside the goldens themselves,
        so the goldens can't silently drift to match a buggy writer."""
        csv = (GOLDEN / "results.csv").read_bytes()
        assert csv.startswith(b"\xef\xbb\xbf")  # UTF-8 BOM, csv.rs:31
        assert (b"Start (s),End (s),Scientific name,Common name,Confidence,"
                b"File\n") in csv
        assert b'"/data/rec, take1.wav"' in csv   # minimal quoting
        assert b'"Pica ""magpie"" pica"' in csv   # quote doubling
        assert b"0.9877" in csv                   # 4-decimal confidence

        raven = (GOLDEN / "results.raven.txt").read_text()
        assert raven.splitlines()[0] == (
            "Selection\tView\tChannel\tBegin Time (s)\tEnd Time (s)\t"
            "Low Freq (Hz)\tHigh Freq (Hz)\tCommon Name\tSpecies Code\t"
            "Confidence\tBegin Path\tFile Offset (s)"
        )
        assert "Common_Blackbird" in raven  # spaces -> underscores
        assert "\tcombla\t" in raven        # first-3 + first-3 species code
        assert "\tnuth\t" in raven          # one-word: first 4, lowercase
        assert "\t150\t15000\t" in raven    # constants.rs:243-245 freqs

        aud = (GOLDEN / "results.audacity.txt").read_text()
        assert "Great, Tit" in aud          # underscore -> ", "
        assert aud.splitlines()[0].startswith("0.0\t3.0\t")  # no header

        kal = (GOLDEN / "results.kaleidoscope.csv").read_text()
        assert kal.splitlines()[0] == (
            "INDIR,FOLDER,IN FILE,OFFSET,DURATION,TOP1MATCH,TOP1DIST"
        )
        assert "/a,b,c.wav,120.0,3.0,Great_Tit,0.0301" in kal

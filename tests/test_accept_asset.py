"""The one-command acceptance rehearsal (scripts/accept_asset.py) on real
``torch.onnx.export`` bytes as a stand-in asset.

VERDICT r4 #6: the day-one pieces (preflight, parity-with-bisection,
fusion engagement, int8 recall, bench point) lived in five scripts/tests
with separate env contracts; the rehearsal glues them into one invocation.
These tests pin that the chain accepts a good asset end to end and fails
loudly — at the right gate — for a parity regression, a label mismatch,
and an unsupported graph.
"""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

import fixtures_onnx as fo  # noqa: E402
from test_torch_export import torch_export  # noqa: E402

_SPEC = importlib.util.spec_from_file_location(
    "accept_asset",
    Path(__file__).resolve().parent.parent / "scripts" / "accept_asset.py",
)
accept_asset = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(accept_asset)


class WaveClassifier(nn.Module):
    """Waveform in, sigmoid scores out — the stand-in asset: a fusable
    conv1d-STFT front-end (the real exporter's Slice/Pow/Constant
    spellings) feeding a small head."""

    def __init__(self, bins=32, frame=256, hop=128, mels=16, classes=12):
        # frame >= 256: the mel-front-end fusion matcher only considers
        # STFT-scale windowed convs (fuse.py::_match_chain's kernel gate).
        super().__init__()
        torch.manual_seed(11)
        self.bins = bins
        self.frame = nn.Conv1d(1, 2 * bins, frame, stride=hop, bias=False)
        self.register_buffer("mel", torch.rand(bins, mels) * 0.1)
        self.head = nn.Linear(mels, classes)

    def forward(self, x):
        c = self.frame(x.unsqueeze(1))
        re, im = c[:, :self.bins], c[:, self.bins:]
        p = (re * re + im * im).transpose(1, 2)
        feats = torch.log(p @ self.mel + 1e-6).mean(dim=1)
        return torch.sigmoid(self.head(feats))


@pytest.fixture(scope="module")
def asset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("asset")
    m = WaveClassifier()
    m.eval()
    x = np.random.default_rng(3).normal(0, 0.3, (8, 4096)).astype(np.float32)
    mb = torch_export(m, (torch.from_numpy(x),), 17)
    model_path = tmp / "standin.onnx"
    model_path.write_bytes(mb)
    labels_path = tmp / "labels.txt"
    labels_path.write_text(
        "\n".join(f"Genus species{i}_Common {i}" for i in range(12)) + "\n")
    with torch.no_grad():
        scores = m(torch.from_numpy(x)).numpy()
    ref_path = tmp / "ref.npz"
    np.savez_compressed(ref_path, inputs=x, scores=scores)
    return {"model": model_path, "labels": labels_path, "ref": ref_path,
            "scores": scores, "inputs": x, "tmp": tmp}


def _run(argv):
    return accept_asset.main([str(a) for a in argv])


class TestAcceptAsset:
    def test_good_asset_accepted_end_to_end(self, asset, capsys):
        out_json = asset["tmp"] / "report.json"
        rc = _run([asset["model"], asset["labels"],
                   "--reference", asset["ref"], "--json", out_json])
        captured = capsys.readouterr().out
        assert rc == 0, captured
        report = json.loads(out_json.read_text())
        assert report["accepted"] is True
        gates = {r["gate"]: r["status"] for r in report["gates"]}
        assert gates["load"] == "PASS"
        assert gates["preflight"] == "PASS"
        assert gates["labels"] == "PASS"
        # The stand-in front-end is deliberately fusable: the rehearsal
        # must exercise the engaged-fusion path, not just warn.
        assert gates["fusion"] == "PASS"
        assert gates["parity"] == "PASS"
        assert gates["int8"] == "PASS"
        assert gates["bench"] == "PASS"

    def test_parity_regression_fails_at_the_parity_gate(self, asset,
                                                        capsys):
        bad_ref = asset["tmp"] / "bad_ref.npz"
        scores = asset["scores"].copy()
        scores[0, 0] += 0.25
        np.savez_compressed(bad_ref, inputs=asset["inputs"], scores=scores)
        rc = _run([asset["model"], asset["labels"], "--reference", bad_ref,
                   "--skip-int8", "--skip-bench"])
        out = capsys.readouterr().out
        assert rc == 1
        assert "[FAIL] parity" in out
        assert "record-nodes" in out  # hints at the bisection recipe

    def test_label_mismatch_fails(self, asset, capsys):
        short = asset["tmp"] / "short_labels.txt"
        short.write_text("Only one_Label\n")
        rc = _run([asset["model"], short, "--skip-int8", "--skip-bench"])
        out = capsys.readouterr().out
        assert rc == 1
        assert "[FAIL] labels" in out and "12 classes" in out

    def test_unsupported_graph_fails_at_preflight(self, tmp_path, capsys):
        # NonZero has a data-dependent output shape: permanently
        # unsupported under XLA's static-shape model (the fixture the
        # preflight tests standardize on).
        mb = fo.model(
            [fo.node("NonZero", ["x"], ["y"])],
            inputs=[fo.value_info("x", [2, 3])],
            outputs=[fo.value_info("y", [2, "n"], elem_type=7)],  # int64
        )
        model_path = tmp_path / "bad.onnx"
        model_path.write_bytes(mb)
        labels = tmp_path / "labels.txt"
        labels.write_text("a_b\n")
        rc = _run([model_path, labels])
        out = capsys.readouterr().out
        assert rc == 1
        assert "[FAIL] preflight" in out and "NonZero" in out

    def test_no_reference_skips_parity_but_still_accepts(self, asset,
                                                         capsys):
        rc = _run([asset["model"], asset["labels"], "--skip-bench"])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "[SKIP] parity" in out
        assert "record_parity_reference" in out

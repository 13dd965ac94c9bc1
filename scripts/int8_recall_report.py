#!/usr/bin/env python3
"""Render the int8 recall-validation report for a real model + inputs.

The day-one acceptance tool for ``--precision int8`` on a new asset
(protocol + criteria: ``birda_tpu/onnx/int8_accuracy.py``). Inputs come
from either route:

- ``--reference ref.npz`` — the score-parity recording
  (``scripts/record_parity_reference.py``): its ``inputs`` waveforms are
  scored through the fp32 and int8 lowerings;
- ``--audio FILE|DIR [--sample-rate R --seconds S]`` — real recordings
  decoded + segmented through the production audio stack.

Usage:
    python scripts/int8_recall_report.py MODEL.onnx --reference ref.npz
    python scripts/int8_recall_report.py MODEL.onnx --audio recs/ \
        --sample-rate 48000 --seconds 3 [--calibration-audio calib/]

Exit 0 when every acceptance criterion passes, 1 otherwise.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _collect_audio(spec: str) -> list[Path]:
    """Resolve --audio/--calibration-audio to decodable files: a directory
    keeps only supported audio extensions (a stray labels.txt or report
    in a recordings dir must not crash the acceptance tool); an explicit
    file path is passed through as given."""
    from birda_tpu.constants import audio as audio_consts

    root = Path(spec)
    if not root.is_dir():
        return [root]
    exts = {"." + e for e in audio_consts.SUPPORTED_EXTENSIONS}
    paths = [p for p in sorted(root.rglob("*"))
             if p.is_file() and p.suffix.lower() in exts]
    skipped = sum(1 for p in sorted(root.rglob("*"))
                  if p.is_file() and p.suffix.lower() not in exts)
    if skipped:
        print(f"note: skipped {skipped} non-audio file(s) under {root}",
              file=sys.stderr)
    if not paths:
        raise SystemExit(f"no supported audio files under {root} "
                         f"(extensions: {sorted(exts)})")
    return paths


def _segments_from_audio(paths, sample_rate: int, seconds: float,
                         limit: int) -> np.ndarray:
    """Decode + window + (host-)resample through the production stack."""
    from birda_tpu.audio.decode import StreamingDecoder
    from birda_tpu.ops.resample import resample_numpy

    seg_model = int(round(sample_rate * seconds))
    out = []
    for p in paths:
        dec = StreamingDecoder(p)
        try:
            src_seg = int(round(dec.sample_rate * seconds))
            while len(out) < limit:
                raw = dec.next_segment(src_seg, 0)
                if raw is None:
                    break
                window = raw.samples
                if dec.sample_rate != sample_rate:
                    window = resample_numpy(window, dec.sample_rate,
                                            sample_rate)
                if len(window) < seg_model:
                    window = np.pad(window, (0, seg_model - len(window)))
                out.append(np.asarray(window[:seg_model], np.float32))
        finally:
            dec.close()
        if len(out) >= limit:
            break
    if not out:
        raise SystemExit("no segments decoded from the given audio")
    return np.stack(out)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", help="classifier ONNX file")
    ap.add_argument("--reference", help="parity-recording .npz (inputs key)")
    ap.add_argument("--audio", help="recording file or directory")
    ap.add_argument("--sample-rate", type=int, default=48_000)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--calibration-audio",
                    help="separate recordings for the calibration pass "
                         "(defaults to the evaluation segments themselves)")
    ap.add_argument("--limit", type=int, default=512,
                    help="max evaluation segments")
    ap.add_argument("--labels", help="labels file for species names")
    args = ap.parse_args()

    if bool(args.reference) == bool(args.audio):
        ap.error("exactly one of --reference / --audio is required")

    if args.reference:
        inputs = np.load(args.reference)["inputs"]
    else:
        inputs = _segments_from_audio(_collect_audio(args.audio),
                                      args.sample_rate,
                                      args.seconds, args.limit)
    inputs = inputs[:args.limit]

    calib = None
    if args.calibration_audio:
        seg = _segments_from_audio(_collect_audio(args.calibration_audio),
                                   args.sample_rate, args.seconds, 64)
        calib = [seg]

    from birda_tpu.onnx.int8_accuracy import Criteria, evaluate_model

    report = evaluate_model(args.model, inputs, calibration_batches=calib)
    labels = None
    if args.labels:
        labels = Path(args.labels).read_text().splitlines()
    print(report.render(labels))
    fails = report.failures(Criteria())
    if fails:
        print("\nACCEPTANCE FAILURES:")
        for f in fails:
            print(f"  - {f}")
        return 1
    print("\nall acceptance criteria pass")
    return 0


if __name__ == "__main__":
    sys.exit(main())

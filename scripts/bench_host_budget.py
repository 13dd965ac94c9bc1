#!/usr/bin/env python3
"""Host-side cycle budget for the chunked streaming path.

End-to-end realtime factor is ``min(host budget, link bound, device
bound)``. The link bound is the transport equation (docs/performance.md);
the device bound is ``bench.py``. This tool measures the third leg on the
*current host*: every per-chunk host cost with transfer and device compute
excluded, so the production (PCIe-attached) extrapolation rests on a
measurement instead of a hope.

Per chunk of B windows at step S the host must: decode B*S samples,
assemble the contiguous chunk, amax+quantize to int16, and dispatch. Run:

    python scripts/bench_host_budget.py [--batch 256] [--seconds 120]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=120.0,
                    help="audio length of the test file")
    ap.add_argument("--rate", type=int, default=48_000)
    args = ap.parse_args()

    from birda_tpu.native import audio as native_audio
    from birda_tpu.audio.decode import StreamingDecoder

    rate, secs = args.rate, args.seconds
    n = int(rate * secs)
    rng = np.random.default_rng(0)
    x = (0.25 * np.sin(2 * np.pi * 3000 * np.arange(n) / rate)
         + 0.05 * rng.normal(size=n)).astype(np.float32)

    with tempfile.TemporaryDirectory() as td:
        wav = Path(td) / "budget.wav"
        native_audio.write_wav16(wav, x, rate)

        # 1. Decode (native, windowed like the producer).
        dec = StreamingDecoder(wav)
        seg, count = 144_000, 0
        t0 = time.perf_counter()
        while True:
            s = dec.next_segment(seg, 0)
            if s is None:
                break
            count += 1
        t_decode = time.perf_counter() - t0
        dec.close()
        decode_rt = secs / t_decode

        # 2. Chunk assembly (concatenate B window steps).
        windows = [x[i * seg:(i + 1) * seg] for i in range(min(
            args.batch, count))]
        reps = max(1, int(2e8 // (len(windows) * seg)))
        t0 = time.perf_counter()
        for _ in range(reps):
            chunk = np.concatenate(windows)
        t_assemble = (time.perf_counter() - t0) / reps
        chunk_secs = len(chunk) / rate

        # 3. amax + int16 quantize (native when available).
        t0 = time.perf_counter()
        for _ in range(reps):
            if native_audio.available():
                payload, amax = native_audio.quantize_int16(chunk)
            else:
                amax = float(np.max(np.abs(chunk)))
                payload = (chunk * (32767.0 / amax)).astype(np.int16)
        t_quant = (time.perf_counter() - t0) / reps

        per_chunk_host = t_assemble + t_quant
        host_rt_stream = chunk_secs / per_chunk_host  # excluding decode
        # Decode overlaps assembly/quantize only across threads; the
        # single-thread budget is the serial sum.
        serial_rt = chunk_secs / (
            per_chunk_host + chunk_secs / decode_rt
        )

        print(json.dumps({
            "host": {
                "decode_x_realtime_1thread": round(decode_rt, 0),
                "assemble_ms_per_chunk": round(t_assemble * 1e3, 2),
                "quantize_ms_per_chunk": round(t_quant * 1e3, 2),
                "chunk_audio_seconds": round(chunk_secs, 1),
                "host_bound_x_realtime_excl_decode": round(host_rt_stream, 0),
                "host_bound_x_realtime_serial_1thread": round(serial_rt, 0),
                "note": ("decode parallelizes with --decode-workers; the "
                         "serial figure is the 1-thread floor"),
            }
        }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Parallel segmented decode of ONE file.

The reference feeds inference from a single decode thread — its documented
scaling ceiling (SURVEY §3.1: "HOT LOOP A … the first thing the TPU rebuild
must parallelize"). At TPU inference rates one thread of WAV/FLAC decode +
resample caps end-to-end throughput, so this module decodes one file with N
workers over disjoint, window-grid-aligned spans:

- Window w of the global stream starts at ``w * step`` (step = segment −
  overlap). Worker k owns windows ``[k*W, (k+1)*W)`` and opens its OWN
  decoder, ``seek_exact``-ed to ``k*W*step`` — exact even on coarse-seek
  containers. The last worker runs to stream end, so the subtle tail-window
  semantics stay identical to the single-decoder path (decode.rs:150-202).
- A mux thread drains the workers' bounded queues strictly in span order
  into the pipeline's queue, so the consumer still sees consecutive windows
  (the chunk runner reassembles a contiguous sample stream from them).
  Per-worker queues provide backpressure: a worker far ahead of the mux
  blocks on its own queue.

Decode (native C++ via ctypes) and per-window resample (numpy) both release
the GIL, so threads give real parallelism without process overhead.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path

import numpy as np

from .decode import StreamingDecoder
from .resample import resample_chunk

_WORKER_DONE = object()
#: Per-worker lookahead (windows) before it blocks on the mux.
_WORKER_QUEUE = 8


def _worker(
    path: Path,
    out: queue.Queue,
    first_window: int,
    end_window: int | None,
    seg_samples: int,
    ovl_samples: int,
    target_rate: int,
    target_count: int,
    resample_needed: bool,
):
    step = seg_samples - ovl_samples
    dec = None
    try:
        dec = StreamingDecoder(path)
        dec.seek_exact(first_window * step)
        while True:
            seg = dec.next_segment(seg_samples, ovl_samples)
            if seg is None:
                break
            if end_window is not None and seg.start_sample // step >= end_window:
                break
            samples = seg.samples
            if resample_needed:
                samples = resample_chunk(samples, dec.sample_rate, target_rate)
            if len(samples) < target_count:
                samples = np.concatenate(
                    [samples, np.zeros(target_count - len(samples), np.float32)]
                )
            elif len(samples) > target_count:
                samples = samples[:target_count]
            out.put((samples, seg.start_sample))
    except BaseException as e:  # noqa: BLE001 — shipped in-band via the mux
        out.put(e)
    finally:
        if dec is not None:
            dec.close()
        out.put(_WORKER_DONE)


def spawn_parallel_decode(
    path: Path,
    tx: queue.Queue,
    sentinel,
    total_frames: int,
    seg_samples: int,
    ovl_samples: int,
    target_rate: int,
    target_count: int,
    resample_needed: bool,
    n_workers: int,
) -> threading.Thread:
    """Start N span decoders + the ordered mux; returns the mux thread.

    The mux emits ``(samples, start_sample)`` tuples into ``tx`` in global
    window order, ships the first worker exception in-band, and always
    terminates the stream with ``sentinel`` — the same contract as the
    single-threaded producer in :mod:`birda_tpu.pipeline.processor`.
    """
    step = max(1, seg_samples - ovl_samples)
    # Upper bound on the window count; the tail worker runs to stream end,
    # so an under-estimate is impossible and an over-estimate only creates
    # workers that immediately hit EOF.
    n_windows = max(1, -(-max(total_frames - ovl_samples, 1) // step))
    n_workers = max(1, min(n_workers, n_windows))
    per = -(-n_windows // n_workers)

    worker_queues: list[queue.Queue] = []
    threads: list[threading.Thread] = []
    for k in range(n_workers):
        first = k * per
        if first >= n_windows:
            break
        end = None if k == n_workers - 1 else min((k + 1) * per, n_windows)
        q: queue.Queue = queue.Queue(maxsize=_WORKER_QUEUE)
        t = threading.Thread(
            target=_worker,
            args=(path, q, first, end, seg_samples, ovl_samples,
                  target_rate, target_count, resample_needed),
            daemon=True,
            name=f"birda-decode-{k}",
        )
        t.start()
        worker_queues.append(q)
        threads.append(t)

    def mux():
        error = None
        try:
            for q in worker_queues:
                while True:
                    item = q.get()
                    if item is _WORKER_DONE:
                        break
                    if isinstance(item, BaseException):
                        if error is None:
                            error = item
                        continue  # drain to DONE so the worker can exit
                    if error is None:
                        tx.put(item)
            if error is not None:
                tx.put(error)
        finally:
            tx.put(sentinel)
            for t in threads:
                t.join(timeout=1)

    m = threading.Thread(target=mux, daemon=True, name="birda-decode-mux")
    m.start()
    return m

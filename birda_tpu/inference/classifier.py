"""The classifier: batched inference with a per-shape warmup registry.

TPU-native rebuild of the reference's ``BirdClassifier``
(``src/inference/classifier.rs``). The ONNX-Runtime session becomes a jitted
jax step; the TensorRT per-batch-shape engine discipline becomes XLA's
per-shape compilation, tracked by the same warmup registry pattern
(reference ``classifier.rs:222-246,404-466``): every batch size a run
submits goes through ``ensure_warm`` before it carries real audio, and
warm-up timing distinguishes a fresh XLA compile from a persistent-cache
load (reference's TensorRT build-vs-cache-load reporting, ``lib.rs:88``).

Device step (one fused XLA program): waveform batch -> mel front-end ->
backbone -> scores -> top-k. Only ``[B, K]`` values/indices (plus
``[B, E]`` embeddings when a secondary head needs them) come back to host —
the 6,522-wide score matrix never crosses the PCIe/ICI boundary.
"""

from __future__ import annotations

import logging
import threading
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..constants import DEFAULT_MIN_CONFIDENCE, DEFAULT_TOP_K, compile_cache
from ..errors import Inference as InferenceErr
from ..models.zoo import LoadedModel
from .backend import BackendStatus, select_backend
from .geomodel import GeomodelScores, MappingSummary
from .geomodel_filter import FilterSettings, Prediction, filter_predictions

logger = logging.getLogger(__name__)


@dataclass
class InferenceOptions:
    min_confidence: float = DEFAULT_MIN_CONFIDENCE
    top_k: int = DEFAULT_TOP_K


@dataclass
class PredictionResult:
    """Per-segment predictions (+ embeddings when requested)."""

    predictions: list[Prediction]
    embeddings: Optional[np.ndarray] = None


@dataclass
class RangeFilterData:
    """Projected geomodel scores + policy, computed once at startup."""

    scores: GeomodelScores
    settings: FilterSettings
    summary: MappingSummary


@dataclass
class WarmupReport:
    batch_size: int
    seconds: float
    #: True when the compile took long enough to be a fresh build rather than
    #: a persistent-cache load.
    was_build: bool


class _WarmupRegistry:
    """Thread-safe set of already-warmed batch shapes."""

    def __init__(self):
        self._sizes: set[int] = set()
        self._lock = threading.Lock()

    def is_warm(self, batch_size: int) -> bool:
        with self._lock:
            return batch_size in self._sizes

    def mark_warm(self, batch_size: int) -> None:
        with self._lock:
            self._sizes.add(batch_size)


class BirdClassifier:
    """Batched classifier over one model graph."""

    def __init__(
        self,
        model: LoadedModel,
        device: str = "auto",
        min_confidence: float = DEFAULT_MIN_CONFIDENCE,
        top_k: int = DEFAULT_TOP_K,
        range_filter_data: Optional[RangeFilterData] = None,
        species_list: Optional[set[str]] = None,
        want_embeddings: bool = False,
        mesh=None,
    ):
        import jax

        self.model = model
        if len(model.labels) != model.num_classes:
            from ..errors import ClassifierBuild

            raise ClassifierBuild(
                f"label count {len(model.labels)} does not match the model's "
                f"{model.num_classes} classes"
            )
        self.labels = model.labels
        self.min_confidence = min_confidence
        self.top_k = min(top_k, model.num_classes)
        self.range_filter_data = range_filter_data
        self.species_list = species_list
        self.want_embeddings = want_embeddings
        self._warmed = _WarmupRegistry()
        # Compound check-then-warm must be atomic: two --jobs threads both
        # seeing not-warm would dispatch duplicate warmups.
        self._warm_lock = threading.Lock()
        self._warmup_reports: list[WarmupReport] = []
        self._chunk_runners: dict[tuple, "ChunkRunner"] = {}
        self._chunk_runner_lock = threading.Lock()
        self.mesh = mesh

        devices, status = select_backend(device)
        self.devices = devices
        self.backend_status: BackendStatus = status
        self._device = devices[0]

        # ONNX-lowered models keep their weights as an explicit params
        # pytree; commit it to the selected device once so every compiled
        # batch shape shares the same HBM copy.
        if getattr(model, "bind_device", None) is not None and mesh is None:
            model.bind_device(self._device)

        want_emb = want_embeddings
        k = self.top_k

        def step(waveform):
            out = model.apply(waveform)
            scores = out["scores"]
            vals, idx = jax.lax.top_k(scores, k)
            if want_emb:
                return vals, idx, out["embeddings"]
            return vals, idx

        if mesh is not None:
            from ..parallel.sharding import shard_data_parallel

            self._step = shard_data_parallel(step, mesh)
        else:
            self._step = jax.jit(step)

    # -- introspection (reference classifier.rs:355-390) --------------------

    @property
    def sample_rate(self) -> int:
        return self.model.config.sample_rate

    @property
    def segment_duration(self) -> float:
        return self.model.config.segment_duration

    @property
    def sample_count(self) -> int:
        return self.model.config.sample_count

    def execution_provider_status(self) -> BackendStatus:
        return self.backend_status

    def range_filter_info(self) -> Optional[dict]:
        """Geomodel coverage record for the JSON protocol."""
        if self.range_filter_data is None:
            return None
        from ..constants import range_filter as rf_consts

        d = self.range_filter_data
        return {
            "geomodel_version": rf_consts.GEOMODEL_VERSION,
            "species_in_range": d.summary.in_range,
            "total_species": d.summary.total,
            "mapped_species": d.summary.mapped,
            "unmatched_species": d.summary.unmatched,
            "unmatched_policy": d.settings.unmatched.value,
            "threshold": d.settings.threshold,
        }

    # -- warmup --------------------------------------------------------------

    def ensure_warm(self, batch_size: int) -> Optional[WarmupReport]:
        """Warm the compiled program for this batch shape, once.

        XLA keys compiled programs on input shape exactly the way TensorRT
        keys engines, so every distinct batch size pays its own first-call
        cost; repeat calls for a warmed shape return immediately.
        """
        with self._warm_lock:
            if self._warmed.is_warm(batch_size):
                return None
            report = self._warmup(batch_size)
            # Recorded only after success, so a failed warmup is retried
            # rather than skipped straight to real audio on a never-warmed
            # shape.
            self._warmed.mark_warm(batch_size)
            self._warmup_reports.append(report)
            return report

    def _warmup(self, batch_size: int) -> WarmupReport:
        dummy = np.zeros((batch_size, self.sample_count), np.float32)
        start = time.monotonic()
        try:
            out = self._run_device(dummy)
            _ = [np.asarray(o) for o in out]  # block until executed
        except Exception as e:  # noqa: BLE001
            raise InferenceErr(f"warmup inference failed: {e}") from e
        elapsed = time.monotonic() - start
        return WarmupReport(
            batch_size=batch_size,
            seconds=elapsed,
            was_build=elapsed >= compile_cache.BUILD_THRESHOLD_SECS,
        )

    def warmup_reports(self) -> list[WarmupReport]:
        return list(self._warmup_reports)

    # -- prediction ----------------------------------------------------------

    def _run_device(self, batch: np.ndarray):
        import jax

        x = jax.device_put(batch, self._device) if self.mesh is None else batch
        out = self._step(x)
        return out if isinstance(out, tuple) else (out,)

    def predict_batch(
        self,
        segments: np.ndarray,
        options: Optional[InferenceOptions] = None,
    ) -> list[PredictionResult]:
        """Run one padded batch; returns one result per input row.

        ``segments``: [batch, sample_count] float32 (caller pads partial
        batches with silence to a warmed shape and slices the results,
        reference ``processor.rs:242-258``).
        """
        options = options or InferenceOptions(self.min_confidence, self.top_k)
        if segments.ndim != 2 or segments.shape[1] != self.sample_count:
            raise InferenceErr(
                f"batch shape {segments.shape} does not match "
                f"[*, {self.sample_count}]"
            )
        try:
            out = self._run_device(np.ascontiguousarray(segments, np.float32))
            vals = np.asarray(out[0])
            idx = np.asarray(out[1])
            emb = np.asarray(out[2]) if len(out) > 2 else None
        except InferenceErr:
            raise
        except Exception as e:  # noqa: BLE001
            raise InferenceErr(str(e)) from e

        k = _effective_top_k(options, vals.shape[1])
        results = []
        for row in range(vals.shape[0]):
            preds = [
                Prediction(
                    species=self.labels[int(i)],
                    confidence=float(v),
                    index=int(i),
                )
                for v, i in zip(vals[row][:k], idx[row][:k])
                if v >= options.min_confidence
            ]
            results.append(
                PredictionResult(
                    predictions=preds,
                    embeddings=emb[row] if emb is not None else None,
                )
            )
        return results

    def predict(self, segment: np.ndarray,
                options: Optional[InferenceOptions] = None) -> PredictionResult:
        return self.predict_batch(segment[None, :], options)[0]

    # -- chunked streaming path ---------------------------------------------

    def chunk_runner(self, batch_size: int, step_samples: int,
                     transport: str = "int16",
                     src_rate: Optional[int] = None,
                     src_chunk_samples: Optional[int] = None) -> "ChunkRunner":
        key = (batch_size, step_samples, transport, src_rate,
               src_chunk_samples)
        # Serialized build: under --jobs several files can request the same
        # (batch, step) concurrently, and an unsynchronized check-then-insert
        # would compile the same XLA program twice (40-170 s each on the
        # remote service).
        with self._chunk_runner_lock:
            cached = self._chunk_runners.get(key)
            if cached is not None:
                return cached
            runner = self._build_chunk_runner(
                batch_size, step_samples, transport, src_rate,
                src_chunk_samples,
            )
            self._chunk_runners[key] = runner
            return runner

    def _build_chunk_runner(self, batch_size: int, step_samples: int,
                            transport: str,
                            src_rate: Optional[int],
                            src_chunk_samples: Optional[int] = None,
                            ) -> "ChunkRunner":
        """Build the high-throughput streaming interface.

        Instead of shipping ``[batch, sample_count]`` f32 windows (which
        duplicates every overlapped sample and costs 4 bytes each over the
        host->device link), the host ships one contiguous **int16 chunk** of
        ``(batch-1)*step + sample_count`` samples with a reconstruction
        scale; the device dequantizes, gathers the overlapped windows with
        static indices, and runs the model — windowing fused into the same
        XLA program as the mel front-end and backbone. Transfer cost drops to
        2 bytes per audio sample, the minimum without entropy coding, and
        int16 PCM also compresses far better through transparent link
        compression than float32 mantissa noise does.

        With ``src_rate`` set (and differing from the model rate), the chunk
        is shipped at the *source* rate and the polyphase resampler runs on
        device ahead of the windowing — the host's only per-sample work left
        is the decode itself.
        """
        return ChunkRunner(self, batch_size, step_samples, transport,
                           src_rate, src_chunk_samples)

    # -- post-filters (reference classifier.rs:587-645) ----------------------

    def apply_range_filter(
        self, results: list[PredictionResult]
    ) -> list[PredictionResult]:
        """Range filter if configured, else species-list retain, else no-op."""
        if self.range_filter_data is not None:
            d = self.range_filter_data
            for r in results:
                r.predictions = filter_predictions(
                    r.predictions, d.scores, d.settings
                )
        elif self.species_list is not None:
            for r in results:
                r.predictions = [
                    p for p in r.predictions if p.species in self.species_list
                ]
        return results


class ChunkRunner:
    """Streaming chunk interface over one classifier (see ``chunk_runner``)."""

    def __init__(self, classifier: BirdClassifier, batch_size: int,
                 step_samples: int, transport: str = "int16",
                 src_rate: Optional[int] = None,
                 src_chunk_samples: Optional[int] = None):
        import math

        import jax
        import jax.numpy as jnp

        self.classifier = classifier
        self.batch_size = batch_size
        self.step_samples = step_samples
        self.transport = transport
        seg = classifier.sample_count
        model_rate = classifier.sample_rate
        from ..ops.resample import get_plan

        self.src_rate = src_rate if src_rate is not None else model_rate
        # Every rational ratio resamples on device (the blocked-matmul
        # polyphase form, ops/resample.py::_device_fn_blocked — 44.1 kHz
        # included), so the host's only per-sample work is the decode.
        self.resample_on_device = self.src_rate != model_rate
        chunk_model = (batch_size - 1) * step_samples + seg

        if self.resample_on_device:
            plan = get_plan(self.src_rate, model_rate)
            # Source chunk sized so its resampled length covers the model
            # chunk (out_len = ceil(in * L/M) >= chunk_model), plus one
            # resampler period of slack; a producer whose window geometry
            # is rounded at the SOURCE rate passes its exact host chunk
            # length (``src_chunk_samples``) — per-window step rounding
            # accumulates ~0.5 samples/window, which overflows a capacity
            # derived from model-side numbers alone at large batch.
            base = math.ceil(chunk_model * plan.M / plan.L) + plan.M
            self.chunk_samples = max(base, src_chunk_samples or 0)
        else:
            self.chunk_samples = chunk_model

        model = classifier.model
        k = classifier.top_k
        want_emb = classifier.want_embeddings
        is_int16 = transport == "int16"
        resample = self.resample_on_device
        src = self.src_rate

        mel_cfg = getattr(model, "mel_config", None)
        # The conv-grid mel path needs the window step on the hop grid.
        use_mel_path = mel_cfg is not None and step_samples % mel_cfg.hop == 0
        # bf16 mel on the accelerator (halves front-end HBM traffic); exact
        # f32 on CPU so the chunk path matches the batch path bit-for-bit.
        mel_dtype = (
            jnp.bfloat16 if classifier.backend_status.actual == "tpu" else None
        )

        def step(chunk, scale):
            from jax import lax

            if is_int16:
                x = chunk.astype(jnp.float32) * (scale / 32767.0)
            else:
                x = chunk * scale
            if resample:
                from ..ops.resample import resample_device

                x = resample_device(x[None, :], src, model_rate)[0]
                x = x[:chunk_model]
            if use_mel_path:
                # Native models take precomputed mel: the DFT runs as one
                # strided conv over the chunk, so neither the windowed
                # [B, sample_count] intermediate nor any giant index tensor
                # hits HBM (the step is bandwidth-bound).
                from ..ops.melspec import melspec_from_chunk

                mel = melspec_from_chunk(
                    x, mel_cfg, batch_size, step_samples, seg,
                    compute_dtype=mel_dtype,
                )
                out = model.apply(mel)
            else:
                # Window gather with indices built on device (a host-side
                # index constant this size would bloat the serialized HLO).
                row = lax.broadcasted_iota(
                    jnp.int32, (batch_size, seg), 0
                ) * step_samples
                col = lax.broadcasted_iota(jnp.int32, (batch_size, seg), 1)
                frames = jnp.take(x, row + col, axis=0)
                out = model.apply(frames)
            vals, topk_idx = jax.lax.top_k(out["scores"], k)
            if want_emb:
                return vals, topk_idx, out["embeddings"]
            return vals, topk_idx

        if classifier.mesh is not None:
            # Multi-chip: the chunk (tiny) is replicated; the window gather
            # and everything after it shards on the batch axis, XLA inserting
            # only the output gather over ICI.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            mesh = classifier.mesh
            if batch_size % mesh.devices.size != 0:
                raise ValueError(
                    f"chunk runner batch {batch_size} not divisible by mesh "
                    f"size {mesh.devices.size}"
                )
            replicated = NamedSharding(mesh, P())
            sharded = NamedSharding(mesh, P(DATA_AXIS))
            out_shard = (
                (sharded, sharded, sharded) if want_emb else (sharded, sharded)
            )
            self._step = jax.jit(
                step,
                in_shardings=(replicated, replicated),
                out_shardings=out_shard,
            )
        else:
            # Chunk-buffer donation (the analogue of the reference's
            # pre-allocated device I/O contexts, classifier.rs:547-582)
            # was tried and is a measured no-op here: XLA donation is an
            # input→output ALIASING mechanism, and the step's outputs
            # (top-k floats) can never alias the int16 chunk — every run
            # just warned "donated buffers were not usable". Freeing the
            # input early needs no donation: the buffer dies with its
            # last read inside the single fused program.
            self._step = jax.jit(step)
        self._warm = False
        self._warm_lock = threading.Lock()

    def ensure_warm(self) -> Optional[WarmupReport]:
        with self._warm_lock:
            return self._ensure_warm_locked()

    def _ensure_warm_locked(self) -> Optional[WarmupReport]:
        if self._warm:
            return None
        start = time.monotonic()
        dtype = np.int16 if self.transport == "int16" else np.float32
        out = self._step(
            np.zeros(self.chunk_samples, dtype), np.float32(1.0)
        )
        _ = [np.asarray(o) for o in (out if isinstance(out, tuple) else (out,))]
        elapsed = time.monotonic() - start
        self._warm = True
        return WarmupReport(
            batch_size=self.batch_size,
            seconds=elapsed,
            was_build=elapsed >= compile_cache.BUILD_THRESHOLD_SECS,
        )

    def predict_chunk_async(
        self, chunk: np.ndarray, n_real: int,
        options: Optional[InferenceOptions] = None,
    ) -> "PendingChunk":
        """Dispatch a chunk without blocking on results.

        jax dispatch is asynchronous: the int16 payload upload and the device
        step proceed in the background while the host decodes and assembles
        the next chunk. Collect results with :meth:`PendingChunk.collect`.
        """
        options = options or InferenceOptions(
            self.classifier.min_confidence, self.classifier.top_k
        )
        payload, scale = self._quantize(chunk)
        try:
            out = self._step(payload, scale)
        except Exception as e:  # noqa: BLE001
            raise InferenceErr(str(e)) from e
        return PendingChunk(self, out if isinstance(out, tuple) else (out,),
                            n_real, options)

    def _quantize(self, chunk: np.ndarray):
        chunk = np.asarray(chunk, np.float32)
        if len(chunk) < self.chunk_samples:
            chunk = np.concatenate(
                [chunk, np.zeros(self.chunk_samples - len(chunk), np.float32)]
            )
        elif len(chunk) > self.chunk_samples:
            raise InferenceErr(
                f"chunk of {len(chunk)} exceeds runner size {self.chunk_samples}"
            )

        if self.transport == "int16":
            from ..native import audio as native_audio

            if native_audio.available():
                # Native fused amax+quantize: ~10x the numpy passes, which
                # otherwise dominate the host side of the chunk cycle on
                # fast links.
                payload, amax = native_audio.quantize_int16(chunk)
                scale = np.float32(amax if amax >= 1e-9 else 0.0)
            else:
                amax = float(np.max(np.abs(chunk)))
                if amax < 1e-9:
                    payload = np.zeros(self.chunk_samples, np.int16)
                    scale = np.float32(0.0)
                else:
                    payload = np.clip(
                        np.rint(chunk * (32767.0 / amax)), -32767, 32767
                    ).astype(np.int16)
                    scale = np.float32(amax)
        else:
            payload = chunk
            scale = np.float32(1.0)
        return payload, scale

    def predict_chunk(
        self,
        chunk: np.ndarray,
        n_real: int,
        options: Optional[InferenceOptions] = None,
    ) -> list[PredictionResult]:
        """Run one chunk of model-rate f32 audio; returns ``n_real`` results.

        ``chunk`` shorter than ``chunk_samples`` is zero-padded (tail chunk).
        """
        return self.predict_chunk_async(chunk, n_real, options).collect()


def _effective_top_k(options: "InferenceOptions", built_k: int) -> int:
    """Honor a caller-supplied top_k: the device computes the top-``built_k``
    scores per row (baked into the jit), so a smaller request truncates and
    a larger one is a hard error rather than a silent no-op."""
    k = getattr(options, "top_k", None)
    if k is None or k == built_k:
        return built_k
    if k > built_k:
        raise InferenceErr(
            f"top_k={k} exceeds the compiled top-k of {built_k}; rebuild "
            "the classifier with a larger top_k")
    return max(1, int(k))


class PendingChunk:
    """In-flight device work for one chunk (see ``predict_chunk_async``)."""

    def __init__(self, runner: ChunkRunner, out: tuple, n_real: int,
                 options: InferenceOptions):
        self._runner = runner
        self._out = out
        self._n_real = n_real
        self._options = options

    def collect(self) -> list[PredictionResult]:
        """Block on the device results and decode them."""
        try:
            vals = np.asarray(self._out[0])
            idx = np.asarray(self._out[1])
            emb = np.asarray(self._out[2]) if len(self._out) > 2 else None
        except Exception as e:  # noqa: BLE001
            raise InferenceErr(str(e)) from e

        labels = self._runner.classifier.labels
        k = _effective_top_k(self._options, vals.shape[1])
        results = []
        for row in range(min(self._n_real, self._runner.batch_size)):
            preds = [
                Prediction(
                    species=labels[int(i)], confidence=float(v), index=int(i)
                )
                for v, i in zip(vals[row][:k], idx[row][:k])
                if v >= self._options.min_confidence
            ]
            results.append(
                PredictionResult(
                    predictions=preds,
                    embeddings=emb[row] if emb is not None else None,
                )
            )
        return results


def enable_persistent_cache(cache_dir) -> None:
    """Turn on XLA's persistent compilation cache (the TensorRT engine-cache
    equivalent; reference ``classifier.rs:994-1057``)."""
    import jax

    from pathlib import Path

    path = Path(cache_dir)
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

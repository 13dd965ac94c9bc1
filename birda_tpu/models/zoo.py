"""Model zoo: the shipped model families as loadable graph objects.

A :class:`LoadedModel` is what the classifier layer consumes: a pure
``apply(waveform_batch) -> {scores, logits, embeddings}`` function plus its
contract and labels. Two construction paths:

- :func:`native_model` — flax architecture (:mod:`.backbone`) with either
  imported weights or deterministic synthetic initialization (the test/bench
  path, mirroring the reference's fixture-model strategy).
- :func:`onnx_model` — any exported ONNX graph lowered to jax
  (:mod:`birda_tpu.onnx.lowering`), for bit-faithful parity with upstream
  releases when the asset is installed.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

from ..ops.melspec import MelSpecConfig
from . import contracts
from .backbone import AudioClassifier
from .contracts import ModelConfig, ModelFamily

#: Mel front-end defaults per family (native path; the real graphs carry
#: their own front-end in-graph and go through the ONNX path instead).
#: Hops are chosen to divide the segment length so the chunked conv-grid
#: framing applies at zero overlap (144000 % 576 == 0, 160000 % 640 == 0).
MEL_CONFIGS = {
    ModelFamily.BIRDNET_V24: MelSpecConfig(sample_rate=48_000, n_fft=1024,
                                           hop=576, n_mels=128, fmax=15_000.0),
    ModelFamily.BSG_FI_V44: MelSpecConfig(sample_rate=48_000, n_fft=1024,
                                          hop=576, n_mels=128, fmax=15_000.0),
    ModelFamily.BIRDNET_V30: MelSpecConfig(sample_rate=32_000, n_fft=1024,
                                           hop=640, n_mels=128, fmax=16_000.0),
    ModelFamily.PERCH_V2: MelSpecConfig(sample_rate=32_000, n_fft=1024,
                                        hop=640, n_mels=128, fmax=16_000.0),
}


@dataclass
class LoadedModel:
    """A ready-to-run classifier graph."""

    config: ModelConfig
    labels: list[str]
    #: waveform [batch, sample_count] -> {"scores", "logits", "embeddings"}
    apply: Callable[[Any], dict]
    #: human-readable source ("native-synthetic", "native-weights", "onnx")
    source: str = "native-synthetic"
    #: mel front-end config when apply() accepts precomputed [B,F,M] mel
    #: input (native models); None for opaque graphs (ONNX).
    mel_config: object = None
    #: optional hook: move the model's weights to a specific jax device
    #: (one HBM copy shared across every compiled batch shape). The
    #: classifier calls this after backend selection.
    bind_device: Callable[[Any], None] | None = None
    #: reduced-precision observability (surfaced in the pipeline_started
    #: payload): {"mode": "bf16"|"int8", and for int8 the selection counts}
    precision_info: dict | None = None

    @property
    def num_classes(self) -> int:
        return self.config.num_classes


def synthetic_labels(n: int, prefix: str = "Species") -> list[str]:
    """Deterministic placeholder labels, BirdNET `Scientific_Common` shape."""
    return [f"{prefix} sp{i:05d}_{prefix} common {i:05d}" for i in range(n)]


def _synthesize_params(module, sample_count: int, seed: int):
    """Deterministic parameter synthesis from shapes alone.

    ``module.init`` would trace AND XLA-compile the full forward pass (200+ s
    for the full backbone on TPU). ``jax.eval_shape`` gives the parameter
    pytree abstractly in milliseconds; leaves are then filled host-side:
    kernels get fan-in-scaled normals, norm scales/variances ones, biases and
    means zeros — seeded per-path so the same (family, seed) always yields
    identical weights.
    """
    import numpy as np

    dummy = jax.ShapeDtypeStruct((1, sample_count), jnp.float32)
    shapes = jax.eval_shape(
        lambda k, x: module.init(k, x), jax.random.PRNGKey(seed), dummy
    )

    import zlib

    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    leaves = []
    for path, leaf in flat:
        names = [getattr(p, "key", str(p)) for p in path]
        leaf_name = names[-1] if names else ""
        # crc32, not hash(): str hashing is salted per process, and these
        # weights must be identical across processes for a given seed.
        key = zlib.crc32("/".join(names).encode()) ^ (seed * 2654435761)
        rng = np.random.default_rng(key & 0xFFFFFFFF)
        shape = leaf.shape
        if leaf_name in ("scale", "var"):
            arr = np.ones(shape, np.float32)
        elif leaf_name in ("bias", "mean"):
            arr = np.zeros(shape, np.float32)
        elif len(shape) >= 2:
            fan_in = int(np.prod(shape[:-1]))
            arr = rng.normal(0.0, (1.0 / max(fan_in, 1)) ** 0.5, shape)
            arr = arr.astype(np.float32)
        else:
            arr = np.zeros(shape, np.float32)
        leaves.append(jnp.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def native_model(
    family: ModelFamily | str,
    params=None,
    labels: list[str] | None = None,
    dtype=jnp.float32,
    seed: int = 0,
    blocks=None,
) -> LoadedModel:
    """Build the native flax model for a family.

    With ``params=None``, parameters are deterministically initialized from
    ``seed`` — the synthetic path used by tests and benchmarks (contract-
    and FLOP-faithful, not score-faithful).
    """
    family = ModelFamily(family)
    cfg = contracts.contract_for(family)
    kwargs = {}
    if blocks is not None:
        kwargs["blocks"] = blocks
    module = AudioClassifier(
        mel=MEL_CONFIGS[family],
        num_classes=cfg.num_classes,
        embedding_dim=cfg.embedding_dim or 1024,
        activation=cfg.activation.value,
        dtype=dtype,
        **kwargs,
    )
    if params is None:
        variables = _synthesize_params(module, cfg.sample_count, seed)
        source = "native-synthetic"
    else:
        variables = params
        source = "native-weights"

    def apply(waveform):
        return module.apply(variables, waveform)

    return LoadedModel(
        config=cfg,
        labels=labels or synthetic_labels(cfg.num_classes),
        apply=apply,
        source=source,
        mel_config=MEL_CONFIGS[family],
    )


def onnx_model(
    path: Path | str | bytes,
    config: ModelConfig,
    labels: list[str],
    dtype=None,
) -> LoadedModel:
    """Load an exported ONNX classifier graph (bit-faithful path).

    The graph is expected to take ``[batch, sample_count]`` float32 and
    produce scores (first output) and optionally embeddings (second output),
    matching the birdnet-onnx contract the reference drives
    (``src/inference/classifier.rs:281``).

    ``dtype=None`` runs bit-faithful fp32 (the ≤1e-3 parity path);
    ``dtype=jnp.bfloat16`` runs matmuls/convs in mixed precision with fp32
    accumulation (the TensorRT-fp16-engine analogue) and also stores the
    lifted weights in bfloat16, halving their HBM footprint and read
    traffic.

    Large weights are lifted into a params pytree fed per call — one device
    copy shared by all compiled batch shapes, and none of it baked into the
    serialized HLO (remote compile services reject giant constant blobs).
    """
    from ..onnx.lowering import lower

    fn = lower(path if isinstance(path, bytes) else str(path),
               compute_dtype=dtype)
    model = _loaded_from_onnx_fn(fn, config, labels,
                                 cast_float=dtype is not None)
    if dtype is not None:
        model.precision_info = {"mode": "bf16"}
    return model


def onnx_model_int8(
    path: Path | str | bytes,
    config: ModelConfig,
    labels: list[str],
    calibration,
    compute_dtype=None,
    storage_only: bool = False,
) -> LoadedModel:
    """Load an ONNX graph with calibrated int8 execution (the TensorRT-int8
    analogue; see :mod:`birda_tpu.onnx.quantize` for the scheme and the
    selection rules).

    ``calibration`` is a :class:`~birda_tpu.onnx.quantize.CalibrationResult`
    from :func:`~birda_tpu.onnx.quantize.calibrate`. ``compute_dtype``
    governs the non-quantized ops (None = bf16 on TPU, fp32 elsewhere);
    quantized weights ship/live as int8 (half the bf16 footprint).

    ``storage_only=True`` is ``--precision mixed``: no node quantizes —
    compute (and weights) stay at ``compute_dtype`` and the calibration
    scales only back int8 *storage* of the large fusion-boundary streams
    (``boundary_store="storage"``; +10.5% over bf16 on v2.4 at b768,
    ~4e-3 extra drift — docs/performance.md "Mixed int8 storage").
    """
    import os

    from ..onnx.quantize import int8_throughput_advisory, lower_int8

    # Experiment escape hatch for real-asset tuning: the boundary-storage
    # policy default ("all") is the measured optimum on the synthetic
    # full-scale graphs (docs/performance.md "Fusion-boundary storage
    # policy"); a real export with a different fusion landscape can be
    # re-tuned without a code change. Mixed mode IS a storage policy, so
    # the env knob does not apply there.
    if storage_only:
        boundary = "storage"
    else:
        boundary = os.environ.get("BIRDA_INT8_BOUNDARY", "all")
    fn = lower_int8(path if isinstance(path, bytes) else str(path),
                    calibration, compute_dtype=compute_dtype,
                    boundary_store=boundary)
    if compute_dtype is None:
        import jax

        cast_float = jax.default_backend() == "tpu"
    else:
        cast_float = compute_dtype == jnp.bfloat16
    model = _loaded_from_onnx_fn(fn, config, labels, cast_float=cast_float,
                                 source="onnx-mixed" if storage_only
                                 else "onnx-int8")
    model.precision_info = {
        "mode": "mixed" if storage_only else "int8",
        "quantized_nodes": len(fn.quantized_nodes),
        "int8_boundary_tensors": len(fn.int8_boundary_tensors),
        "boundary_store": boundary,
        "skipped_nodes": len(fn.skipped_nodes),
    }
    if storage_only:
        # Mixed mode never attempts node quantization (the selection gates
        # are forced shut), so "skipped" counts would misread as selection
        # failures; and the advisory below is about int8 COMPUTE epilogues,
        # which mixed has none of (dequant-on-read fuses into each
        # consumer).
        del model.precision_info["skipped_nodes"]
        return model
    # Static throughput advisory (the selection-never-picks-a-known-worse-
    # variant analogue, reference src/registry/selection.rs:160): warn when
    # the graph is compute-shaped and int8's quantize/requantize epilogues
    # are likely to outweigh the bandwidth saved (measured on Perch v2:
    # -3.6% vs bf16). Evaluated at the large-batch shape where the weight
    # savings are fully amortized — if it loses there, it loses everywhere.
    try:
        import jax

        probe = jax.ShapeDtypeStruct((256, config.sample_count), np.float32)
        advisory = int8_throughput_advisory(fn, probe)
    except Exception:  # noqa: BLE001 — advisory must never block a load
        advisory = None
    if advisory is not None:
        logger.warning("--precision int8: %s", advisory["message"])
        model.precision_info["advisory"] = {
            "compute_shaped": True,
            "intensity_flop_per_byte": round(
                advisory["intensity_flop_per_byte"], 1),
        }
    return model


def _loaded_from_onnx_fn(
    fn, config: ModelConfig, labels: list[str],
    cast_float: bool, source: str = "onnx",
) -> LoadedModel:
    """Wrap a lowered :class:`OnnxFunction` as a :class:`LoadedModel`.

    ``cast_float=True`` stores lifted *float* params in bfloat16 (halving
    HBM footprint and read traffic); integer params (int8 weights from the
    quantized path) always keep their dtype.
    """
    holder = {
        "params": (
            {
                k: (np.asarray(v, jnp.bfloat16)
                    if np.asarray(v).dtype.kind == "f" else v)
                for k, v in fn.params.items()
            }
            if cast_float
            else fn.params
        )
    }

    def bind_device(device):
        import jax

        holder["params"] = {
            k: jax.device_put(v, device) for k, v in holder["params"].items()
        }

    def apply(waveform):
        out = fn(waveform, params=holder["params"])
        if isinstance(out, tuple):
            scores, embeddings = out[0], out[1] if len(out) > 1 else None
        else:
            scores, embeddings = out, None
        scores = scores.astype(jnp.float32)
        result = {"scores": scores, "logits": scores}
        if embeddings is not None:
            result["embeddings"] = embeddings.astype(jnp.float32)
        else:
            result["embeddings"] = jnp.zeros(
                (scores.shape[0], config.embedding_dim or 1), jnp.float32
            )
        return result

    return LoadedModel(config=config, labels=labels, apply=apply,
                       source=source, bind_device=bind_device)


# ---------------------------------------------------------------------------
# Tiny variants for tests: same contracts, ~1000x fewer FLOPs.
# ---------------------------------------------------------------------------

TINY_BLOCKS = ((16, 1, 3, 2, 1), (24, 1, 3, 2, 2), (40, 1, 3, 2, 2))


def tiny_model(family: ModelFamily | str = ModelFamily.BIRDNET_V24,
               seed: int = 0, dtype=jnp.float32) -> LoadedModel:
    """Contract-exact but tiny — the fixture-model equivalent for CI."""
    return native_model(family, seed=seed, dtype=dtype, blocks=TINY_BLOCKS)

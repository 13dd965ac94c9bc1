"""Custom embedding-head classifiers (bat two-stage; reference
``CustomClassifier`` from birdnet-onnx, driven at ``src/lib.rs:883`` and
``src/pipeline/processor.rs:323-360``).

The backbone's 1,024-d embeddings feed a small regional head (11-38 bat
species). As a second matmul over embeddings the head is tiny; it runs as a
jitted jax call per batch. Heads load from an exported ONNX graph
(``BattyBirdNET-<Region>-256kHz_fp32.onnx``) through the ONNX lowering, or
directly from a (weights, labels) pair.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import numpy as np

from ..errors import LabelLoad
from ..inference.geomodel_filter import Prediction


def read_labels(path: Path | str) -> list[str]:
    try:
        text = Path(path).read_text(encoding="utf-8-sig")
    except OSError as e:
        raise LabelLoad(str(path), str(e)) from e
    labels = [line.strip() for line in text.splitlines() if line.strip()]
    if not labels:
        raise LabelLoad(str(path), "file contains no labels")
    return labels


class CustomClassifier:
    """Embedding -> species head with top-k + threshold semantics."""

    def __init__(
        self,
        head_fn: Callable,
        labels: list[str],
        min_confidence: float = 0.1,
        top_k: int = 5,
    ):
        """``head_fn``: [batch, emb_dim] -> [batch, n_classes] scores."""
        import jax

        self.labels = labels
        self.min_confidence = min_confidence
        self.top_k = min(top_k, len(labels))
        k = self.top_k

        def step(emb):
            scores = head_fn(emb)
            return jax.lax.top_k(scores, k)

        self._step = jax.jit(step)

    @classmethod
    def from_onnx(cls, model_path: Path | str, labels_path: Path | str,
                  min_confidence: float = 0.1, top_k: int = 5,
                  ) -> "CustomClassifier":
        from ..onnx.lowering import lower

        fn = lower(str(model_path))
        labels = read_labels(labels_path)

        def head(emb):
            out = fn(emb)
            return out[0] if isinstance(out, tuple) else out

        return cls(head, labels, min_confidence, top_k)

    def predict_batch(self, embeddings: np.ndarray) -> list[list[Prediction]]:
        vals, idx = self._step(np.ascontiguousarray(embeddings, np.float32))
        vals = np.asarray(vals)
        idx = np.asarray(idx)
        out = []
        for row in range(vals.shape[0]):
            out.append([
                Prediction(self.labels[int(i)], float(v), int(i))
                for v, i in zip(vals[row], idx[row])
                if v >= self.min_confidence
            ])
        return out

    def reclassify(self, results) -> list:
        """Replace each PredictionResult's predictions using its embeddings
        (the bat two-stage hop). Results without embeddings pass through."""
        embs = [r.embeddings for r in results]
        if not embs or any(e is None for e in embs):
            return results
        new_preds = self.predict_batch(np.stack(embs))
        for r, preds in zip(results, new_preds):
            r.predictions = preds
        return results

"""Geomodel range filter (reference ``src/inference/range_filter.rs``).

Wraps a geomodel graph — the shipped ONNX asset lowered to jax, or a
synthetic stand-in — and answers "which species occur at (lat, lon) in this
week". Queried ONCE per run at threshold 0 so every class gets a score;
thresholding and the unmatched policy are applied afterwards in the
classifier's own label space (reference ``classifier.rs:117-188``).

Input contract: ``[batch, 3]`` float32 = (latitude, longitude, week 1-48),
12,012 sigmoid occurrence scores out (``constants.range_filter``).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..errors import GeomodelLabelCount, LabelLoad, RangeFilterBuild, RangeFilterPredict
from ..utils.date import date_to_week
from .geomodel import LocationScore


def read_geomodel_labels(path: Path | str) -> list[str]:
    """One ``Scientific name_Common name`` per line; blank lines dropped."""
    try:
        content = Path(path).read_text(encoding="utf-8-sig")
    except OSError as e:
        raise LabelLoad(str(path), str(e)) from e
    labels = [line.strip() for line in content.splitlines() if line.strip()]
    if not labels:
        raise LabelLoad(str(path), "file contains no labels")
    return labels


def validate_geomodel_labels(labels: list[str], expected: int) -> None:
    """A count mismatch means labels and graph are from different versions."""
    if len(labels) != expected:
        raise GeomodelLabelCount(expected, len(labels))


class RangeFilter:
    """Occurrence-score model over (lat, lon, week)."""

    def __init__(self, predict_fn, labels: list[str], threshold: float = 0.0):
        """``predict_fn``: [batch,3] float32 -> [batch,N] sigmoid scores."""
        self._fn = predict_fn
        self.labels = labels
        self.threshold = threshold

    @classmethod
    def from_onnx(cls, geomodel_path: Path | str, labels: list[str],
                  threshold: float = 0.0) -> "RangeFilter":
        from ..onnx.lowering import lower

        try:
            fn = lower(str(geomodel_path))
        except Exception as e:
            raise RangeFilterBuild(str(e)) from e

        out_dim = None
        for vi in fn.graph.outputs:
            dims = [d for d in vi.shape if isinstance(d, int)]
            if dims:
                out_dim = dims[-1]
        if out_dim is not None:
            validate_geomodel_labels(labels, out_dim)
        return cls(fn, labels, threshold)

    def predict(self, latitude: float, longitude: float, month: int, day: int
                ) -> list[LocationScore]:
        """Scores for every species at/above the threshold."""
        week = date_to_week(month, day)
        return self.predict_week(latitude, longitude, week)

    def predict_week(self, latitude: float, longitude: float, week: int
                     ) -> list[LocationScore]:
        x = np.asarray([[latitude, longitude, float(week)]], np.float32)
        try:
            scores = np.asarray(self._fn(x))[0]
        except Exception as e:
            raise RangeFilterPredict(str(e)) from e
        if scores.shape[-1] != len(self.labels):
            raise RangeFilterPredict(
                f"geomodel produced {scores.shape[-1]} scores for "
                f"{len(self.labels)} labels"
            )
        return [
            LocationScore(species=label, score=float(s), index=i)
            for i, (label, s) in enumerate(zip(self.labels, scores))
            if s >= self.threshold
        ]

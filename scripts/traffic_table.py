#!/usr/bin/env python3
"""Per-fusion HBM traffic accounting for the ONNX-lowered programs.

The roofline argument in docs/performance.md needs data, not prose: this
tool compiles one inference step (the bench program body, minus the scan
wrapper) and emits a table of the top fusions by bytes accessed, from the
compiled executable's own optimized HLO — result bytes + operand bytes per
fusion/convolution/dot instruction, plus XLA's whole-program
``cost_analysis()`` totals for cross-checking.

Usage:
    python scripts/traffic_table.py [--spec v24|v30|perch] [--batch 256]
                                    [--precision bf16|int8|fp32] [--top 25]
                                    [--markdown]

Runs on whatever backend jax resolves (the real chip under the axon
tunnel; CPU with JAX_PLATFORMS=cpu — fusion decisions differ per backend,
so chip numbers are the ones that count).
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_DTYPE_BYTES = {
    "pred": 1, "s4": 1, "u4": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2,
    "s32": 4, "u32": 4, "s64": 8, "u64": 8, "f8e4m3fn": 1, "f8e5m2": 1,
    "bf16": 2, "f16": 2, "f32": 4, "f64": 8, "c64": 8, "c128": 16,
    "token": 0, "opaque": 0,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
# An HLO instruction definition: `%name = <type> op(...)` (ROOT optional).
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^)]*\)|\S+)\s+([\w\-]+)\(")
_OPERAND_RE = re.compile(r"%([\w.\-]+)")


def shape_bytes(type_str: str) -> int:
    """Bytes of an HLO type string; tuples sum their elements."""
    total = 0
    for m in _SHAPE_RE.finditer(type_str):
        dt, dims = m.group(1), m.group(2)
        b = _DTYPE_BYTES.get(dt)
        if b is None:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * b
    return total


def parse_entry_fusions(hlo: str):
    """Traffic per instruction of the ENTRY computation.

    Every ENTRY instruction's operands and result are HBM-resident tensors
    (fusion boundaries); everything inside a fused computation stays in
    registers/VMEM. So summing (result + operands) over ENTRY instructions
    IS the program's HBM traffic model, double-counting only in that one
    tensor read by k fusions counts k times — which is what the memory
    system sees anyway.
    """
    sizes: dict[str, int] = {}
    rows = []
    in_entry = False
    for line in hlo.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        m = _INSTR_RE.match(line)
        if m is None:
            continue
        name, type_str, op = m.group(1), m.group(2), m.group(3)
        sizes[name] = shape_bytes(type_str)
        if not in_entry:
            continue
        # Zero-traffic bookkeeping ops: a bitcast is a view, parameters /
        # tuples move nothing themselves (their bytes are counted as the
        # operands of the instructions that read them).
        if op in ("bitcast", "parameter", "tuple", "get-tuple-element",
                  "constant", "after-all"):
            continue
        # Operands: %tokens inside the call parens (skip the computation
        # references after `calls=` / `to_apply=`).
        call = line.split(m.group(3) + "(", 1)[1]
        call = call.split("), ")[0] if "), " in call else call.rstrip(")")
        operands = [
            sizes.get(o, 0) for o in _OPERAND_RE.findall(call) if o in sizes
        ]
        rows.append({
            "name": name, "op": op,
            "kind": (re.search(r"kind=(\w+)", line).group(1)
                     if "kind=" in line else ""),
            "result_bytes": sizes[name],
            "operand_bytes": sum(operands),
            "bytes": sizes[name] + sum(operands),
        })
    return rows


def build_step(spec_key: str, precision: str, batch: int):
    import jax
    import jax.numpy as jnp

    from birda_tpu.onnx import fullscale as fs

    spec = {"v24": fs.BIRDNET_V24_SPEC, "v30": fs.BIRDNET_V30_SPEC,
            "perch": fs.PERCH_V2_SPEC}[spec_key]
    g = fs.cached_build(spec, seed=1)
    if precision == "int8":
        from birda_tpu.onnx.quantize import cached_calibration, lower_int8

        calib, _ = cached_calibration(g.model_bytes, spec.sample_count)
        fn = lower_int8(g.model_bytes, calib)
        params = {
            k: (np.asarray(v, jnp.bfloat16)
                if np.asarray(v).dtype.kind == "f" else np.asarray(v))
            for k, v in fn.params.items()
        }
    else:
        from birda_tpu.onnx.lowering import lower

        dtype = jnp.bfloat16 if precision == "bf16" else None
        fn = lower(g.model_bytes, compute_dtype=dtype)
        params = {
            k: (np.asarray(v, jnp.bfloat16) if dtype is not None
                else np.asarray(v))
            for k, v in fn.params.items()
        }

    def step(p, x):
        scores = fn(x, params=p)[0].astype(jnp.float32)
        return jax.lax.top_k(scores, 5)

    x_shape = jax.ShapeDtypeStruct((batch, spec.sample_count), np.float32)
    p_shapes = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                for k, v in params.items()}
    return jax.jit(step).lower(p_shapes, x_shape), spec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", default="v24", choices=["v24", "v30", "perch"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--precision", default="bf16",
                    choices=["bf16", "int8", "fp32"])
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--markdown", action="store_true",
                    help="emit a docs-ready markdown table")
    ap.add_argument("--json", metavar="FILE", default=None,
                    help="dump EVERY entry-instruction row (+ summary) to "
                         "FILE for offline attribution")
    args = ap.parse_args(argv)

    lowered, spec = build_step(args.spec, args.precision, args.batch)
    print(f"compiling {args.spec} {args.precision} b{args.batch} ...",
          file=sys.stderr)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    hlo = compiled.as_text()
    rows = parse_entry_fusions(hlo)
    rows.sort(key=lambda r: -r["bytes"])
    parsed_total = sum(r["bytes"] for r in rows)

    flops = float(ca.get("flops", 0.0))
    xla_bytes = float(ca.get("bytes accessed", 0.0))
    summary = {
        "spec": args.spec, "precision": args.precision, "batch": args.batch,
        "flops_per_step": flops,
        "xla_bytes_accessed": xla_bytes,
        "parsed_entry_bytes": parsed_total,
        "entry_instructions": len(rows),
        "arith_intensity_flop_per_byte": (
            flops / xla_bytes if xla_bytes else None),
    }
    print(json.dumps(summary))
    if args.json:
        Path(args.json).write_text(json.dumps(
            {"summary": summary, "rows": rows}, indent=1))

    if args.markdown:
        print()
        print(f"| # | op | kind | result MB | operands MB | total MB |"
              f" share |")
        print("|---|---|---|---|---|---|---|")
        for i, r in enumerate(rows[: args.top], 1):
            print(f"| {i} | {r['name']} ({r['op']}) | {r['kind']} "
                  f"| {r['result_bytes']/1e6:.1f} "
                  f"| {r['operand_bytes']/1e6:.1f} "
                  f"| {r['bytes']/1e6:.1f} "
                  f"| {100*r['bytes']/max(parsed_total,1):.1f}% |")
        rest = sum(r["bytes"] for r in rows[args.top:])
        print(f"| | remaining {max(len(rows)-args.top,0)} instructions | | |"
              f" | {rest/1e6:.1f} | {100*rest/max(parsed_total,1):.1f}% |")
    else:
        for r in rows[: args.top]:
            print(f"{r['bytes']/1e6:10.1f} MB  {r['op']:<18} {r['kind']:<18}"
                  f" {r['name']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Compile-and-run every Pallas kernel at the real v2.4 stage geometries.

One shot on the real chip (B=4, seconds per shape once the backend is
up): catches Mosaic compile errors and numerical blowups in the fused
SE / SE+project / whole-block kernels without paying a full-graph
compile. Run this BEFORE trusting `entry()`/`bench.py` with the fused
kernels after a kernel change.

Prints one JSON line per case and a final summary; exit 1 on any
failure. A Pallas failure surfaces as "HTTP 500: tpu_compile_helper
subprocess exit code 1" — the full exception string holds the Mosaic
error (CLAUDE.md).
"""

from __future__ import annotations

import json
import sys
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (name, Cin, Cm, k, H, W, C_se, O, has_expand, has_res) — the stride-1
# v2.4 blocks (ops/mbconv.py) at batch 4.
MBCONV_CASES = [
    ("stage1", 32, 32, 3, 256, 96, 8, 16, False, False),
    ("stage2b2", 24, 144, 3, 128, 48, 6, 24, True, True),
    ("stage3b2", 40, 240, 5, 64, 24, 10, 40, True, True),
    ("stage4b2", 80, 480, 3, 32, 12, 20, 80, True, True),
    ("stage5b1", 80, 480, 5, 32, 12, 20, 112, True, False),
    ("stage5b2", 112, 672, 5, 32, 12, 28, 112, True, True),
    ("stage6b2", 192, 1152, 5, 16, 6, 48, 192, True, True),
    ("stage7", 192, 1152, 3, 16, 6, 48, 320, True, False),
]

# (name, C, H, W, C_se, O) — the stride-2 blocks' SE(+project) slabs.
SE_CASES = [
    ("stage2b1", 96, 128, 48, 4, 24),
    ("stage3b1", 144, 64, 24, 6, 40),
    ("stage4b1", 240, 32, 12, 10, 80),
    ("stage6b1", 672, 16, 6, 28, 192),
]


def _reference_mbconv(x, we, ae, wd, k, ad, w1, b1, w2, b2, wp, ap, x_res):
    def swish(v):
        return v * (1.0 / (1.0 + np.exp(-v)))

    h = x.astype(np.float64)
    if we is not None:
        h = np.einsum("mc,bchw->bmhw", we.astype(np.float64), h)
        h = swish(h * ae[0][None, :, None, None]
                  + ae[1][None, :, None, None])
    b, cm, hh, ww = h.shape
    p = k // 2
    hp = np.pad(h, ((0, 0), (0, 0), (p, p), (p, p)))
    dw = np.zeros_like(h)
    for dy in range(k):
        for dx in range(k):
            dw += (wd[:, dy * k + dx][None, :, None, None]
                   * hp[:, :, dy:dy + hh, dx:dx + ww])
    h = swish(dw * ad[0][None, :, None, None] + ad[1][None, :, None, None])
    s = h.mean(axis=(2, 3))
    r = swish(s @ w1.astype(np.float64).T + b1)
    g = 1.0 / (1.0 + np.exp(-(r @ w2.astype(np.float64).T + b2)))
    gated = h * g[:, :, None, None]
    out = (np.einsum("om,bmhw->bohw", wp.astype(np.float64), gated)
           * ap[0][None, :, None, None] + ap[1][None, :, None, None])
    if x_res is not None:
        out = out + x_res
    return out.astype(np.float32)


def main() -> int:
    from birda_tpu.ops.mbconv import fused_mbconv_s1
    from birda_tpu.ops.se import fused_se, fused_se_project

    B = 4
    failures = 0
    rng = np.random.default_rng(0)

    for (name, cin, cm, k, h, w, c_se, o,
         has_expand, has_res) in MBCONV_CASES:
        try:
            x = rng.normal(0, 1, (B, cin, h, w)).astype(np.float32)
            we = (rng.normal(0, 0.2, (cm, cin)).astype(np.float32)
                  if has_expand else None)
            ae = (rng.uniform(0.8, 1.2, cm).astype(np.float32),
                  rng.normal(0, .1, cm).astype(np.float32))
            wd = rng.normal(0, 0.2, (cm, k * k)).astype(np.float32)
            ad = (rng.uniform(0.8, 1.2, cm).astype(np.float32),
                  rng.normal(0, .1, cm).astype(np.float32))
            w1 = rng.normal(0, 0.3, (c_se, cm)).astype(np.float32)
            b1 = rng.normal(0, .1, c_se).astype(np.float32)
            w2 = rng.normal(0, 0.3, (cm, c_se)).astype(np.float32)
            b2 = rng.normal(0, .1, cm).astype(np.float32)
            wp = rng.normal(0, 0.2, (o, cm)).astype(np.float32)
            ap = (rng.uniform(0.8, 1.2, o).astype(np.float32),
                  rng.normal(0, .1, o).astype(np.float32))
            xr = (rng.normal(0, 1, (B, o, h, w)).astype(np.float32)
                  if has_res else None)
            got = np.asarray(fused_mbconv_s1(
                x, we, ae[0], ae[1], wd, ad[0], ad[1], w1, b1, w2, b2,
                wp, ap[0], ap[1], x_res=xr), np.float32)
            want = _reference_mbconv(x, we, ae, wd, k, ad, w1, b1, w2,
                                     b2, wp, ap, xr)
            err = float(np.abs(got - want).max() / np.abs(want).max())
            ok = err < 2e-2
            failures += not ok
            print(json.dumps({"kernel": "mbconv", "case": name,
                              "rel_err": round(err, 5), "ok": ok}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(json.dumps({"kernel": "mbconv", "case": name,
                              "error": str(e)[:2000]}), flush=True)
            traceback.print_exc(limit=3)

    for name, c, h, w, c_se, o in SE_CASES:
        try:
            x = rng.normal(0, 1, (B, c, h, w)).astype(np.float32)
            w1 = rng.normal(0, 0.3, (c_se, c)).astype(np.float32)
            b1 = rng.normal(0, .1, c_se).astype(np.float32)
            w2 = rng.normal(0, 0.3, (c, c_se)).astype(np.float32)
            b2 = rng.normal(0, .1, c).astype(np.float32)
            wp = rng.normal(0, 0.2, (o, c)).astype(np.float32)
            bp = rng.normal(0, .1, o).astype(np.float32)
            g1 = np.asarray(fused_se(x, w1, b1, w2, b2), np.float32)
            g2 = np.asarray(fused_se_project(x, w1, b1, w2, b2, wp, bp),
                            np.float32)
            # SE reference
            xs = x.astype(np.float64)
            s = xs.mean(axis=(2, 3))
            r = s @ w1.astype(np.float64).T + b1
            r = r * (1 / (1 + np.exp(-r)))
            gt = 1 / (1 + np.exp(-(r @ w2.astype(np.float64).T + b2)))
            ref1 = (xs * gt[:, :, None, None]).astype(np.float32)
            ref2 = (np.einsum("bchw,oc->bohw", ref1.astype(np.float64),
                              wp.astype(np.float64))
                    + bp[None, :, None, None]).astype(np.float32)
            e1 = float(np.abs(g1 - ref1).max() / np.abs(ref1).max())
            e2 = float(np.abs(g2 - ref2).max() / np.abs(ref2).max())
            ok = e1 < 2e-2 and e2 < 2e-2
            failures += not ok
            print(json.dumps({"kernel": "se/sep", "case": name,
                              "rel_err": [round(e1, 5), round(e2, 5)],
                              "ok": ok}), flush=True)
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(json.dumps({"kernel": "se/sep", "case": name,
                              "error": str(e)[:2000]}), flush=True)
            traceback.print_exc(limit=3)

    print(json.dumps({"failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

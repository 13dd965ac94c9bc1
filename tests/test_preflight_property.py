"""Preflight⇄execute consistency property (VERDICT r3 #5).

The contract ``models check`` sells to users: **every graph preflight
passes must execute without an** ``UnsupportedOnnxOp`` **, and every
statically-knowable runtime unsupported-raise must be
preflight-detectable** (the reference analogue is ORT resolving every
node's kernel at session build, ``src/inference/classifier.rs:250``).

The grid below enumerates minimal per-op graphs across the attribute /
input-presence configurations on BOTH sides of every static rule in
``onnx/preflight.py`` and every static ``raise UnsupportedOnnxOp`` site
in the evaluator. Each supported config must preflight clean AND
execute; each unsupported config must be flagged by preflight AND
refused by ``lower()`` with the aggregate ``OnnxGraphUnsupported``
(never a raw first-op raise). Genuinely input-dependent raises
(data-dependent If conditions, dynamic Slice params, zero-size scales
content) are out of scope by design — the wire format cannot expose
them statically.
"""

import numpy as np
import pytest

import fixtures_onnx as fo
from birda_tpu.errors import OnnxGraphUnsupported
from birda_tpu.onnx.lowering import lower
from birda_tpu.onnx.preflight import preflight


def _vi(name, shape, et=1):
    return fo.value_info(name, shape, elem_type=et)


def _case_cumsum(exclusive=0, reverse=0):
    attrs = []
    if exclusive:
        attrs.append(fo.attr_int("exclusive", 1))
    if reverse:
        attrs.append(fo.attr_int("reverse", 1))
    mb = fo.model(
        [fo.node("CumSum", ["x", "ax"], ["y"], attrs=attrs)],
        inputs=[_vi("x", [6])], outputs=[_vi("y", [6])],
        initializers=[fo.tensor("ax", np.array(0, np.int64))], opset=17)
    return mb, (np.arange(6, dtype=np.float32),)


def _case_topk(axis=-1, largest=1):
    attrs = [fo.attr_int("axis", axis), fo.attr_int("largest", largest)]
    t, f = (2, 3) if axis in (-1, 1) else (3, 8)
    mb = fo.model(
        [fo.node("TopK", ["x", "k"], ["v", "i"], attrs=attrs)],
        inputs=[_vi("x", [2, 8])], outputs=[_vi("v", [t, f]),
                                            _vi("i", [t, f], et=7)],
        initializers=[fo.tensor("k", np.array([3], np.int64))], opset=17)
    return mb, (np.random.default_rng(0).normal(
        size=(2, 8)).astype(np.float32),)


def _case_resize(mode="linear", ct="half_pixel", antialias=0,
                 no_scales=False, opset=17):
    attrs = [fo.attr_str("mode", mode),
             fo.attr_str("coordinate_transformation_mode", ct)]
    if antialias:
        attrs.append(fo.attr_int("antialias", 1))
    scales = np.array([1.0, 1.0, 2.0, 2.0], np.float32)
    if opset < 11:
        ins = ["x", "sc"]
        attrs = [fo.attr_str("mode", "nearest")]
    elif no_scales:
        ins = ["x", "", ""]
    else:
        ins = ["x", "", "sc"]
    mb = fo.model(
        [fo.node("Resize", ins, ["y"], attrs=attrs)],
        inputs=[_vi("x", [1, 1, 4, 4])], outputs=[_vi("y", [1, 1, 8, 8])],
        initializers=[fo.tensor("sc", scales)], opset=opset)
    return mb, (np.random.default_rng(1).normal(
        size=(1, 1, 4, 4)).astype(np.float32),)


def _case_maxpool(indices=False):
    outs = ["y", "i"] if indices else ["y"]
    out_vi = [_vi("y", [1, 1, 4, 4])]
    if indices:
        out_vi.append(_vi("i", [1, 1, 4, 4], et=7))
    mb = fo.model(
        [fo.node("MaxPool", ["x"], outs, attrs=[
            fo.attr_ints("kernel_shape", [2, 2]),
            fo.attr_ints("strides", [2, 2])])],
        inputs=[_vi("x", [1, 1, 8, 8])], outputs=out_vi, opset=17)
    return mb, (np.random.default_rng(2).normal(
        size=(1, 1, 8, 8)).astype(np.float32),)


def _case_dft(inverse=0):
    attrs = [fo.attr_int("inverse", 1)] if inverse else []
    mb = fo.model(
        [fo.node("DFT", ["x"], ["y"], attrs=attrs)],
        inputs=[_vi("x", [1, 16, 1])], outputs=[_vi("y", [1, 16, 2])],
        opset=17)
    return mb, (np.random.default_rng(3).normal(
        size=(1, 16, 1)).astype(np.float32),)


def _case_argmax(sli=0):
    attrs = [fo.attr_int("select_last_index", 1)] if sli else []
    mb = fo.model(
        [fo.node("ArgMax", ["x"], ["y"], attrs=attrs)],
        inputs=[_vi("x", [3, 4])], outputs=[_vi("y", [1, 4], et=7)],
        opset=17)
    return mb, (np.random.default_rng(4).normal(
        size=(3, 4)).astype(np.float32),)


def _case_pad(mode="constant"):
    mb = fo.model(
        [fo.node("Pad", ["x", "p"], ["y"], attrs=[fo.attr_str("mode", mode)])],
        inputs=[_vi("x", [4])], outputs=[_vi("y", [6])],
        initializers=[fo.tensor("p", np.array([1, 1], np.int64))], opset=17)
    return mb, (np.arange(4, dtype=np.float32),)


def _case_cast(to=1):
    mb = fo.model(
        [fo.node("Cast", ["x"], ["y"], attrs=[fo.attr_int("to", to)])],
        inputs=[_vi("x", [4])], outputs=[_vi("y", [4], et=to)], opset=17)
    return mb, (np.arange(4, dtype=np.float32),)


def _case_gridsample(mode="linear", padding="zeros"):
    mb = fo.model(
        [fo.node("GridSample", ["x", "g"], ["y"], attrs=[
            fo.attr_str("mode", mode), fo.attr_str("padding_mode", padding)])],
        inputs=[_vi("x", [1, 1, 4, 4]), _vi("g", [1, 2, 2, 2])],
        outputs=[_vi("y", [1, 1, 2, 2])], opset=20)
    rng = np.random.default_rng(5)
    return mb, (rng.normal(size=(1, 1, 4, 4)).astype(np.float32),
                rng.uniform(-1, 1, (1, 2, 2, 2)).astype(np.float32))


def _case_bitshift(direction="LEFT"):
    mb = fo.model(
        [fo.node("BitShift", ["x", "s"], ["y"],
                 attrs=[fo.attr_str("direction", direction)])],
        inputs=[_vi("x", [4], et=12), _vi("s", [4], et=12)],
        outputs=[_vi("y", [4], et=12)], opset=17)
    return mb, (np.arange(4, dtype=np.uint32),
                np.ones(4, np.uint32))


def _case_stft(onesided=1):
    win = (0.5 - 0.5 * np.cos(
        2 * np.pi * np.arange(64) / 64)).astype(np.float32)
    t = (128 - 64) // 32 + 1
    bins = 33 if onesided else 64
    mb = fo.model(
        [fo.node("STFT", ["x", "st", "w"], ["y"],
                 attrs=[fo.attr_int("onesided", onesided)])],
        inputs=[_vi("x", [1, 128])], outputs=[_vi("y", [1, t, bins, 2])],
        initializers=[fo.tensor("st", np.array(32, np.int64)),
                      fo.tensor("w", win)], opset=17)
    return mb, (np.random.default_rng(6).normal(
        size=(1, 128)).astype(np.float32),)


def _case_gathernd(batch_dims=0):
    attrs = [fo.attr_int("batch_dims", 1)] if batch_dims else []
    mb = fo.model(
        [fo.node("GatherND", ["x", "i"], ["y"], attrs=attrs)],
        inputs=[_vi("x", [2, 2])], outputs=[_vi("y", [1])],
        initializers=[fo.tensor("i", np.array([[0, 1]], np.int64))],
        opset=17)
    return mb, (np.arange(4, dtype=np.float32).reshape(2, 2),)


def _case_groupnorm(with_groups=True):
    attrs = ([fo.attr_int("num_groups", 2)] if with_groups else []) + [
        fo.attr_float("epsilon", 1e-5)]
    mb = fo.model(
        [fo.node("GroupNormalization", ["x", "s", "b"], ["y"], attrs=attrs)],
        inputs=[_vi("x", [1, 4, 4])], outputs=[_vi("y", [1, 4, 4])],
        initializers=[fo.tensor("s", np.ones(2, np.float32)),
                      fo.tensor("b", np.zeros(2, np.float32))], opset=18)
    return mb, (np.random.default_rng(7).normal(
        size=(1, 4, 4)).astype(np.float32),)


def _case_fusedmatmul(trans_batch=0):
    attrs = [fo.attr_float("alpha", 1.0)]
    if trans_batch:
        attrs.append(fo.attr_int("transBatchA", 1))
    mb = fo.model(
        [fo.node("FusedMatMul", ["a", "b"], ["y"], attrs=attrs,
                 domain="com.microsoft")],
        inputs=[_vi("a", [2, 3]), _vi("b", [3, 4])],
        outputs=[_vi("y", [2, 4])], opset=17)
    rng = np.random.default_rng(8)
    return mb, (rng.normal(size=(2, 3)).astype(np.float32),
                rng.normal(size=(3, 4)).astype(np.float32))


def _branch_graph(val):
    return fo.graph(
        [fo.node("Constant", [], ["c"],
                 attrs=[fo.attr_tensor("value",
                                       np.array(val, np.float32))])],
        inputs=[], outputs=[_vi("c", [])],
    )


def _case_if(with_branches=True):
    attrs = []
    if with_branches:
        attrs = [fo.attr_graph("then_branch", _branch_graph(1.0)),
                 fo.attr_graph("else_branch", _branch_graph(2.0))]
    mb = fo.model(
        [fo.node("If", ["cond"], ["y"], attrs=attrs)],
        inputs=[], outputs=[_vi("y", [])],
        initializers=[fo.tensor("cond", np.array(True))], opset=17)
    return mb, ()


def _loop_body():
    return fo.graph(
        [fo.node("Identity", ["cond_in"], ["cond_out"]),
         fo.node("Add", ["v", "one"], ["v_out"])],
        inputs=[_vi("it", [], et=7), _vi("cond_in", [], et=9),
                _vi("v", [])],
        outputs=[_vi("cond_out", [], et=9), _vi("v_out", [])],
        initializers=[fo.tensor("one", np.float32(1.0))],
    )


def _case_loop(with_body=True, with_inputs=True):
    attrs = [fo.attr_graph("body", _loop_body())] if with_body else []
    ins = ["m", "c", "v0"] if with_inputs else ["", "", "v0"]
    inits = [fo.tensor("v0", np.float32(0.0))]
    if with_inputs:
        inits += [fo.tensor("m", np.array(3, np.int64)),
                  fo.tensor("c", np.array(True))]
    mb = fo.model(
        [fo.node("Loop", ins, ["y"], attrs=attrs)],
        inputs=[], outputs=[_vi("y", [])],
        initializers=inits, opset=17)
    return mb, ()


def _case_scan(with_attrs=True):
    body = fo.graph(
        [fo.node("Add", ["s", "xi"], ["s_out"]),
         fo.node("Identity", ["s_out"], ["yi"])],
        inputs=[_vi("s", []), _vi("xi", [])],
        outputs=[_vi("s_out", []), _vi("yi", [])],
    )
    attrs = []
    if with_attrs:
        attrs = [fo.attr_graph("body", body),
                 fo.attr_int("num_scan_inputs", 1)]
    mb = fo.model(
        [fo.node("Scan", ["s0", "xs"], ["sf", "ys"], attrs=attrs)],
        inputs=[_vi("xs", [4])], outputs=[_vi("sf", []), _vi("ys", [4])],
        initializers=[fo.tensor("s0", np.float32(0.0))], opset=17)
    return mb, (np.arange(4, dtype=np.float32),)


def _case_mha(with_num_heads=True):
    attrs = [fo.attr_int("num_heads", 2)] if with_num_heads else []
    mb = fo.model(
        [fo.node("MultiHeadAttention", ["q", "k", "v"], ["y"], attrs=attrs,
                 domain="com.microsoft")],
        inputs=[_vi("q", [1, 3, 8]), _vi("k", [1, 3, 8]),
                _vi("v", [1, 3, 8])],
        outputs=[_vi("y", [1, 3, 8])], opset=17)
    rng = np.random.default_rng(9)
    return mb, tuple(rng.normal(size=(1, 3, 8)).astype(np.float32)
                     for _ in range(3))


def _case_qlinear_avgpool(channels_last=0):
    attrs = [fo.attr_ints("kernel_shape", [2, 2]),
             fo.attr_ints("strides", [2, 2])]
    if channels_last:
        attrs.append(fo.attr_int("channels_last", 1))
    mb = fo.model(
        [fo.node("QLinearAveragePool",
                 ["x", "xs", "xz", "ys", "yz"], ["y"], attrs=attrs,
                 domain="com.microsoft")],
        inputs=[_vi("x", [1, 1, 4, 4], et=2)],
        outputs=[_vi("y", [1, 1, 2, 2], et=2)],
        initializers=[fo.tensor("xs", np.float32(0.1)),
                      fo.tensor("xz", np.uint8(128)),
                      fo.tensor("ys", np.float32(0.1)),
                      fo.tensor("yz", np.uint8(128))], opset=17)
    return mb, (np.random.default_rng(10).integers(
        0, 255, (1, 1, 4, 4), dtype=np.uint8),)


def _case_upsample(with_scales=True, opset=9):
    ins = ["x", "sc"] if with_scales else ["x"]
    inits = ([fo.tensor("sc", np.array([1, 1, 2, 2], np.float32))]
             if with_scales else [])
    mb = fo.model(
        [fo.node("Upsample", ins, ["y"],
                 attrs=[fo.attr_str("mode", "nearest")])],
        inputs=[_vi("x", [1, 1, 2, 2])], outputs=[_vi("y", [1, 1, 4, 4])],
        initializers=inits, opset=opset)
    return mb, (np.arange(4, dtype=np.float32).reshape(1, 1, 2, 2),)


def _case_unknown_op():
    mb = fo.model(
        [fo.node("NonZero", ["x"], ["y"])],  # dynamic output shape: never
        inputs=[_vi("x", [4])], outputs=[_vi("y", [1, 4], et=7)], opset=17)
    return mb, (np.arange(4, dtype=np.float32),)


CASES = [
    # (id, expect_supported, builder)
    ("cumsum", True, _case_cumsum),
    ("cumsum-exclusive", False, lambda: _case_cumsum(exclusive=1)),
    ("cumsum-reverse", False, lambda: _case_cumsum(reverse=1)),
    ("topk-last-axis", True, _case_topk),
    ("topk-axis0", True, lambda: _case_topk(axis=0)),
    ("topk-smallest", False, lambda: _case_topk(largest=0)),
    ("resize-linear", True, _case_resize),
    ("resize-nearest-asym", True,
     lambda: _case_resize(mode="nearest", ct="asymmetric")),
    ("resize-bogus-mode", False, lambda: _case_resize(mode="lanczos")),
    ("resize-tf-crop", False,
     lambda: _case_resize(ct="tf_crop_and_resize")),
    ("resize-antialias", False, lambda: _case_resize(antialias=1)),
    ("resize-no-scales-or-sizes", False,
     lambda: _case_resize(no_scales=True)),
    ("resize-opset10-scales-input", True,
     lambda: _case_resize(opset=10)),
    ("maxpool", True, _case_maxpool),
    ("maxpool-indices", False, lambda: _case_maxpool(indices=True)),
    ("dft", True, _case_dft),
    ("dft-inverse", False, lambda: _case_dft(inverse=1)),
    ("argmax", True, _case_argmax),
    ("argmax-select-last", False, lambda: _case_argmax(sli=1)),
    ("pad-constant", True, _case_pad),
    ("pad-bogus-mode", False, lambda: _case_pad(mode="mirror")),
    ("cast-float", True, _case_cast),
    ("cast-string", False, lambda: _case_cast(to=8)),
    ("gridsample", True, _case_gridsample),
    ("gridsample-bicubic", False,
     lambda: _case_gridsample(mode="bicubic")),
    ("gridsample-reflection", False,
     lambda: _case_gridsample(padding="reflection")),
    ("bitshift-left", True, _case_bitshift),
    ("bitshift-bogus", False, lambda: _case_bitshift(direction="UP")),
    ("stft", True, _case_stft),
    ("stft-twosided", False, lambda: _case_stft(onesided=0)),
    ("gathernd", True, _case_gathernd),
    ("gathernd-batchdims", False, lambda: _case_gathernd(batch_dims=1)),
    ("groupnorm", True, _case_groupnorm),
    ("groupnorm-no-groups", False,
     lambda: _case_groupnorm(with_groups=False)),
    ("fusedmatmul", True, _case_fusedmatmul),
    ("fusedmatmul-transbatch", False,
     lambda: _case_fusedmatmul(trans_batch=1)),
    ("if", True, _case_if),
    ("if-missing-branches", False,
     lambda: _case_if(with_branches=False)),
    ("loop", True, _case_loop),
    ("loop-missing-body", False, lambda: _case_loop(with_body=False)),
    ("loop-no-trip-or-cond", False,
     lambda: _case_loop(with_inputs=False)),
    ("scan", True, _case_scan),
    ("scan-missing-attrs", False, lambda: _case_scan(with_attrs=False)),
    ("mha", True, _case_mha),
    ("mha-missing-num-heads", False,
     lambda: _case_mha(with_num_heads=False)),
    ("qlinear-avgpool", True, _case_qlinear_avgpool),
    ("qlinear-avgpool-channels-last", False,
     lambda: _case_qlinear_avgpool(channels_last=1)),
    ("upsample", True, _case_upsample),
    ("upsample-missing-scales", False,
     lambda: _case_upsample(with_scales=False)),
    ("unknown-op", False, _case_unknown_op),
]


@pytest.mark.parametrize(
    "expect_ok,build", [(e, b) for _, e, b in CASES],
    ids=[i for i, _, _ in CASES])
def test_preflight_execute_consistency(expect_ok, build):
    mb, args = build()
    findings = preflight(mb)
    if expect_ok:
        assert findings == [], (
            "preflight false-positive on a supported config:\n"
            + "\n".join(f.render() for f in findings))
        fn = lower(mb)
        out = fn(*args)  # must not raise UnsupportedOnnxOp
        for o in (out if isinstance(out, tuple) else (out,)):
            assert np.asarray(o) is not None
    else:
        assert findings, (
            "runtime-unsupported config is NOT preflight-detectable "
            "(models check would pass a graph that fails at run time)")
        # The lowering must refuse with the aggregate error (one full fix
        # list), never a raw first-op raise.
        with pytest.raises(OnnxGraphUnsupported):
            fn = lower(mb)
            fn(*args)


def test_every_supported_case_runs_the_op():
    """Guard against vacuous supported cases: each must actually execute
    its op (non-empty outputs with finite values where float)."""
    for name, expect_ok, build in CASES:
        if not expect_ok:
            continue
        mb, args = build()
        fn = lower(mb)
        out = fn(*args)
        outs = out if isinstance(out, tuple) else (out,)
        for o in outs:
            a = np.asarray(o)
            assert a.size > 0, name
            if a.dtype.kind == "f":
                assert np.all(np.isfinite(a)), name

"""Fused squeeze-and-excitation kernel (ops/se.py) and its graph pass.

The kernel only engages on a TPU backend at bf16 compute; these tests force
it on CPU via ``BIRDA_SE_KERNEL=pallas`` (interpret mode) and pin that the
fused gate computes the same math as the composed-op SE chain it replaces
(reference model family: EfficientNet MBConv, spelled in ONNX as
GlobalAveragePool -> Conv -> swish -> Conv -> Sigmoid -> Mul).
"""

import numpy as np
import pytest

import jax.numpy as jnp


def _reference_se(x, w1, b1, w2, b2):
    """Composed-op SE in float64 — the semantics both paths approximate."""
    xs = x.astype(np.float64)
    s = xs.mean(axis=(2, 3))                       # [B, C]
    r = s @ w1.astype(np.float64).T + b1           # [B, C_se]
    r = r * (1.0 / (1.0 + np.exp(-r)))  # swish
    g = r @ w2.astype(np.float64).T + b2           # [B, C]
    gate = 1.0 / (1.0 + np.exp(-g))
    return (xs * gate[:, :, None, None]).astype(np.float32)


GEOMETRIES = [
    pytest.param(3, 32, 16, 8, 8, id="v24-stage1-shape"),
    pytest.param(2, 96, 8, 16, 4, id="v24-stage2-shape"),
    pytest.param(2, 240, 4, 32, 10, id="wide-small-spatial"),
    pytest.param(2, 672, 16, 6, 28, id="v24-tail-hw96"),
    pytest.param(2, 64, 31, 8, 8, id="odd-hw-not-128-multiple"),
]


class TestFusedSeKernel:
    @pytest.mark.parametrize("b,c,h,w,c_se", GEOMETRIES)
    def test_matches_reference(self, b, c, h, w, c_se):
        from birda_tpu.ops.se import fused_se, geometry_ok

        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (b, c, h, w)).astype(np.float32)
        w1 = rng.normal(0, 0.3, (c_se, c)).astype(np.float32)
        b1 = rng.normal(0, 0.1, c_se).astype(np.float32)
        w2 = rng.normal(0, 0.3, (c, c_se)).astype(np.float32)
        b2 = rng.normal(0, 0.1, c).astype(np.float32)
        assert geometry_ok(x.shape)
        got = np.asarray(fused_se(x, w1, b1, w2, b2, interpret=True),
                         np.float32)
        want = _reference_se(x, w1, b1, w2, b2)
        assert got.shape == want.shape
        # bf16 slab and matmul operands; fp32 pool/gate accumulation.
        assert np.abs(got - want).max() / np.abs(want).max() < 2e-2

    def test_geometry_gating(self):
        from birda_tpu.ops.se import geometry_ok

        assert geometry_ok((4, 96, 128, 48))       # v2.4 stage-2 slab
        assert geometry_ok((4, 672, 16, 6))        # v2.4 tail: HW=96
        assert geometry_ok((4, 64, 249, 64))       # v3.0-ish: HW%128!=0
        assert not geometry_ok((4, 96, 11, 5))     # HW % 8 != 0
        assert not geometry_ok((4, 30, 128, 48))   # C % 8 != 0
        assert not geometry_ok((4, 96, 48))        # not 4-D
        # A slab over the VMEM budget falls back (C * HW * 2 * 2 > 13 MB).
        assert not geometry_ok((1, 1024, 128, 64))

    def test_kernel_enabled_gating(self, monkeypatch):
        from birda_tpu.ops import se

        monkeypatch.delenv("BIRDA_SE_KERNEL", raising=False)
        # CPU backend, auto mode: off (composed path serves tests/parity).
        assert not se.kernel_enabled(jnp.bfloat16)
        monkeypatch.setenv("BIRDA_SE_KERNEL", "pallas")
        assert se.kernel_enabled(jnp.bfloat16)
        assert not se.kernel_enabled(None)  # fp32 parity mode: never
        monkeypatch.setenv("BIRDA_SE_KERNEL", "off")
        assert not se.kernel_enabled(jnp.bfloat16)


def _se_graph(c=16, c_se=4, h=8, w=16, swish=True, extra_consumer=False,
              bias=True, pool_spelling="global"):
    """A standalone SE chain around input x [B, c, h, w]."""
    import fixtures_onnx as fo

    rng = np.random.default_rng(1)
    w1 = rng.normal(0, 0.3, (c_se, c, 1, 1)).astype(np.float32)
    w2 = rng.normal(0, 0.3, (c, c_se, 1, 1)).astype(np.float32)
    b1 = rng.normal(0, 0.1, c_se).astype(np.float32)
    b2 = rng.normal(0, 0.1, c).astype(np.float32)
    conv1_in = ["s", "w1", "b1"] if bias else ["s", "w1"]
    conv2_in = ["r2", "w2", "b2"] if bias else ["r2", "w2"]
    if pool_spelling == "global":
        pool = fo.node("GlobalAveragePool", ["x"], ["s"])
    else:  # the tf2onnx spelling
        pool = fo.node("ReduceMean", ["x"], ["s"], attrs=[
            fo.attr_ints("axes", [2, 3]), fo.attr_int("keepdims", 1)])
    nodes = [
        pool,
        fo.node("Conv", conv1_in, ["r"]),
    ]
    if swish:
        nodes += [
            fo.node("Sigmoid", ["r"], ["rs"]),
            fo.node("Mul", ["r", "rs"], ["r2"]),
        ]
    else:
        nodes += [fo.node("Relu", ["r"], ["r2"])]
    nodes += [
        fo.node("Conv", conv2_in, ["g0"]),
        fo.node("Sigmoid", ["g0"], ["g"]),
        fo.node("Mul", ["x", "g"], ["y"]),
    ]
    outputs = [fo.value_info("y", ["batch", c, h, w])]
    if extra_consumer:
        nodes.append(fo.node("Relu", ["r2"], ["z"]))
        outputs.append(fo.value_info("z", ["batch", c_se, 1, 1]))
    inits = [fo.tensor("w1", w1), fo.tensor("w2", w2)]
    if bias:
        inits += [fo.tensor("b1", b1), fo.tensor("b2", b2)]
    return fo.model(
        nodes,
        inputs=[fo.value_info("x", ["batch", c, h, w])],
        outputs=outputs,
        initializers=inits,
    )


class TestSeFusionPass:
    def test_pass_splices_the_chain(self):
        from birda_tpu.onnx.fuse import FUSED_SE_OP, fuse_se
        from birda_tpu.onnx.proto import load_model

        model = load_model(_se_graph())
        assert fuse_se(model.graph) == 1
        ops = [n.op_type for n in model.graph.nodes]
        assert ops == [FUSED_SE_OP]
        node = model.graph.nodes[0]
        assert node.inputs == ["x", "w1", "b1", "w2", "b2"]
        assert node.outputs == ["y"]

    def test_biasless_convs_fuse_with_empty_inputs(self):
        from birda_tpu.onnx.fuse import FUSED_SE_OP, fuse_se
        from birda_tpu.onnx.proto import load_model

        model = load_model(_se_graph(bias=False))
        assert fuse_se(model.graph) == 1
        node = next(n for n in model.graph.nodes
                    if n.op_type == FUSED_SE_OP)
        assert node.inputs == ["x", "w1", "", "w2", ""]

    def test_reducemean_spelling_fuses(self):
        """tf2onnx spells the squeeze pool as ReduceMean([2,3], keepdims);
        the matcher accepts it alongside GlobalAveragePool."""
        from birda_tpu.onnx.fuse import FUSED_SE_OP, fuse_se
        from birda_tpu.onnx.proto import load_model

        model = load_model(_se_graph(pool_spelling="reducemean"))
        assert fuse_se(model.graph) == 1
        assert any(n.op_type == FUSED_SE_OP for n in model.graph.nodes)

    def test_non_swish_or_shared_tensors_left_alone(self):
        from birda_tpu.onnx.fuse import fuse_se
        from birda_tpu.onnx.proto import load_model

        m1 = load_model(_se_graph(swish=False))
        assert fuse_se(m1.graph) == 0
        m2 = load_model(_se_graph(extra_consumer=True))
        assert fuse_se(m2.graph) == 0

    def test_tiny_v24_fuses_every_se_block(self):
        from birda_tpu.onnx import fullscale as fs
        from birda_tpu.onnx.fuse import (FUSED_SE_OP, FUSED_SE_PROJECT_OP,
                                         fuse_se)
        from birda_tpu.onnx.proto import load_model

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        model = load_model(g.model_bytes)
        # v2.4-tiny: 7 stages x 1 repeat, all plain MBConv -> 7 SE chains,
        # each gated output sole-consumed by the block's project conv,
        # each project followed by a BN (absorbed, folded to scale/shift)
        # and — for the stride-1 same-width block — a residual Add.
        fused = fuse_se(model.graph)
        assert fused == 7
        assert sum(n.op_type == FUSED_SE_PROJECT_OP
                   for n in model.graph.nodes) == fused
        # Only the head's global pool survives; every SE pool is fused.
        assert sum(n.op_type == "GlobalAveragePool"
                   for n in model.graph.nodes) == 1
        sep = [n for n in model.graph.nodes
               if n.op_type == FUSED_SE_PROJECT_OP]
        assert all(n.inputs[7] and n.inputs[8] for n in sep)  # BN folded
        assert sum(bool(n.inputs[9]) for n in sep) == 1  # one residual
        # No orphaned initializers (raw BN stats dropped after the fold).
        used = {i for n in model.graph.nodes for i in n.inputs}
        for name in model.graph.initializers:
            assert name in used, f"orphaned initializer {name}"

        # With absorption disabled the project convs stay separate.
        m2 = load_model(g.model_bytes)
        n2 = len(m2.graph.nodes)
        assert fuse_se(m2.graph, absorb_project=False) == 7
        assert len(m2.graph.nodes) == n2 - 6 * 7
        assert sum(n.op_type == FUSED_SE_OP
                   for n in m2.graph.nodes) == 7

    def test_shared_bn_gamma_fold_stays_per_chain(self):
        """Exporter dedup can merge identical BN gamma tensors across
        blocks into ONE initializer. The folded scale/shift names derive
        from that shared input — they must be uniquified per chain, or
        the second fold silently overwrites the first's."""
        import fixtures_onnx as fo
        from birda_tpu.onnx.fuse import FUSED_SE_PROJECT_OP, fuse_se
        from birda_tpu.onnx.lowering import OnnxFunction, lower
        from birda_tpu.onnx.proto import load_model

        rng = np.random.default_rng(31)
        c, c_se, h, w = 8, 4, 4, 8
        nodes, inits = [], []
        gamma = np.full(c, 1.5, np.float32)  # deduplicated: shared by name
        inits.append(fo.tensor("gamma", gamma))
        t = "x"
        for i in (1, 2):
            w1 = rng.normal(0, 0.3, (c_se, c, 1, 1)).astype(np.float32)
            w2 = rng.normal(0, 0.3, (c, c_se, 1, 1)).astype(np.float32)
            wp = rng.normal(0, 0.3, (c, c, 1, 1)).astype(np.float32)
            beta = rng.normal(0, 0.1, c).astype(np.float32)
            mean = rng.normal(0, 0.5, c).astype(np.float32)
            var = rng.uniform(0.5, 2.0, c).astype(np.float32)
            inits += [fo.tensor(f"w1_{i}", w1), fo.tensor(f"w2_{i}", w2),
                      fo.tensor(f"wp_{i}", wp), fo.tensor(f"beta_{i}", beta),
                      fo.tensor(f"mean_{i}", mean), fo.tensor(f"var_{i}", var)]
            nodes += [
                fo.node("GlobalAveragePool", [t], [f"s{i}"]),
                fo.node("Conv", [f"s{i}", f"w1_{i}"], [f"r{i}"]),
                fo.node("Sigmoid", [f"r{i}"], [f"rs{i}"]),
                fo.node("Mul", [f"r{i}", f"rs{i}"], [f"r2{i}"]),
                fo.node("Conv", [f"r2{i}", f"w2_{i}"], [f"g0{i}"]),
                fo.node("Sigmoid", [f"g0{i}"], [f"g{i}"]),
                fo.node("Mul", [t, f"g{i}"], [f"gm{i}"]),
                fo.node("Conv", [f"gm{i}", f"wp_{i}"], [f"p{i}"]),
                fo.node("BatchNormalization",
                        [f"p{i}", "gamma", f"beta_{i}", f"mean_{i}",
                         f"var_{i}"], [f"o{i}"]),
            ]
            t = f"o{i}"
        mb = fo.model(
            nodes,
            inputs=[fo.value_info("x", ["batch", c, h, w])],
            outputs=[fo.value_info(t, ["batch", c, h, w])],
            initializers=inits,
        )
        x = rng.normal(0, 0.5, (2, c, h, w)).astype(np.float32)
        plain = lower(mb)
        want = np.asarray(plain(x, params=plain.params), np.float32)

        model = load_model(mb)
        assert fuse_se(model.graph) == 2
        fused = [n for n in model.graph.nodes
                 if n.op_type == FUSED_SE_PROJECT_OP]
        assert len(fused) == 2
        # Distinct folded scale/shift initializers per chain.
        assert fused[0].inputs[7] != fused[1].inputs[7]
        assert fused[0].inputs[8] != fused[1].inputs[8]
        fn = OnnxFunction(model)
        got = np.asarray(fn(x, params=fn.params), np.float32)
        assert np.max(np.abs(got - want)) < 0.02  # bf16 slab drift only

    def test_initializer_listed_in_graph_inputs_survives(self):
        """IR-3-style exports list initializers in graph.inputs; deleting
        one during chain cleanup turns it into a required runtime input
        and every call fails with 'missing graph inputs'."""
        from birda_tpu.onnx.fuse import fuse_se
        from birda_tpu.onnx.lowering import OnnxFunction
        from birda_tpu.onnx.proto import load_model

        import fixtures_onnx as fo

        # The ReduceMean pool spelling with its axes as an initializer
        # that ALSO appears in graph.inputs (chain-only consumer).
        rng = np.random.default_rng(32)
        c, c_se, h, w = 8, 4, 4, 8
        w1 = rng.normal(0, 0.3, (c_se, c, 1, 1)).astype(np.float32)
        w2 = rng.normal(0, 0.3, (c, c_se, 1, 1)).astype(np.float32)
        mb = fo.model(
            [
                fo.node("ReduceMean", ["x", "axes"], ["s"],
                        attrs=[fo.attr_int("keepdims", 1)]),
                fo.node("Conv", ["s", "w1"], ["r"]),
                fo.node("Sigmoid", ["r"], ["rs"]),
                fo.node("Mul", ["r", "rs"], ["r2"]),
                fo.node("Conv", ["r2", "w2"], ["g0"]),
                fo.node("Sigmoid", ["g0"], ["g"]),
                fo.node("Mul", ["x", "g"], ["y"]),
            ],
            inputs=[fo.value_info("x", ["batch", c, h, w]),
                    fo.value_info("axes", [2], elem_type=7)],
            outputs=[fo.value_info("y", ["batch", c, h, w])],
            initializers=[fo.tensor("w1", w1), fo.tensor("w2", w2),
                          fo.tensor("axes", np.array([2, 3], np.int64))],
        )
        model = load_model(mb)
        assert fuse_se(model.graph) == 1
        assert "axes" in model.graph.initializers  # survived the cleanup
        fn = OnnxFunction(model)
        x = rng.normal(0, 0.5, (2, c, h, w)).astype(np.float32)
        out = np.asarray(fn(x, params=fn.params), np.float32)
        assert out.shape == (2, c, h, w)

    def test_fused_scores_match_unfused(self, monkeypatch):
        """End to end on the tiny full-scale graph: scores through the
        fused SE (Pallas where geometry allows, composed fallback
        elsewhere) match the bit-faithful fp32 node-by-node path within
        the documented bf16 budget."""
        from birda_tpu.onnx import fullscale as fs
        from birda_tpu.onnx.lowering import lower

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        rng = np.random.default_rng(3)
        x = rng.normal(0, 0.1, (2, g.spec.sample_count)).astype(np.float32)

        monkeypatch.setenv("BIRDA_STFT_KERNEL", "gather")
        monkeypatch.setenv("BIRDA_SE_KERNEL", "off")
        fn = lower(g.model_bytes, compute_dtype=None)
        assert not any(n.op_type == "BirdaFusedSE" for n in fn.graph.nodes)
        want = np.asarray(fn(x, params=fn.params)[0], np.float32)

        monkeypatch.setenv("BIRDA_STFT_KERNEL", "pallas")
        monkeypatch.setenv("BIRDA_SE_KERNEL", "pallas-se")
        fn2 = lower(g.model_bytes, compute_dtype=jnp.bfloat16)
        assert any(n.op_type == "BirdaFusedSE" for n in fn2.graph.nodes)
        got = np.asarray(fn2(x, params=fn2.params)[0], np.float32)
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) < 0.05
        assert np.array_equal(np.argmax(got, -1), np.argmax(want, -1))

    def test_fused_se_project_kernel_matches_reference(self):
        from birda_tpu.ops.se import fused_se_project, geometry_ok_project

        rng = np.random.default_rng(5)
        b, c, h, w, c_se, o = 2, 96, 8, 16, 4, 24
        x = rng.normal(0, 1, (b, c, h, w)).astype(np.float32)
        w1 = rng.normal(0, 0.3, (c_se, c)).astype(np.float32)
        b1 = rng.normal(0, 0.1, c_se).astype(np.float32)
        w2 = rng.normal(0, 0.3, (c, c_se)).astype(np.float32)
        b2 = rng.normal(0, 0.1, c).astype(np.float32)
        wp = rng.normal(0, 0.2, (o, c)).astype(np.float32)
        bp = rng.normal(0, 0.1, o).astype(np.float32)
        assert geometry_ok_project(x.shape, o)
        got = np.asarray(
            fused_se_project(x, w1, b1, w2, b2, wp, bp, interpret=True),
            np.float32)
        gated = _reference_se(x, w1, b1, w2, b2).astype(np.float64)
        want = (np.einsum("bchw,oc->bohw", gated, wp.astype(np.float64))
                + bp[None, :, None, None]).astype(np.float32)
        assert got.shape == want.shape
        assert np.abs(got - want).max() / np.abs(want).max() < 2e-2

        # With the folded BN affine and the residual absorbed too.
        bn_s = rng.uniform(0.8, 1.2, o).astype(np.float32)
        bn_t = rng.normal(0, 0.1, o).astype(np.float32)
        x_res = rng.normal(0, 1, (b, o, h, w)).astype(np.float32)
        got2 = np.asarray(
            fused_se_project(x, w1, b1, w2, b2, wp, bp, bn_scale=bn_s,
                             bn_shift=bn_t, x_res=x_res, interpret=True),
            np.float32)
        want2 = (want.astype(np.float64) * bn_s[None, :, None, None]
                 + bn_t[None, :, None, None] + x_res).astype(np.float32)
        assert np.abs(got2 - want2).max() / np.abs(want2).max() < 2e-2

    def test_se_mode_env_keeps_project_separate(self, monkeypatch):
        """BIRDA_SE_KERNEL=se lowers with the gate fused but the project
        conv left to XLA — the A/B isolation mode."""
        from birda_tpu.onnx import fullscale as fs
        from birda_tpu.onnx.lowering import lower

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        monkeypatch.setenv("BIRDA_STFT_KERNEL", "pallas")
        monkeypatch.setenv("BIRDA_SE_KERNEL", "pallas-se")
        fn = lower(g.model_bytes, compute_dtype=jnp.bfloat16)
        ops = [n.op_type for n in fn.graph.nodes]
        assert "BirdaFusedSE" in ops
        assert "BirdaFusedSEProject" not in ops

    def test_project_scores_match_unfused(self, monkeypatch):
        """End to end with project absorption (kernel where geometry
        allows, composed fallback elsewhere) vs the fp32 path."""
        from birda_tpu.onnx import fullscale as fs
        from birda_tpu.onnx.lowering import lower

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        rng = np.random.default_rng(7)
        x = rng.normal(0, 0.1, (2, g.spec.sample_count)).astype(np.float32)

        monkeypatch.setenv("BIRDA_STFT_KERNEL", "gather")
        monkeypatch.setenv("BIRDA_SE_KERNEL", "off")
        fn = lower(g.model_bytes, compute_dtype=None)
        want = np.asarray(fn(x, params=fn.params)[0], np.float32)

        monkeypatch.setenv("BIRDA_STFT_KERNEL", "pallas")
        monkeypatch.setenv("BIRDA_SE_KERNEL", "pallas")
        fn2 = lower(g.model_bytes, compute_dtype=jnp.bfloat16)
        assert any(n.op_type == "BirdaFusedSEProject"
                   for n in fn2.graph.nodes)
        got = np.asarray(fn2(x, params=fn2.params)[0], np.float32)
        assert np.max(np.abs(got - want)) < 0.05
        assert np.array_equal(np.argmax(got, -1), np.argmax(want, -1))

    def test_project_vmem_overflow_falls_back(self, monkeypatch):
        """Geometry the project kernel cannot hold falls back to the SE
        handler + einsum with identical semantics."""
        from birda_tpu.onnx import fullscale as fs
        from birda_tpu.onnx.lowering import lower
        from birda_tpu.ops import se as se_ops

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        rng = np.random.default_rng(8)
        x = rng.normal(0, 0.1, (2, g.spec.sample_count)).astype(np.float32)

        monkeypatch.setenv("BIRDA_STFT_KERNEL", "pallas")
        monkeypatch.setenv("BIRDA_SE_KERNEL", "pallas")
        fn = lower(g.model_bytes, compute_dtype=jnp.bfloat16)
        want = np.asarray(fn(x, params=fn.params)[0], np.float32)

        monkeypatch.setattr(se_ops, "geometry_ok_project",
                            lambda *a, **k: False)
        fn2 = lower(g.model_bytes, compute_dtype=jnp.bfloat16)
        got = np.asarray(fn2(x, params=fn2.params)[0], np.float32)
        assert np.max(np.abs(got - want)) < 0.05
        assert np.array_equal(np.argmax(got, -1), np.argmax(want, -1))

    def test_int8_path_stays_unfused(self):
        """--precision int8 keeps the SE chain composed: its boundary
        storage policy (quantize.py) owns those streams."""
        from birda_tpu.onnx import fullscale as fs
        from birda_tpu.onnx.quantize import (calibrate, calibration_signals,
                                             lower_int8)

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        batches = list(calibration_signals(g.spec.sample_count, batch=2,
                                           n_batches=1))
        calib = calibrate(g.model_bytes, batches, min_weight_bytes=256)
        q = lower_int8(g.model_bytes, calib, min_weight_bytes=256)
        assert not any(n.op_type == "BirdaFusedSE" for n in q.graph.nodes)


def _reference_mbconv(x, we, ae, wd, k, ad, w1, b1, w2, b2, wp, ap, x_res):
    """Composed f64 reference for the whole stride-1 block."""
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


class TestMBConvKernel:
    def test_kernel_matches_reference(self):
        from birda_tpu.ops.mbconv import fused_mbconv_s1, geometry_ok

        rng = np.random.default_rng(11)
        B, Cin, H, W = 2, 24, 16, 24
        Cm, k, Cse, O = 144, 5, 6, 24
        x = rng.normal(0, 1, (B, Cin, H, W)).astype(np.float32)
        we = rng.normal(0, 0.2, (Cm, Cin)).astype(np.float32)
        ae = (rng.uniform(0.8, 1.2, Cm).astype(np.float32),
              rng.normal(0, .1, Cm).astype(np.float32))
        wd = rng.normal(0, 0.2, (Cm, k * k)).astype(np.float32)
        ad = (rng.uniform(0.8, 1.2, Cm).astype(np.float32),
              rng.normal(0, .1, Cm).astype(np.float32))
        w1 = rng.normal(0, 0.3, (Cse, Cm)).astype(np.float32)
        b1 = rng.normal(0, .1, Cse).astype(np.float32)
        w2 = rng.normal(0, 0.3, (Cm, Cse)).astype(np.float32)
        b2 = rng.normal(0, .1, Cm).astype(np.float32)
        wp = rng.normal(0, 0.2, (O, Cm)).astype(np.float32)
        ap = (rng.uniform(0.8, 1.2, O).astype(np.float32),
              rng.normal(0, .1, O).astype(np.float32))
        xr = rng.normal(0, 1, (B, O, H, W)).astype(np.float32)
        assert geometry_ok(x.shape, Cm, O, k, True, True)
        got = np.asarray(fused_mbconv_s1(
            x, we, ae[0], ae[1], wd, ad[0], ad[1], w1, b1, w2, b2,
            wp, ap[0], ap[1], x_res=xr, interpret=True), np.float32)
        want = _reference_mbconv(x, we, ae, wd, k, ad, w1, b1, w2, b2,
                                 wp, ap, xr)
        assert got.shape == want.shape
        assert np.abs(got - want).max() / np.abs(want).max() < 2e-2

    def test_no_expand_no_res(self):
        from birda_tpu.ops.mbconv import fused_mbconv_s1

        rng = np.random.default_rng(12)
        B, Cm, H, W, k, Cse, O = 2, 32, 8, 16, 3, 8, 16
        x = rng.normal(0, 1, (B, Cm, H, W)).astype(np.float32)
        wd = rng.normal(0, 0.2, (Cm, k * k)).astype(np.float32)
        ad = (rng.uniform(0.8, 1.2, Cm).astype(np.float32),
              rng.normal(0, .1, Cm).astype(np.float32))
        w1 = rng.normal(0, 0.3, (Cse, Cm)).astype(np.float32)
        b1 = rng.normal(0, .1, Cse).astype(np.float32)
        w2 = rng.normal(0, 0.3, (Cm, Cse)).astype(np.float32)
        b2 = rng.normal(0, .1, Cm).astype(np.float32)
        wp = rng.normal(0, 0.2, (O, Cm)).astype(np.float32)
        ap = (np.ones(O, np.float32), np.zeros(O, np.float32))
        got = np.asarray(fused_mbconv_s1(
            x, None, np.ones(1, np.float32), np.zeros(1, np.float32),
            wd, ad[0], ad[1], w1, b1, w2, b2, wp, ap[0], ap[1],
            interpret=True), np.float32)
        want = _reference_mbconv(x, None, None, wd, k, ad, w1, b1, w2,
                                 b2, wp, ap, None)
        assert np.abs(got - want).max() / np.abs(want).max() < 2e-2

    def test_geometry_and_env_gating(self, monkeypatch):
        from birda_tpu.ops import mbconv

        assert mbconv.geometry_ok((4, 24, 128, 48), 144, 24, 3, True, True)
        assert not mbconv.geometry_ok((4, 24, 128, 48), 144, 24, 4,
                                      True, True)   # even k
        assert not mbconv.geometry_ok((4, 24, 4, 3), 20, 24, 3,
                                      True, False)  # Cm % 8
        monkeypatch.delenv("BIRDA_MBCONV_KERNEL", raising=False)
        assert not mbconv.kernel_enabled(jnp.bfloat16)  # CPU auto: off
        monkeypatch.setenv("BIRDA_MBCONV_KERNEL", "pallas")
        assert mbconv.kernel_enabled(jnp.bfloat16)
        assert not mbconv.kernel_enabled(None)
        monkeypatch.setenv("BIRDA_MBCONV_KERNEL", "off")
        assert not mbconv.kernel_enabled(jnp.bfloat16)


def _mbconv_ratio1_graph(expose_swish=False):
    """Expand-ratio-1 MBConv block: depthwise 3x3 SAME -> swish -> SE ->
    1x1 project. With ``expose_swish`` the depthwise-swish activation is
    also a graph output (exporters expose intermediate taps this way)."""
    import fixtures_onnx as fo

    rng = np.random.default_rng(21)
    c, c_se, h, w = 16, 4, 8, 16
    wd = rng.normal(0, 0.3, (c, 1, 3, 3)).astype(np.float32)
    w1 = rng.normal(0, 0.3, (c_se, c, 1, 1)).astype(np.float32)
    b1 = rng.normal(0, 0.1, c_se).astype(np.float32)
    w2 = rng.normal(0, 0.3, (c, c_se, 1, 1)).astype(np.float32)
    b2 = rng.normal(0, 0.1, c).astype(np.float32)
    wp = rng.normal(0, 0.3, (c, c, 1, 1)).astype(np.float32)
    nodes = [
        fo.node("Conv", ["x0", "wd"], ["d"], attrs=[
            fo.attr_int("group", c),
            fo.attr_ints("pads", [1, 1, 1, 1]),
            fo.attr_ints("kernel_shape", [3, 3]),
        ]),
        fo.node("Sigmoid", ["d"], ["ds"]),
        fo.node("Mul", ["d", "ds"], ["xm"]),
        fo.node("GlobalAveragePool", ["xm"], ["s"]),
        fo.node("Conv", ["s", "w1", "b1"], ["r"]),
        fo.node("Sigmoid", ["r"], ["rs"]),
        fo.node("Mul", ["r", "rs"], ["r2"]),
        fo.node("Conv", ["r2", "w2", "b2"], ["g0"]),
        fo.node("Sigmoid", ["g0"], ["g"]),
        fo.node("Mul", ["xm", "g"], ["gm"]),
        fo.node("Conv", ["gm", "wp"], ["y"]),
    ]
    outputs = [fo.value_info("y", ["batch", c, h, w])]
    if expose_swish:
        outputs.append(fo.value_info("xm", ["batch", c, h, w]))
    return fo.model(
        nodes,
        inputs=[fo.value_info("x0", ["batch", c, h, w])],
        outputs=outputs,
        initializers=[fo.tensor("wd", wd), fo.tensor("w1", w1),
                      fo.tensor("b1", b1), fo.tensor("w2", w2),
                      fo.tensor("b2", b2), fo.tensor("wp", wp)],
    )


class TestMBConvFusionPass:
    def test_exposed_swish_output_blocks_block_fusion(self):
        """When the depthwise-swish tap is itself a graph output, the
        whole-block fusion must not match — splicing would delete the
        Mul that produces it, orphaning the output. The SE+project
        fusion (which keeps the tap live as its input) still applies."""
        from birda_tpu.onnx.fuse import (FUSED_MBCONV_OP,
                                         FUSED_SE_PROJECT_OP,
                                         fuse_mbconv_s1, fuse_se)
        from birda_tpu.onnx.lowering import OnnxFunction, lower
        from birda_tpu.onnx.proto import load_model

        mb = _mbconv_ratio1_graph(expose_swish=True)
        rng = np.random.default_rng(22)
        x = rng.normal(0, 0.5, (2, 16, 8, 16)).astype(np.float32)
        plain = lower(mb)
        want_y, want_xm = (np.asarray(v, np.float32)
                           for v in plain(x, params=plain.params))

        model = load_model(mb)
        assert fuse_mbconv_s1(model.graph) == 0
        assert not any(n.op_type == FUSED_MBCONV_OP
                       for n in model.graph.nodes)
        # The SE chain itself is still safely fusable (xm stays an input).
        assert fuse_se(model.graph) == 1
        assert any(n.op_type == FUSED_SE_PROJECT_OP
                   for n in model.graph.nodes)
        fn = OnnxFunction(model)
        got_y, got_xm = (np.asarray(v, np.float32)
                         for v in fn(x, params=fn.params))
        np.testing.assert_allclose(got_xm, want_xm, atol=1e-6)
        # The composed SE-project path runs its slabs at the kernel's
        # production dtype (bf16), so the budget is bf16 drift.
        assert np.max(np.abs(got_y - want_y)) < 0.01

        # Control: the same block without the exposed tap fuses whole.
        m2 = load_model(_mbconv_ratio1_graph(expose_swish=False))
        assert fuse_mbconv_s1(m2.graph) == 1

    def test_tiny_v24_block_split(self):
        """Tiny v2.4: stages 1/5/7 are stride-1 (whole-block fusable,
        stage 1 with residual and no expand), stages 2/3/4/6 are
        stride-2 (SE+project only)."""
        from birda_tpu.onnx import fullscale as fs
        from birda_tpu.onnx.fuse import (FUSED_MBCONV_OP,
                                         FUSED_SE_PROJECT_OP,
                                         fuse_mbconv_s1, fuse_se)
        from birda_tpu.onnx.proto import load_model

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        model = load_model(g.model_bytes)
        n_mega = fuse_mbconv_s1(model.graph)
        assert n_mega == 3
        n_se = fuse_se(model.graph)
        assert n_se == 4
        mega = [n for n in model.graph.nodes
                if n.op_type == FUSED_MBCONV_OP]
        assert len(mega) == 3
        assert sum(n.op_type == FUSED_SE_PROJECT_OP
                   for n in model.graph.nodes) == 4
        # stage 1: no expand (ratio 1), residual present.
        assert mega[0].inputs[1] == ""
        assert mega[0].inputs[14] != ""
        # stage 5/7: expanded, no residual.
        assert mega[1].inputs[1] != "" and mega[1].inputs[14] == ""
        # No orphaned initializers (absorbed convs/BNs dropped).
        used = {i for n in model.graph.nodes for i in n.inputs}
        for name in model.graph.initializers:
            assert name in used, f"orphaned initializer {name}"

    def test_tiny_v30_only_mbconv_stages_match(self):
        """v3.0's fused-MBConv early stages (no SE, no depthwise) must
        not match; its late MBConv stages split by stride like v2.4."""
        from birda_tpu.onnx import fullscale as fs
        from birda_tpu.onnx.fuse import fuse_mbconv_s1, fuse_se
        from birda_tpu.onnx.proto import load_model

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V30_SPEC), seed=1)
        model = load_model(g.model_bytes)
        # v3.0-tiny: stages 4-7 are MBConv (w/ SE); strides [2,1,2,1]
        # -> stages 5 and 7 fuse whole, stages 4 and 6 keep SE+project.
        assert fuse_mbconv_s1(model.graph) == 2
        assert fuse_se(model.graph) == 2

    def test_e2e_scores_match_fp32(self, monkeypatch):
        from birda_tpu.onnx import fullscale as fs
        from birda_tpu.onnx.lowering import lower

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        rng = np.random.default_rng(13)
        x = rng.normal(0, 0.1, (2, g.spec.sample_count)).astype(np.float32)

        monkeypatch.setenv("BIRDA_STFT_KERNEL", "gather")
        monkeypatch.setenv("BIRDA_SE_KERNEL", "off")
        monkeypatch.setenv("BIRDA_MBCONV_KERNEL", "off")
        fn = lower(g.model_bytes, compute_dtype=None)
        want = np.asarray(fn(x, params=fn.params)[0], np.float32)

        monkeypatch.setenv("BIRDA_STFT_KERNEL", "pallas")
        monkeypatch.setenv("BIRDA_SE_KERNEL", "pallas")
        monkeypatch.setenv("BIRDA_MBCONV_KERNEL", "pallas")
        fn2 = lower(g.model_bytes, compute_dtype=jnp.bfloat16)
        ops = [n.op_type for n in fn2.graph.nodes]
        assert "BirdaFusedMBConvS1" in ops
        got = np.asarray(fn2(x, params=fn2.params)[0], np.float32)
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) < 0.05
        assert np.array_equal(np.argmax(got, -1), np.argmax(want, -1))

    def test_vmem_overflow_falls_back(self, monkeypatch):
        from birda_tpu.onnx import fullscale as fs
        from birda_tpu.onnx.lowering import lower
        from birda_tpu.ops import mbconv as mb_ops

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        rng = np.random.default_rng(14)
        x = rng.normal(0, 0.1, (2, g.spec.sample_count)).astype(np.float32)

        monkeypatch.setenv("BIRDA_STFT_KERNEL", "pallas")
        monkeypatch.setenv("BIRDA_SE_KERNEL", "off")
        monkeypatch.setenv("BIRDA_MBCONV_KERNEL", "pallas")
        fn = lower(g.model_bytes, compute_dtype=jnp.bfloat16)
        want = np.asarray(fn(x, params=fn.params)[0], np.float32)

        monkeypatch.setattr(mb_ops, "geometry_ok", lambda *a, **k: False)
        fn2 = lower(g.model_bytes, compute_dtype=jnp.bfloat16)
        got = np.asarray(fn2(x, params=fn2.params)[0], np.float32)
        assert np.max(np.abs(got - want)) < 0.05
        assert np.array_equal(np.argmax(got, -1), np.argmax(want, -1))

    def test_int8_path_stays_unfused(self):
        """--precision int8 keeps every block composed: its boundary
        storage policy (quantize.py) owns those streams."""
        from birda_tpu.onnx import fullscale as fs
        from birda_tpu.onnx.quantize import (calibrate, calibration_signals,
                                             lower_int8)

        g = fs.cached_build(fs.tiny_spec(fs.BIRDNET_V24_SPEC), seed=1)
        batches = list(calibration_signals(g.spec.sample_count, batch=2,
                                           n_batches=1))
        calib = calibrate(g.model_bytes, batches, min_weight_bytes=256)
        q = lower_int8(g.model_bytes, calib, min_weight_bytes=256)
        assert not any(n.op_type.startswith("BirdaFusedSE")
                       or n.op_type == "BirdaFusedMBConvS1"
                       for n in q.graph.nodes)

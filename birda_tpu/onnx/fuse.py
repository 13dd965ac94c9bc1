"""Graph-level fusion passes (the TensorRT layer-fusion analogue).

The shipped BirdNET graphs spell their spectrogram front-end as a chain of
ONNX nodes (reference manifests ``graph.notes``; synthesized at real scale
in :mod:`.fullscale`):

    Conv1d(stft_w, stride=hop)            # [B, 2*bins, T] windowed DFT
    -> Slice(re) / Slice(im)              # cos / sin banks
       (or the exporter spelling: one Split(axis=1) into equal halves)
    -> Mul, Mul, Add                      # power spectrum
       (squares also match the Pow(x, 2) spelling)
    -> Transpose(0,2,1)                   # [B, T, bins]
    -> MatMul(mel_fb) [x n banks]         # mel projection(s)
    -> Concat(axis=2)                     # when several banks
    -> Add(eps) -> Log                    # log compression

Executed node by node, the ``[B, 2*bins, T]`` spectrum is written to HBM
and re-read by the power ops and every mel bank — ~1.6 GB of traffic per
batch-256 inference for v2.4. :func:`fuse_mel_frontend` pattern-matches
the chain (conservatively: initializer-backed weights, chain-internal
tensors single-consumed and not graph outputs, exact re/im slice split)
and splices in a single ``BirdaFusedMelFrontend`` node that the evaluator
lowers to one Pallas kernel (``ops/stft_conv.py::fused_logmel``) emitting
the ~50 MB log-mel image directly.

Anything that does not match is left untouched — the pass is a pure
optimization with the node-by-node path as its semantics reference.
"""

from __future__ import annotations

import numpy as np

from .proto import Attribute, Graph, Node, Tensor, constant_payload

FUSED_OP = "BirdaFusedMelFrontend"
FUSED_SE_OP = "BirdaFusedSE"
FUSED_SE_PROJECT_OP = "BirdaFusedSEProject"
FUSED_MBCONV_OP = "BirdaFusedMBConvS1"


def fold_constant_nodes(graph: Graph) -> int:
    """Convert foldable ``Constant`` nodes into initializers (and drop the
    nodes) so the matchers see one spelling. Real exporters emit scalars —
    the eps of the Log chain, Slice starts/ends, Split sizes — as Constant
    *nodes*; every matcher here reads ``graph.initializers``, so without
    this pass a producer-shaped export silently falls back to node-by-node
    execution. Semantics-preserving: the evaluator folds Constant nodes
    into its constant pool the same way (``lowering._constant_payload``).
    Constants that are graph outputs, shadow an existing initializer, or
    use unfoldable spellings (sparse, strings) keep their node."""
    out_names = {vi.name for vi in graph.outputs}
    kept, n = [], 0
    for node in graph.nodes:
        if node.op_type == "Constant" and node.outputs and \
                node.outputs[0] not in out_names and \
                node.outputs[0] not in graph.initializers:
            v = constant_payload(node)
            if v is not None:
                a = np.asarray(v)
                graph.initializers[node.outputs[0]] = Tensor(
                    name=node.outputs[0], dims=tuple(a.shape), array=a)
                n += 1
                continue
        kept.append(node)
    if n:
        graph.nodes = kept
    return n


def _build_consumers(graph: Graph):
    """``(consumers, out_names, sole_consumer)`` over the current node
    list. Maps go stale after any splice — rebuild before re-matching."""
    consumers: dict[str, list[Node]] = {}
    for n in graph.nodes:
        for inp in n.inputs:
            # Dedupe: Mul(x, x) is ONE consumer of x, not two.
            if inp and (inp not in consumers
                        or consumers[inp][-1] is not n):
                consumers.setdefault(inp, []).append(n)
    out_names = {vi.name for vi in graph.outputs}

    def sole_consumer(tensor: str, op_type: str | None = None):
        """The unique consumer of ``tensor`` (None if shared or an
        output); optionally requiring its op type."""
        if tensor in out_names:
            return None
        cons = consumers.get(tensor, [])
        if len(cons) != 1:
            return None
        if op_type is not None and cons[0].op_type != op_type:
            return None
        return cons[0]

    return consumers, out_names, sole_consumer


def _fresh_init_name(graph: Graph, base: str) -> str:
    """``base``, uniquified against the existing initializers. Exporter
    dedup passes can make two fused chains share a parameter initializer
    (e.g. identical BN gammas merged to one tensor); deriving the folded
    names from that shared input alone would cross-wire the chains'
    folds."""
    name, n = base, 1
    while name in graph.initializers:
        n += 1
        name = f"{base}_{n}"
    return name


def _iter_nodes_recursive(graph: Graph):
    """Every node in ``graph`` including If/Loop/Scan body subgraphs
    (whose nodes close over outer-scope tensors by name)."""
    stack = list(graph.nodes)
    while stack:
        n = stack.pop()
        yield n
        for a in n.attrs.values():
            if a.g is not None:
                stack.extend(a.g.nodes)


def _drop_dead_inits(graph: Graph, chain) -> None:
    """Delete initializers the spliced-out ``chain`` alone consumed.
    "Still used" must count subgraph-body references and the graph's
    declared inputs: IR-3 exports list initializers in ``graph.inputs``,
    and deleting one would turn it into a required runtime input."""
    chain_inits = {
        i for n in chain for i in n.inputs if i in graph.initializers
    }
    still_used = {i for n in _iter_nodes_recursive(graph) for i in n.inputs}
    still_used.update(vi.name for vi in graph.outputs)
    still_used.update(vi.name for vi in graph.inputs)
    for name in chain_inits - still_used:
        del graph.initializers[name]


def _attr_i(name: str, v: int) -> Attribute:
    return Attribute(name=name, i=int(v))


def _attr_f(name: str, v: float) -> Attribute:
    return Attribute(name=name, f=float(v))


def _attr_s(name: str, v: str) -> Attribute:
    return Attribute(name=name, s=v.encode())


def _slice_params(graph: Graph, node: Node):
    """(starts, ends, axes) for a Slice node from attrs or initializer
    inputs; None when dynamic (non-initializer) inputs are used."""
    if len(node.inputs) == 1:
        st, en, ax = (node.attr("starts"), node.attr("ends"),
                      node.attr("axes"))
        if st is None or en is None:
            return None
        return list(st), list(en), (list(ax) if ax is not None else None)
    vals = []
    for name in node.inputs[1:4]:
        if not name:
            vals.append(None)
            continue
        t = graph.initializers.get(name)
        if t is None or t.array is None:
            return None
        vals.append([int(v) for v in np.asarray(t.array).reshape(-1)])
    while len(vals) < 3:
        vals.append(None)
    if len(node.inputs) > 4 and node.inputs[4]:
        t = graph.initializers.get(node.inputs[4])
        if t is None or t.array is None:
            return None
        if any(int(v) != 1 for v in np.asarray(t.array).reshape(-1)):
            return None  # strided slices never match the re/im split
    st, en, ax = vals
    if st is None or en is None:
        return None
    return st, en, ax


def _scalar_init(graph: Graph, name: str):
    t = graph.initializers.get(name)
    if t is None or t.array is None:
        return None
    a = np.asarray(t.array)
    if a.size != 1:
        return None
    return float(a.reshape(()))


def fuse_mel_frontend(graph: Graph) -> int:
    """Splice matching spectrogram-front-end→…→Log chains in place;
    returns the number of chains fused (0 = graph untouched). Two chain
    spellings match: the Conv1d-STFT form (the v3.0 manifest chain,
    :func:`_match_chain`) and the opset-17 ``STFT``-op form a TF export
    traces (:func:`_match_chain_stft`)."""
    fold_constant_nodes(graph)
    consumers, out_names, sole_consumer = _build_consumers(graph)
    fused = 0
    for anchor in list(graph.nodes):
        match = _match_chain(graph, anchor, consumers, out_names,
                             sole_consumer)
        if match is None:
            match = _match_chain_stft(graph, anchor, consumers, out_names,
                                      sole_consumer)
        if match is None:
            continue
        _apply(graph, match)
        fused += 1
        # Maps are stale after a splice; one chain per graph in practice.
        break
    return fused


def _square_of(graph, sole_consumer, tensor: str):
    """The node squaring ``tensor`` — ``Mul(x, x)`` or the exporter
    spelling ``Pow(x, 2)``; None when it is anything else."""
    node = sole_consumer(tensor)
    if node is None:
        return None
    if node.op_type == "Mul" and node.inputs == [tensor] * 2:
        return node
    if node.op_type == "Pow" and node.inputs[0] == tensor and \
            _scalar_init(graph, node.inputs[1]) == 2.0:
        return node
    return None


def _match_mel_tail(graph, spec_name: str, bins: int, consumers,
                    out_names, sole_consumer):
    """Mel matmul(s) → [Concat] → Add(eps) → Log off the ``[B, T, bins]``
    power spectrum ``spec_name``. Returns ``(tail_nodes, fb_cat, log,
    eps)`` or None; shared by the Conv1d and STFT-op chain matchers."""
    if spec_name in out_names:
        return None
    mm_nodes = consumers.get(spec_name, [])
    if not mm_nodes or any(n.op_type != "MatMul" for n in mm_nodes):
        return None
    fbs = []
    for mm in mm_nodes:
        if mm.inputs[0] != spec_name:
            return None
        fb = graph.initializers.get(mm.inputs[1])
        if fb is None or fb.array is None or fb.array.ndim != 2 or \
                fb.array.shape[0] != bins:
            return None
        fbs.append((mm, fb.array))
    if len(mm_nodes) == 1:
        mel_out = mm_nodes[0].outputs[0]
        chain_tail = list(mm_nodes)
        fb_cat = fbs[0][1]
    else:
        concat = sole_consumer(mm_nodes[0].outputs[0], "Concat")
        if concat is None or concat.attr("axis") not in (2, -1):
            return None
        # Every matmul off the spectrum must feed this Concat, exactly
        # once — a stray bank (e.g. an auxiliary head's matmul) would
        # otherwise be deleted with the chain, orphaning its consumers.
        if sorted(concat.inputs) != sorted(m.outputs[0] for m in mm_nodes):
            return None
        # Concat input order defines the bank order in the fused matrix.
        order = []
        for inp in concat.inputs:
            mm = next((m for m, _ in fbs if m.outputs[0] == inp), None)
            if mm is None or sole_consumer(inp, "Concat") is not concat:
                return None
            order.append(next(a for m, a in fbs if m is mm))
        mel_out = concat.outputs[0]
        chain_tail = list(mm_nodes) + [concat]
        fb_cat = np.concatenate(order, axis=1)

    eps_add = sole_consumer(mel_out, "Add")
    if eps_add is None:
        return None
    others = [i for i in eps_add.inputs if i != mel_out]
    if len(others) != 1:
        return None
    eps = _scalar_init(graph, others[0])
    if eps is None or not (0.0 < eps < 1.0):
        return None
    log = sole_consumer(eps_add.outputs[0], "Log")
    if log is None:
        return None
    return chain_tail + [eps_add, log], fb_cat, log, eps


def _match_chain(graph, conv, consumers, out_names, sole_consumer):
    if conv.op_type != "Conv" or len(conv.inputs) < 2 or \
            (len(conv.inputs) > 2 and conv.inputs[2]):
        return None  # bias-less single-input conv only
    w = graph.initializers.get(conv.inputs[1])
    if w is None or w.array is None or w.array.ndim != 3 or \
            w.array.shape[1] != 1 or w.array.shape[2] < 256:
        return None
    if w.array.shape[0] % 2:
        return None
    strides = conv.attr("strides")
    dil = conv.attr("dilations")
    pads = conv.attr("pads")
    if not strides or len(strides) != 1:
        return None
    if dil is not None and list(dil) != [1]:
        return None
    if pads is not None and any(int(p) for p in pads):
        return None
    if conv.attr("group", 1) != 1:
        return None
    if conv.attr("auto_pad", b"NOTSET") not in (b"NOTSET", b"VALID"):
        return None
    bins = w.array.shape[0] // 2

    cons = [] if conv.outputs[0] in out_names else \
        consumers.get(conv.outputs[0], [])
    if len(cons) == 2 and all(n.op_type == "Slice" for n in cons):
        re_sl = im_sl = None
        for sl in cons:
            p = _slice_params(graph, sl)
            if p is None:
                return None
            st, en, ax = p
            if ax is not None and list(ax) != [1]:
                return None
            if st == [0] and en == [bins]:
                re_sl = sl
            elif st == [bins] and en[0] >= 2 * bins:
                im_sl = sl
        if re_sl is None or im_sl is None:
            return None
        re_name, im_name = re_sl.outputs[0], im_sl.outputs[0]
        split_nodes = [re_sl, im_sl]
    elif len(cons) == 1 and cons[0].op_type == "Split":
        # Exporter spelling: one Split(axis=1) into equal cos/sin halves
        # instead of two Slices. Which half is cos vs sin is irrelevant —
        # the chain squares and sums both.
        sp = cons[0]
        if sp.attr("axis", 0) != 1 or len(sp.outputs) != 2:
            return None
        sizes = sp.attr("split")
        if sizes is None and len(sp.inputs) > 1 and sp.inputs[1]:
            t = graph.initializers.get(sp.inputs[1])
            if t is None or t.array is None:
                return None
            sizes = [int(v) for v in np.asarray(t.array).reshape(-1)]
        if sizes is not None and list(sizes) != [bins, bins]:
            return None  # absent sizes = equal split of 2*bins = [bins, bins]
        re_name, im_name = sp.outputs
        split_nodes = [sp]
    else:
        return None

    re_mul = _square_of(graph, sole_consumer, re_name)
    im_mul = _square_of(graph, sole_consumer, im_name)
    if re_mul is None or im_mul is None:
        return None
    add = sole_consumer(re_mul.outputs[0], "Add")
    if add is None or add is not sole_consumer(im_mul.outputs[0], "Add"):
        return None
    if set(add.inputs) != {re_mul.outputs[0], im_mul.outputs[0]}:
        return None
    tr = sole_consumer(add.outputs[0], "Transpose")
    if tr is None or list(tr.attr("perm") or []) != [0, 2, 1]:
        return None

    # One or more mel matmuls off the transposed power spectrum.
    tail = _match_mel_tail(graph, tr.outputs[0], bins, consumers,
                           out_names, sole_consumer)
    if tail is None:
        return None
    tail_nodes, fb_cat, log, eps = tail

    chain = [conv, *split_nodes, re_mul, im_mul, add, tr, *tail_nodes]
    return {
        "chain": chain, "anchor": conv, "sig_name": conv.inputs[0],
        "w_name": conv.inputs[1], "log": log, "fb_cat": fb_cat,
        "hop": int(strides[0]), "eps": eps, "bins": bins, "kind": "conv",
    }


def _squeeze_axes(graph, node):
    """The static axes of a Squeeze node (attr or initializer input),
    or None when dynamic/absent."""
    if node.op_type != "Squeeze":
        return None
    ax = node.attr("axes")
    if ax is None and len(node.inputs) > 1 and node.inputs[1]:
        t = graph.initializers.get(node.inputs[1])
        if t is None or t.array is None:
            return None
        ax = np.asarray(t.array).reshape(-1)
    if ax is None:
        return None
    return [int(v) for v in ax]


def _match_chain_stft(graph, stft, consumers, out_names, sole_consumer):
    """The opset-17 ``STFT``-op spelling of the front-end chain — what a
    producer that keeps ``tf.signal.stft`` as the ONNX signal op exports
    (oracled in ``tests/test_tf_oracle.py``):

        STFT(sig, step, win) -> Slice(re)/Slice(im) on the complex axis
        -> Mul/Pow squares -> Add -> Squeeze -> MatMul(mel) [-> Concat]
        -> Add(eps) -> Log

    (squeezing re/im before squaring also matches). The windowed DFT
    becomes the conv-weight form the fused kernel already runs — rows
    ``[win*cos ; -win*sin]`` — synthesized from the window and frame
    length at apply time, so both spellings share one kernel."""
    if stft.op_type != "STFT":
        return None
    if stft.attr("onesided", 1) != 1:
        return None
    ins = list(stft.inputs) + [""] * (4 - len(stft.inputs))
    sig_name, step_name, win_name, flen_name = ins[:4]
    hop = _scalar_init(graph, step_name) if step_name else None
    if hop is None or hop <= 0 or hop != int(hop):
        return None
    hop = int(hop)
    win_t = graph.initializers.get(win_name) if win_name else None
    if win_t is None or win_t.array is None or win_t.array.ndim != 1:
        return None  # window-less (rectangular) STFT: not an export shape
    k = int(win_t.array.shape[0])
    if k < 256:
        return None
    if flen_name:
        fl = _scalar_init(graph, flen_name)
        if fl is None or int(fl) != k:
            return None  # fft_length != window length: zero-padded DFT
    bins = k // 2 + 1

    cons = [] if stft.outputs[0] in out_names else \
        consumers.get(stft.outputs[0], [])
    complex_axes = (3, -1)
    if len(cons) == 2 and all(n.op_type == "Slice" for n in cons):
        re_name = im_name = None
        for sl in cons:
            p = _slice_params(graph, sl)
            if p is None:
                return None
            st, en, ax = p
            if ax is None or len(ax) != 1 or int(ax[0]) not in complex_axes:
                return None
            if st == [0] and en == [1]:
                re_name = sl.outputs[0]
            elif st == [1] and en[0] >= 2:
                im_name = sl.outputs[0]
        if re_name is None or im_name is None:
            return None
        split_nodes = list(cons)
    elif len(cons) == 1 and cons[0].op_type == "Split":
        sp = cons[0]
        if sp.attr("axis", 0) not in complex_axes or len(sp.outputs) != 2:
            return None
        sizes = sp.attr("split")
        if sizes is None and len(sp.inputs) > 1 and sp.inputs[1]:
            t = graph.initializers.get(sp.inputs[1])
            if t is None or t.array is None:
                return None
            sizes = [int(v) for v in np.asarray(t.array).reshape(-1)]
        if sizes is not None and list(sizes) != [1, 1]:
            return None
        re_name, im_name = sp.outputs
        split_nodes = [sp]
    else:
        return None

    # Optional per-component Squeeze of the complex axis before squaring.
    squeeze_nodes = []
    sq_re = sole_consumer(re_name, "Squeeze")
    sq_im = sole_consumer(im_name, "Squeeze")
    pre_squeezed = False
    if sq_re is not None and sq_im is not None:
        ax_re, ax_im = _squeeze_axes(graph, sq_re), _squeeze_axes(graph,
                                                                  sq_im)
        if ax_re is not None and ax_im is not None and \
                len(ax_re) == 1 and ax_re[0] in complex_axes and \
                len(ax_im) == 1 and ax_im[0] in complex_axes:
            re_name, im_name = sq_re.outputs[0], sq_im.outputs[0]
            squeeze_nodes = [sq_re, sq_im]
            pre_squeezed = True

    re_mul = _square_of(graph, sole_consumer, re_name)
    im_mul = _square_of(graph, sole_consumer, im_name)
    if re_mul is None or im_mul is None:
        return None
    add = sole_consumer(re_mul.outputs[0], "Add")
    if add is None or add is not sole_consumer(im_mul.outputs[0], "Add"):
        return None
    if set(add.inputs) != {re_mul.outputs[0], im_mul.outputs[0]}:
        return None

    if pre_squeezed:
        pow_name = add.outputs[0]
    else:
        sq = sole_consumer(add.outputs[0], "Squeeze")
        if sq is None:
            return None
        ax = _squeeze_axes(graph, sq)
        if ax is None or len(ax) != 1 or ax[0] not in complex_axes:
            return None
        squeeze_nodes = [sq]
        pow_name = sq.outputs[0]

    tail = _match_mel_tail(graph, pow_name, bins, consumers, out_names,
                           sole_consumer)
    if tail is None:
        return None
    tail_nodes, fb_cat, log, eps = tail

    chain = [stft, *split_nodes, re_mul, im_mul, add, *squeeze_nodes,
             *tail_nodes]
    return {
        "chain": chain, "anchor": stft, "sig_name": sig_name,
        "win": np.asarray(win_t.array, np.float64), "log": log,
        "fb_cat": fb_cat, "hop": hop, "eps": eps, "bins": bins,
        "frame": k, "kind": "stft",
    }


def fuse_se(graph: Graph, absorb_project: bool = True) -> int:
    """Splice every squeeze-and-excitation gate chain

        GlobalAveragePool -> Conv(1x1) -> Mul(.,Sigmoid(.)) [swish]
        -> Conv(1x1) -> Sigmoid -> Mul(x, .)

    into one ``BirdaFusedSE`` node (lowered to the VMEM-resident Pallas
    kernel in ``ops/se.py`` when geometry allows; composed ops otherwise).
    With ``absorb_project`` (the default) a chain whose gated output is
    sole-consumed by the MBConv block's 1x1 project conv is spliced as
    ``BirdaFusedSEProject`` instead — the gated slab then never crosses
    HBM (``ops/se.py::fused_se_project``). Matching is conservative —
    initializer-backed 1x1 group-1 convs, chain-internal tensors
    single-consumed and not graph outputs — and ``x`` itself may have
    other consumers (it stays live as the fused node's input). Returns
    the number of chains fused."""
    fold_constant_nodes(graph)
    fused = 0
    while True:
        m = _match_one_se(graph, absorb_project)
        if m is None:
            return fused
        _apply_se(graph, m)
        fused += 1


def _se_conv_1x1(graph, node):
    """(w, b_name) for an initializer-backed 1x1 group-1 Conv; None if the
    node is anything else. ``w`` keeps its ONNX [C_out, C_in, 1, 1] shape."""
    if node.op_type != "Conv" or len(node.inputs) < 2:
        return None
    w = graph.initializers.get(node.inputs[1])
    if w is None or w.array is None or w.array.ndim != 4 or \
            w.array.shape[2:] != (1, 1):
        return None
    if node.attr("group", 1) != 1:
        return None
    strides = node.attr("strides")
    if strides is not None and any(int(s) != 1 for s in strides):
        return None
    dil = node.attr("dilations")
    if dil is not None and any(int(d) != 1 for d in dil):
        return None
    pads = node.attr("pads")
    if pads is not None and any(int(p) for p in pads):
        return None
    if node.attr("auto_pad", b"NOTSET") not in (b"NOTSET", b"VALID"):
        return None
    b_name = node.inputs[2] if len(node.inputs) > 2 and node.inputs[2] else ""
    if b_name and b_name not in graph.initializers:
        return None
    return w.array, b_name


def _match_one_se(graph, absorb_project=True, skip=frozenset()):
    consumers, out_names, sole_consumer = _build_consumers(graph)

    for pool in graph.nodes:
        if id(pool) in skip:
            continue
        if pool.op_type == "GlobalAveragePool":
            pass
        elif pool.op_type == "ReduceMean":
            # tf2onnx spells the squeeze pool as ReduceMean over the
            # spatial axes with keepdims — identical semantics for the
            # NCHW 4-D slabs this pass targets.
            if not pool.attr("keepdims", 1):
                continue
            axes = pool.attr("axes")
            if axes is None and len(pool.inputs) > 1 and pool.inputs[1]:
                t = graph.initializers.get(pool.inputs[1])
                if t is None or t.array is None:
                    continue
                axes = [int(v) for v in np.asarray(t.array).reshape(-1)]
            if axes is None or sorted(
                    int(a) % 4 for a in axes) != [2, 3]:
                continue  # matched slabs are 4-D, so -2/-1 ≡ 2/3
        else:
            continue
        x = pool.inputs[0]
        conv1 = sole_consumer(pool.outputs[0], "Conv")
        if conv1 is None:
            continue
        p1 = _se_conv_1x1(graph, conv1)
        if p1 is None:
            continue
        w1, b1_name = p1
        # swish: r consumed by exactly {Sigmoid sg, Mul mu(r, sg.out)}
        r = conv1.outputs[0]
        if r in out_names:
            continue
        cons_r = consumers.get(r, [])
        if len(cons_r) != 2:
            continue
        sg = next((n for n in cons_r if n.op_type == "Sigmoid"), None)
        mu = next((n for n in cons_r if n.op_type == "Mul"), None)
        if sg is None or mu is None or \
                sole_consumer(sg.outputs[0], "Mul") is not mu or \
                set(mu.inputs) != {r, sg.outputs[0]}:
            continue
        conv2 = sole_consumer(mu.outputs[0], "Conv")
        if conv2 is None:
            continue
        p2 = _se_conv_1x1(graph, conv2)
        if p2 is None:
            continue
        w2, b2_name = p2
        # shape consistency: w1 [C_se, C, 1, 1], w2 [C, C_se, 1, 1]
        c_se, c = w1.shape[0], w1.shape[1]
        if w2.shape[0] != c or w2.shape[1] != c_se:
            continue
        sg2 = sole_consumer(conv2.outputs[0], "Sigmoid")
        if sg2 is None:
            continue
        gate_mul = sole_consumer(sg2.outputs[0], "Mul")
        if gate_mul is None or set(gate_mul.inputs) != {x, sg2.outputs[0]}:
            continue
        m = {
            "x": x, "pool": pool, "conv1": conv1, "sg": sg, "mu": mu,
            "conv2": conv2, "sg2": sg2, "gate_mul": gate_mul,
            "w1_name": conv1.inputs[1], "b1_name": b1_name,
            "w2_name": conv2.inputs[1], "b2_name": b2_name,
            "chain": [pool, conv1, sg, mu, conv2, sg2, gate_mul],
            "proj": None,
        }
        if absorb_project:
            proj = sole_consumer(gate_mul.outputs[0], "Conv")
            pp = _se_conv_1x1(graph, proj) if proj is not None else None
            # wp [O, C, 1, 1] contracting the gated slab's C channels.
            if pp is not None and pp[0].shape[1] == c:
                m["proj"] = proj
                m["wp_name"], m["bp_name"] = proj.inputs[1], pp[1]
                m["chain"] = m["chain"] + [proj]
                m["bn"] = m["res"] = None
                m["out_node"] = proj
                # Optional absorptions past the project conv: the BN
                # affine (folded to scale/shift at graph time) and the
                # block's residual Add — each saves the project output's
                # own HBM round trip through the elementwise fusion.
                tail = sole_consumer(proj.outputs[0],
                                     "BatchNormalization")
                if tail is not None and _bn_fold(graph, tail) is not None:
                    m["bn"] = tail
                    m["chain"] = m["chain"] + [tail]
                    m["out_node"] = tail
                add = sole_consumer(m["out_node"].outputs[0], "Add")
                if add is not None:
                    others = [i for i in add.inputs
                              if i != m["out_node"].outputs[0]]
                    # A residual reads a tensor produced BEFORE this block
                    # (never an initializer, never a chain tensor) — the
                    # fused node is inserted at the pool's position, so
                    # the operand must already be live there.
                    pool_idx = graph.nodes.index(pool)
                    produced_before = {
                        o for n in graph.nodes[:pool_idx] for o in n.outputs
                    } | {vi.name for vi in graph.inputs}
                    if (len(others) == 1
                            and others[0] not in graph.initializers
                            and others[0] in produced_before):
                        m["res"] = add
                        m["res_name"] = others[0]
                        m["chain"] = m["chain"] + [add]
                        m["out_node"] = add
        return m
    return None


def fuse_mbconv_s1(graph: Graph) -> int:
    """Splice whole stride-1 MBConv blocks

        [Conv 1x1 expand -> [BN] -> swish] -> Conv kxk depthwise(s=1,
        SAME) -> [BN] -> swish -> SE chain -> Conv 1x1 project -> [BN]
        -> [residual Add]

    into one ``BirdaFusedMBConvS1`` node (the whole-block Pallas kernel
    in ``ops/mbconv.py`` — the 6x-expanded mid slab never leaves VMEM).
    Builds on the SE matcher: every SE match whose upstream spells the
    block is absorbed; SE chains that do not (stride-2 blocks, foreign
    graphs) are left for :func:`fuse_se`. BN affines are folded to
    per-channel scale/shift initializers with conv biases folded in, so
    exports that pre-fold BN match with identity affines. Returns the
    number of blocks fused."""
    fold_constant_nodes(graph)
    fused = 0
    skip: set[int] = set()
    while True:
        m = _match_one_se(graph, absorb_project=True, skip=skip)
        if m is None:
            return fused
        mm = _match_mbconv_upstream(graph, m) if m["proj"] is not None \
            else None
        if mm is None:
            skip.add(id(m["pool"]))
            continue
        _apply_mbconv(graph, m, mm)
        fused += 1


def _swish_producer(graph, t, producers, consumers, out_names):
    """When ``t`` is the output of ``Mul(a, Sigmoid(a))`` whose pieces are
    consumed only by that swish, return ``(a, [sigmoid, mul])``."""
    if t in out_names:
        return None  # the swish Mul itself feeds a graph output: keep it
    mu = producers.get(t)
    if mu is None or mu.op_type != "Mul" or len(mu.inputs) != 2:
        return None
    for a in set(mu.inputs):
        sg = producers.get(next((i for i in mu.inputs if i != a), a))
        if sg is None or sg.op_type != "Sigmoid" or sg.inputs[0] != a:
            continue
        if set(mu.inputs) != {a, sg.outputs[0]}:
            continue
        if a in out_names or sg.outputs[0] in out_names:
            return None
        cons_a = consumers.get(a, [])
        if len(cons_a) != 2 or sg not in cons_a or mu not in cons_a:
            return None
        if consumers.get(sg.outputs[0], []) != [mu]:
            return None
        return a, [sg, mu]
    return None


def _affine_after(graph, conv, sole_consumer):
    """Follow ``conv`` through an optional initializer-backed BN; return
    (tail_output_name, chain_nodes, scale, shift) with the conv bias
    folded into the shift. None when the BN stats are dynamic."""
    w = graph.initializers[conv.inputs[1]].array
    c_out = w.shape[0]
    bias = np.zeros(c_out, np.float64)
    if len(conv.inputs) > 2 and conv.inputs[2]:
        t = graph.initializers.get(conv.inputs[2])
        if t is None or t.array is None:
            return None
        bias = np.asarray(t.array, np.float64)
    bn = sole_consumer(conv.outputs[0], "BatchNormalization")
    if bn is not None:
        folded = _bn_fold(graph, bn)
        if folded is None:
            return None
        scale, shift = (np.asarray(v, np.float64) for v in folded)
        return (bn.outputs[0], [bn],
                scale.astype(np.float32),
                (shift + bias * scale).astype(np.float32))
    return (conv.outputs[0], [], np.ones(c_out, np.float32),
            bias.astype(np.float32))


def _match_mbconv_upstream(graph, m):
    """Given an SE match ``m`` (with absorbed project), check that its
    gate input is the swish of a stride-1 SAME depthwise conv, optionally
    preceded by an expand-1x1 + [BN] + swish. Returns the upstream pieces
    or None (the SE match then stays a plain SE/SEP fusion)."""
    producers: dict[str, Node] = {}
    for n in graph.nodes:
        for o in n.outputs:
            if o:
                producers[o] = n
    consumers, out_names, sole_consumer = _build_consumers(graph)

    # m["x"] is consumed by the SE pool and the gate Mul — exactly.
    if len(consumers.get(m["x"], [])) != 2:
        return None
    sw_d = _swish_producer(graph, m["x"], producers, consumers, out_names)
    if sw_d is None:
        return None
    t_d, sw_d_nodes = sw_d
    dw = producers.get(t_d)
    chain_d = []
    if dw is not None and dw.op_type == "BatchNormalization":
        dw = producers.get(dw.inputs[0])
    if dw is None or dw.op_type != "Conv" or len(dw.inputs) < 2:
        return None
    wd_t = graph.initializers.get(dw.inputs[1])
    if wd_t is None or wd_t.array is None or wd_t.array.ndim != 4:
        return None
    cm, cin_g, kh, kw = wd_t.array.shape
    if cin_g != 1 or kh != kw or kh % 2 == 0 or kh > 7 or kh < 3:
        return None
    if dw.attr("group", 1) != cm:
        return None
    strides = dw.attr("strides")
    if strides is not None and any(int(s) != 1 for s in strides):
        return None
    dil = dw.attr("dilations")
    if dil is not None and any(int(d) != 1 for d in dil):
        return None
    p = kh // 2
    pads = dw.attr("pads")
    autopad = dw.attr("auto_pad", b"NOTSET")
    same = (pads is not None and [int(v) for v in pads] == [p] * 4) or \
        (pads is None and autopad == b"SAME_UPPER")
    if not same:
        return None
    aff_d = _affine_after(graph, dw, sole_consumer)
    if aff_d is None or aff_d[0] != t_d:
        return None
    _, bn_d_nodes, ad_scale, ad_shift = aff_d
    chain_d = [dw] + bn_d_nodes + sw_d_nodes

    # SE gate width must match the depthwise channel count.
    w1 = graph.initializers[m["w1_name"]].array
    if w1.shape[1] != cm:
        return None

    # Optional expand: dw input is the swish of an expand 1x1 (+BN).
    t_e = dw.inputs[0]
    expand = None
    chain_e = []
    sw_e = _swish_producer(graph, t_e, producers, consumers, out_names)
    if sw_e is not None and consumers.get(t_e, []) == [dw]:
        t_e2, sw_e_nodes = sw_e
        conv_e = producers.get(t_e2)
        if conv_e is not None and conv_e.op_type == "BatchNormalization":
            conv_e = producers.get(conv_e.inputs[0])
        if (conv_e is not None and conv_e.op_type == "Conv"
                and _se_conv_1x1(graph, conv_e) is not None):
            we = graph.initializers[conv_e.inputs[1]].array
            if we.shape[0] == cm:
                # Consumption: with BN, conv_e.out is sole-consumed by it
                # (_affine_after checks); without, conv_e.out IS t_e2 and
                # _swish_producer validated its two swish consumers.
                aff_e = _affine_after(graph, conv_e, sole_consumer)
                if aff_e is not None and aff_e[0] == t_e2:
                    _, bn_e_nodes, ae_scale, ae_shift = aff_e
                    expand = {
                        "conv": conv_e, "we_name": conv_e.inputs[1],
                        "ae_scale": ae_scale, "ae_shift": ae_shift,
                        "x0": conv_e.inputs[0],
                        "chain": [conv_e] + bn_e_nodes + sw_e_nodes,
                    }
    if expand is None:
        # expand ratio 1: the depthwise conv reads the block input.
        x0 = t_e
        ae_scale = ae_shift = None
        chain_e = []
    else:
        x0 = expand["x0"]
        ae_scale, ae_shift = expand["ae_scale"], expand["ae_shift"]
        chain_e = expand["chain"]

    # The fused node lands at the first chain node's position (earlier
    # than the SE pool the residual check used) — the residual operand
    # must already be live there.
    if m["res"] is not None:
        first = (chain_e + chain_d)[0]
        first_idx = graph.nodes.index(first)
        produced_before = {
            o for n in graph.nodes[:first_idx] for o in n.outputs
        } | {vi.name for vi in graph.inputs}
        if m["res_name"] not in produced_before:
            return None

    # The project affine: refold with the project conv's bias (the SE
    # matcher recorded bn/bias separately; _apply_mbconv rebuilds both).
    return {
        "x0": x0, "expand": expand, "dw": dw,
        "wd": wd_t.array.reshape(cm, kh * kw).astype(np.float32),
        "wd_name": dw.inputs[1], "k": kh,
        "ad_scale": ad_scale, "ad_shift": ad_shift,
        "ae_scale": ae_scale, "ae_shift": ae_shift,
        "chain_up": chain_e + chain_d,
    }


def _apply_mbconv(graph: Graph, m: dict, mm: dict) -> None:
    proj = m["proj"]
    aff_p = None
    # Refold the project affine (bias + optional BN already matched by
    # the SE pass as m["bn"]).
    wp_t = graph.initializers[proj.inputs[1]].array
    o_ch = wp_t.shape[0]
    bias = np.zeros(o_ch, np.float64)
    if m["bp_name"]:
        bias = np.asarray(graph.initializers[m["bp_name"]].array,
                          np.float64)
    if m["bn"] is not None:
        scale, shift = (np.asarray(v, np.float64)
                        for v in _bn_fold(graph, m["bn"]))
        aff_p = (scale.astype(np.float32),
                 (shift + bias * scale).astype(np.float32))
    else:
        aff_p = (np.ones(o_ch, np.float32), bias.astype(np.float32))

    def init(tag, arr):
        name = _fresh_init_name(graph, proj.inputs[1] + "__fused_" + tag)
        graph.initializers[name] = Tensor(
            name=name, dims=tuple(arr.shape),
            array=np.ascontiguousarray(arr))
        return name

    cm = mm["wd"].shape[0]
    ae_s = mm["ae_scale"] if mm["ae_scale"] is not None \
        else np.ones(1, np.float32)
    ae_t = mm["ae_shift"] if mm["ae_shift"] is not None \
        else np.zeros(1, np.float32)
    inputs = [
        mm["x0"],
        mm["expand"]["we_name"] if mm["expand"] is not None else "",
        init("ae_s", ae_s), init("ae_t", ae_t),
        init("wd_taps", mm["wd"]),
        init("ad_s", mm["ad_scale"]), init("ad_t", mm["ad_shift"]),
        m["w1_name"], m["b1_name"], m["w2_name"], m["b2_name"],
        proj.inputs[1], init("ap_s", aff_p[0]), init("ap_t", aff_p[1]),
        m["res_name"] if m["res"] is not None else "",
    ]
    fused = Node(
        op_type=FUSED_MBCONV_OP,
        name=(mm["dw"].name or "mbconv") + "_fused_block",
        inputs=inputs,
        outputs=[m["out_node"].outputs[0]],
        attrs={},
    )
    chain = mm["chain_up"] + m["chain"]
    chain_set = set(map(id, chain))
    first_idx = min(graph.nodes.index(n) for n in chain)
    graph.nodes = [n for n in graph.nodes if id(n) not in chain_set]
    graph.nodes.insert(first_idx, fused)
    _drop_dead_inits(graph, chain)


def _bn_fold(graph: Graph, bn: Node):
    """(scale, shift) float32 vectors folding an initializer-backed
    BatchNormalization's affine; None when any input is dynamic."""
    arrs = []
    for name in bn.inputs[1:5]:
        t = graph.initializers.get(name)
        if t is None or t.array is None or t.array.ndim != 1:
            return None
        arrs.append(np.asarray(t.array, np.float64))
    s, b, mean, var = arrs
    eps = bn.attr("epsilon", 1e-5)
    scale = s / np.sqrt(var + eps)
    shift = b - mean * scale
    return scale.astype(np.float32), shift.astype(np.float32)


def _apply_se(graph: Graph, m: dict) -> None:
    if m["proj"] is not None:
        bn_s_name = bn_t_name = ""
        if m["bn"] is not None:
            scale, shift = _bn_fold(graph, m["bn"])
            bn_s_name = _fresh_init_name(
                graph, m["bn"].inputs[1] + "__fused_se_scale")
            bn_t_name = _fresh_init_name(
                graph, m["bn"].inputs[1] + "__fused_se_shift")
            graph.initializers[bn_s_name] = Tensor(
                name=bn_s_name, dims=tuple(scale.shape), array=scale)
            graph.initializers[bn_t_name] = Tensor(
                name=bn_t_name, dims=tuple(shift.shape), array=shift)
        fused = Node(
            op_type=FUSED_SE_PROJECT_OP,
            name=(m["pool"].name or "se") + "_fused_se_project",
            inputs=[m["x"], m["w1_name"], m["b1_name"],
                    m["w2_name"], m["b2_name"],
                    m["wp_name"], m["bp_name"], bn_s_name, bn_t_name,
                    m["res_name"] if m["res"] is not None else ""],
            outputs=[m["out_node"].outputs[0]],
            attrs={},
        )
    else:
        fused = Node(
            op_type=FUSED_SE_OP,
            name=(m["pool"].name or "se") + "_fused_se",
            inputs=[m["x"], m["w1_name"], m["b1_name"],
                    m["w2_name"], m["b2_name"]],
            outputs=[m["gate_mul"].outputs[0]],
            attrs={},
        )
    chain_set = set(map(id, m["chain"]))
    idx = graph.nodes.index(m["pool"])
    graph.nodes = [n for n in graph.nodes if id(n) not in chain_set]
    graph.nodes.insert(idx, fused)
    # Drop initializers the chain alone consumed (raw BN stats after the
    # fold, the ReduceMean axes tensor) — same discipline as the mel pass.
    _drop_dead_inits(graph, m["chain"])


def _apply(graph: Graph, m: dict) -> None:
    anchor = m["anchor"]
    fb_name = _fresh_init_name(graph, m["w_name"] + "__fused_melfb") \
        if m["kind"] == "conv" else \
        _fresh_init_name(graph, (anchor.name or "stft") + "__fused_melfb")
    fb = np.ascontiguousarray(m["fb_cat"].astype(np.float32))
    graph.initializers[fb_name] = Tensor(
        name=fb_name, dims=tuple(fb.shape), array=fb,
    )
    if m["kind"] == "stft":
        # Synthesize the windowed-DFT conv weight the fused kernel runs:
        # rows [win*cos(2π f t / K) ; -win*sin(...)] for the onesided
        # bins — exactly what op_STFT computes, so both spellings share
        # one kernel and one numerics reference.
        k, bins = m["frame"], m["bins"]
        t = np.arange(k, dtype=np.float64)
        f = np.arange(bins, dtype=np.float64)[:, None]
        ang = 2.0 * np.pi * f * t[None, :] / k
        win = m["win"]
        w = np.concatenate(
            [win * np.cos(ang), -win * np.sin(ang)], axis=0,
        ).astype(np.float32)[:, None, :]
        w_name = _fresh_init_name(
            graph, (anchor.name or "stft") + "__fused_stft_w")
        graph.initializers[w_name] = Tensor(
            name=w_name, dims=tuple(w.shape), array=np.ascontiguousarray(w),
        )
    else:
        w_name = m["w_name"]
    fused = Node(
        op_type=FUSED_OP,
        name=(anchor.name or "stft") + "_fused_melfrontend",
        inputs=[m["sig_name"], w_name, fb_name],
        outputs=[m["log"].outputs[0]],
        attrs={
            "hop": _attr_i("hop", m["hop"]),
            "eps": _attr_f("eps", m["eps"]),
            "src": _attr_s("src", m["kind"]),
        },
    )
    chain_set = set(map(id, m["chain"]))
    idx = graph.nodes.index(anchor)
    graph.nodes = [n for n in graph.nodes if id(n) not in chain_set]
    graph.nodes.insert(idx, fused)
    # Drop initializers the chain alone consumed (the per-bank mel
    # matrices are large enough to be param-lifted and shipped to the
    # device — dead weight once the concatenated copy replaces them).
    _drop_dead_inits(graph, m["chain"])

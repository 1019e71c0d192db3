"""Circuit pipeline tests: tracer, interpreters, compiler, JAX runtime.

Mirrors the reference's streaming-context and mode-equivalence integration
tests (SURVEY §4.1/§4.4): template caching, constants, dead-wire elision,
nested components, and garble→evaluate consistency with ciphertext-stream
parity — here checked between the sequential interpreters (the oracle) and
the compiled wave-scheduled runtime.
"""

from itertools import product

import numpy as np
import pytest

from gsv_tpu.circuit import component, trace_circuit
from gsv_tpu.circuit.interp import (
    EvalWire,
    EvaluateInterp,
    ExecuteInterp,
    GarbleInterp,
)
from gsv_tpu.circuit.link import link
from gsv_tpu.circuit.runtime import PlanExecutor
from gsv_tpu.circuit.tape import Compiler
from gsv_tpu.core.gate_types import GateType
from gsv_tpu.core.labels import (
    int_array_from_words,
    words_from_int,
    words_from_int_array,
)
from gsv_tpu.core.rng import GarblerRng


@component
def full_adder(ctx, a, b, cin):
    axb = ctx.xor(a, b)
    s = ctx.xor(axb, cin)
    t1 = ctx.and_(axb, ctx.xor(cin, b))
    carry = ctx.xor(t1, b)
    return s, carry


@component
def all_families(ctx, a, b):
    dead = ctx.and_(a, b)  # noqa: F841 — dead on purpose
    n = ctx.not_(a)
    x = ctx.nor(n, b)
    y = ctx.imp(a, x)
    return ctx.xnor(y, b)


def adder_circuit(ctx, inputs):
    a0, a1, b0, b1 = inputs
    s0, c0 = full_adder(ctx, a0, b0, ctx.FALSE)
    s1, c1 = full_adder(ctx, a1, b1, c0)
    w = all_families(ctx, s0, c1)
    return [s0, s1, c1, w, a0]  # includes an input passthrough


@pytest.fixture(scope="module")
def traced():
    return trace_circuit(adder_circuit, 4)


@pytest.fixture(scope="module")
def plan(traced):
    tmpl, _ = traced
    return link(Compiler(flatten_max=1 << 20).compile(tmpl), 4)


@pytest.fixture(scope="module")
def super_plan(traced):
    tmpl, _ = traced
    return link(Compiler(flatten_max=4).compile(tmpl), 4)


class TestTracer:
    def test_template_cache(self, traced):
        tmpl, cache = traced
        # full_adder traced once, reused once; all_families traced once
        assert cache.misses == 2
        assert cache.hits == 1

    def test_gate_counts(self, traced):
        tmpl, _ = traced
        assert tmpl.total_gates == 5 + 5 + 5
        assert int(tmpl.hist[GateType.XOR]) == 4 * 2
        assert int(tmpl.hist[GateType.AND]) == 1 * 2 + 1

    def test_component_returns_same_structure_on_hit(self, traced):
        # traced fixture already exercised a cache hit for full_adder —
        # outputs were a 2-tuple both times (adder_circuit destructures it)
        pass


class TestExecute:
    def test_matches_interpreter(self, traced, plan):
        tmpl, _ = traced
        ex = PlanExecutor(plan)
        for bits in product([0, 1], repeat=4):
            want = ExecuteInterp().run(tmpl, [bool(x) for x in bits])
            got = ex.execute(np.array(bits, dtype=np.uint8))
            assert [bool(v) for v in got] == want

    def test_super_program_matches(self, traced, super_plan):
        tmpl, _ = traced
        assert len(super_plan.steps) > 1
        ex = PlanExecutor(super_plan)
        for bits in product([0, 1], repeat=4):
            want = ExecuteInterp().run(tmpl, [bool(x) for x in bits])
            got = ex.execute(np.array(bits, dtype=np.uint8))
            assert [bool(v) for v in got] == want


class TestGarbleEvaluate:
    @pytest.fixture(scope="class")
    def garbled(self, traced):
        tmpl, _ = traced
        g = GarbleInterp(seed=5)
        out_ref, in_l0 = g.run(tmpl)
        return g, out_ref, in_l0

    def test_garble_matches_interpreter(self, traced, plan, garbled):
        g, out_ref, in_l0 = garbled
        rng = GarblerRng(5)
        in_labels = [rng.issue_label0() for _ in range(4)]
        assert in_labels == in_l0  # same draw order as the interpreter
        cts = []
        outw, _ = PlanExecutor(plan).garble(
            words_from_int_array(in_labels),
            words_from_int(rng.delta),
            words_from_int(rng.false_label0),
            words_from_int(rng.true_label0),
            ct_handler=lambda c: cts.append(np.asarray(c)),
        )
        assert int_array_from_words(outw) == out_ref
        assert int_array_from_words(np.concatenate(cts)) == g.ciphertexts

    def test_evaluate_matches_interpreter(self, traced, plan, garbled):
        tmpl, _ = traced
        g, out_ref, in_l0 = garbled
        delta = g.delta
        cts_words = words_from_int_array(g.ciphertexts)
        eex = PlanExecutor(plan)
        for bits in [(0, 0, 0, 0), (1, 0, 1, 0), (1, 1, 1, 1), (0, 1, 0, 1)]:
            bits = [bool(b) for b in bits]
            inl = [l ^ (delta if b else 0) for l, b in zip(in_l0, bits)]
            labels, vals = eex.evaluate(
                words_from_int_array(inl),
                np.array(bits, np.uint8),
                words_from_int(g.false_label0),
                words_from_int(g.true_label0 ^ delta),
                ct_source=lambda base, cnt: cts_words[base : base + cnt],
            )
            ev = EvaluateInterp(
                true_label=g.true_label0 ^ delta, false_label=g.false_label0
            )
            want = ev.run(
                tmpl, [EvalWire(l, b) for l, b in zip(inl, bits)], g.ciphertexts
            )
            assert int_array_from_words(labels) == [w.label for w in want]
            assert [bool(v) for v in vals] == [w.value for w in want]
            # active output label == label0 ^ value*delta (2PC invariant)
            for lab, w0, v in zip(
                int_array_from_words(labels), out_ref, ExecuteInterp().run(tmpl, bits)
            ):
                assert lab == (w0 ^ (delta if v else 0))

    def test_batched_instances(self, traced, plan):
        tmpl, _ = traced
        seeds = [11, 22]
        refs, in_labels, deltas, f0, t0 = [], [], [], [], []
        for s in seeds:
            gi = GarbleInterp(seed=s)
            out_ref, _ = gi.run(tmpl)
            refs.append((out_ref, gi.ciphertexts))
            rng = GarblerRng(s)
            in_labels.append(
                words_from_int_array([rng.issue_label0() for _ in range(4)])
            )
            deltas.append(words_from_int(rng.delta))
            f0.append(words_from_int(rng.false_label0))
            t0.append(words_from_int(rng.true_label0))
        ex = PlanExecutor(plan, batch=len(seeds))
        cts = []
        outw, _ = ex.garble(
            np.stack(in_labels),
            np.stack(deltas),
            np.stack(f0),
            np.stack(t0),
            ct_handler=lambda c: cts.append(np.asarray(c)),
        )
        cts = np.concatenate(cts, axis=1)
        for i in range(len(seeds)):
            assert int_array_from_words(outw[i]) == refs[i][0]
            assert int_array_from_words(cts[i]) == refs[i][1]

    def test_super_program_ciphertext_parity(self, traced, super_plan, garbled):
        g, out_ref, in_l0 = garbled
        rng = GarblerRng(5)
        in_labels = [rng.issue_label0() for _ in range(4)]
        cts = []
        outw, _ = PlanExecutor(super_plan).garble(
            words_from_int_array(in_labels),
            words_from_int(rng.delta),
            words_from_int(rng.false_label0),
            words_from_int(rng.true_label0),
            ct_handler=lambda c: cts.append(np.asarray(c)),
        )
        assert int_array_from_words(outw) == out_ref
        assert int_array_from_words(np.concatenate(cts)) == g.ciphertexts


class TestDeadGates:
    def test_dead_gate_advances_gate_id_but_emits_no_ct(self):
        @component
        def gadget(ctx, a, b):
            dead = ctx.and_(a, b)  # noqa: F841 — non-free AND dead
            live = ctx.or_(a, b)
            return live

        def circ(ctx, inputs):
            return [gadget(ctx, inputs[0], inputs[1])]

        tmpl, _ = trace_circuit(circ, 2)
        g = GarbleInterp(seed=1)
        g.run(tmpl)
        assert g.gate_index == 2  # both gates consumed ids
        assert len(g.ciphertexts) == 1  # only the live one emitted
        plan = link(Compiler().compile(tmpl), 2)
        assert plan.ct_count == 1
        assert plan.total_gates == 2


class TestNesting:
    """Streaming-context invariants (reference circuit/mod.rs:604-835):
    deep nesting, sibling isolation, constants visible at every depth."""

    def test_deep_nesting(self):
        # Reference invariant: 1000-deep component nesting traces fine
        # (circuit/mod.rs:604-835).  `depth` must be an off-circuit param so
        # each level gets its own template key.
        @component(offcircuit=("depth",))
        def wrap(ctx, a, depth):
            if depth == 0:
                return ctx.xor(a, ctx.TRUE)
            return wrap(ctx, a, depth=depth - 1)

        def circ(ctx, ins):
            return [wrap(ctx, ins[0], depth=1000)]

        tmpl, _ = trace_circuit(circ, 1)
        plan = link(Compiler(flatten_max=1 << 20).compile(tmpl), 1)
        ex = PlanExecutor(plan)
        for bit in (0, 1):
            out = ex.execute(np.array([bit], dtype=np.uint8))
            assert int(out[0]) == bit ^ 1

    def test_runaway_recursion_diagnosed(self):
        """An int param that should be offcircuit -> clear RecursionError
        instead of a 100k-frame interpreter blowup."""

        @component
        def bad(ctx, a, depth):
            if depth == 0:
                return ctx.xor(a, ctx.TRUE)
            return bad(ctx, a, depth=depth - 1)

        def circ(ctx, ins):
            return [bad(ctx, ins[0], depth=3)]

        with pytest.raises(RecursionError, match="offcircuit"):
            trace_circuit(circ, 1)

    def test_sibling_component_isolation(self):
        """Two sibling calls of one template get distinct frames: outputs
        must not alias even though the compiled tape is shared."""

        @component
        def pair(ctx, a, b):
            return ctx.and_(a, b), ctx.xor(a, b)

        def circ(ctx, ins):
            x0, x1 = pair(ctx, ins[0], ins[1])
            y0, y1 = pair(ctx, ins[2], ins[3])
            return [x0, x1, y0, y1]

        tmpl, _ = trace_circuit(circ, 4)
        plan = link(Compiler(flatten_max=1 << 20).compile(tmpl), 4)
        ex = PlanExecutor(plan)
        for bits in product((0, 1), repeat=4):
            out = ex.execute(np.array(bits, dtype=np.uint8))
            a, b, c, d = bits
            assert list(out) == [a & b, a ^ b, c & d, c ^ d], bits


def test_pallas_hasher_matches_aes(monkeypatch):
    """hasher='aes_pallas' produces bit-identical ciphertexts to 'aes'
    (same fixed-key AES, Pallas-kernel execution; interpret mode on CPU).
    Threshold patched so the tiny test circuit takes the Pallas path."""
    from gsv_tpu.circuit import runtime as rt

    monkeypatch.setattr(rt, "_PALLAS_MIN_BLOCKS", 1)

    tmpl, _ = trace_circuit(adder_circuit, 4)
    plan = link(Compiler(flatten_max=1 << 20).compile(tmpl), 4)
    rng = GarblerRng(5)
    in_labels = words_from_int_array([rng.issue_label0() for _ in range(4)])
    args = (
        in_labels,
        words_from_int(rng.delta),
        words_from_int(rng.false_label0),
        words_from_int(rng.true_label0),
    )
    outs = {}
    for hasher in ("aes", "aes_pallas", "aes_pallas2"):
        cts = []
        outw, _ = PlanExecutor(plan, hasher=hasher).garble(
            *args, ct_handler=lambda c: cts.append(np.asarray(c))
        )
        outs[hasher] = (int_array_from_words(outw), int_array_from_words(np.concatenate(cts)))
    assert outs["aes"] == outs["aes_pallas"]
    assert outs["aes"] == outs["aes_pallas2"]


def test_arity_check_surface():
    """Reference arity_check.rs parity: explicit wire-width guard at API
    boundaries with a diagnostic error."""
    from gsv_tpu.circuit.streaming import CircuitRunner, EvaluatedWire
    from gsv_tpu.circuit.wires import ArityError, arity_check
    from gsv_tpu.gadgets import bigint
    from gsv_tpu.gadgets.bigint import BigIntWires

    assert arity_check([1, 2, 3], 3) == [1, 2, 3]
    with pytest.raises(ArityError, match="expected 4"):
        arity_check([1, 2, 3], 4)

    def circ(ctx, ins):
        a = BigIntWires(ins[0:4])
        b = BigIntWires(ins[4:8])
        return bigint.add_without_carry(ctx, a, b).bits

    runner = CircuitRunner(circ, 8)
    with pytest.raises(ArityError):
        runner.execute([False] * 7)
    with pytest.raises(ArityError):
        runner.garble(1, input_labels=[0] * 9)
    with pytest.raises(ArityError):
        runner.evaluate([EvaluatedWire(0, False)] * 6, 1, 2, None)


def test_every_gate_type_garble_evaluate_compiled():
    """All 11 gate types through the COMPILED garble->evaluate path for
    every input combination: values match truth tables and active output
    labels satisfy label0 ^ value*delta (the reference's per-gate-type
    garbling tests, garble_mode.rs/evaluate_mode.rs #[cfg(test)])."""
    import numpy as np

    from gsv_tpu.circuit.runtime import PlanExecutor
    from gsv_tpu.core.gate_types import TRUTH_TABLE
    from gsv_tpu.core.labels import (
        int_array_from_words,
        words_from_int,
        words_from_int_array,
    )
    from gsv_tpu.core.rng import GarblerRng

    def circ(ctx, ins):
        a, b = ins
        outs = [ctx.gate(gt, a, b) for gt in range(10)]
        outs.append(ctx.not_(a))
        return outs

    tmpl, _ = trace_circuit(circ, 2)
    plan = link(Compiler().compile(tmpl), 2)

    rng = GarblerRng(77)
    in_l0 = [rng.issue_label0(), rng.issue_label0()]
    delta = rng.delta
    cts = []
    out_l0w, _ = PlanExecutor(plan).garble(
        words_from_int_array(in_l0),
        words_from_int(delta),
        words_from_int(rng.false_label0),
        words_from_int(rng.true_label0),
        ct_handler=lambda c: cts.append(np.asarray(c)),
    )
    stream = np.concatenate(cts)
    out_l0 = int_array_from_words(out_l0w)

    for a in (0, 1):
        for b in (0, 1):
            active = [in_l0[0] ^ (delta if a else 0), in_l0[1] ^ (delta if b else 0)]
            labw, vals = PlanExecutor(plan).evaluate(
                words_from_int_array(active),
                np.array([a, b], np.uint8),
                words_from_int(rng.false_label0),
                words_from_int(rng.true_label0 ^ delta),
                ct_source=lambda base, cnt: stream[base : base + cnt],
            )
            labs = int_array_from_words(labw)
            for gt in range(10):
                want = (TRUTH_TABLE[gt] >> (a * 2 + b)) & 1
                assert vals[gt] == want, (gt, a, b)
                assert labs[gt] == out_l0[gt] ^ (delta if want else 0), gt
            assert vals[10] == (1 - a)
            assert labs[10] == out_l0[10] ^ (delta if not a else 0)


def test_template_cache_lru_bound():
    """Reference parity (component_template_pool.rs:10): the template pool
    is LRU-bounded; recently used templates survive eviction."""
    from gsv_tpu.circuit.builder import TemplateCache

    c = TemplateCache(max_entries=3)
    for k in "abc":
        c.put(k, k.upper())
    assert c.get("a") == "A"  # refresh 'a'
    c.put("d", "D")  # evicts 'b' (least recently used)
    assert c.get("b") is None
    assert c.get("a") == "A" and c.get("c") == "C" and c.get("d") == "D"
    assert len(c.templates) == 3


def test_component_top_aggregate():
    """The per-gadget cost aggregator (test_log_parser.bash analogue) counts
    exact DAG multiplicities: sum over rows of own-gates == circuit total."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "component_top", "scripts/component_top.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from gsv_tpu.models.groth16_verifier import fq_mul_model

    runner = fq_mul_model()
    rows, hits, misses = mod.aggregate(runner.template, runner.cache)
    assert misses == len(runner.cache.templates)
    # every fully-expanded gate is owned by exactly one component
    assert (
        sum(r["sum_own_gates"] for r in rows.values())
        == runner.template.total_gates
    )
    # root appears exactly once
    assert rows["<root>"]["count"] == 1

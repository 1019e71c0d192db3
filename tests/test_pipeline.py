"""Pipelined garbler→evaluator tests and device blake3 hasher parity.

Reference parity: the channel-connected garble/evaluate pipeline
(examples/groth16_garble.rs:171-265) and hasher selection
(``--hasher aes|blake3``, groth16_garble.rs:270-309).
"""

import numpy as np
import pytest

from gsv_tpu.circuit import component, trace_circuit
from gsv_tpu.circuit.ciphertext import ArraySource, CollectHandler
from gsv_tpu.circuit.interp import ExecuteInterp, GarbleInterp
from gsv_tpu.circuit.link import link
from gsv_tpu.circuit.pipeline import (
    garble_evaluate_pipeline,
    seed_eval_arena,
    seed_garbler_arena,
)
from gsv_tpu.circuit.streaming import CircuitRunner, EvaluatedWire
from gsv_tpu.circuit.tape import Compiler
from gsv_tpu.core.labels import int_array_from_words, int_from_words
from gsv_tpu.gadgets import bigint as bi
from gsv_tpu.gadgets.bigint import BigIntWires
from gsv_tpu.ops.blake3_host import blake3_hash_with_gate

N = 16


def _circ(ctx, ins):
    a = BigIntWires(ins[:N])
    b = BigIntWires(ins[N:])
    prod = bi.mul(ctx, a, b)
    return [bi.equal_constant(ctx, prod, b=35), prod.bits[0]]


@pytest.fixture(scope="module")
def plan_and_tmpl():
    tmpl, _ = trace_circuit(_circ, 2 * N)
    return link(Compiler().compile(tmpl), 2 * N), tmpl


class TestPipeline:
    def test_device_resident_roundtrip(self, plan_and_tmpl):
        plan, tmpl = plan_and_tmpl
        g_arena, delta, labels, rng = seed_garbler_arena(plan, 99)
        bits = [bool((5 >> i) & 1) for i in range(N)] + [
            bool((7 >> i) & 1) for i in range(N)
        ]
        e_arena, e_bits = seed_eval_arena(plan, rng, labels, bits)
        ga, ea, eb = garble_evaluate_pipeline(plan, g_arena, delta, e_arena, e_bits)
        out_bits = [bool(v) for v in np.asarray(eb)[plan.output_abs]]
        assert out_bits == ExecuteInterp().run(tmpl, bits) == [True, True]
        d = int_from_words(np.asarray(delta))
        ga_np, ea_np, eb_np = np.asarray(ga), np.asarray(ea), np.asarray(eb)
        for pos in plan.output_abs:
            l0 = int_from_words(ga_np[pos])
            act = int_from_words(ea_np[pos])
            v = bool(eb_np[pos])
            assert act == (l0 ^ (d if v else 0))

    def test_ct_tee_matches_stream_order(self, plan_and_tmpl):
        plan, tmpl = plan_and_tmpl
        g_arena, delta, labels, rng = seed_garbler_arena(plan, 5)
        bits = [False] * (2 * N)
        e_arena, e_bits = seed_eval_arena(plan, rng, labels, bits)
        col = CollectHandler()
        garble_evaluate_pipeline(plan, g_arena, delta, e_arena, e_bits, ct_tee=col)
        gi = GarbleInterp(seed=5)
        gi.run(tmpl)  # draws its own input labels in the same order
        assert int_array_from_words(col.stream()) == gi.ciphertexts


class TestBlake3Hasher:
    def test_runtime_matches_interpreter(self):
        @component
        def g(ctx, a, b, c):
            x = ctx.xor(a, b)
            return ctx.xor(ctx.and_(x, ctx.or_(c, b)), ctx.nand(a, c))

        def circ(ctx, ins):
            r = g(ctx, ins[0], ins[1], ins[2])
            return [g(ctx, r, ins[3], ins[0])]

        runner = CircuitRunner(circ, 4)
        gi = GarbleInterp(seed=11, hash_fn=blake3_hash_with_gate)
        out_ref, _ = gi.run(runner.template)
        col = CollectHandler()
        res = runner.garble(11, ct_handler=col, hasher="blake3")
        assert [w.label0 for w in res.output_value] == out_ref
        assert int_array_from_words(col.stream()) == gi.ciphertexts

        bits = [True, False, True, True]
        inputs = [
            EvaluatedWire(gw.select(b), b)
            for gw, b in zip(res.input_wire_values, bits)
        ]
        eres = runner.evaluate(
            inputs,
            res.true_wire_constant.label1,
            res.false_wire_constant.label0,
            ct_source=ArraySource(col.stream()),
            hasher="blake3",
        )
        for ew, gw in zip(eres.output_value, res.output_value):
            assert ew.active_label == gw.select(ew.value)

    def test_vectorized_blake3_matches_host(self):
        import random

        from gsv_tpu.core.labels import words_from_int_array
        from gsv_tpu.ops.blake3_jax import blake3_hash_words
        from gsv_tpu.ops.tweaks import split64

        random.seed(5)
        labels = [random.getrandbits(128) for _ in range(16)]
        gids = [random.getrandbits(40) for _ in range(16)]
        hi, lo = split64(gids)
        out = blake3_hash_words(words_from_int_array(labels), hi, lo)
        got = int_array_from_words(out)
        assert got == [blake3_hash_with_gate(l, g) for l, g in zip(labels, gids)]

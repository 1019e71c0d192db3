"""Heavy end-to-end tests, gated behind GSV_SLOW=1.

- fq12-mul 2PC roundtrip (reference: tests/fq12_mul_e2e.rs) — ~20M gates.
- Groth16 verifier at k=4 in execute mode (reference: groth16.rs tests).

Run with: GSV_SLOW=1 python -m pytest tests/test_slow_e2e.py -q
"""

import os
import random

import numpy as np
import pytest

slow = pytest.mark.skipif(
    os.environ.get("GSV_SLOW") != "1", reason="set GSV_SLOW=1 to run"
)


@slow
def test_fq12_mul_2pc_roundtrip():
    from gsv_tpu.circuit.ciphertext import ArraySource, CollectHandler, HashHandler, TeeHandler
    from gsv_tpu.circuit.streaming import EvaluatedWire
    from gsv_tpu.models.groth16_verifier import fq12_mul_model

    runner = fq12_mul_model()
    col, h = CollectHandler(), HashHandler()
    res = runner.garble(7, ct_handler=TeeHandler(col, h))
    commit = h.finalize()

    # re-garble must reproduce the identical stream commitment (seed determinism)
    h2 = HashHandler()
    runner.garble(7, ct_handler=h2)
    assert h2.finalize() == commit

    rng = random.Random(3)
    bits = [bool(rng.getrandbits(1)) for _ in range(runner.n_inputs)]
    inputs = [
        EvaluatedWire(gw.select(b), b) for gw, b in zip(res.input_wire_values, bits)
    ]
    eres = runner.evaluate(
        inputs,
        res.true_wire_constant.label1,
        res.false_wire_constant.label0,
        ct_source=ArraySource(col.stream()),
    )
    for ew, gw in zip(eres.output_value, res.output_value):
        assert ew.active_label == gw.select(ew.value)

    # semantic check against the host field
    from gsv_tpu.bn254_host.field import Fq as HFq, Fq2 as HF2, Fq6 as HF6, Fq12 as HF12
    from gsv_tpu.gadgets.bn254.fq import FqWire

    def dec(vals, base):
        fqs = []
        for i in range(12):
            m = 0
            for j in range(254):
                if vals[base + i * 254 + j]:
                    m |= 1 << j
            fqs.append(HFq(FqWire.from_montgomery(m)))
        return HF12(
            HF6(HF2(fqs[0], fqs[1]), HF2(fqs[2], fqs[3]), HF2(fqs[4], fqs[5])),
            HF6(HF2(fqs[6], fqs[7]), HF2(fqs[8], fqs[9]), HF2(fqs[10], fqs[11])),
        )

    a = dec(bits, 0)
    b = dec(bits, 12 * 254)
    got = dec([w.value for w in eres.output_value], 0)
    assert got == a * b


@slow
def test_groth16_verify_execute_k4():
    from gsv_tpu.bn254_host.curve import G1Jac, G2Jac
    from gsv_tpu.bn254_host.groth16 import dummy_proof
    from gsv_tpu.circuit import trace_circuit
    from gsv_tpu.circuit.link import link
    from gsv_tpu.circuit.runtime import PlanExecutor
    from gsv_tpu.circuit.tape import Compiler
    from gsv_tpu.gadgets.groth16 import Groth16Input, build_verify_circuit

    vk, proof, publics = dummy_proof(k=4, seed=0)
    fn, n_inputs = build_verify_circuit(vk, n_public=len(publics))
    tmpl, _ = trace_circuit(fn, n_inputs)
    plan = link(Compiler().compile(tmpl), n_inputs)
    inp = Groth16Input(
        public=[int(x) for x in publics],
        a=G1Jac.from_affine(proof.a),
        b=G2Jac.from_affine(proof.b),
        c=G1Jac.from_affine(proof.c),
    )
    ex = PlanExecutor(plan)
    out = ex.execute(np.array([int(b) for b in inp.to_bits()], dtype=np.uint8))
    assert bool(out[0]) is True
    bad = Groth16Input(
        public=[int(publics[0]) + 1], a=inp.a, b=inp.b, c=inp.c
    )
    out2 = ex.execute(np.array([int(b) for b in bad.to_bits()], dtype=np.uint8))
    assert bool(out2[0]) is False


@slow
def test_decompression_roundtrip_in_circuit():
    """In-circuit G1/G2 decompression recovers the original points from
    (x, y_flag) — reference src/gadgets/groth16.rs:826-860 roundtrips.
    ~620M gates; compiled execute on CPU."""
    import numpy as np

    from gsv_tpu.bn254_host.curve import g1_gen, g2_gen
    from gsv_tpu.circuit import trace_circuit
    from gsv_tpu.circuit.link import link
    from gsv_tpu.circuit.runtime import PlanExecutor
    from gsv_tpu.circuit.tape import Compiler
    from gsv_tpu.gadgets.bn254.encode import (
        dec_many_fq,
        enc_fq,
        enc_fq2,
        wire_fq,
        wire_fq2,
    )
    from gsv_tpu.gadgets.groth16 import (
        CompressedG1Wires,
        CompressedG2Wires,
        decompress_g1_from_compressed,
        decompress_g2_from_compressed,
    )
    from gsv_tpu.protocol.garbled_groth16 import fq_canonical_sqrt, fq2_canonical_sqrt

    p1 = g1_gen().mul(123457)
    q1 = g2_gen().mul(987653)
    a_flag = fq_canonical_sqrt(p1.y * p1.y) == p1.y
    b_flag = fq2_canonical_sqrt(q1.y.square()) == q1.y

    def circ(ctx, ins):
        g1c = CompressedG1Wires(wire_fq(ins, 0), ins[762])
        g2c = CompressedG2Wires(wire_fq2(ins, 1), ins[763])
        r1 = decompress_g1_from_compressed(ctx, g1c)
        r2 = decompress_g2_from_compressed(ctx, g2c)
        return [r1.x, r1.y, r2.x.c0, r2.x.c1, r2.y.c0, r2.y.c1]

    bits = enc_fq(int(p1.x)) + enc_fq2(q1.x) + [bool(a_flag), bool(b_flag)]
    tmpl, _ = trace_circuit(circ, len(bits))
    plan = link(Compiler().compile(tmpl), len(bits))
    out = PlanExecutor(plan).execute(np.array([int(b) for b in bits], np.uint8))
    vals = dec_many_fq([bool(v) for v in out], 6)
    assert vals[0] == int(p1.x) and vals[1] == int(p1.y), "G1 roundtrip"
    assert (vals[2], vals[3]) == (int(q1.x.c0), int(q1.x.c1)), "G2.x roundtrip"
    assert (vals[4], vals[5]) == (int(q1.y.c0), int(q1.y.c1)), "G2.y roundtrip"

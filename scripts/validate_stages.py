"""Staged circuit-vs-host validation of the BN254/Groth16 gadget stack.

Bisects the full-verifier correctness by executing each layer's circuit
(compiled execute mode, CPU) on random/mirrored inputs and comparing with
the host oracle (``gsv_tpu.bn254_host``).  Run stages cheap-to-expensive to
find the first divergence.

Usage: python scripts/validate_stages.py [stage...]
  stages: fq fq2 fq6 fq12 g1 g2 affine ell miller fe msm groth
  (default: the cheap ones — fq fq2 fq6 fq12 g1 g2 affine ell)
"""

import random
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from gsv_tpu.circuit import trace_circuit
from gsv_tpu.circuit.link import link
from gsv_tpu.circuit.runtime import PlanExecutor
from gsv_tpu.circuit.tape import Compiler
from gsv_tpu.circuit.wires import flatten_wires, unflatten_wires
from gsv_tpu.bn254_host import curve as hc
import importlib

# the package re-exports a `pairing` FUNCTION that shadows the submodule
hp = importlib.import_module("gsv_tpu.bn254_host.pairing")
from gsv_tpu.bn254_host.field import Fq as HFq, Fq2 as HFq2, Fq6 as HFq6, Fq12 as HFq12
from gsv_tpu.gadgets.bigint import BigIntWires
from gsv_tpu.gadgets.bn254 import pairing as cp
from gsv_tpu.gadgets.bn254.fp254 import FQ_PARAMS as FP
from gsv_tpu.gadgets.bn254.fq import FqWire
from gsv_tpu.gadgets.bn254.fq2 import Fq2Ops, Fq2Wire
from gsv_tpu.gadgets.bn254.fq6 import Fq6Ops, Fq6Wire
from gsv_tpu.gadgets.bn254.fq12 import Fq12Ops, Fq12Wire
from gsv_tpu.gadgets.bn254.g1 import G1Ops, G1Wire
from gsv_tpu.gadgets.bn254.g2 import G2Ops, G2Wire

rng = random.Random(20260817)
P = FP.modulus


# ---------------------------------------------------------------- encoding

def enc_fq(v: int) -> list[bool]:
    """Host int -> montgomery little-endian bits."""
    m = FP.to_mont(v)
    return [bool((m >> i) & 1) for i in range(254)]


def dec_fq(bits) -> int:
    m = 0
    for i, b in enumerate(bits):
        m |= int(b) << i
    return FP.from_mont(m)


def enc_fq2(v: HFq2):
    return enc_fq(int(v.c0)) + enc_fq(int(v.c1))


def enc_fq6(v: HFq6):
    return enc_fq2(v.c0) + enc_fq2(v.c1) + enc_fq2(v.c2)


def enc_fq12(v: HFq12):
    return enc_fq6(v.c0) + enc_fq6(v.c1)


def dec_many_fq(bits, n):
    return [dec_fq(bits[i * 254 : (i + 1) * 254]) for i in range(n)]


def dec_fq2(bits):
    a = dec_many_fq(bits, 2)
    return HFq2(HFq(a[0]), HFq(a[1]))


def dec_fq12(bits):
    a = dec_many_fq(bits, 12)
    f2 = lambda i: HFq2(HFq(a[i]), HFq(a[i + 1]))  # noqa: E731
    return HFq12(
        HFq6(f2(0), f2(2), f2(4)),
        HFq6(f2(6), f2(8), f2(10)),
    )


def wire_fq(ins, k):
    return FqWire(BigIntWires(ins[k * 254 : (k + 1) * 254]))


def wire_fq2(ins, k):
    return Fq2Wire(wire_fq(ins, k), wire_fq(ins, k + 1))


def wire_fq6(ins, k):
    return Fq6Wire(wire_fq2(ins, k), wire_fq2(ins, k + 2), wire_fq2(ins, k + 4))


def wire_fq12(ins, k):
    return Fq12Wire(wire_fq6(ins, k), wire_fq6(ins, k + 6))


def wire_g1(ins, k):
    return G1Wire(wire_fq(ins, k), wire_fq(ins, k + 1), wire_fq(ins, k + 2))


def wire_g2(ins, k):
    return G2Wire(wire_fq2(ins, k), wire_fq2(ins, k + 2), wire_fq2(ins, k + 4))


def run(builder, in_bits, label):
    t0 = time.time()
    tmpl, _ = trace_circuit(builder, len(in_bits))
    plan = link(Compiler().compile(tmpl), len(in_bits))
    out = PlanExecutor(plan).execute(np.array([int(b) for b in in_bits], np.uint8))
    print(
        f"  [{label}] {tmpl.total_gates:,} gates in {time.time()-t0:.0f}s",
        flush=True,
    )
    return [bool(v) for v in out]


def flat_out(x):
    ids, _ = flatten_wires(x)
    return ids


def check(name, got, want):
    ok = got == want
    print(f"  {name}: {'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        print(f"    got:  {got}", flush=True)
        print(f"    want: {want}", flush=True)
    return ok


# ---------------------------------------------------------------- stages

def rfq2():
    return HFq2(HFq(rng.randrange(P)), HFq(rng.randrange(P)))


def rfq12():
    return HFq12(
        HFq6(rfq2(), rfq2(), rfq2()),
        HFq6(rfq2(), rfq2(), rfq2()),
    )


def stage_fq():
    a, b = rng.randrange(P), rng.randrange(P)
    from gsv_tpu.gadgets.bn254 import fp254

    def f(ctx, ins):
        A = BigIntWires(ins[:254])
        return [
            fp254.inverse_montgomery(ctx, A, fp=FP),
            fp254.exp_by_constant_montgomery(ctx, A, exp=5, fp=FP),
            fp254.square_montgomery(ctx, A, fp=FP),
        ]

    out = run(f, enc_fq(a), "fq inverse+exp+square")
    vals = dec_many_fq(out, 3)
    ok = check("fq.inverse", vals[0], pow(a, P - 2, P))
    ok &= check("fq.exp5", vals[1], pow(a, 5, P))
    ok &= check("fq.square", vals[2], a * a % P)
    return ok


def stage_fq2():
    a, b = rfq2(), rfq2()

    def f(ctx, ins):
        A, B = wire_fq2(ins, 0), wire_fq2(ins, 2)
        outs = [
            Fq2Ops.mul_montgomery(ctx, A, B),
            Fq2Ops.square_montgomery(ctx, A),
            Fq2Ops.inverse_montgomery(ctx, A),
            Fq2Ops.mul_by_nonresidue(ctx, A),
            Fq2Ops.frobenius_montgomery(ctx, A, 1),
            Fq2Ops.conjugate(ctx, A),
        ]
        return outs

    out = run(f, enc_fq2(a) + enc_fq2(b), "fq2 ops")
    vals = [dec_fq2(out[i * 508 : (i + 1) * 508]) for i in range(6)]
    ok = check("fq2.mul", vals[0], a * b)
    ok &= check("fq2.square", vals[1], a * a)
    ok &= check("fq2.inverse", vals[2], a.inv())
    ok &= check("fq2.nonresidue", vals[3], a.mul_by_nonresidue())
    ok &= check("fq2.frob1", vals[4], a.frobenius(1))
    ok &= check("fq2.conj", vals[5], a.conjugate())
    return ok


def stage_fq6():
    a = HFq6(rfq2(), rfq2(), rfq2())
    b = HFq6(rfq2(), rfq2(), rfq2())

    def f(ctx, ins):
        A, B = wire_fq6(ins, 0), wire_fq6(ins, 6)
        return [
            Fq6Ops.mul_montgomery(ctx, A, B),
            Fq6Ops.square_montgomery(ctx, A),
            Fq6Ops.inverse_montgomery(ctx, A),
        ]

    out = run(f, enc_fq6(a) + enc_fq6(b), "fq6 ops")
    n = 6 * 254
    g = lambda i: dec_many_fq(out[i * n : (i + 1) * n], 6)  # noqa: E731

    def h6(v):
        return [int(v.c0.c0), int(v.c0.c1), int(v.c1.c0), int(v.c1.c1), int(v.c2.c0), int(v.c2.c1)]

    ok = check("fq6.mul", g(0), h6(a * b))
    ok &= check("fq6.square", g(1), h6(a * a))
    ok &= check("fq6.inverse", g(2), h6(a.inv()))
    return ok


def stage_fq12():
    a, b = rfq12(), rfq12()

    def f(ctx, ins):
        A, B = wire_fq12(ins, 0), wire_fq12(ins, 12)
        return [
            Fq12Ops.mul_montgomery(ctx, A, B),
            Fq12Ops.inverse_montgomery(ctx, A),
            Fq12Ops.frobenius_montgomery(ctx, A, 1),
            Fq12Ops.frobenius_montgomery(ctx, A, 2),
            Fq12Ops.frobenius_montgomery(ctx, A, 3),
            Fq12Ops.conjugate(ctx, A),
        ]

    out = run(f, enc_fq12(a) + enc_fq12(b), "fq12 ops")
    n = 12 * 254
    vals = [dec_fq12(out[i * n : (i + 1) * n]) for i in range(6)]
    ok = check("fq12.mul", vals[0], a * b)
    ok &= check("fq12.inverse", vals[1], a.inv())
    ok &= check("fq12.frob1", vals[2], a.frobenius(1))
    ok &= check("fq12.frob2", vals[3], a.frobenius(2))
    ok &= check("fq12.frob3", vals[4], a.frobenius(3))
    ok &= check("fq12.conj", vals[5], a.conjugate())
    return ok


def stage_g1():
    g = hc.g1_gen()
    # .double() gives z != 1 so the full Jacobian formulas are exercised
    p1 = hc.G1Jac.from_affine(g.mul(rng.getrandbits(100))).double()
    p2 = hc.G1Jac.from_affine(g.mul(rng.getrandbits(100))).double()

    def f(ctx, ins):
        A, B = wire_g1(ins, 0), wire_g1(ins, 3)
        s = G1Ops.add_montgomery(ctx, A, B)
        d = G1Ops.double_montgomery(ctx, A)
        return [s, d]

    bits = (
        enc_fq(int(p1.x)) + enc_fq(int(p1.y)) + enc_fq(int(p1.z))
        + enc_fq(int(p2.x)) + enc_fq(int(p2.y)) + enc_fq(int(p2.z))
    )
    out = run(f, bits, "g1 add+double")
    vals = dec_many_fq(out, 6)
    sj = p1 + p2
    dj = p1.double()
    got_s = hc.G1Jac(HFq(vals[0]), HFq(vals[1]), HFq(vals[2]))
    got_d = hc.G1Jac(HFq(vals[3]), HFq(vals[4]), HFq(vals[5]))
    ok = check("g1.add", got_s.to_affine(), sj.to_affine())
    ok &= check("g1.double", got_d.to_affine(), dj.to_affine())
    return ok


def stage_g2():
    g = hc.g2_gen()
    p1 = hc.G2Jac.from_affine(g.mul(rng.getrandbits(100))).double()
    p2 = hc.G2Jac.from_affine(g.mul(rng.getrandbits(100))).double()

    def f(ctx, ins):
        A, B = wire_g2(ins, 0), wire_g2(ins, 6)
        return [G2Ops.add_montgomery(ctx, A, B), G2Ops.double_montgomery(ctx, A)]

    def encp(p):
        return enc_fq2(p.x) + enc_fq2(p.y) + enc_fq2(p.z)

    out = run(f, encp(p1) + encp(p2), "g2 add+double")
    n = 254
    fq2s = [dec_fq2(out[i * 2 * n : (i + 1) * 2 * n]) for i in range(6)]
    got_s = hc.G2Jac(fq2s[0], fq2s[1], fq2s[2])
    got_d = hc.G2Jac(fq2s[3], fq2s[4], fq2s[5])
    ok = check("g2.add", got_s.to_affine(), (p1 + p2).to_affine())
    ok &= check("g2.double", got_d.to_affine(), p1.double().to_affine())
    return ok


def stage_affine():
    from gsv_tpu.gadgets.groth16 import projective_to_affine_montgomery

    pj = hc.G1Jac.from_affine(hc.g1_gen().mul(rng.getrandbits(100))).double()

    def f(ctx, ins):
        return [projective_to_affine_montgomery(ctx, wire_g1(ins, 0))]

    bits = enc_fq(int(pj.x)) + enc_fq(int(pj.y)) + enc_fq(int(pj.z))
    out = run(f, bits, "proj->affine")
    vals = dec_many_fq(out, 3)
    aff = pj.to_affine()
    ok = check("affine.x", vals[0], int(aff.x))
    ok &= check("affine.y", vals[1], int(aff.y))
    ok &= check("affine.z", vals[2], 1)
    return ok


def stage_ell():
    # one double_in_place + ell vs host double_in_place coefficients
    q = hc.g2_gen()
    p = hc.g1_gen()
    f0 = rfq12()

    def f(ctx, ins):
        fw = wire_fq12(ins, 0)
        pw = wire_g1(ins, 12)  # affine: z=1 (only x,y used by ell)
        qw = wire_g2(ins, 15)
        rw = G2Wire(qw.x, qw.y, qw.z)
        rw2, coeffs = cp.double_in_place_circuit_montgomery(ctx, rw)
        fo = cp.ell_montgomery(ctx, fw, coeffs, pw)
        return [fo]

    one = FP.to_mont(1)
    bits = (
        enc_fq12(f0)
        + enc_fq(int(p.x)) + enc_fq(int(p.y)) + enc_fq(1)
        + enc_fq2(q.x) + enc_fq2(q.y) + enc_fq2(HFq2(HFq(1), HFq(0)))
    )
    out = run(f, bits, "double_in_place+ell")
    got = dec_fq12(out[: 12 * 254])
    r = hp.G2Proj(q.x, q.y, HFq2(HFq(1), HFq(0)))
    coeff = hp.double_in_place(r)
    want = hp.ell(f0, coeff, p)
    return check("ell.double", got, want)


def stage_miller():
    p = hc.g1_gen()
    q = hc.g2_gen()

    def f(ctx, ins):
        pw = wire_g1(ins, 0)
        qw = wire_g2(ins, 3)
        return [cp.multi_miller_loop_montgomery_fast(ctx, [pw], [qw])]

    bits = (
        enc_fq(int(p.x)) + enc_fq(int(p.y)) + enc_fq(1)
        + enc_fq2(q.x) + enc_fq2(q.y) + enc_fq2(HFq2(HFq(1), HFq(0)))
    )
    out = run(f, bits, "miller 1 pair")
    got = dec_fq12(out[: 12 * 254])
    want = hp.miller_loop(p, q)
    return check("miller", got, want)


def stage_miller3():
    """The exact 3-pair evaluate-variant the verifier uses, with the real
    vk/proof values."""
    from gsv_tpu.bn254_host.groth16 import dummy_proof
    from gsv_tpu.gadgets.bn254.pairing import g2_key

    vk, proof, publics = dummy_proof(k=6, seed=0)
    msm = hc.G1Jac.from_affine(vk.gamma_abc_g1[0])
    for sc, base in zip(publics, vk.gamma_abc_g1[1:]):
        msm = msm + hc.G1Jac.from_affine(base.mul(int(sc)))
    msm_aff = msm.to_affine()
    neg_gamma = -vk.gamma_g2
    neg_delta = -vk.delta_g2

    def f(ctx, ins):
        p1 = wire_g1(ins, 0)
        p2 = wire_g1(ins, 3)
        p3 = wire_g1(ins, 6)
        q3 = wire_g2(ins, 9)
        return [
            cp.multi_miller_loop_groth16_evaluate_montgomery_fast(
                ctx, p1, p2, p3, q3,
                q1_key=g2_key(neg_gamma), q2_key=g2_key(neg_delta),
            )
        ]

    one2 = HFq2(HFq(1), HFq(0))
    bits = (
        enc_fq(int(msm_aff.x)) + enc_fq(int(msm_aff.y)) + enc_fq(1)
        + enc_fq(int(proof.c.x)) + enc_fq(int(proof.c.y)) + enc_fq(1)
        + enc_fq(int(proof.a.x)) + enc_fq(int(proof.a.y)) + enc_fq(1)
        + enc_fq2(proof.b.x) + enc_fq2(proof.b.y) + enc_fq2(one2)
    )
    out = run(f, bits, "miller3 (groth16 evaluate variant)")
    got = dec_fq12(out[: 12 * 254])
    want = hp.multi_miller_loop(
        [(msm_aff, neg_gamma), (proof.c, neg_delta), (proof.a, proof.b)]
    )
    return check("miller3", got, want)


def stage_fe():
    from gsv_tpu.gadgets.bn254.final_exponentiation import final_exponentiation_montgomery

    f0 = hp.miller_loop(hc.g1_gen(), hc.g2_gen())

    def f(ctx, ins):
        return [final_exponentiation_montgomery(ctx, wire_fq12(ins, 0))]

    out = run(f, enc_fq12(f0), "final exponentiation")
    got = dec_fq12(out[: 12 * 254])
    want = hp.final_exponentiation(f0)
    return check("fe", got, want)


def stage_msm():
    from gsv_tpu.bn254_host.groth16 import dummy_proof
    from gsv_tpu.gadgets.bn254.g1 import FrScalarWire
    from gsv_tpu.gadgets.groth16 import MSM_WINDOW

    vk, proof, publics = dummy_proof(k=6, seed=0)
    bases = [hc.G1Jac.from_affine(pt) for pt in vk.gamma_abc_g1[1 : 1 + len(publics)]]

    def f(ctx, ins):
        scalars = [
            FrScalarWire(BigIntWires(ins[i * 254 : (i + 1) * 254]))
            for i in range(len(publics))
        ]
        return [G1Ops.msm_with_constant_bases_montgomery(ctx, scalars, bases, MSM_WINDOW)]

    bits = []
    for s in publics:
        bits += [bool((int(s) >> i) & 1) for i in range(254)]
    out = run(f, bits, "msm")
    vals = dec_many_fq(out, 3)
    want = None
    for sc, base_aff in zip(publics, vk.gamma_abc_g1[1 : 1 + len(publics)]):
        t = hc.G1Jac.from_affine(base_aff.mul(int(sc)))
        want = t if want is None else want + t
    got = hc.G1Jac(HFq(vals[0]), HFq(vals[1]), HFq(vals[2]))
    return check("msm", got.to_affine(), want.to_affine())


def stage_groth():
    from gsv_tpu.bn254_host.groth16 import dummy_proof, verify
    from gsv_tpu.gadgets.groth16 import Groth16Input, build_verify_circuit

    vk, proof, publics = dummy_proof(k=6, seed=0)
    assert verify(vk, proof, publics)
    fn, n_inputs = build_verify_circuit(vk, n_public=len(publics))
    inp = Groth16Input(
        public=[int(x) for x in publics],
        a=hc.G1Jac.from_affine(proof.a),
        b=hc.G2Jac.from_affine(proof.b),
        c=hc.G1Jac.from_affine(proof.c),
    )
    out = run(fn, [bool(b) for b in inp.to_bits()], "FULL groth16_verify")
    return check("groth16", bool(out[0]), True)


STAGES = {
    "fq": stage_fq, "fq2": stage_fq2, "fq6": stage_fq6, "fq12": stage_fq12,
    "g1": stage_g1, "g2": stage_g2, "affine": stage_affine, "ell": stage_ell,
    "miller": stage_miller, "miller3": stage_miller3, "fe": stage_fe,
    "msm": stage_msm, "groth": stage_groth,
}

DEFAULT = ["fq", "fq2", "fq6", "fq12", "g1", "g2", "affine", "ell"]


def main():
    names = sys.argv[1:] or DEFAULT
    results = {}
    for nm in names:
        print(f"== stage {nm} ==", flush=True)
        try:
            results[nm] = STAGES[nm]()
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            results[nm] = False
        print(f"== stage {nm}: {'PASS' if results[nm] else 'FAIL'} ==", flush=True)
    bad = [k for k, v in results.items() if not v]
    print("SUMMARY:", "ALL PASS" if not bad else f"FAILED: {bad}", flush=True)


if __name__ == "__main__":
    main()

"""Gadget-vs-oracle tests: bigint, fp254, Fq2 (fast subset for CI).

The reference's pattern: random values, run the gadget in execute mode,
compare with host arithmetic (SURVEY §4.2).  Heavier tower/curve/pairing
circuits are covered by the gated slow suite (tests/test_slow_e2e.py) and
the staged validator (scripts/validate_stages.py).
"""

import random

import numpy as np
import pytest

from gsv_tpu.circuit import trace_circuit
from gsv_tpu.circuit.interp import ExecuteInterp
from gsv_tpu.circuit.link import link
from gsv_tpu.circuit.runtime import PlanExecutor
from gsv_tpu.circuit.tape import Compiler
from gsv_tpu.gadgets import bigint as bi
from gsv_tpu.gadgets.bigint import BigIntWires, int_from_bits
from gsv_tpu.gadgets.bn254 import fp254
from gsv_tpu.gadgets.bn254.fp254 import FQ_PARAMS as FP

rng = random.Random(1234)


def enc(v, n):
    return [bool((v >> i) & 1) for i in range(n)]


def run_interp(builder, in_bits):
    tmpl, _ = trace_circuit(builder, len(in_bits))
    return ExecuteInterp().run(tmpl, in_bits)


def run_compiled(builder, in_bits):
    tmpl, _ = trace_circuit(builder, len(in_bits))
    plan = link(Compiler().compile(tmpl), len(in_bits))
    out = PlanExecutor(plan).execute(np.array([int(b) for b in in_bits], np.uint8))
    return [bool(v) for v in out]


class TestBigint:
    N = 32

    def _ab(self):
        return rng.getrandbits(self.N), rng.getrandbits(self.N)

    def test_add_sub(self):
        N = self.N
        a, b = self._ab()

        def f(ctx, ins):
            A, B = BigIntWires(ins[:N]), BigIntWires(ins[N:])
            return [bi.add(ctx, A, B), bi.sub(ctx, A, B)]

        out = run_interp(f, enc(a, N) + enc(b, N))
        assert int_from_bits(out[: N + 1]) == a + b
        assert int_from_bits(out[N + 1 : 2 * N + 1]) == (a - b) % 2**N
        assert out[2 * N + 1] == (a < b)

    def test_mul_karatsuba(self):
        N = self.N
        a, b = self._ab()

        def f(ctx, ins):
            return bi.mul(ctx, BigIntWires(ins[:N]), BigIntWires(ins[N:]))

        out = run_interp(f, enc(a, N) + enc(b, N))
        assert int_from_bits(out) == a * b

    def test_mul_by_constant_mod_power_two(self):
        N = self.N
        a, _ = self._ab()
        c = rng.getrandbits(N)

        def f(ctx, ins):
            return bi.mul_by_constant_modulo_power_two(
                ctx, BigIntWires(ins), c=c, power=N
            )

        out = run_interp(f, enc(a, N))
        assert int_from_bits(out) == (a * c) % 2**N

    def test_cmp_and_select(self):
        N = self.N
        a, b = self._ab()
        c = rng.getrandbits(N)

        def f(ctx, ins):
            A, B = BigIntWires(ins[:N]), BigIntWires(ins[N:])
            return [
                bi.greater_than(ctx, A, B),
                bi.equal(ctx, A, B),
                bi.less_than_constant(ctx, A, b=c),
                bi.equal_constant(ctx, A, b=c),
                bi.select(ctx, A, B, 1),  # TRUE wire -> A
            ]

        out = run_interp(f, enc(a, N) + enc(b, N))
        assert out[:4] == [a > b, a == b, a < c, a == c]
        assert int_from_bits(out[4:]) == a

    def test_odd_part(self):
        N = self.N
        v = (rng.getrandbits(N - 4) << 3) | 4  # guarantees some trailing zeros

        def f(ctx, ins):
            o, k = bi.odd_part(ctx, BigIntWires(ins))
            return [o, k]

        out = run_interp(f, enc(v, N))
        odd, tz = v, 0
        while odd % 2 == 0:
            odd //= 2
            tz += 1
        assert int_from_bits(out[:N]) == odd
        assert int_from_bits(out[N:]) == 1 << tz


class TestFp254:
    P = FP.modulus
    N = 254

    def _r(self):
        return rng.randrange(self.P)

    def test_modular_ops_interp(self):
        a, b = self._r(), self._r()
        N, P = self.N, self.P

        def f(ctx, ins):
            A, B = BigIntWires(ins[:N]), BigIntWires(ins[N:])
            return [
                fp254.add(ctx, A, B, fp=FP),
                fp254.sub(ctx, A, B, fp=FP),
                fp254.neg(ctx, A, fp=FP),
                fp254.double(ctx, A, fp=FP),
                fp254.half(ctx, A, fp=FP),
                fp254.div6(ctx, A, fp=FP),
            ]

        out = run_interp(f, enc(a, N) + enc(b, N))
        vals = [int_from_bits(out[i * N : (i + 1) * N]) for i in range(6)]
        assert vals[0] == (a + b) % P
        assert vals[1] == (a - b) % P
        assert vals[2] == (-a) % P
        assert vals[3] == (2 * a) % P
        assert (vals[4] * 2) % P == a
        assert (vals[5] * 6) % P == a

    def test_montgomery_mul_compiled(self):
        a, b = self._r(), self._r()
        N, P = self.N, self.P
        am, bm = FP.to_mont(a), FP.to_mont(b)

        def f(ctx, ins):
            A, B = BigIntWires(ins[:N]), BigIntWires(ins[N:])
            return fp254.mul_montgomery(ctx, A, B, fp=FP)

        out = run_compiled(f, enc(am, N) + enc(bm, N))
        assert FP.from_mont(int_from_bits(out)) == (a * b) % P

    def test_montgomery_constants_match_reference_strings(self):
        # fq.rs:57-62 / fr.rs:65-70
        assert FP.m_inverse == int(
            "4759646384140481320982610724935209484903937857060724391493050186936685796471"
        )
        assert FP.r_inverse == int(
            "18289368484950178621272022062020525048389989670507786348948026221581485535495"
        )
        from gsv_tpu.gadgets.bn254.fp254 import FR_PARAMS

        assert FR_PARAMS.m_inverse == int(
            "5441563794177615591428663161977496376097281981129373443346157590346630955009"
        )
        assert FR_PARAMS.r_inverse == int(
            "17773755579518009376303681366703133516854333631346829854655645366227550102839"
        )


class TestConstantEncoding:
    """Montgomery-encoding conventions for constants (regression guards for
    the double-encoding bug that broke the full verifier): Wire.new_constant
    and Fq2-level equal_constant take STANDARD-form values and encode
    internally; fp254-level constant gadgets take pre-encoded values."""

    def test_g1_constant_single_encoding(self):
        from gsv_tpu.bn254_host.curve import G1Jac, g1_gen
        from gsv_tpu.gadgets.bn254.g1 import G1Wire

        pt = G1Jac.from_affine(g1_gen())

        def f(ctx, ins):
            w = G1Wire.new_constant(pt)
            return [w.x, w.y, w.z]

        out = run_interp(f, [False])
        xs = [int_from_bits(out[i * 254 : (i + 1) * 254]) for i in range(3)]
        assert FP.from_mont(xs[0]) == int(pt.x)
        assert FP.from_mont(xs[1]) == int(pt.y)
        assert FP.from_mont(xs[2]) == int(pt.z)

    def test_fq12_equal_constant_takes_standard_form(self):
        import random as _r

        from gsv_tpu.bn254_host.field import Fq as HFq, Fq2 as HFq2, Fq6 as HFq6, Fq12 as HFq12
        from gsv_tpu.gadgets.bn254.fq import FqWire
        from gsv_tpu.gadgets.bn254.fq2 import Fq2Wire
        from gsv_tpu.gadgets.bn254.fq6 import Fq6Wire
        from gsv_tpu.gadgets.bn254.fq12 import Fq12, Fq12Wire

        r = _r.Random(9)
        v = HFq12(
            HFq6(*[HFq2(HFq(r.randrange(FP.modulus)), HFq(r.randrange(FP.modulus))) for _ in range(3)]),
            HFq6(*[HFq2(HFq(r.randrange(FP.modulus)), HFq(r.randrange(FP.modulus))) for _ in range(3)]),
        )

        def f(ctx, ins):
            w = Fq12Wire.new_constant(v)  # wires hold the Montgomery form
            good = Fq12.equal_constant(ctx, w, v)  # compares vs STANDARD v
            return [good]

        out = run_interp(f, [False])
        assert out[0] is True


class TestBigintEdges:
    """Edge-value matrix (reference bigint tests use zero/max/carry-chain
    values alongside random ones; src/gadgets/bigint/*.rs #[cfg(test)])."""

    N = 16

    def _cases(self):
        n = self.N
        top = (1 << n) - 1
        return [(0, 0), (0, top), (top, top), (top, 1), (1 << (n - 1), 1 << (n - 1))]

    def test_add_sub_mul_edges(self):
        N = self.N

        def f(ctx, ins):
            A, B = BigIntWires(ins[:N]), BigIntWires(ins[N:])
            return [bi.add(ctx, A, B), bi.sub(ctx, A, B), bi.mul(ctx, A, B)]

        for a, b in self._cases():
            out = run_interp(f, enc(a, N) + enc(b, N))
            assert int_from_bits(out[: N + 1]) == a + b, (a, b)
            assert int_from_bits(out[N + 1 : 2 * N + 1]) == (a - b) % 2**N
            assert out[2 * N + 1] == (a < b)
            assert int_from_bits(out[2 * N + 2 :]) == a * b, (a, b)

    def test_cmp_select_edges(self):
        N = self.N

        def f(ctx, ins):
            A, B = BigIntWires(ins[:N]), BigIntWires(ins[N : 2 * N])
            s = ins[2 * N]
            return [
                bi.equal(ctx, A, B),
                bi.equal_zero(ctx, A),
                bi.greater_than(ctx, A, B),
                bi.select(ctx, A, B, s),
            ]

        for a, b in self._cases():
            for s in (0, 1):
                out = run_interp(f, enc(a, N) + enc(b, N) + [bool(s)])
                assert out[0] == (a == b)
                assert out[1] == (a == 0)
                assert out[2] == (a > b)
                assert int_from_bits(out[3:]) == (a if s else b), (a, b, s)

    def test_odd_part_and_halving(self):
        N = self.N

        def f(ctx, ins):
            A = BigIntWires(ins[:N])
            odd, k = bi.odd_part(ctx, A)
            return [odd, k, bi.half(ctx, A), bi.double(ctx, A)]

        for a in (0, 1, 2, 12, 1 << (N - 1), (1 << N) - 2):
            out = run_interp(f, enc(a, N))
            odd = int_from_bits(out[:N])
            k = int_from_bits(out[N : 2 * N])
            if a:
                tz = (a & -a).bit_length() - 1
                assert odd == a >> tz and k == 1 << tz, a
            assert int_from_bits(out[2 * N : 3 * N]) == a >> 1
            assert int_from_bits(out[3 * N :]) == (a * 2) % (1 << (N + 1))

    def test_constant_ops_edges(self):
        N = self.N
        top = (1 << N) - 1

        # c=0 is contractually excluded (add.rs asserts nonzero constants)
        for c in (1, top):
            def f(ctx, ins, c=c):
                A = BigIntWires(ins[:N])
                return [
                    bi.add_constant(ctx, A, b=c),
                    bi.mul_by_constant(ctx, A, c=c),
                    bi.equal_constant(ctx, A, b=c),
                    bi.less_than_constant(ctx, A, b=c) if c else A,
                ]

            a = rng.getrandbits(N)
            out = run_interp(f, enc(a, N))
            assert int_from_bits(out[: N + 1]) == a + c
            assert int_from_bits(out[N + 1 : 3 * N + 1]) == a * c
            assert out[3 * N + 1] == (a == c)
            if c:
                assert out[3 * N + 2] == (a < c)

    def test_multiplexer(self):
        N = 8
        W = 2  # 4-way mux

        def f(ctx, ins):
            vals = [BigIntWires(ins[i * N : (i + 1) * N]) for i in range(4)]
            sel = [ins[4 * N], ins[4 * N + 1]]
            return bi.multiplexer(ctx, vals, sel, w=W)

        vals = [rng.getrandbits(N) for _ in range(4)]
        for s in range(4):
            bits = sum((enc(v, N) for v in vals), []) + [bool(s & 1), bool(s >> 1)]
            out = run_interp(f, bits)
            assert int_from_bits(out) == vals[s], s

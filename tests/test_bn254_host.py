"""Host BN254 + Groth16 oracle tests (replacing the reference's arkworks
test dependency; cf. SURVEY §4.2-§4.3)."""

import random

import pytest

from gsv_tpu.bn254_host.curve import G1, G2, g1_gen, g2_gen
from gsv_tpu.bn254_host.field import BN_X, Fq, Fq2, Fq6, Fq12, Fr, P, R
from gsv_tpu.bn254_host.groth16 import Proof, dummy_proof, verify
from gsv_tpu.bn254_host.pairing import (
    ate_loop_count,
    multi_pairing,
    pairing,
)


class TestFields:
    def test_fq_inverse(self):
        rng = random.Random(0)
        for _ in range(10):
            a = Fq(rng.getrandbits(253) | 1)
            assert a * a.inv() == Fq(1)

    def test_fq2_tower(self):
        a = Fq2(Fq(3), Fq(7))
        assert a * a.inv() == Fq2.one()
        # u^2 = -1
        u = Fq2(Fq(0), Fq(1))
        assert u * u == Fq2(Fq(P - 1), Fq(0))

    def test_fq12_frobenius_is_pth_power(self):
        rng = random.Random(1)

        def rfq2():
            return Fq2(Fq(rng.getrandbits(250)), Fq(rng.getrandbits(250)))

        f = Fq12(Fq6(rfq2(), rfq2(), rfq2()), Fq6(rfq2(), rfq2(), rfq2()))
        assert f.frobenius(1) == f.pow(P)

    def test_fq_sqrt(self):
        a = Fq(12345)
        sq = a * a
        s = sq.sqrt()
        assert s is not None and s * s == sq

    def test_fq2_sqrt(self):
        a = Fq2(Fq(987), Fq(654))
        s = a.square().sqrt()
        assert s is not None and s.square() == a.square()

    def test_montgomery_roundtrip(self):
        a = Fq(987654321)
        assert Fq.from_mont(a.to_mont()) == a
        b = Fr(123456789)
        assert Fr.from_mont(b.to_mont()) == b


class TestCurves:
    def test_generators(self):
        assert g1_gen().is_on_curve()
        assert g2_gen().is_on_curve()
        assert g1_gen().mul(R).is_infinity
        assert g2_gen().mul(R).is_infinity

    def test_group_law(self):
        g = g1_gen()
        assert g + g == g.double()
        assert (g.mul(5) + g.mul(7)) == g.mul(12)
        h = g2_gen()
        assert (h.mul(5) + h.mul(7)) == h.mul(12)

    def test_compression_roundtrip(self):
        for k in (1, 2, 12345):
            p = g1_gen().mul(k)
            assert G1.from_compressed(p.to_compressed()) == p
            q = g2_gen().mul(k)
            assert G2.from_compressed(q.to_compressed()) == q
        assert G1.from_compressed(G1.infinity().to_compressed()).is_infinity


class TestPairing:
    def test_ate_loop_count(self):
        d = ate_loop_count()
        assert sum(di * (1 << i) for i, di in enumerate(d)) == 6 * BN_X + 2
        assert all(di in (-1, 0, 1) for di in d)

    def test_bilinearity(self):
        e = pairing(g1_gen(), g2_gen())
        assert e != Fq12.one()
        assert pairing(g1_gen().mul(3), g2_gen().mul(5)) == e.pow(15)

    def test_r_torsion(self):
        assert pairing(g1_gen(), g2_gen()).pow(R) == Fq12.one()

    def test_product(self):
        assert multi_pairing([(g1_gen(), g2_gen()), (-g1_gen(), g2_gen())]) == Fq12.one()


class TestGroth16:
    @pytest.fixture(scope="class")
    def fixture(self):
        return dummy_proof(k=4, seed=0)

    def test_valid_proof(self, fixture):
        vk, proof, publics = fixture
        assert verify(vk, proof, publics)

    def test_bitflip_rejected(self, fixture):
        # the reference's run_false_bitflip_test pattern (groth16.rs:510-539)
        vk, proof, publics = fixture
        assert not verify(vk, Proof(proof.a.double(), proof.b, proof.c), publics)
        assert not verify(vk, Proof(proof.a, proof.b.double(), proof.c), publics)
        assert not verify(vk, Proof(proof.a, proof.b, proof.c.double()), publics)
        assert not verify(vk, proof, [publics[0] + Fr(1)])

    def test_deterministic(self):
        vk1, p1, x1 = dummy_proof(k=4, seed=7)
        vk2, p2, x2 = dummy_proof(k=4, seed=7)
        assert p1.a == p2.a and x1 == x2

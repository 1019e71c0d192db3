"""BitVM glue tests: adaptor signatures + VSSS (reference: src/cac/mod.rs
13-step flow, adaptor_sigs.rs and vsss.rs unit tests)."""

import hashlib
import random

import pytest

from gsv_tpu.protocol.cac import (
    G,
    SECP_N,
    AdaptorInfo,
    Polynomial,
    WideAdaptorInfo,
    bip340_verify,
    lagrange_interpolate_whole_polynomial,
    taproot_output_key,
    verify_share,
)


@pytest.fixture(scope="module")
def rng():
    return random.Random(99)


class TestSecp:
    def test_generator_order(self):
        assert G.mul(SECP_N).is_infinity
        assert (G.mul(5) + G.mul(7)) == G.mul(12)


class TestAdaptor:
    def test_full_flow(self, rng):
        secret = rng.randrange(1, SECP_N)
        eval_secret = rng.randrange(1, SECP_N)
        msg = hashlib.sha256(b"tx").digest()
        ad = AdaptorInfo.new(eval_secret, G.mul(secret), msg, rng)
        sig = ad.garbler_signature(secret)
        # completed signature is valid BIP-340 under the evaluator key
        assert bip340_verify(G.mul(eval_secret).x.to_bytes(32, "big"), msg, sig)
        # evaluator recovers the garbler secret from the published signature
        assert ad.extract_secret(sig) == secret

    def test_wrong_sig_rejected(self, rng):
        secret = rng.randrange(1, SECP_N)
        ad = AdaptorInfo.new(
            rng.randrange(1, SECP_N), G.mul(secret), b"\x01" * 32, rng
        )
        with pytest.raises(ValueError):
            ad.extract_secret(b"\x00" * 64)

    def test_wide_adaptor(self, rng):
        secrets = [rng.randrange(1, SECP_N) for _ in range(3)]
        eval_secret = rng.randrange(1, SECP_N)
        msg = hashlib.sha256(b"wide").digest()
        wide = WideAdaptorInfo(eval_secret, [G.mul(s) for s in secrets], msg, rng)
        sig = wide.garbler_signature(secrets[1])
        assert wide.extract_secret(sig) == secrets[1]


class TestVSSS:
    def test_share_verification(self, rng):
        poly = Polynomial.rand(rng, 2)
        commits = poly.coefficient_commits()
        for x, s in poly.shares(5):
            assert verify_share(x, s, commits)

    def test_bad_share_rejected(self, rng):
        poly = Polynomial.rand(rng, 2)
        commits = poly.coefficient_commits()
        x, s = poly.shares(1)[0]
        assert not verify_share(x, (s + 1) % SECP_N, commits)

    def test_interpolation(self, rng):
        poly = Polynomial.rand(rng, 3)
        shares = poly.shares(6)
        rec = lagrange_interpolate_whole_polynomial(shares, 3)
        assert rec.values == poly.values
        assert rec.secret == poly.secret

    def test_taproot_tweak(self, rng):
        pk = G.mul(rng.randrange(1, SECP_N))
        out = taproot_output_key(pk.x.to_bytes(32, "big"))
        assert len(out) == 32


class TestBlake3:
    def test_official_vectors(self):
        from gsv_tpu.ops.blake3_host import blake3

        pat = lambda n: bytes(i % 251 for i in range(n))  # noqa: E731
        assert (
            blake3(b"").hex()
            == "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
        )
        assert (
            blake3(bytes([0])).hex()
            == "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213"
        )
        assert (
            blake3(pat(1025)).hex()
            == "d00278ae47eb27b34faecf67b4fe263f82d5412916c1ffd97c8cb7fb814b8444"
        )
        assert (
            blake3(pat(2048)).hex()
            == "e776b6028c7cd22a4d0ba182a8bf62205d2ef576467e838ed6f2529b85fba24a"
        )
        assert (
            blake3(pat(3072)).hex()
            == "b98cb0ff3623be03326b373de6b9095218513e64f1ee2edd2525c7ad1e5cffd2"
        )

    def test_gate_hash_shape(self):
        from gsv_tpu.ops.blake3_host import blake3_hash_with_gate, s_hash

        h = blake3_hash_with_gate(0x1234, 7)
        assert 0 <= h < 1 << 128
        assert s_hash(h) != h

    def test_blake3_interp_garble_roundtrip(self):
        # the Blake3 hasher plugs into the interpreters as the gate hash
        from itertools import product

        from gsv_tpu.circuit import component, trace_circuit
        from gsv_tpu.circuit.interp import EvalWire, EvaluateInterp, GarbleInterp
        from gsv_tpu.ops.blake3_host import blake3_hash_with_gate

        @component
        def g(ctx, a, b):
            return ctx.xor(ctx.and_(a, b), b)

        def circ(ctx, ins):
            return [g(ctx, ins[0], ins[1])]

        tmpl, _ = trace_circuit(circ, 2)
        gi = GarbleInterp(seed=3, hash_fn=blake3_hash_with_gate)
        out_l0, in_l0 = gi.run(tmpl)
        for bits in product([False, True], repeat=2):
            ev = EvaluateInterp(
                true_label=gi.true_label0 ^ gi.delta,
                false_label=gi.false_label0,
                hash_fn=blake3_hash_with_gate,
            )
            inputs = [
                EvalWire(l ^ (gi.delta if b else 0), b)
                for l, b in zip(in_l0, bits)
            ]
            outs = ev.run(tmpl, inputs, gi.ciphertexts)
            want = (bits[0] and bits[1]) != bits[1]
            assert outs[0].value == want
            assert outs[0].label == (out_l0[0] ^ (gi.delta if want else 0))


def test_neg_pos_sum_of_powers_of_two():
    """cac/utils.rs:2 parity: the ±2^i decomposition reconstructs the value,
    never exceeds the plain binary weight, and drives scalar-mul correctly."""
    import random

    from gsv_tpu.protocol.cac import G, _naf_mul, neg_pos_sum_of_powers_of_two

    rng = random.Random(3)
    for _ in range(200):
        k = rng.randrange(0, 1 << 64)
        bits = [(k >> i) & 1 == 1 for i in range(k.bit_length())]
        d = neg_pos_sum_of_powers_of_two(bits)
        assert sum(v << i for i, v in enumerate(d)) == k, k
        assert sum(1 for v in d if v) <= max(1, bin(k).count("1")), k
        assert not d or d[-1] != 0
    for k in (0, 1, 7, 12345, (1 << 62) - 1):
        assert _naf_mul(G, k) == G.mul(k), k

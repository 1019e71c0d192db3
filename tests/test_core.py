"""Core type tests: labels, gate types / alphas, RNG bit-exactness.

Mirrors the reference's unit tests in ``src/core/s.rs:176-260`` (label
algebra) and ``src/core/gate_type.rs:181-303`` (alpha-parameter equations).
"""

import numpy as np
import pytest

from gsv_tpu.core import (
    ALPHA_A,
    ALPHA_B,
    ALPHA_C,
    FREE_MASK,
    GateCount,
    GateType,
)
from gsv_tpu.core.gate_types import (
    AND_VARIANTS,
    TRUTH_TABLE,
    alphas,
    and_variant,
    execute_gate,
    truth_table,
)
from gsv_tpu.core.labels import (
    int_array_from_words,
    int_from_words,
    s_from_bytes,
    s_neg,
    s_to_bytes,
    words_from_buffer,
    words_from_int,
    words_from_int_array,
    words_to_bytes,
)
from gsv_tpu.core.rng import ChaCha20Rng, GarblerRng, seed_bytes_from_u64


class TestLabels:
    def test_bytes_roundtrip(self):
        rng = np.random.default_rng(42)
        for _ in range(50):
            b = rng.bytes(16)
            assert s_to_bytes(s_from_bytes(b)) == b

    def test_words_roundtrip(self):
        rng = np.random.default_rng(0)
        vals = [int(x) for x in rng.integers(0, 2**63, size=20)] + [
            (1 << 128) - 1,
            0,
            1 << 127,
        ]
        vals = [v * 3_000_000_007 % (1 << 128) for v in vals]
        w = words_from_int_array(vals)
        assert int_array_from_words(w) == vals
        for v in vals:
            assert int_from_words(words_from_int(v)) == v

    def test_words_bytes_endianness(self):
        # word layout must serialize exactly like u128::to_be_bytes
        v = 0x0102030405060708090A0B0C0D0E0F10
        assert words_to_bytes(words_from_int(v)[None, :]) == s_to_bytes(v)
        assert np.array_equal(
            words_from_buffer(s_to_bytes(v)), words_from_int(v)[None, :]
        )

    def test_xor_identities(self):
        a = 0xDEADBEEF_CAFEBABE_12345678_9ABCDEF0
        b = 0x0F0F0F0F_F0F0F0F0_00FF00FF_FF00FF00
        assert a ^ 0 == a
        assert a ^ a == 0
        assert a ^ b == b ^ a

    def test_neg(self):
        assert s_neg(0) == 0
        assert s_neg(1) == (1 << 128) - 1


class TestGateTypes:
    def test_enum_encoding_matches_reference(self):
        # src/core/gate_type.rs:3-15 — integer values are load-bearing
        assert [g.value for g in GateType] == list(range(11))
        assert GateType.AND == 0 and GateType.OR == 7 and GateType.NOT == 10

    def test_truth_tables(self):
        assert truth_table(GateType.AND) == 8
        assert truth_table(GateType.OR) == 14
        assert truth_table(GateType.XOR) == 6
        assert truth_table(GateType.NAND) == 7

    def test_alpha_equation(self):
        # ((a ^ alpha_a) & (b ^ alpha_b)) ^ alpha_c == f(a, b) for AND-variants
        for gt in AND_VARIANTS:
            aa, ab, ac = alphas(gt)
            for a in (False, True):
                for b in (False, True):
                    got = ((a ^ aa) & (b ^ ab)) ^ ac
                    assert got == execute_gate(gt, a, b), gt

    def test_alpha_const_tables(self):
        expected = {
            GateType.AND: (0, 0, 0),
            GateType.NAND: (0, 0, 1),
            GateType.NIMP: (0, 1, 0),
            GateType.IMP: (0, 1, 1),
            GateType.NCIMP: (1, 0, 0),
            GateType.CIMP: (1, 0, 1),
            GateType.NOR: (1, 1, 0),
            GateType.OR: (1, 1, 1),
        }
        for gt, (a, b, c) in expected.items():
            assert (ALPHA_A[gt], ALPHA_B[gt], ALPHA_C[gt]) == (a, b, c)

    def test_and_variant_mapping(self):
        # ((a ^ f0) & (b ^ f1)) ^ f2 semantics (src/core/gate.rs:180-196)
        for f0 in (False, True):
            for f1 in (False, True):
                for f2 in (False, True):
                    gt = and_variant(f0, f1, f2)
                    for a in (False, True):
                        for b in (False, True):
                            want = ((a ^ f0) & (b ^ f1)) ^ f2
                            assert execute_gate(gt, a, b) == want

    def test_free_mask(self):
        for gt in range(11):
            assert bool(FREE_MASK[gt]) == (gt in (8, 9, 10))

    def test_packed_truth_table(self):
        for gt in range(11):
            for a in (0, 1):
                for b in (0, 1):
                    want = execute_gate(gt, bool(a), bool(b))
                    got = bool((int(TRUTH_TABLE[gt]) >> (a * 2 + b)) & 1)
                    assert got == want

    def test_gate_count(self):
        gc = GateCount()
        gc.handle(GateType.AND, 3)
        gc.handle(GateType.XOR, 5)
        gc.handle(GateType.NOT, 2)
        assert gc.total == 10
        assert gc.nonfree == 3
        assert gc.free == 7
        gc2 = GateCount()
        gc2.add(gc, times=4)
        assert gc2.total == 40 and gc2.nonfree == 12


class TestRng:
    def test_seed_from_u64_is_deterministic(self):
        assert seed_bytes_from_u64(0) == seed_bytes_from_u64(0)
        assert seed_bytes_from_u64(1) != seed_bytes_from_u64(0)
        assert len(seed_bytes_from_u64(123)) == 32

    def test_chacha_vs_openssl(self):
        pytest.importorskip("cryptography")
        from cryptography.hazmat.primitives.ciphers import Cipher, algorithms

        key = bytes(range(32))
        nonce = (0).to_bytes(8, "little") + (0).to_bytes(8, "little")
        enc = Cipher(algorithms.ChaCha20(key, nonce), mode=None).encryptor()
        ks = enc.update(b"\x00" * 256)
        rng = ChaCha20Rng(key)
        mine = b"".join(rng.next_u32().to_bytes(4, "little") for _ in range(64))
        assert mine == ks

    def test_u128_word_order(self):
        # gen::<u128>() = low u64 then high u64; next_u64 = low u32 then high u32
        key = bytes(32)
        r1 = ChaCha20Rng(key)
        words = [r1.next_u32() for _ in range(4)]
        r2 = ChaCha20Rng(key)
        v = r2.next_u128()
        want = words[0] | (words[1] << 32) | (words[2] << 64) | (words[3] << 96)
        assert v == want

    def test_garbler_rng_draw_order(self):
        g = GarblerRng(7)
        r = ChaCha20Rng.seed_from_u64(7)
        assert g.delta == r.next_u128()
        assert g.false_label0 == r.next_u128()
        assert g.true_label0 == r.next_u128()
        assert g.issue_label0() == r.next_u128()

    def test_instances_differ(self):
        assert GarblerRng(1).delta != GarblerRng(2).delta


def test_hw_detection_and_logging():
    from gsv_tpu.core.hw import check_hashing_backend, host_aes_available
    from gsv_tpu.core.logging import init_tracing

    init_tracing()
    assert host_aes_available()  # cryptography is baked into this image
    s = check_hashing_backend()
    assert "host_aes=openssl" in s

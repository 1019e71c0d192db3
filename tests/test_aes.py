"""AES kernel tests: FIPS-197 KAT, bitsliced-vs-oracle equivalence, tweaks,
accumulating hash, gate-hash spec.

The host oracle reproduces the reference's gate hash
(``src/hashers/mod.rs:56-96``: AES-128 with static key 0x42*16 over
label_be_bytes XOR tweak); the bitsliced JAX kernel must match it bit-exactly.
"""

import numpy as np
import pytest

from gsv_tpu.core.labels import words_from_buffer, words_to_bytes
from gsv_tpu.ops.aes_host import (
    Aes128,
    AesAccumulatingHash,
    ROUND_KEYS,
    SBOX,
    STATIC_KEY,
    _aes_encrypt_python,
    aes_hash_with_gate,
    key_schedule,
    tweak_bytes,
)
from gsv_tpu.ops.bits import pack_bits_u32, transpose32, unpack_bits_u32
from gsv_tpu.ops.sbox_circuit import sbox_circuit
from gsv_tpu.ops.tweaks import mul32x32_64, mul64_lo, split64, tweak_words


class TestHostAes:
    def test_fips197_kat(self):
        key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        want = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
        assert Aes128(key).encrypt_block(pt) == want
        assert _aes_encrypt_python(key_schedule(key), pt) == want

    def test_sbox_known_values(self):
        assert SBOX[0x00] == 0x63
        assert SBOX[0x01] == 0x7C
        assert SBOX[0x53] == 0xED
        assert SBOX[0xFF] == 0x16

    def test_static_key_schedule_shape(self):
        assert ROUND_KEYS.shape == (11, 16)
        assert bytes(ROUND_KEYS[0]) == STATIC_KEY

    def test_tweak_spec(self):
        # t0 = gid ^ 0x123456789ABCDEF0 (LE), t1 = gid * 0xDEADBEEFCAFEBABE (LE)
        tw = tweak_bytes(0)
        assert tw[:8] == (0x1234_5678_9ABC_DEF0).to_bytes(8, "little")
        assert tw[8:] == bytes(8)
        gid = 11_174_708_820
        tw = tweak_bytes(gid)
        assert tw[:8] == (gid ^ 0x1234_5678_9ABC_DEF0).to_bytes(8, "little")
        assert tw[8:] == ((gid * 0xDEAD_BEEF_CAFE_BABE) % 2**64).to_bytes(8, "little")

    def test_accumulating_hash_chain(self):
        # h1 = AES(0 ^ ct0); h2 = AES(h1 ^ ct1)
        aes = Aes128()
        ct0, ct1 = bytes(range(16)), bytes(range(16, 32))
        h = AesAccumulatingHash()
        h.update(ct0 + ct1)
        manual = aes.encrypt_block(bytes(a ^ b for a, b in zip(aes.encrypt_block(ct0), ct1)))
        assert h.finalize() == manual


class TestBits:
    def test_transpose32_convention(self):
        rng = np.random.default_rng(3)
        x = rng.integers(0, 2**32, size=(2, 32), dtype=np.uint32)
        y = transpose32(x)
        for t in range(32):
            for i in range(0, 32, 5):
                assert ((int(y[1, t]) >> i) & 1) == ((int(x[1, i]) >> t) & 1)

    def test_transpose32_involution(self):
        rng = np.random.default_rng(4)
        x = rng.integers(0, 2**32, size=(5, 32), dtype=np.uint32)
        assert np.array_equal(transpose32(transpose32(x)), x)

    def test_pack_unpack(self):
        rng = np.random.default_rng(5)
        w = rng.integers(0, 2**32, size=(7,), dtype=np.uint32)
        assert np.array_equal(pack_bits_u32(unpack_bits_u32(w)), w)


class TestSboxCircuit:
    def test_verified_at_build(self):
        c, outs = sbox_circuit()
        assert len(outs) == 8
        # regenerating re-runs the 256-input exhaustive check
        assert c.num_gates() < 400


class TestBitslicedAes:
    @pytest.mark.parametrize("xp_name", ["numpy", "jax"])
    def test_matches_oracle(self, xp_name):
        if xp_name == "jax":
            import jax
            import jax.numpy as jnp

            xp = jnp
        else:
            xp = np
        from gsv_tpu.ops.aes_jax import aes_encrypt_words

        rng = np.random.default_rng(6)
        data = rng.bytes(16 * 32)
        blocks = words_from_buffer(data)
        if xp_name == "jax":
            out = np.asarray(jax.jit(lambda b: aes_encrypt_words(b, xp=xp))(blocks))
        else:
            out = aes_encrypt_words(blocks, xp=np)
        assert words_to_bytes(out) == Aes128().encrypt_blocks(data)

    def test_gate_hash_equivalence(self):
        # full gate-hash path: tweak XOR + AES == host aes_hash_with_gate
        from gsv_tpu.ops.aes_jax import aes_encrypt_words

        rng = np.random.default_rng(7)
        labels = [int.from_bytes(rng.bytes(16), "big") for _ in range(32)]
        gids = [int(g) for g in rng.integers(0, 2**40, size=32)]
        from gsv_tpu.core.labels import words_from_int_array

        lw = words_from_int_array(labels)
        hi, lo = split64(gids)
        tw = tweak_words(hi, lo)
        out = aes_encrypt_words(lw ^ tw, xp=np)
        got = [int.from_bytes(words_to_bytes(out[i : i + 1]), "big") for i in range(32)]
        want = [aes_hash_with_gate(l, g) for l, g in zip(labels, gids)]
        assert got == want


class TestU64Math:
    def test_mul32x32(self):
        rng = np.random.default_rng(8)
        a = rng.integers(0, 2**32, size=100, dtype=np.uint32)
        b = rng.integers(0, 2**32, size=100, dtype=np.uint32)
        hi, lo = mul32x32_64(a, b)
        for i in range(100):
            p = int(a[i]) * int(b[i])
            assert (int(hi[i]) << 32) | int(lo[i]) == p

    def test_mul64_lo(self):
        rng = np.random.default_rng(9)
        xs = [int(x) for x in rng.integers(0, 2**63, size=50)]
        k = 0xDEAD_BEEF_CAFE_BABE
        xh, xl = split64(xs)
        hi, lo = mul64_lo(xh, xl, np.uint32(k >> 32), np.uint32(k & 0xFFFFFFFF))
        for i, x in enumerate(xs):
            want = (x * k) % 2**64
            assert (int(hi[i]) << 32) | int(lo[i]) == want


def _assert_matches_host(fn, n=64, seed=7):
    import jax.numpy as jnp

    from gsv_tpu.ops.aes_host import Aes128

    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 2**32, size=(n, 4), dtype=np.uint32)
    got = np.asarray(fn(jnp.asarray(blocks)))
    aes = Aes128(bytes([0x42] * 16))
    for i in range(blocks.shape[0]):
        inp = b"".join(int(w).to_bytes(4, "big") for w in blocks[i])
        want = aes.encrypt_block(inp)
        have = b"".join(int(w).to_bytes(4, "big") for w in got[i])
        assert have == want, i


def test_pallas_aes_matches_host():
    """Pallas kernel (interpret mode on CPU) == host OpenSSL AES."""
    from gsv_tpu.ops.aes_pallas import aes_encrypt_words_pallas

    _assert_matches_host(lambda b: aes_encrypt_words_pallas(b, interpret=True))


def test_pallas_aes_fused_variants_match_host():
    """Both fused kernels (in-kernel bit transposes; v2 adds the in-kernel
    layout transpose) == host OpenSSL AES, incl. a padded-lane shape."""
    from gsv_tpu.ops.aes_pallas import (aes_encrypt_words_fused,
                                        aes_encrypt_words_fused2)

    for n in (64, 4128):  # 4128/32 = 129 groups: exercises lane-tile padding
        _assert_matches_host(
            lambda b: aes_encrypt_words_fused(b, interpret=True), n=n)
        _assert_matches_host(
            lambda b: aes_encrypt_words_fused2(b, interpret=True), n=n)

"""Bit-exact reimplementation of the reference's label RNG.

The reference derives all garbling randomness from a ``u64`` seed via
``ChaChaRng::seed_from_u64(seed)`` (rand_chacha 0.3.1 ``ChaCha20Rng`` with the
rand_core 0.6.4 default ``seed_from_u64``) and draws labels with
``rng.gen::<u128>()`` (``src/circuit/modes/garble_mode.rs:80-97``,
``src/core/s.rs:57-59``).  Seed-reproducibility is the reference's
checkpoint/consistency story (a garbled instance is fully recoverable from its
seed), so this module reproduces the exact byte stream:

- ``seed_from_u64``: rand_core 0.6.4's default impl — a PCG32 step per 4-byte
  chunk of the 32-byte seed (MUL=6364136223846793005, INC=11634580027462260723).
- ChaCha20 block function per RFC 8439 with a 64-bit block counter in state
  words 12-13 and a 64-bit stream id (zero) in words 14-15 — rand_chacha's
  layout.
- ``next_u32`` walks the 16-word little-endian block output in order;
  ``next_u64`` = two u32 draws (low word first); ``gen::<u128>`` = two u64
  draws (low u64 first — rand 0.8.5's ``Standard`` impl for u128).

Only a handful of draws happen per garbling instance (Δ, the two constant
wires, one label per input wire), so pure Python is plenty fast.
"""

from __future__ import annotations

MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF

_PCG_MUL = 6364136223846793005
_PCG_INC = 11634580027462260723

_CHACHA_CONSTANTS = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)


def seed_bytes_from_u64(state: int) -> bytes:
    """rand_core 0.6.4 ``SeedableRng::seed_from_u64`` default impl."""
    state &= MASK64
    out = bytearray()
    for _ in range(8):  # 32-byte seed, 4 bytes per PCG32 output
        state = (state * _PCG_MUL + _PCG_INC) & MASK64
        xorshifted = (((state >> 18) ^ state) >> 27) & MASK32
        rot = (state >> 59) & 31
        x = ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & MASK32
        out += x.to_bytes(4, "little")
    return bytes(out)


def _rotl32(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & MASK32


def _quarter_round(s, a, b, c, d):
    s[a] = (s[a] + s[b]) & MASK32
    s[d] = _rotl32(s[d] ^ s[a], 16)
    s[c] = (s[c] + s[d]) & MASK32
    s[b] = _rotl32(s[b] ^ s[c], 12)
    s[a] = (s[a] + s[b]) & MASK32
    s[d] = _rotl32(s[d] ^ s[a], 8)
    s[c] = (s[c] + s[d]) & MASK32
    s[b] = _rotl32(s[b] ^ s[c], 7)


def chacha20_block(key_words, counter: int, stream: int) -> list[int]:
    """One 64-byte ChaCha20 block as 16 little-endian u32 words.

    ``counter`` is the 64-bit block counter (words 12-13), ``stream`` the
    64-bit stream id (words 14-15) — rand_chacha's state layout.
    """
    init = list(_CHACHA_CONSTANTS) + list(key_words) + [
        counter & MASK32,
        (counter >> 32) & MASK32,
        stream & MASK32,
        (stream >> 32) & MASK32,
    ]
    s = list(init)
    for _ in range(10):  # 10 double rounds = 20 rounds
        _quarter_round(s, 0, 4, 8, 12)
        _quarter_round(s, 1, 5, 9, 13)
        _quarter_round(s, 2, 6, 10, 14)
        _quarter_round(s, 3, 7, 11, 15)
        _quarter_round(s, 0, 5, 10, 15)
        _quarter_round(s, 1, 6, 11, 12)
        _quarter_round(s, 2, 7, 8, 13)
        _quarter_round(s, 3, 4, 9, 14)
    return [(a + b) & MASK32 for a, b in zip(s, init)]


class ChaCha20Rng:
    """rand_chacha 0.3.1 ``ChaCha20Rng`` word stream (stream id 0)."""

    # rand_chacha generates 4 blocks (64 words) per refill; the observable
    # word sequence is the same as generating block-by-block, so we refill
    # one block at a time but keep the same buffer-boundary semantics for
    # ``next_u64`` as rand_core's BlockRng (buffer len 64 words).
    _BUF_WORDS = 64

    def __init__(self, seed: bytes):
        if len(seed) != 32:
            raise ValueError("ChaCha20Rng seed must be 32 bytes")
        self._key = [int.from_bytes(seed[i : i + 4], "little") for i in range(0, 32, 4)]
        self._counter = 0  # 64-bit block counter
        self._buf: list[int] = []
        self._index = self._BUF_WORDS  # force refill on first draw

    @classmethod
    def seed_from_u64(cls, seed: int) -> "ChaCha20Rng":
        return cls(seed_bytes_from_u64(seed))

    def _refill(self) -> None:
        words: list[int] = []
        for _ in range(4):  # 4 blocks per refill, like rand_chacha
            words.extend(chacha20_block(self._key, self._counter, 0))
            self._counter += 1
        self._buf = words
        self._index = 0

    def next_u32(self) -> int:
        if self._index >= len(self._buf):
            self._refill()
        w = self._buf[self._index]
        self._index += 1
        return w

    def next_u64(self) -> int:
        # Mirrors rand_core BlockRng::next_u64 buffer-boundary handling.
        length = self._BUF_WORDS
        index = self._index
        if index < length - 1 and self._buf:
            self._index += 2
            return self._buf[index] | (self._buf[index + 1] << 32)
        if index >= length or not self._buf:
            self._refill()
            self._index = 2
            return self._buf[0] | (self._buf[1] << 32)
        # exactly one word left in the buffer
        x = self._buf[length - 1]
        self._refill()
        self._index = 1
        return x | (self._buf[0] << 32)

    def next_u128(self) -> int:
        """rand 0.8.5 ``gen::<u128>()``: low u64 first, then high u64."""
        lo = self.next_u64()
        hi = self.next_u64()
        return (hi << 64) | lo


class GarblerRng:
    """Draw order of ``GarbleMode::new`` (garble_mode.rs:80-97).

    From a u64 seed: Δ first, then the FALSE-constant wire's label0, then the
    TRUE-constant wire's label0, then one label0 per call to
    ``issue_garbled_wire`` (input encoding).  ``label1 = label0 ^ Δ`` always.
    """

    def __init__(self, seed: int):
        self.rng = ChaCha20Rng.seed_from_u64(seed)
        self.delta = self.rng.next_u128()
        self.false_label0 = self.rng.next_u128()
        self.true_label0 = self.rng.next_u128()

    def issue_label0(self) -> int:
        return self.rng.next_u128()

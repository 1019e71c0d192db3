"""BitVM glue: Schnorr adaptor signatures and verifiable secret sharing
over secp256k1 (host-side).

Reference parity: ``src/cac/`` — the 13-step flow (cac/mod.rs:17-120):
the evaluator creates adaptor pre-signatures tied to the garbler's share
commitments; publishing a valid BIP-340 signature on-chain reveals the
committed share, and enough revealed shares reconstruct the garbler's
secret polynomial via Lagrange interpolation.

- ``AdaptorInfo`` (cac/adaptor_sigs.rs:31-116): BIP-340 challenge hashing
  with even-Y normalization; ``extract_secret`` recovers the garbler secret
  from a published signature; ``WideAdaptorInfo`` is the any-of-N variant.
- ``Polynomial`` VSSS (cac/vsss.rs): polynomials as evaluations at
  0..degree, share issuance at suffix points, Feldman-style commitment
  verification in the exponent, and whole-polynomial interpolation.
- ``taproot_output_key``: the BIP-341 key-path tweak used by the on-chain
  side (cac/adaptor_sigs.rs:255-278).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

# ----------------------------------------------------------------------
# secp256k1
# ----------------------------------------------------------------------

SECP_P = 2**256 - 2**32 - 977
SECP_N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
SECP_GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
SECP_GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8


@dataclass(frozen=True)
class Point:
    """Affine secp256k1 point; x=y=None is infinity."""

    x: int | None
    y: int | None

    @property
    def is_infinity(self):
        return self.x is None

    def __add__(self, o: "Point") -> "Point":
        if self.is_infinity:
            return o
        if o.is_infinity:
            return self
        if self.x == o.x:
            if (self.y + o.y) % SECP_P == 0:
                return Point(None, None)
            lam = (3 * self.x * self.x) * pow(2 * self.y, -1, SECP_P) % SECP_P
        else:
            lam = (o.y - self.y) * pow(o.x - self.x, -1, SECP_P) % SECP_P
        x3 = (lam * lam - self.x - o.x) % SECP_P
        return Point(x3, (lam * (self.x - x3) - self.y) % SECP_P)

    def __neg__(self):
        if self.is_infinity:
            return self
        return Point(self.x, (-self.y) % SECP_P)

    def __sub__(self, o):
        return self + (-o)

    def mul(self, k: int) -> "Point":
        k %= SECP_N
        r, base = Point(None, None), self
        while k:
            if k & 1:
                r = r + base
            base = base + base
            k >>= 1
        return r


G = Point(SECP_GX, SECP_GY)


def _tagged_hash(tag: bytes, data: bytes) -> bytes:
    th = hashlib.sha256(tag).digest()
    return hashlib.sha256(th + th + data).digest()


def _x32(p: Point) -> bytes:
    return p.x.to_bytes(32, "big")


def bip340_challenge(r_x: bytes, pub_x: bytes, msg: bytes) -> int:
    return int.from_bytes(_tagged_hash(b"BIP0340/challenge", r_x + pub_x + msg), "big") % SECP_N


def bip340_verify(pub_x: bytes, msg: bytes, sig: bytes) -> bool:
    """Standard BIP-340 verification (x-only key, even-Y convention)."""
    if len(sig) != 64:
        return False
    r_x = int.from_bytes(sig[:32], "big")
    s = int.from_bytes(sig[32:], "big")
    if r_x >= SECP_P or s >= SECP_N:
        return False
    px = int.from_bytes(pub_x, "big")
    y2 = (pow(px, 3, SECP_P) + 7) % SECP_P
    py = pow(y2, (SECP_P + 1) // 4, SECP_P)
    if py * py % SECP_P != y2:
        return False
    if py % 2:
        py = SECP_P - py
    P = Point(px, py)
    e = bip340_challenge(sig[:32], pub_x, msg)
    R = G.mul(s) + P.mul(SECP_N - e)
    if R.is_infinity or R.y % 2 or R.x != r_x:
        return False
    return True


# ----------------------------------------------------------------------
# Adaptor signatures (cac/adaptor_sigs.rs)
# ----------------------------------------------------------------------


@dataclass
class AdaptorInfo:
    garbler_commit: Point
    evaluator_nonce_commit: Point
    evaluator_s: int

    @classmethod
    def new(cls, evaluator_secret: int, garbler_commit: Point, message_hash: bytes, rng):
        nonce = rng.randrange(1, SECP_N)
        nonce_commit = G.mul(nonce)
        eval_pub = G.mul(evaluator_secret)
        public_sum = garbler_commit + nonce_commit
        if public_sum.y % 2:  # BIP-340 even-Y normalization
            public_sum = -public_sum
            nonce = SECP_N - nonce
        e = bip340_challenge(_x32(public_sum), _x32(eval_pub), message_hash)
        s = (nonce + e * evaluator_secret) % SECP_N
        return cls(garbler_commit, nonce_commit, s)

    def garbler_signature(self, secret: int) -> bytes:
        """The garbler completes the signature by adding its secret
        (adaptor_sigs.rs:99-116)."""
        commit_sum = self.evaluator_nonce_commit + self.garbler_commit
        if commit_sum.y % 2:
            r = -commit_sum
            s = (self.evaluator_s - secret) % SECP_N
        else:
            r = commit_sum
            s = (self.evaluator_s + secret) % SECP_N
        return _x32(r) + s.to_bytes(32, "big")

    def extract_secret(self, garbler_sig: bytes) -> int:
        """Recover the garbler secret from the published signature
        (adaptor_sigs.rs:80-98)."""
        if len(garbler_sig) != 64:
            raise ValueError("invalid signature length")
        commit_sum = self.evaluator_nonce_commit + self.garbler_commit
        odd = commit_sum.y % 2 == 1
        if garbler_sig[:32] != _x32(commit_sum):
            raise ValueError("Unexpected nonce value")
        garbler_s = int.from_bytes(garbler_sig[32:], "big") % SECP_N
        diff = (garbler_s - self.evaluator_s) % SECP_N
        return (SECP_N - diff) % SECP_N if odd else diff


class WideAdaptorInfo:
    """Any-of-N adaptor: a signature reveals whichever committed secret was
    used (adaptor_sigs.rs:118-155)."""

    def __init__(self, evaluator_secret: int, garbler_commits: list[Point], message_hash: bytes, rng):
        self.adaptors = [
            AdaptorInfo.new(evaluator_secret, c, message_hash, rng)
            for c in garbler_commits
        ]

    def garbler_signature(self, secret: int) -> bytes:
        commit = G.mul(secret)
        for a in self.adaptors:
            if a.garbler_commit == commit:
                return a.garbler_signature(secret)
        raise ValueError("Secret does not correspond to any of the commits")

    def extract_secret(self, garbler_sig: bytes) -> int:
        for a in self.adaptors:
            try:
                return a.extract_secret(garbler_sig)
            except ValueError:
                continue
        raise ValueError("No valid garbler signature found")


# ----------------------------------------------------------------------
# Verifiable secret sharing (cac/vsss.rs)
# ----------------------------------------------------------------------


def _lagrange_coeffs(xs: list[int], x: int) -> list[int]:
    """L_i(x) over the secp scalar field for nodes ``xs``."""
    out = []
    for i, xi in enumerate(xs):
        num, den = 1, 1
        for j, xj in enumerate(xs):
            if j == i:
                continue
            num = num * ((x - xj) % SECP_N) % SECP_N
            den = den * ((xi - xj) % SECP_N) % SECP_N
        out.append(num * pow(den, -1, SECP_N) % SECP_N)
    return out


@dataclass
class Polynomial:
    """Degree-d polynomial as evaluations at x = 0..d (vsss.rs:100)."""

    values: list[int]  # y-values at 0..degree, mod SECP_N

    @classmethod
    def rand(cls, rng, degree: int) -> "Polynomial":
        return cls([rng.randrange(1, SECP_N) for _ in range(degree + 1)])

    @property
    def secret(self) -> int:
        return self.values[0]

    def eval_at(self, x: int) -> int:
        if x < len(self.values):
            return self.values[x]
        coeffs = _lagrange_coeffs(list(range(len(self.values))), x)
        return sum(c * v for c, v in zip(coeffs, self.values)) % SECP_N

    def shares(self, num_shares: int) -> list[tuple[int, int]]:
        """Shares at the suffix points degree+1 .. degree+num_shares."""
        base = len(self.values)
        return [(x, self.eval_at(x)) for x in range(base, base + num_shares)]

    def coefficient_commits(self) -> list[Point]:
        return [G.mul(v) for v in self.values]


def neg_pos_sum_of_powers_of_two(bits: list[bool]) -> list[int]:
    """Minimal add/sub powers-of-two decomposition of a little-endian bit
    vector (cac/utils.rs:2-28): each maximal run of 1-bits [l..i] collapses
    to +2^(i+1) - 2^l.  Returns digits in {-1, 0, 1}, trailing zeros
    stripped; sum(d_i * 2^i) equals the input value."""
    n = len(bits)
    res = [0] * (n + 1)
    run_start = -1
    for i in range(n):
        if not bits[i]:
            run_start = -1
        elif i == n - 1 or not bits[i + 1]:
            if run_start == -1:
                res[i] = 1
            else:
                res[i + 1] = 1
                res[run_start] = -1
        elif run_start == -1:
            run_start = i
    while res and res[-1] == 0:
        res.pop()
    return res


def _naf_mul(p: Point, k: int, table: list[Point] | None = None) -> Point:
    """k*P via a doubling table and the ±2^i decomposition — the reference's
    USE_TABLES scalar-mul in suffix evaluation (vsss.rs:160-195); runs of
    1-bits cost 2 group ops instead of one add per bit."""
    k %= SECP_N
    bits = [(k >> i) & 1 == 1 for i in range(k.bit_length())]
    digits = neg_pos_sum_of_powers_of_two(bits)
    if table is None:
        table = [p]
        for _ in range(len(digits) - 1):
            table.append(table[-1] + table[-1])
    acc = Point(None, None)
    for i, d in enumerate(digits):
        if d == 1:
            acc = acc + table[i]
        elif d == -1:
            acc = acc - table[i]
    return acc


def verify_share(x: int, share: int, commits: list[Point]) -> bool:
    """Check g^share == prod commit_i^{L_i(x)} (vsss.rs:242-287)."""
    coeffs = _lagrange_coeffs(list(range(len(commits))), x)
    acc = Point(None, None)
    for c, com in zip(coeffs, commits):
        acc = acc + _naf_mul(com, c)
    return acc == G.mul(share)


def lagrange_interpolate_whole_polynomial(
    shares: list[tuple[int, int]], degree: int
) -> Polynomial:
    """Recover evaluations at 0..degree from degree+1 shares (vsss.rs:289-353)."""
    assert len(shares) >= degree + 1
    shares = shares[: degree + 1]
    xs = [x for x, _ in shares]
    values = []
    for target in range(degree + 1):
        coeffs = _lagrange_coeffs(xs, target)
        values.append(sum(c * s for c, (_, s) in zip(coeffs, shares)) % SECP_N)
    return Polynomial(values)


# ----------------------------------------------------------------------
# Taproot helper (cac/adaptor_sigs.rs:255-278)
# ----------------------------------------------------------------------


def taproot_output_key(internal_pub_x: bytes, merkle_root: bytes = b"") -> bytes:
    """BIP-341 key-path output key: P + H_taptweak(P||root)*G (x-only)."""
    t = int.from_bytes(_tagged_hash(b"TapTweak", internal_pub_x + merkle_root), "big")
    assert t < SECP_N
    px = int.from_bytes(internal_pub_x, "big")
    y2 = (pow(px, 3, SECP_P) + 7) % SECP_P
    py = pow(y2, (SECP_P + 1) // 4, SECP_P)
    if py % 2:
        py = SECP_P - py
    out = Point(px, py) + G.mul(t)
    return _x32(out)

"""Bitsliced AES S-box boolean circuit, derived programmatically.

The TPU garbling kernels evaluate AES-128 bitsliced: every byte of the AES
state is held as 8 one-bit planes vectorized over blocks, so SubBytes must be
a boolean circuit over the 8 planes.  Instead of transcribing a published
gate listing, this module *derives* a circuit from the composite-field
construction and verifies it against the S-box table at import time:

    S(x) = A · inv(x) ^ 0x63          (AES definition)
    inv computed in the tower GF(((2^2)^2)^2)-style field GF(16)[Y]/(Y^2+Y+nu)
    with GF(16) = GF(2)[x]/(x^4+x+1):

        e = ah·Y + al
        d = nu·ah^2 + ah·al + al^2    (the field norm, an element of GF(16))
        e^-1 = (ah·d^-1)·Y + (ah+al)·d^-1

    The isomorphism M : GF(2^8)_poly -> tower is found by locating a root r
    of the AES polynomial x^8+x^4+x^3+x+1 in the tower field and mapping
    2^i -> r^i; the output linear layer folds A·M^-1 and the 0x63 constant.

The result is an SSA program of AND/XOR/NOT ops (~120 gates) that both the
pure-jnp and the Pallas kernels replay on (16, m)-shaped uint32 plane arrays.

Replaces the role of the reference's AES-NI instruction path
(``src/hashers/aes_ni.rs``) on hardware with no AES instructions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# ------------------------------------------------------------------
# GF(16) arithmetic (polynomial basis mod x^4 + x + 1)
# ------------------------------------------------------------------


def _gf16_mul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x10:
            a ^= 0x13
        b >>= 1
    return r


def _gf16_inv(a: int) -> int:
    if a == 0:
        return 0
    for x in range(1, 16):
        if _gf16_mul(a, x) == 1:
            return x
    raise AssertionError


# ------------------------------------------------------------------
# Tower field GF(16)[Y] / (Y^2 + Y + NU)
# ------------------------------------------------------------------


def _pick_nu() -> int:
    for nu in range(1, 16):
        # irreducible iff no root t in GF(16): t^2 + t + nu == 0
        if all(_gf16_mul(t, t) ^ t ^ nu != 0 for t in range(16)):
            return nu
    raise AssertionError("no irreducible Y^2+Y+nu found")


NU = _pick_nu()


def _tower_mul(x: int, y: int) -> int:
    xh, xl = x >> 4, x & 0xF
    yh, yl = y >> 4, y & 0xF
    hh = _gf16_mul(xh, yh)
    ll = _gf16_mul(xl, yl)
    mid = _gf16_mul(xh ^ xl, yh ^ yl)
    # (xh Y + xl)(yh Y + yl) = hh Y^2 + (mid^hh^ll) Y + ll ; Y^2 = Y + NU
    # => Y coeff: (mid^hh^ll) ^ hh = mid ^ ll ; const: ll ^ NU*hh
    h = mid ^ ll
    l = ll ^ _gf16_mul(hh, NU)
    return (h << 4) | l


def _tower_inv(x: int) -> int:
    xh, xl = x >> 4, x & 0xF
    d = _gf16_mul(NU, _gf16_mul(xh, xh)) ^ _gf16_mul(xh, xl) ^ _gf16_mul(xl, xl)
    di = _gf16_inv(d)
    return (_gf16_mul(xh, di) << 4) | _gf16_mul(xh ^ xl, di)


def _find_isomorphism() -> tuple[np.ndarray, np.ndarray]:
    """Matrix M (and inverse) mapping AES poly-basis bytes to tower bytes."""
    from gsv_tpu.ops.aes_host import _gf256_mul

    # find a root of x^8+x^4+x^3+x+1 in the tower field
    root = None
    for r in range(2, 256):
        # evaluate r^8 + r^4 + r^3 + r + 1 using tower arithmetic
        p = {}
        v = 1
        pw = {0: 1}
        for i in range(1, 9):
            v = _tower_mul(v, r)
            pw[i] = v
        acc = pw[8] ^ pw[4] ^ pw[3] ^ pw[1] ^ 1
        if acc == 0:
            root = r
            break
    assert root is not None, "no root of the AES polynomial in tower field"

    # M columns: tower encodings of root^i  (i = bit index of poly byte)
    cols = []
    v = 1
    for i in range(8):
        cols.append(v)
        v = _tower_mul(v, root)
    M = np.zeros((8, 8), dtype=np.uint8)
    for i, c in enumerate(cols):
        for bit in range(8):
            M[bit, i] = (c >> bit) & 1

    # invert over GF(2)
    Mi = _gf2_matrix_inv(M)

    # verify ring isomorphism on a few products
    rng = np.random.default_rng(0)
    for _ in range(64):
        a, b = int(rng.integers(0, 256)), int(rng.integers(0, 256))
        pa, pb = _apply_matrix(M, a), _apply_matrix(M, b)
        assert _apply_matrix(Mi, _tower_mul(pa, pb)) == _gf256_mul(a, b)
    return M, Mi


def _gf2_matrix_inv(M: np.ndarray) -> np.ndarray:
    n = M.shape[0]
    A = M.astype(np.uint8).copy()
    I = np.eye(n, dtype=np.uint8)
    for col in range(n):
        piv = None
        for r in range(col, n):
            if A[r, col]:
                piv = r
                break
        assert piv is not None, "singular matrix"
        if piv != col:
            A[[col, piv]] = A[[piv, col]]
            I[[col, piv]] = I[[piv, col]]
        for r in range(n):
            if r != col and A[r, col]:
                A[r] ^= A[col]
                I[r] ^= I[col]
    assert np.array_equal(A, np.eye(n, dtype=np.uint8))
    return I


def _apply_matrix(M: np.ndarray, x: int) -> int:
    out = 0
    for row in range(M.shape[0]):
        b = 0
        for col in range(M.shape[1]):
            if M[row, col]:
                b ^= (x >> col) & 1
        out |= b << row
    return out


# ------------------------------------------------------------------
# SSA circuit builder
# ------------------------------------------------------------------

OP_XOR = 0
OP_AND = 1
OP_NOT = 2


@dataclass
class Circuit:
    """SSA op list over single-bit registers; inputs are regs 0..n_inputs-1."""

    n_inputs: int
    ops: list[tuple[int, int, int, int]] = field(default_factory=list)  # (op, dst, a, b)
    _n_regs: int = 0

    def __post_init__(self):
        self._n_regs = self.n_inputs

    def xor(self, a: int, b: int) -> int:
        d = self._n_regs
        self._n_regs += 1
        self.ops.append((OP_XOR, d, a, b))
        return d

    def and_(self, a: int, b: int) -> int:
        d = self._n_regs
        self._n_regs += 1
        self.ops.append((OP_AND, d, a, b))
        return d

    def not_(self, a: int) -> int:
        d = self._n_regs
        self._n_regs += 1
        self.ops.append((OP_NOT, d, a, a))
        return d

    def xor_many(self, regs: list[int]) -> int:
        assert regs
        acc = regs[0]
        for r in regs[1:]:
            acc = self.xor(acc, r)
        return acc

    @property
    def n_regs(self) -> int:
        return self._n_regs

    def num_gates(self) -> int:
        return len(self.ops)

    def eval(self, inputs: list[np.ndarray]) -> list[np.ndarray]:
        """Evaluate on numpy arrays (elementwise AND/XOR/NOT)."""
        regs: list = [None] * self._n_regs
        for i, v in enumerate(inputs):
            regs[i] = v
        for op, d, a, b in self.ops:
            if op == OP_XOR:
                regs[d] = regs[a] ^ regs[b]
            elif op == OP_AND:
                regs[d] = regs[a] & regs[b]
            else:
                regs[d] = ~regs[a]
        return regs


def _linear_layer(c: Circuit, M: np.ndarray, in_regs: list[int], const: int = 0) -> list[int]:
    """out_row = XOR of in_cols selected by M, optionally NOT-ed by const bits."""
    outs = []
    for row in range(M.shape[0]):
        srcs = [in_regs[col] for col in range(M.shape[1]) if M[row, col]]
        r = c.xor_many(srcs) if srcs else None
        assert r is not None, "zero row in linear layer"
        if (const >> row) & 1:
            r = c.not_(r)
        outs.append(r)
    return outs


def _gf16_mul_circuit(c: Circuit, a: list[int], b: list[int]) -> list[int]:
    """Schoolbook GF(16) multiply: 16 ANDs + reduction mod x^4+x+1."""
    # partial products p_k = sum_{i+j=k} a_i b_j, k = 0..6
    p = [[] for _ in range(7)]
    for i in range(4):
        for j in range(4):
            p[i + j].append(c.and_(a[i], b[j]))
    ps = [c.xor_many(terms) for terms in p]
    # reduce: x^4 = x + 1, x^5 = x^2 + x, x^6 = x^3 + x^2
    r0 = c.xor(ps[0], ps[4])
    r1 = c.xor_many([ps[1], ps[4], ps[5]])
    r2 = c.xor_many([ps[2], ps[5], ps[6]])
    r3 = c.xor(ps[3], ps[6])
    return [r0, r1, r2, r3]


def _gf16_linear_matrix(fn) -> np.ndarray:
    """4x4 GF(2) matrix of a linear GF(16) function."""
    M = np.zeros((4, 4), dtype=np.uint8)
    for col in range(4):
        y = fn(1 << col)
        for row in range(4):
            M[row, col] = (y >> row) & 1
    return M


def _gf16_inv_circuit(c: Circuit, x: list[int]) -> list[int]:
    """GF(16) inversion via ANF (Moebius transform) with shared monomials."""
    # ANF coefficients per output bit
    anf = np.zeros((4, 16), dtype=np.uint8)
    for bit in range(4):
        f = np.array([(_gf16_inv(v) >> bit) & 1 for v in range(16)], dtype=np.uint8)
        # Moebius transform
        g = f.copy()
        for i in range(4):
            step = 1 << i
            for v in range(16):
                if v & step:
                    g[v] ^= g[v ^ step]
        anf[bit] = g
    # build needed monomials once
    monomial_reg: dict[int, int] = {}

    def monomial(mask: int) -> int:
        if mask in monomial_reg:
            return monomial_reg[mask]
        # split mask into (lowest bit, rest) for sharing
        low = mask & (-mask)
        rest = mask ^ low
        if rest == 0:
            r = x[low.bit_length() - 1]
        else:
            r = c.and_(monomial(rest), x[low.bit_length() - 1])
        monomial_reg[mask] = r
        return r

    outs = []
    for bit in range(4):
        terms = [monomial(m) for m in range(1, 16) if anf[bit, m]]
        assert anf[bit, 0] == 0, "inv(0)=0 so constant term must be 0"
        outs.append(c.xor_many(terms))
    return outs


def build_sbox_circuit() -> tuple[Circuit, list[int]]:
    """Build and verify the S-box circuit.

    Returns (circuit, output_regs); inputs are regs 0..7 = S-box input bits
    LSB-first, outputs LSB-first.
    """
    M, Mi = _find_isomorphism()
    from gsv_tpu.ops.aes_host import SBOX

    # AES affine matrix A (bit i of output = x_i ^ x_{i+4} ^ x_{i+5} ^ x_{i+6} ^ x_{i+7})
    A = np.zeros((8, 8), dtype=np.uint8)
    for i in range(8):
        for off in (0, 4, 5, 6, 7):
            A[i, (i + off) % 8] = 1
    bottom = (A @ Mi) % 2

    c = Circuit(n_inputs=8)
    xin = list(range(8))

    t = _linear_layer(c, M, xin)  # tower representation
    al, ah = t[:4], t[4:]

    # norm d = nu*ah^2 + ah*al + al^2 ; fold nu*(.)^2 and (.)^2 into matrices
    sq = _gf16_linear_matrix(lambda v: _gf16_mul(v, v))
    sqnu = _gf16_linear_matrix(lambda v: _gf16_mul(NU, _gf16_mul(v, v)))
    ah2nu = _linear_layer(c, sqnu, ah)
    al2 = _linear_layer(c, sq, al)
    ahal = _gf16_mul_circuit(c, ah, al)
    d = [c.xor_many([ah2nu[i], al2[i], ahal[i]]) for i in range(4)]

    di = _gf16_inv_circuit(c, d)

    ih = _gf16_mul_circuit(c, ah, di)
    ahl = [c.xor(ah[i], al[i]) for i in range(4)]
    il = _gf16_mul_circuit(c, ahl, di)

    inv_tower = il + ih  # low nibble, high nibble

    outs = _linear_layer(c, bottom, inv_tower, const=0x63)

    # verify against the table for all 256 inputs
    vals = np.arange(256, dtype=np.uint32)
    planes = [((vals >> b) & 1).astype(np.uint32) for b in range(8)]
    regs = c.eval(planes)
    got = np.zeros(256, dtype=np.uint32)
    for b in range(8):
        got |= (regs[outs[b]] & 1) << b
    assert np.array_equal(got, SBOX.astype(np.uint32)), "S-box circuit verification failed"
    return c, outs


_CACHE: tuple[Circuit, list[int]] | None = None


def sbox_circuit() -> tuple[Circuit, list[int]]:
    global _CACHE
    if _CACHE is None:
        _CACHE = build_sbox_circuit()
    return _CACHE

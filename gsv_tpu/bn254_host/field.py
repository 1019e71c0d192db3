"""BN254 field tower: Fq, Fr, Fq2, Fq6, Fq12 (host-side, pure Python).

Tower (identical to arkworks ark-bn254, which the reference's gadgets and
tests are built against):

    Fq2  = Fq[u]  / (u^2 + 1)
    Fq6  = Fq2[v] / (v^3 - xi),  xi = 9 + u
    Fq12 = Fq6[w] / (w^2 - v)

Montgomery form (R = 2^254) conversion helpers mirror
``src/gadgets/bn254/fq.rs:130-169`` — the circuit gadgets operate on
Montgomery representations.
"""

from __future__ import annotations

from dataclasses import dataclass

P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
BN_X = 4965661367192848881  # the BN parameter x

# Montgomery constants for the 254-bit circuit representation
N_BITS = 254
MONT_R = 1 << 254  # R = 2^254 (fp254impl.rs:24)
MONT_R_MOD_P = MONT_R % P
MONT_R_INV_P = pow(MONT_R, P - 2, P)
MONT_MINV_P = pow(-P, -1, MONT_R)  # M^-1 such that -P * MINV = 1 mod R


class Fq(int):
    """Prime field element mod P; plain ints with helper ops."""

    def __new__(cls, v: int):
        return super().__new__(cls, v % P)

    def __add__(self, o):
        return Fq(int(self) + int(o))

    __radd__ = __add__

    def __sub__(self, o):
        return Fq(int(self) - int(o))

    def __rsub__(self, o):
        return Fq(int(o) - int(self))

    def __mul__(self, o):
        return Fq(int(self) * int(o))

    __rmul__ = __mul__

    def __neg__(self):
        return Fq(-int(self))

    def inv(self):
        return Fq(pow(int(self), P - 2, P))

    def __truediv__(self, o):
        return self * Fq(int(o)).inv()

    def pow(self, e: int):
        return Fq(pow(int(self), e, P))

    def is_zero(self):
        return int(self) % P == 0

    def sqrt(self):
        """Square root via (p+1)/4 (p ≡ 3 mod 4); None if non-residue."""
        c = self.pow((P + 1) // 4)
        if c * c == self:
            return c
        return None

    def legendre(self) -> int:
        l = pow(int(self), (P - 1) // 2, P)
        return -1 if l == P - 1 else int(l)

    # Montgomery form used by the circuit gadgets
    def to_mont(self) -> int:
        return (int(self) * MONT_R_MOD_P) % P

    @staticmethod
    def from_mont(m: int) -> "Fq":
        return Fq(m * MONT_R_INV_P)

    def to_key_bytes(self) -> bytes:
        return int(self).to_bytes(32, "little")


class Fr(int):
    """Scalar field element mod R."""

    def __new__(cls, v: int):
        return super().__new__(cls, v % R)

    def __add__(self, o):
        return Fr(int(self) + int(o))

    __radd__ = __add__

    def __sub__(self, o):
        return Fr(int(self) - int(o))

    def __mul__(self, o):
        return Fr(int(self) * int(o))

    __rmul__ = __mul__

    def __neg__(self):
        return Fr(-int(self))

    def inv(self):
        return Fr(pow(int(self), R - 2, R))

    def pow(self, e: int):
        return Fr(pow(int(self), e, R))

    def to_mont(self) -> int:
        return (int(self) * (MONT_R % R)) % R

    @staticmethod
    def from_mont(m: int) -> "Fr":
        return Fr(m * pow(MONT_R, R - 2, R))

    def to_key_bytes(self) -> bytes:
        return int(self).to_bytes(32, "little")


@dataclass(frozen=True)
class Fq2:
    c0: Fq
    c1: Fq

    @staticmethod
    def new(c0, c1) -> "Fq2":
        return Fq2(Fq(c0), Fq(c1))

    @staticmethod
    def zero() -> "Fq2":
        return Fq2(Fq(0), Fq(0))

    @staticmethod
    def one() -> "Fq2":
        return Fq2(Fq(1), Fq(0))

    def is_zero(self):
        return self.c0.is_zero() and self.c1.is_zero()

    def __add__(self, o):
        return Fq2(self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o):
        return Fq2(self.c0 - o.c0, self.c1 - o.c1)

    def __neg__(self):
        return Fq2(-self.c0, -self.c1)

    def __mul__(self, o):
        if isinstance(o, (int, Fq)):
            return Fq2(self.c0 * o, self.c1 * o)
        # (a0 + a1 u)(b0 + b1 u), u^2 = -1
        t0 = self.c0 * o.c0
        t1 = self.c1 * o.c1
        return Fq2(t0 - t1, (self.c0 + self.c1) * (o.c0 + o.c1) - t0 - t1)

    __rmul__ = __mul__

    def square(self):
        return self * self

    def double(self):
        return self + self

    def conjugate(self):
        return Fq2(self.c0, -self.c1)

    def norm(self) -> Fq:
        return self.c0 * self.c0 + self.c1 * self.c1

    def inv(self):
        n = self.norm().inv()
        return Fq2(self.c0 * n, -self.c1 * n)

    def pow(self, e: int):
        r = Fq2.one()
        b = self
        while e:
            if e & 1:
                r = r * b
            b = b * b
            e >>= 1
        return r

    def frobenius(self, power: int = 1):
        if power % 2 == 0:
            return self
        return self.conjugate()

    def mul_by_nonresidue(self):
        """* (9 + u) — the Fq6 nonresidue xi."""
        return self * XI

    def sqrt(self):
        """Square root in Fq2 (for G2 decompression); None if QNR."""
        if self.c1.is_zero():
            s = self.c0.sqrt()
            if s is not None:
                return Fq2(s, Fq(0))
            # sqrt(c0) = sqrt(-c0) * u since u^2 = -1
            s = (-self.c0).sqrt()
            if s is None:
                return None
            return Fq2(Fq(0), s)
        # alpha = c0^2 + c1^2 must be a QR in Fq
        alpha = self.norm().sqrt()
        if alpha is None:
            return None
        delta = (self.c0 + alpha) * Fq(2).inv()
        if delta.legendre() == -1:
            delta = (self.c0 - alpha) * Fq(2).inv()
        x0 = delta.sqrt()
        if x0 is None:
            return None
        x1 = self.c1 * (x0 + x0).inv()
        cand = Fq2(x0, x1)
        if cand.square() == self:
            return cand
        return None

    def to_key_bytes(self) -> bytes:
        return self.c0.to_key_bytes() + self.c1.to_key_bytes()


XI = Fq2(Fq(9), Fq(1))


@dataclass(frozen=True)
class Fq6:
    c0: Fq2
    c1: Fq2
    c2: Fq2

    @staticmethod
    def zero():
        return Fq6(Fq2.zero(), Fq2.zero(), Fq2.zero())

    @staticmethod
    def one():
        return Fq6(Fq2.one(), Fq2.zero(), Fq2.zero())

    def is_zero(self):
        return self.c0.is_zero() and self.c1.is_zero() and self.c2.is_zero()

    def __add__(self, o):
        return Fq6(self.c0 + o.c0, self.c1 + o.c1, self.c2 + o.c2)

    def __sub__(self, o):
        return Fq6(self.c0 - o.c0, self.c1 - o.c1, self.c2 - o.c2)

    def __neg__(self):
        return Fq6(-self.c0, -self.c1, -self.c2)

    def __mul__(self, o):
        if isinstance(o, Fq2):
            return Fq6(self.c0 * o, self.c1 * o, self.c2 * o)
        a0, a1, a2 = self.c0, self.c1, self.c2
        b0, b1, b2 = o.c0, o.c1, o.c2
        t0, t1, t2 = a0 * b0, a1 * b1, a2 * b2
        c0 = ((a1 + a2) * (b1 + b2) - t1 - t2).mul_by_nonresidue() + t0
        c1 = (a0 + a1) * (b0 + b1) - t0 - t1 + t2.mul_by_nonresidue()
        c2 = (a0 + a2) * (b0 + b2) - t0 - t2 + t1
        return Fq6(c0, c1, c2)

    def square(self):
        return self * self

    def mul_by_nonresidue(self):
        """* v: (c0, c1, c2) -> (xi*c2, c0, c1)."""
        return Fq6(self.c2.mul_by_nonresidue(), self.c0, self.c1)

    def inv(self):
        a, b, c = self.c0, self.c1, self.c2
        t0 = a.square() - (b * c).mul_by_nonresidue()
        t1 = c.square().mul_by_nonresidue() - a * b
        t2 = b.square() - a * c
        norm = a * t0 + (c * t1 + b * t2).mul_by_nonresidue()
        ninv = norm.inv()
        return Fq6(t0 * ninv, t1 * ninv, t2 * ninv)

    def frobenius(self, power: int):
        c0 = self.c0.frobenius(power)
        c1 = self.c1.frobenius(power) * FROB_FQ6_C1[power % 6]
        c2 = self.c2.frobenius(power) * FROB_FQ6_C2[power % 6]
        return Fq6(c0, c1, c2)


@dataclass(frozen=True)
class Fq12:
    c0: Fq6
    c1: Fq6

    @staticmethod
    def one():
        return Fq12(Fq6.one(), Fq6.zero())

    @staticmethod
    def zero():
        return Fq12(Fq6.zero(), Fq6.zero())

    def __add__(self, o):
        return Fq12(self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o):
        return Fq12(self.c0 - o.c0, self.c1 - o.c1)

    def __neg__(self):
        return Fq12(-self.c0, -self.c1)

    def __mul__(self, o):
        a0, a1 = self.c0, self.c1
        b0, b1 = o.c0, o.c1
        t0 = a0 * b0
        t1 = a1 * b1
        return Fq12(t0 + t1.mul_by_nonresidue(), (a0 + a1) * (b0 + b1) - t0 - t1)

    def square(self):
        return self * self

    def conjugate(self):
        return Fq12(self.c0, -self.c1)

    def inv(self):
        t = (self.c0.square() - self.c1.square().mul_by_nonresidue()).inv()
        return Fq12(self.c0 * t, -(self.c1 * t))

    def frobenius(self, power: int):
        c0 = self.c0.frobenius(power)
        c1 = self.c1.frobenius(power)
        c1 = Fq6(
            c1.c0 * FROB_FQ12_C1[power % 12],
            c1.c1 * FROB_FQ12_C1[power % 12],
            c1.c2 * FROB_FQ12_C1[power % 12],
        )
        return Fq12(c0, c1)

    def pow(self, e: int):
        r = Fq12.one()
        b = self
        while e:
            if e & 1:
                r = r * b
            b = b * b
            e >>= 1
        return r

    def cyclotomic_square(self):
        return self * self  # host side needs no fast path

    def mul_by_034(self, c0: Fq2, c3: Fq2, c4: Fq2):
        """Sparse mult by (c0 + c3 w^3 + c4 w^4) in Fq12-as-Fq2^6 terms.

        Matches arkworks' ``mul_by_034`` with the element
        g = c0 + (c3 v + c4 v^2 ... ) — concretely: multiplier has
        Fq6 parts (c0, 0, 0) and (c3, c4, 0).
        """
        other = Fq12(Fq6(c0, Fq2.zero(), Fq2.zero()), Fq6(c3, c4, Fq2.zero()))
        return self * other


def _compute_frobenius_coeffs():
    """xi^((p^i - 1)/3), xi^(2(p^i-1)/3) for Fq6; xi^((p^i-1)/6) for Fq12."""
    fq6_c1, fq6_c2, fq12_c1 = [], [], []
    for i in range(12):
        e = (pow(P, i % 6) - 1) // 3 if True else 0
        fq12_e = (pow(P, i) - 1) // 6
        fq12_c1.append(XI.pow(fq12_e))
    for i in range(6):
        fq6_c1.append(XI.pow((pow(P, i) - 1) // 3))
        fq6_c2.append(XI.pow(2 * (pow(P, i) - 1) // 3))
    return fq6_c1, fq6_c2, fq12_c1


FROB_FQ6_C1, FROB_FQ6_C2, FROB_FQ12_C1 = _compute_frobenius_coeffs()

"""BN254 curves: G1 (y^2 = x^3 + 3 over Fq) and G2 (twist over Fq2).

Host-side affine/projective arithmetic; arkworks-compatible generators and
compressed serialization (used by the compressed Groth16 input paths,
reference ``src/gadgets/groth16.rs:115-184``).
"""

from __future__ import annotations

from dataclasses import dataclass

from gsv_tpu.bn254_host.field import Fq, Fq2, Fr, P, R, XI

B1 = Fq(3)
B2 = Fq2(Fq(3), Fq(0)) * XI.inv()  # twist b = 3/xi


@dataclass(frozen=True)
class G1:
    """Affine G1 point; x=y=None is infinity."""

    x: Fq | None
    y: Fq | None

    @staticmethod
    def infinity() -> "G1":
        return G1(None, None)

    @property
    def is_infinity(self) -> bool:
        return self.x is None

    def is_on_curve(self) -> bool:
        if self.is_infinity:
            return True
        return self.y * self.y == self.x * self.x * self.x + B1

    def __neg__(self):
        if self.is_infinity:
            return self
        return G1(self.x, -self.y)

    def __add__(self, o: "G1") -> "G1":
        if self.is_infinity:
            return o
        if o.is_infinity:
            return self
        if self.x == o.x:
            if self.y == o.y:
                return self.double()
            return G1.infinity()
        lam = (o.y - self.y) / (o.x - self.x)
        x3 = lam * lam - self.x - o.x
        return G1(x3, lam * (self.x - x3) - self.y)

    def double(self) -> "G1":
        if self.is_infinity or self.y.is_zero():
            return G1.infinity()
        lam = (Fq(3) * self.x * self.x) / (self.y + self.y)
        x3 = lam * lam - self.x - self.x
        return G1(x3, lam * (self.x - x3) - self.y)

    def mul(self, k: int) -> "G1":
        k = int(k) % R
        r, base = G1.infinity(), self
        while k:
            if k & 1:
                r = r + base
            base = base.double()
            k >>= 1
        return r

    # arkworks-compatible compressed serialization: 32 bytes LE x with flags
    # in the MSB of the last byte: bit7 = y is the lexicographically largest,
    # bit6 = infinity.
    def to_compressed(self) -> bytes:
        if self.is_infinity:
            b = bytearray(32)
            b[-1] |= 0x40
            return bytes(b)
        b = bytearray(int(self.x).to_bytes(32, "little"))
        if int(self.y) > P - 1 - int(self.y):
            b[-1] |= 0x80
        return bytes(b)

    @staticmethod
    def from_compressed(data: bytes) -> "G1":
        b = bytearray(data)
        flags = b[-1] & 0xC0
        b[-1] &= 0x3F
        if flags & 0x40:
            return G1.infinity()
        x = Fq(int.from_bytes(bytes(b), "little"))
        y = (x * x * x + B1).sqrt()
        if y is None:
            raise ValueError("invalid compressed G1: x not on curve")
        largest = int(y) > P - 1 - int(y)
        if bool(flags & 0x80) != largest:
            y = -y
        return G1(x, y)


@dataclass(frozen=True)
class G2:
    x: Fq2 | None
    y: Fq2 | None

    @staticmethod
    def infinity() -> "G2":
        return G2(None, None)

    @property
    def is_infinity(self) -> bool:
        return self.x is None

    def is_on_curve(self) -> bool:
        if self.is_infinity:
            return True
        return self.y.square() == self.x.square() * self.x + B2

    def __neg__(self):
        if self.is_infinity:
            return self
        return G2(self.x, -self.y)

    def __add__(self, o: "G2") -> "G2":
        if self.is_infinity:
            return o
        if o.is_infinity:
            return self
        if self.x == o.x:
            if self.y == o.y:
                return self.double()
            return G2.infinity()
        lam = (o.y - self.y) * (o.x - self.x).inv()
        x3 = lam.square() - self.x - o.x
        return G2(x3, lam * (self.x - x3) - self.y)

    def double(self) -> "G2":
        if self.is_infinity or self.y.is_zero():
            return G2.infinity()
        lam = (self.x.square() * Fq(3)) * self.y.double().inv()
        x3 = lam.square() - self.x - self.x
        return G2(x3, lam * (self.x - x3) - self.y)

    def mul(self, k: int) -> "G2":
        k = int(k) % R
        r, base = G2.infinity(), self
        while k:
            if k & 1:
                r = r + base
            base = base.double()
            k >>= 1
        return r

    def to_compressed(self) -> bytes:
        """64 bytes: x.c0 LE || x.c1 LE with flags in the last byte.

        arkworks compares y lexicographically as (c1, c0).
        """
        if self.is_infinity:
            b = bytearray(64)
            b[-1] |= 0x40
            return bytes(b)
        b = bytearray(
            int(self.x.c0).to_bytes(32, "little") + int(self.x.c1).to_bytes(32, "little")
        )
        neg = -self.y
        if _fq2_lex_gt(self.y, neg):
            b[-1] |= 0x80
        return bytes(b)

    @staticmethod
    def from_compressed(data: bytes) -> "G2":
        b = bytearray(data)
        flags = b[-1] & 0xC0
        b[-1] &= 0x3F
        if flags & 0x40:
            return G2.infinity()
        c0 = Fq(int.from_bytes(bytes(b[:32]), "little"))
        c1 = Fq(int.from_bytes(bytes(b[32:]), "little"))
        x = Fq2(c0, c1)
        y = (x.square() * x + B2).sqrt()
        if y is None:
            raise ValueError("invalid compressed G2")
        if _fq2_lex_gt(y, -y) != bool(flags & 0x80):
            y = -y
        return G2(x, y)


def _fq2_lex_gt(a: Fq2, b: Fq2) -> bool:
    """a > b lexicographically by (c1, c0) — arkworks Fq2 ordering."""
    if int(a.c1) != int(b.c1):
        return int(a.c1) > int(b.c1)
    return int(a.c0) > int(b.c0)


class _Jacobian:
    """arkworks-compatible short-Weierstrass Jacobian arithmetic.

    The exact coordinate *representatives* matter: circuit constants (e.g.
    windowed scalar-mul tables, g1.rs:308-368) embed them bit-for-bit, so we
    use the same formulas as ark-ec — zero = (1, 1, 0), ``add-2007-bl`` for
    addition with doubling fallback, ``dbl-2009-l`` for doubling.
    """

    __slots__ = ("x", "y", "z")

    def __init__(self, x, y, z):
        self.x = x
        self.y = y
        self.z = z

    @classmethod
    def zero(cls):
        one = cls._field_one()
        return cls(one, one, cls._field_zero())

    @property
    def is_zero(self):
        return self.z.is_zero() if hasattr(self.z, "is_zero") else int(self.z) == 0

    @classmethod
    def from_affine(cls, p):
        if p.is_infinity:
            return cls.zero()
        return cls(p.x, p.y, cls._field_one())

    def double(self):
        if self.is_zero:
            return self
        X, Y, Z = self.x, self.y, self.z
        A = X * X
        B = Y * Y
        C = B * B
        t = X + B
        D = t * t - A - C
        D = D + D
        E = A + A + A
        F = E * E
        X3 = F - (D + D)
        eight_c = C + C
        eight_c = eight_c + eight_c
        eight_c = eight_c + eight_c
        Y3 = E * (D - X3) - eight_c
        Z3 = (Y * Z)
        Z3 = Z3 + Z3
        return type(self)(X3, Y3, Z3)

    def __add__(self, other):
        if self.is_zero:
            return other
        if other.is_zero:
            return self
        X1, Y1, Z1 = self.x, self.y, self.z
        X2, Y2, Z2 = other.x, other.y, other.z
        Z1Z1 = Z1 * Z1
        Z2Z2 = Z2 * Z2
        U1 = X1 * Z2Z2
        U2 = X2 * Z1Z1
        S1 = Y1 * Z2 * Z2Z2
        S2 = Y2 * Z1 * Z1Z1
        if U1 == U2 and S1 == S2:
            return self.double()
        H = U2 - U1
        I = (H + H) * (H + H)
        J = H * I
        r = (S2 - S1)
        r = r + r
        V = U1 * I
        X3 = r * r - J - (V + V)
        S1J = S1 * J
        Y3 = r * (V - X3) - (S1J + S1J)
        t = Z1 + Z2
        Z3 = (t * t - Z1Z1 - Z2Z2) * H
        return type(self)(X3, Y3, Z3)

    def to_affine(self):
        raise NotImplementedError


class G1Jac(_Jacobian):
    @staticmethod
    def _field_one():
        return Fq(1)

    @staticmethod
    def _field_zero():
        return Fq(0)

    def to_affine(self) -> G1:
        if self.is_zero:
            return G1.infinity()
        zinv = self.z.inv()
        z2 = zinv * zinv
        return G1(self.x * z2, self.y * z2 * zinv)


class G2Jac(_Jacobian):
    @staticmethod
    def _field_one():
        return Fq2.one()

    @staticmethod
    def _field_zero():
        return Fq2.zero()

    def to_affine(self) -> G2:
        if self.is_zero:
            return G2.infinity()
        zinv = self.z.inv()
        z2 = zinv * zinv
        return G2(self.x * z2, self.y * z2 * zinv)


def g1_gen() -> G1:
    return G1(Fq(1), Fq(2))


def g2_gen() -> G2:
    return G2(
        Fq2(
            Fq(10857046999023057135944570762232829481370756359578518086990519993285655852781),
            Fq(11559732032986387107991004021392285783925812861821192530917403151452391805634),
        ),
        Fq2(
            Fq(8495653923123431417604973247489272438418190587263600148770280649306958101930),
            Fq(4082367875863433681332203403145435568316851327593401208105741076214120093531),
        ),
    )

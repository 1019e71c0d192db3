"""Groth16 verifier circuit gadget.

Reference parity: ``src/gadgets/groth16.rs`` — MSM over public inputs with
constant bases (window 10) plus the gamma_abc[0] constant, projective→affine
conversion, the 3-pair Miller loop against constant −gamma/−delta and wire B,
final exponentiation, and comparison against the host-precomputed
e(alpha, −beta)^{-1} constant.  Compressed variants decompress G1/G2 points
in-circuit via the sqrt gadgets.

Input encodings (groth16.rs:288-370): public scalars as raw bits; curve
points as Montgomery-form coordinates; compressed points as Montgomery x
plus a y-selection flag.
"""

from __future__ import annotations

from dataclasses import dataclass

from gsv_tpu.bn254_host.curve import B1, B2, G1Jac, G2 as HostG2
from gsv_tpu.bn254_host.field import Fq as HostFq, Fq12 as HostFq12
from gsv_tpu.bn254_host.groth16 import VerifyingKey
from gsv_tpu.bn254_host.pairing import multi_miller_loop, final_exponentiation
from gsv_tpu.circuit.builder import component
from gsv_tpu.circuit.wires import WireStruct
from gsv_tpu.gadgets import bigint
from gsv_tpu.gadgets.bn254.fq import Fq, FqWire
from gsv_tpu.gadgets.bn254.fq2 import Fq2, Fq2Wire
from gsv_tpu.gadgets.bn254.fq6 import _as_mont_fq2
from gsv_tpu.gadgets.bn254.fq12 import Fq12
from gsv_tpu.gadgets.bn254.g1 import FrScalarWire, G1Ops, G1Wire
from gsv_tpu.gadgets.bn254.g2 import G2Wire
from gsv_tpu.gadgets.bn254.pairing import (
    g2_key,
    multi_miller_loop_groth16_evaluate_montgomery_fast,
)
from gsv_tpu.gadgets.bn254.final_exponentiation import final_exponentiation_montgomery

MSM_WINDOW = 10  # the reference's ::<10> (groth16.rs:79)


@component(name="groth16.projective_to_affine")
def projective_to_affine_montgomery(ctx, p: G1Wire) -> G1Wire:
    """(groth16.rs:26-48)."""
    z_inv = Fq.inverse_montgomery(ctx, p.z)
    z_inv_sq = Fq.square_montgomery(ctx, z_inv)
    z_inv_cube = Fq.mul_montgomery(ctx, z_inv, z_inv_sq)
    new_x = Fq.mul_montgomery(ctx, p.x, z_inv_sq)
    new_y = Fq.mul_montgomery(ctx, p.y, z_inv_cube)
    return G1Wire(new_x, new_y, FqWire.new_constant(1))


class CompressedG1Wires(WireStruct):
    __slots__ = ("x_m", "y_flag")

    def __init__(self, x_m: FqWire, y_flag: int):
        self.x_m = x_m
        self.y_flag = y_flag

    @classmethod
    def from_ctx(cls, ctx):
        return cls(FqWire.from_ctx(ctx), ctx.issue_wire())

    def wires_flatten(self):
        return [self.x_m, self.y_flag], None

    @classmethod
    def wires_unflatten(cls, aux, children):
        return cls(children[0], children[1])


class CompressedG2Wires(WireStruct):
    __slots__ = ("p", "y_flag")

    def __init__(self, p: Fq2Wire, y_flag: int):
        self.p = p
        self.y_flag = y_flag

    @classmethod
    def from_ctx(cls, ctx):
        return cls(Fq2Wire.from_ctx(ctx), ctx.issue_wire())

    def wires_flatten(self):
        return [self.p, self.y_flag], None

    @classmethod
    def wires_unflatten(cls, aux, children):
        return cls(children[0], children[1])


@component(name="groth16.decompress_g1")
def decompress_g1_from_compressed(ctx, compressed: CompressedG1Wires) -> G1Wire:
    """(groth16.rs:115-144): y = y_flag ? sqrt(x^3+b) : -sqrt(x^3+b)."""
    x_m, y_flag = compressed.x_m, compressed.y_flag
    x2 = Fq.square_montgomery(ctx, x_m)
    x3 = Fq.mul_montgomery(ctx, x2, x_m)
    rhs = Fq.add_constant(ctx, x3, FqWire.as_montgomery(int(B1)))
    sy = Fq.sqrt_montgomery(ctx, rhs)
    sy_neg = Fq.neg(ctx, sy)
    y_bits = bigint.select(ctx, sy.n, sy_neg.n, y_flag)
    return G1Wire(x_m, FqWire(y_bits), FqWire.new_constant(1))


@component(name="groth16.decompress_g2")
def decompress_g2_from_compressed(ctx, compressed: CompressedG2Wires) -> G2Wire:
    """(groth16.rs:145-184)."""
    x, y_flag = compressed.p, compressed.y_flag
    x2 = Fq2.square_montgomery(ctx, x)
    x3 = Fq2.mul_montgomery(ctx, x2, x)
    y2 = Fq2.add_constant(ctx, x3, _as_mont_fq2(B2))
    y = Fq2.sqrt_general_montgomery(ctx, y2)
    neg_y = Fq2.neg(ctx, y)
    final_y0 = bigint.select(ctx, y.c0.n, neg_y.c0.n, y_flag)
    final_y1 = bigint.select(ctx, y.c1.n, neg_y.c1.n, y_flag)
    z = Fq2Wire(FqWire.new_constant(1), FqWire.new_constant(0))
    return G2Wire(x, Fq2Wire(FqWire(final_y0), FqWire(final_y1)), z)


def _vk_alpha_beta_inv(vk: VerifyingKey) -> HostFq12:
    """Host-side e(alpha, -beta)^{-1} constant (groth16.rs:98-105)."""
    ml = multi_miller_loop([(vk.alpha_g1, -vk.beta_g2)])
    return final_exponentiation(ml).inv()


def groth16_verify(
    ctx,
    public: list[FrScalarWire],
    a: G1Wire,
    b: G2Wire,
    c: G1Wire,
    vk: VerifyingKey,
) -> int:
    """The verifier circuit (groth16.rs:57-110); returns a boolean wire."""
    bases = [G1Jac.from_affine(p) for p in vk.gamma_abc_g1[1 : 1 + len(public)]]
    msm_temp = G1Ops.msm_with_constant_bases_montgomery(ctx, public, bases, MSM_WINDOW)

    # G1Wire.new_constant Montgomery-encodes; pass the standard form
    # (pre-encoding here double-encoded gamma_abc[0] and broke the MSM)
    gamma0 = G1Jac.from_affine(vk.gamma_abc_g1[0])
    msm = G1Ops.add_montgomery(ctx, msm_temp, G1Wire.new_constant(gamma0))
    msm_affine = projective_to_affine_montgomery(ctx, msm)

    f = multi_miller_loop_groth16_evaluate_montgomery_fast(
        ctx,
        msm_affine,
        c,
        a,
        b,
        q1_key=g2_key(-vk.gamma_g2),
        q2_key=g2_key(-vk.delta_g2),
    )

    alpha_beta = _vk_alpha_beta_inv(vk)
    f = final_exponentiation_montgomery(ctx, f)
    # Fq2.equal_constant Montgomery-encodes each coefficient internally, so
    # the comparison constant stays in standard form (pre-encoding here
    # compared f against a double-encoded alpha*beta and always failed)
    return Fq12.equal_constant(ctx, f, alpha_beta)


def groth16_verify_compressed(
    ctx,
    public: list[FrScalarWire],
    a: CompressedG1Wires,
    b: CompressedG2Wires,
    c: CompressedG1Wires,
    vk: VerifyingKey,
) -> int:
    """(groth16.rs:250-268)."""
    a_p = decompress_g1_from_compressed(ctx, a)
    b_p = decompress_g2_from_compressed(ctx, b)
    c_p = decompress_g1_from_compressed(ctx, c)
    return groth16_verify(ctx, public, a_p, b_p, c_p, vk)


# ----------------------------------------------------------------------
# Host-side input encodings (groth16.rs:288-370 + compressed variants)
# ----------------------------------------------------------------------


@dataclass
class Groth16Input:
    """Semantic inputs; provides flat bit encoding in allocation order."""

    public: list[int]  # Fr values (standard form)
    a: G1Jac
    b: "HostG2 | G2Jac"
    c: G1Jac

    @staticmethod
    def n_wires(n_public: int) -> int:
        return n_public * 254 + 3 * 254 * 2 + 6 * 254  # publics + a + c + b(6 coords)

    def to_bits(self) -> list[bool]:
        bits: list[bool] = []
        for s in self.public:
            bits += _bits(int(s))
        for coord in (self.a.x, self.a.y, self.a.z):
            bits += _bits(FqWire.as_montgomery(int(coord)))
        bx, by, bz = self.b.x, self.b.y, self.b.z
        for c2 in (bx, by, bz):
            bits += _bits(FqWire.as_montgomery(int(c2.c0)))
            bits += _bits(FqWire.as_montgomery(int(c2.c1)))
        for coord in (self.c.x, self.c.y, self.c.z):
            bits += _bits(FqWire.as_montgomery(int(coord)))
        return bits


def _bits(v: int, n: int = 254) -> list[bool]:
    return [bool((v >> i) & 1) for i in range(n)]


def build_verify_circuit(vk: VerifyingKey, n_public: int):
    """Returns (circuit_fn, n_inputs) for CircuitRunner.

    Input wire order matches ``Groth16Input.to_bits``: public scalars (raw
    bits), then A (Montgomery x,y,z), then B (Fq2 x,y,z), then C.
    """
    n_inputs = Groth16Input.n_wires(n_public)

    def circuit(ctx, wires):
        pos = 0

        def take(n):
            nonlocal pos
            seg = wires[pos : pos + n]
            pos += n
            return seg

        public = [
            FrScalarWire(bigint.BigIntWires(take(254))) for _ in range(n_public)
        ]
        a = G1Wire(*[FqWire(bigint.BigIntWires(take(254))) for _ in range(3)])
        b = G2Wire(
            *[
                Fq2Wire(
                    FqWire(bigint.BigIntWires(take(254))),
                    FqWire(bigint.BigIntWires(take(254))),
                )
                for _ in range(3)
            ]
        )
        c = G1Wire(*[FqWire(bigint.BigIntWires(take(254))) for _ in range(3)])
        assert pos == n_inputs
        return [groth16_verify(ctx, public, a, b, c, vk)]

    return circuit, n_inputs

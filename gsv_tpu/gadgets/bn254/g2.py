"""G2 (Jacobian projective over Fq2) circuit gadgets.

Reference parity: ``src/gadgets/bn254/g2.rs`` — mirrors the G1 gadgets with
Fq2 coordinates.  NOTE: the reference's ``G2Projective::new_constant`` does
*not* Montgomery-encode (g2.rs:73-88), unlike G1's scalar-mul path which
encodes explicitly; we mirror that literally (the Groth16 verifier never
uses the G2 scalar-mul table).
"""

from __future__ import annotations

from gsv_tpu.bn254_host.curve import G2Jac
from gsv_tpu.bn254_host.field import Fq2 as HostFq2
from gsv_tpu.circuit.wires import WireStruct
from gsv_tpu.circuit.builder import component
from gsv_tpu.gadgets.bn254.fq import Fq, FqWire, N_BITS
from gsv_tpu.gadgets.bn254.fq2 import Fq2, Fq2Wire
from gsv_tpu.gadgets.bn254.g1 import FrScalarWire


class G2Wire(WireStruct):
    __slots__ = ("x", "y", "z")

    def __init__(self, x: Fq2Wire, y: Fq2Wire, z: Fq2Wire):
        self.x = x
        self.y = y
        self.z = z

    @classmethod
    def from_ctx(cls, ctx) -> "G2Wire":
        return cls(Fq2Wire.from_ctx(ctx), Fq2Wire.from_ctx(ctx), Fq2Wire.from_ctx(ctx))

    @classmethod
    def new_constant(cls, p: G2Jac) -> "G2Wire":
        """Raw (standard-form) constant wires — g2.rs:73-88 semantics."""
        return cls(
            Fq2Wire(_raw_const(p.x.c0), _raw_const(p.x.c1)),
            Fq2Wire(_raw_const(p.y.c0), _raw_const(p.y.c1)),
            Fq2Wire(_raw_const(p.z.c0), _raw_const(p.z.c1)),
        )

    @classmethod
    def new_constant_montgomery(cls, p: G2Jac) -> "G2Wire":
        return cls(
            Fq2Wire(_mont_const(p.x.c0), _mont_const(p.x.c1)),
            Fq2Wire(_mont_const(p.y.c0), _mont_const(p.y.c1)),
            Fq2Wire(_mont_const(p.z.c0), _mont_const(p.z.c1)),
        )

    def wires_flatten(self):
        return [self.x, self.y, self.z], None

    @classmethod
    def wires_unflatten(cls, aux, children):
        return cls(*children)


def _raw_const(v) -> FqWire:
    from gsv_tpu.gadgets.bigint import BigIntWires

    return FqWire(BigIntWires.new_constant(N_BITS, int(v)))


def _mont_const(v) -> FqWire:
    return FqWire.new_constant(int(v))


class G2Ops:
    @staticmethod
    def add_montgomery(ctx, p: G2Wire, q: G2Wire) -> G2Wire:
        return _add_montgomery(ctx, p, q)

    @staticmethod
    def double_montgomery(ctx, p: G2Wire) -> G2Wire:
        return _double_montgomery(ctx, p)

    @staticmethod
    def multiplexer(ctx, a: list[G2Wire], s: list[int], w: int) -> G2Wire:
        return _multiplexer(ctx, a, s, w=w)

    @staticmethod
    def scalar_mul_by_constant_base_montgomery(
        ctx, s: FrScalarWire, base: G2Jac, window: int
    ) -> G2Wire:
        key = tuple(
            (int(c.c0), int(c.c1)) for c in (base.x, base.y, base.z)
        )
        return _scalar_mul_by_constant_base(ctx, s, base_key=key, window=window)

    @staticmethod
    def msm_with_constant_bases_montgomery(ctx, scalars, bases, window: int):
        """(g2.rs:499-517) — plain function in the reference, not a component."""
        assert len(scalars) == len(bases)
        to_be_added = [
            G2Ops.scalar_mul_by_constant_base_montgomery(ctx, s, b, window)
            for s, b in zip(scalars, bases)
        ]
        acc = to_be_added[0]
        for add in to_be_added[1:]:
            acc = G2Ops.add_montgomery(ctx, acc, add)
        return acc

    @staticmethod
    def neg(ctx, p: G2Wire) -> G2Wire:
        return _neg(ctx, p)


def _mux2(ctx, options: list[Fq2Wire], s: list[int], w: int) -> Fq2Wire:
    c0 = Fq.multiplexer(ctx, [o.c0 for o in options], s, w)
    c1 = Fq.multiplexer(ctx, [o.c1 for o in options], s, w)
    return Fq2Wire(c0, c1)


@component(name="g2.add_montgomery")
def _add_montgomery(ctx, p: G2Wire, q: G2Wire) -> G2Wire:
    """(g2.rs:210-343)."""
    x1, y1, z1 = p.x, p.y, p.z
    x2, y2, z2 = q.x, q.y, q.z
    z1s = Fq2.square_montgomery(ctx, z1)
    z2s = Fq2.square_montgomery(ctx, z2)
    z1c = Fq2.mul_montgomery(ctx, z1s, z1)
    z2c = Fq2.mul_montgomery(ctx, z2s, z2)
    u1 = Fq2.mul_montgomery(ctx, x1, z2s)
    u2 = Fq2.mul_montgomery(ctx, x2, z1s)
    s1 = Fq2.mul_montgomery(ctx, y1, z2c)
    s2 = Fq2.mul_montgomery(ctx, y2, z1c)
    r = Fq2.sub(ctx, s1, s2)
    h = Fq2.sub(ctx, u1, u2)
    h2 = Fq2.square_montgomery(ctx, h)
    g = Fq2.mul_montgomery(ctx, h, h2)
    v = Fq2.mul_montgomery(ctx, u1, h2)
    r2 = Fq2.square_montgomery(ctx, r)
    r2g = Fq2.add(ctx, r2, g)
    vd = Fq2.double(ctx, v)
    x3 = Fq2.sub(ctx, r2g, vd)
    vx3 = Fq2.sub(ctx, v, x3)
    w = Fq2.mul_montgomery(ctx, r, vx3)
    s1g = Fq2.mul_montgomery(ctx, s1, g)
    y3 = Fq2.sub(ctx, w, s1g)
    z1z2 = Fq2.mul_montgomery(ctx, z1, z2)
    z3 = Fq2.mul_montgomery(ctx, z1z2, h)

    z1_0 = Fq2.equal_constant(ctx, z1, HostFq2.zero())
    z2_0 = Fq2.equal_constant(ctx, z2, HostFq2.zero())
    zero = Fq2Wire(_mont_const(0), _mont_const(0))
    s = [z1_0, z2_0]
    x = _mux2(ctx, [x3, x2, x1, zero], s, 2)
    y = _mux2(ctx, [y3, y2, y1, zero], s, 2)
    z = _mux2(ctx, [z3, z2, z1, zero], s, 2)
    return G2Wire(x, y, z)


@component(name="g2.double_montgomery")
def _double_montgomery(ctx, p: G2Wire) -> G2Wire:
    """(g2.rs:345-386)."""
    x1, y1, z1 = p.x, p.y, p.z
    x2 = Fq2.square_montgomery(ctx, x1)
    y2 = Fq2.square_montgomery(ctx, y1)
    m = Fq2.triple(ctx, x2)
    t = Fq2.square_montgomery(ctx, y2)
    xy2 = Fq2.mul_montgomery(ctx, x1, y2)
    xy2d = Fq2.double(ctx, xy2)
    s = Fq2.double(ctx, xy2d)
    m2 = Fq2.square_montgomery(ctx, m)
    sd = Fq2.double(ctx, s)
    xr = Fq2.sub(ctx, m2, sd)
    sxr = Fq2.sub(ctx, s, xr)
    msxr = Fq2.mul_montgomery(ctx, m, sxr)
    td = Fq2.double(ctx, t)
    tdd = Fq2.double(ctx, td)
    tddd = Fq2.double(ctx, tdd)
    yr = Fq2.sub(ctx, msxr, tddd)
    yz = Fq2.mul_montgomery(ctx, y1, z1)
    zr = Fq2.double(ctx, yz)
    z_0 = Fq2.equal_constant(ctx, z1, HostFq2.zero())
    zero = Fq2Wire(_mont_const(0), _mont_const(0))
    z = _mux2(ctx, [zr, zero], [z_0], 1)
    return G2Wire(xr, yr, z)


@component(offcircuit=("w",), name="g2.multiplexer")
def _multiplexer(ctx, a: list[G2Wire], s: list[int], *, w: int) -> G2Wire:
    n = 1 << w
    assert len(a) == n and len(s) == w
    return G2Wire(
        _mux2(ctx, [p.x for p in a], s, w),
        _mux2(ctx, [p.y for p in a], s, w),
        _mux2(ctx, [p.z for p in a], s, w),
    )


@component(offcircuit=("base_key", "window"), name="g2.scalar_mul_by_constant_base")
def _scalar_mul_by_constant_base(
    ctx, s: FrScalarWire, *, base_key: tuple, window: int
) -> G2Wire:
    """(g2.rs:443-497) — raw (non-Montgomery) table constants, as in the
    reference."""
    from gsv_tpu.bn254_host.field import Fq as HostFq

    W = window
    base = G2Jac(
        HostFq2(HostFq(base_key[0][0]), HostFq(base_key[0][1])),
        HostFq2(HostFq(base_key[1][0]), HostFq(base_key[1][1])),
        HostFq2(HostFq(base_key[2][0]), HostFq(base_key[2][1])),
    )
    n = 1 << W
    bases: list[G2Jac] = []
    p = G2Jac.zero()
    for _ in range(n):
        bases.append(p)
        p = p + base

    bases_wires = [G2Wire.new_constant(b) for b in bases]
    to_be_added = []
    index = 0
    while index < N_BITS:
        w = min(W, N_BITS - index)
        m = 1 << w
        selector = s.bits.bits[index : index + w]
        result = G2Ops.multiplexer(ctx, bases_wires[:m], selector, w)
        to_be_added.append(result)
        index += W
        new_bases = []
        for b in bases:
            nb = b
            for _ in range(w):
                nb = nb + nb
            new_bases.append(nb)
        bases = new_bases
        bases_wires = [G2Wire.new_constant(b) for b in bases]

    acc = to_be_added[0]
    for add in to_be_added[1:]:
        acc = G2Ops.add_montgomery(ctx, acc, add)
    return acc


@component(name="g2.neg")
def _neg(ctx, p: G2Wire) -> G2Wire:
    return G2Wire(p.x, Fq2.neg(ctx, p.y), p.z)


G2Gadget = G2Ops

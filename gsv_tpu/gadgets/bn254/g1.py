"""G1 (Jacobian projective) circuit gadgets.

Reference parity: ``src/gadgets/bn254/g1.rs`` — full projective addition
with zero-handling multiplexers, doubling, point multiplexer, windowed
scalar multiplication over constant bases and MSM.
"""

from __future__ import annotations

from gsv_tpu.bn254_host.curve import G1Jac
from gsv_tpu.bn254_host.field import Fq as HostFq
from gsv_tpu.circuit.wires import WireStruct
from gsv_tpu.circuit.builder import component
from gsv_tpu.gadgets.bigint import BigIntWires
from gsv_tpu.gadgets.bn254.fq import Fq, FqWire, N_BITS


class G1Wire(WireStruct):
    """(x, y, z) Jacobian coordinates, each an FqWire in Montgomery form."""

    __slots__ = ("x", "y", "z")

    def __init__(self, x: FqWire, y: FqWire, z: FqWire):
        self.x = x
        self.y = y
        self.z = z

    @classmethod
    def from_ctx(cls, ctx) -> "G1Wire":
        return cls(FqWire.from_ctx(ctx), FqWire.from_ctx(ctx), FqWire.from_ctx(ctx))

    @classmethod
    def new_constant(cls, p: G1Jac) -> "G1Wire":
        return cls(
            FqWire.new_constant(int(p.x)),
            FqWire.new_constant(int(p.y)),
            FqWire.new_constant(int(p.z)),
        )

    def wires_flatten(self):
        return [self.x, self.y, self.z], None

    @classmethod
    def wires_unflatten(cls, aux, children):
        return cls(*children)


class FrScalarWire(WireStruct):
    """A scalar as its 254 raw (standard-form) bits, LSB first.

    The reference's ``Fr`` wires feed window selectors directly
    (g1.rs:308-340), so the encoding is the plain bit decomposition.
    """

    __slots__ = ("bits",)

    def __init__(self, bits: BigIntWires):
        assert len(bits) == N_BITS
        self.bits = bits

    @classmethod
    def from_ctx(cls, ctx) -> "FrScalarWire":
        return cls(BigIntWires.from_ctx(ctx, N_BITS))

    def wires_flatten(self):
        return [self.bits], None

    @classmethod
    def wires_unflatten(cls, aux, children):
        return cls(children[0])


class G1Ops:
    @staticmethod
    def add_montgomery(ctx, p: G1Wire, q: G1Wire) -> G1Wire:
        return _add_montgomery(ctx, p, q)

    @staticmethod
    def double_montgomery(ctx, p: G1Wire) -> G1Wire:
        """(g1.rs:237-273)."""
        x1, y1, z1 = p.x, p.y, p.z
        x2 = Fq.square_montgomery(ctx, x1)
        y2 = Fq.square_montgomery(ctx, y1)
        m = Fq.triple(ctx, x2)
        t = Fq.square_montgomery(ctx, y2)
        xy2 = Fq.mul_montgomery(ctx, x1, y2)
        xy2d = Fq.double(ctx, xy2)
        s = Fq.double(ctx, xy2d)
        m2 = Fq.square_montgomery(ctx, m)
        sd = Fq.double(ctx, s)
        xr = Fq.sub(ctx, m2, sd)
        sxr = Fq.sub(ctx, s, xr)
        msxr = Fq.mul_montgomery(ctx, m, sxr)
        td = Fq.double(ctx, t)
        tdd = Fq.double(ctx, td)
        tddd = Fq.double(ctx, tdd)
        yr = Fq.sub(ctx, msxr, tddd)
        yz = Fq.mul_montgomery(ctx, y1, z1)
        zr = Fq.double(ctx, yz)
        z_0 = Fq.equal_constant(ctx, z1, 0)
        zero = FqWire.new_constant(0)
        z = Fq.multiplexer(ctx, [zr, zero], [z_0], 1)
        return G1Wire(xr, yr, z)

    @staticmethod
    def multiplexer(ctx, a: list[G1Wire], s: list[int], w: int) -> G1Wire:
        return _multiplexer(ctx, a, s, w=w)

    @staticmethod
    def scalar_mul_by_constant_base_montgomery(
        ctx, s: FrScalarWire, base: G1Jac, window: int
    ) -> G1Wire:
        return _scalar_mul_by_constant_base(
            ctx, s, base_key=(int(base.x), int(base.y), int(base.z)), window=window
        )

    @staticmethod
    def msm_with_constant_bases_montgomery(
        ctx, scalars: list[FrScalarWire], bases: list[G1Jac], window: int
    ) -> G1Wire:
        return _msm_with_constant_bases(
            ctx,
            scalars,
            bases_key=tuple((int(b.x), int(b.y), int(b.z)) for b in bases),
            window=window,
        )

    @staticmethod
    def neg(ctx, p: G1Wire) -> G1Wire:
        return _neg(ctx, p)


@component(name="g1.add_montgomery")
def _add_montgomery(ctx, p: G1Wire, q: G1Wire) -> G1Wire:
    """Full Jacobian addition with zero-point multiplexers (g1.rs:159-235).

    Does not handle p == ±q; callers ensure distinctness (windowed tables).
    """
    x1, y1, z1 = p.x, p.y, p.z
    x2, y2, z2 = q.x, q.y, q.z
    z1s = Fq.square_montgomery(ctx, z1)
    z2s = Fq.square_montgomery(ctx, z2)
    z1c = Fq.mul_montgomery(ctx, z1s, z1)
    z2c = Fq.mul_montgomery(ctx, z2s, z2)
    u1 = Fq.mul_montgomery(ctx, x1, z2s)
    u2 = Fq.mul_montgomery(ctx, x2, z1s)
    s1 = Fq.mul_montgomery(ctx, y1, z2c)
    s2 = Fq.mul_montgomery(ctx, y2, z1c)
    r = Fq.sub(ctx, s1, s2)
    h = Fq.sub(ctx, u1, u2)
    h2 = Fq.square_montgomery(ctx, h)
    g = Fq.mul_montgomery(ctx, h, h2)
    v = Fq.mul_montgomery(ctx, u1, h2)
    r2 = Fq.square_montgomery(ctx, r)
    r2g = Fq.add(ctx, r2, g)
    vd = Fq.double(ctx, v)
    x3 = Fq.sub(ctx, r2g, vd)
    vx3 = Fq.sub(ctx, v, x3)
    w = Fq.mul_montgomery(ctx, r, vx3)
    s1g = Fq.mul_montgomery(ctx, s1, g)
    y3 = Fq.sub(ctx, w, s1g)
    z1z2 = Fq.mul_montgomery(ctx, z1, z2)
    z3 = Fq.mul_montgomery(ctx, z1z2, h)

    z1_0 = Fq.equal_constant(ctx, z1, 0)
    z2_0 = Fq.equal_constant(ctx, z2, 0)
    zero = FqWire.new_constant(0)
    s = [z1_0, z2_0]
    x = Fq.multiplexer(ctx, [x3, x2, x1, zero], s, 2)
    y = Fq.multiplexer(ctx, [y3, y2, y1, zero], s, 2)
    z = Fq.multiplexer(ctx, [z3, z2, z1, zero], s, 2)
    return G1Wire(x, y, z)


@component(offcircuit=("w",), name="g1.multiplexer")
def _multiplexer(ctx, a: list[G1Wire], s: list[int], *, w: int) -> G1Wire:
    n = 1 << w
    assert len(a) == n and len(s) == w
    return G1Wire(
        Fq.multiplexer(ctx, [p.x for p in a], s, w),
        Fq.multiplexer(ctx, [p.y for p in a], s, w),
        Fq.multiplexer(ctx, [p.z for p in a], s, w),
    )


@component(offcircuit=("base_key", "window"), name="g1.scalar_mul_by_constant_base")
def _scalar_mul_by_constant_base(
    ctx, s: FrScalarWire, *, base_key: tuple, window: int
) -> G1Wire:
    """Windowed table lookup + adds over a constant base (g1.rs:308-368)."""
    W = window
    base = G1Jac(HostFq(base_key[0]), HostFq(base_key[1]), HostFq(base_key[2]))
    n = 1 << W

    bases: list[G1Jac] = []
    p = G1Jac.zero()
    for _ in range(n):
        bases.append(p)
        p = p + base

    def to_wires(pts):
        # G1Wire.new_constant Montgomery-encodes internally; feeding it
        # pre-encoded coordinates double-encodes the table (x*R^2) — the
        # reference's new_constant allocates raw, hence its explicit
        # as_montgomery at this spot (g1.rs:308-340), which must NOT be
        # mirrored here.
        return [G1Wire.new_constant(b) for b in pts]

    bases_wires = to_wires(bases)
    to_be_added = []
    index = 0
    while index < N_BITS:
        w = min(W, N_BITS - index)
        m = 1 << w
        selector = s.bits.bits[index : index + w]
        result = G1Ops.multiplexer(ctx, bases_wires[:m], selector, w)
        to_be_added.append(result)
        index += W
        new_bases = []
        for b in bases:
            nb = b
            for _ in range(w):
                nb = nb + nb
            new_bases.append(nb)
        bases = new_bases
        bases_wires = to_wires(bases)

    acc = to_be_added[0]
    for add in to_be_added[1:]:
        acc = G1Ops.add_montgomery(ctx, acc, add)
    return acc


@component(offcircuit=("bases_key", "window"), name="g1.msm_with_constant_bases")
def _msm_with_constant_bases(
    ctx, scalars: list[FrScalarWire], *, bases_key: tuple, window: int
) -> G1Wire:
    """(g1.rs:370-400)."""
    if not scalars:
        return G1Wire.new_constant(G1Jac(HostFq(1), HostFq(1), HostFq(0)))
    assert len(scalars) == len(bases_key)
    to_be_added = []
    for s, bk in zip(scalars, bases_key):
        base = G1Jac(HostFq(bk[0]), HostFq(bk[1]), HostFq(bk[2]))
        to_be_added.append(
            G1Ops.scalar_mul_by_constant_base_montgomery(ctx, s, base, window)
        )
    acc = to_be_added[0]
    for add in to_be_added[1:]:
        acc = G1Ops.add_montgomery(ctx, acc, add)
    return acc


@component(name="g1.neg")
def _neg(ctx, p: G1Wire) -> G1Wire:
    return G1Wire(p.x, Fq.neg(ctx, p.y), p.z)


G1Gadget = G1Ops

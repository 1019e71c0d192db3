"""Wire-structure flattening (the reference's ``WiresObject`` machinery).

Gadget functions pass wires around in nested structures: plain ints (wire
ids), lists/tuples, and typed containers such as ``BigIntWires`` or the BN254
field wire classes.  The component decorator must flatten any such structure
into an ordered wire list (and rebuild the structure from a wire list on
template-cache hits without re-running the gadget body).

Reference parity: ``src/circuit/into_wire_list.rs`` (WiresObject /
FromWires).  Instead of a trait per type, containers implement two methods::

    def wires_flatten(self) -> tuple[list, aux]  # children (wire-bearing), aux (static)
    @classmethod
    def wires_unflatten(cls, aux, children) -> Self

Flatten order is load-bearing — it defines input wire allocation order and
hence RNG label-draw order during garbling.
"""

from __future__ import annotations

from typing import Any


class WireStruct:
    """Optional base class documenting the container protocol."""

    def wires_flatten(self):  # pragma: no cover - interface
        raise NotImplementedError

    @classmethod
    def wires_unflatten(cls, aux, children):  # pragma: no cover - interface
        raise NotImplementedError


def _is_container(obj: Any) -> bool:
    return hasattr(obj, "wires_flatten") and hasattr(type(obj), "wires_unflatten")


def flatten_wires(obj: Any) -> tuple[list[int], Any]:
    """Flatten a wire structure -> (flat wire-id list, treedef).

    The treedef is an opaque structure usable with ``unflatten_wires``.
    """
    flat: list[int] = []

    def go(o: Any):
        if isinstance(o, bool):
            raise TypeError("bool is not a wire; encode constants via ctx constants")
        if isinstance(o, int):
            flat.append(o)
            return ("w",)
        if isinstance(o, (list, tuple)):
            defs = [go(c) for c in o]
            return ("l" if isinstance(o, list) else "t", defs)
        if _is_container(o):
            children, aux = o.wires_flatten()
            defs = [go(c) for c in children]
            return ("c", type(o), aux, defs)
        raise TypeError(f"not a wire structure: {type(o)!r}")

    treedef = go(obj)
    return flat, treedef


def unflatten_wires(treedef: Any, flat: list[int]) -> Any:
    """Rebuild a wire structure from a treedef and a flat wire list."""
    it = iter(flat)

    def go(td):
        kind = td[0]
        if kind == "w":
            return next(it)
        if kind in ("l", "t"):
            vals = [go(d) for d in td[1]]
            return vals if kind == "l" else tuple(vals)
        if kind == "c":
            _, cls, aux, defs = td
            children = [go(d) for d in defs]
            return cls.wires_unflatten(aux, children)
        raise AssertionError(kind)

    out = go(treedef)
    rest = list(it)
    if rest:
        raise ValueError(f"{len(rest)} unconsumed wires during unflatten")
    return out


def count_wires(treedef: Any) -> int:
    kind = treedef[0]
    if kind == "w":
        return 1
    if kind in ("l", "t"):
        return sum(count_wires(d) for d in treedef[1])
    if kind == "c":
        return sum(count_wires(d) for d in treedef[3])
    raise AssertionError(kind)


def param_key_bytes(value: Any) -> bytes:
    """Stable byte encoding of off-circuit parameters for component keys.

    Reference parity: ``src/circuit/offcircuit_param.rs`` (OffCircuitParam).
    Supports ints, bools, bytes, strings, None, tuples/lists, and objects with
    ``to_key_bytes()`` (host-side field/curve values).
    """
    if isinstance(value, bool):
        return b"b1" if value else b"b0"
    if isinstance(value, int):
        return b"i" + value.to_bytes((value.bit_length() + 15) // 8 + 1, "little", signed=True)
    if isinstance(value, bytes):
        return b"y" + len(value).to_bytes(4, "little") + value
    if isinstance(value, str):
        v = value.encode()
        return b"s" + len(v).to_bytes(4, "little") + v
    if value is None:
        return b"n"
    if isinstance(value, (tuple, list)):
        parts = [param_key_bytes(v) for v in value]
        return (
            b"v" + len(parts).to_bytes(4, "little") + b"".join(parts)
        )
    if hasattr(value, "to_key_bytes"):
        v = value.to_key_bytes()
        return b"o" + len(v).to_bytes(4, "little") + v
    raise TypeError(f"unsupported off-circuit param type: {type(value)!r}")

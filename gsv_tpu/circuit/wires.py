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


class ArityError(TypeError):
    """A wire structure's flattened width does not match expectations."""


def arity_check(wires: Any, expected: int, what: str = "wires") -> list[int]:
    """Assert ``wires`` flattens to exactly ``expected`` wire ids and return
    the flat list.  Reference parity: ``src/circuit/arity_check.rs`` — the
    macro-level guard that a component's wire payload has the declared
    width; here it is an explicit call for API boundaries (runner inputs,
    protocol label lists) where a silent mismatch would otherwise surface
    as an opaque shape error deep in the executor."""
    flat, _ = flatten_wires(wires)
    if len(flat) != expected:
        raise ArityError(f"{what}: expected {expected} wires, got {len(flat)}")
    return flat


def flatten_wires(obj: Any) -> tuple[list[int], Any]:
    """Flatten a wire structure -> (flat wire-id list, treedef).

    The treedef is an opaque structure usable with ``unflatten_wires``.
    Iterative (explicit stack): deeply nested component outputs exceed
    CPython 3.12's C-recursion guard, which ``sys.setrecursionlimit``
    cannot lift.
    """
    flat: list[int] = []

    def enter(o: Any):
        """Leaf -> final treedef tuple; container -> open frame (a list)."""
        if isinstance(o, bool):
            raise TypeError("bool is not a wire; encode constants via ctx constants")
        if isinstance(o, int):
            flat.append(o)
            return ("w",)
        if isinstance(o, (list, tuple)):
            return ["l" if isinstance(o, list) else "t", list(o), []]
        if _is_container(o):
            children, aux = o.wires_flatten()
            return ["c", type(o), aux, list(children), []]
        raise TypeError(f"not a wire structure: {type(o)!r}")

    first = enter(obj)
    if isinstance(first, tuple):
        return flat, first
    stack = [first]
    while True:
        fr = stack[-1]
        pending = fr[1] if fr[0] != "c" else fr[3]
        defs = fr[2] if fr[0] != "c" else fr[4]
        if len(defs) < len(pending):
            nxt = enter(pending[len(defs)])
            if isinstance(nxt, tuple):
                defs.append(nxt)
            else:
                stack.append(nxt)
            continue
        td = ("c", fr[1], fr[2], defs) if fr[0] == "c" else (fr[0], defs)
        stack.pop()
        if not stack:
            return flat, td
        parent = stack[-1]
        (parent[2] if parent[0] != "c" else parent[4]).append(td)


def unflatten_wires(treedef: Any, flat: list[int]) -> Any:
    """Rebuild a wire structure from a treedef and a flat wire list.

    Iterative for the same deep-nesting reason as ``flatten_wires``.
    """
    it = iter(flat)

    def build(td, vals):
        if td[0] == "l":
            return vals
        if td[0] == "t":
            return tuple(vals)
        return td[1].wires_unflatten(td[2], vals)

    if treedef[0] == "w":
        out = next(it)
    else:
        stack = [(treedef, [])]
        while True:
            td, vals = stack[-1]
            kids = td[1] if td[0] in ("l", "t") else td[3]
            if len(vals) < len(kids):
                k = kids[len(vals)]
                if k[0] == "w":
                    vals.append(next(it))
                else:
                    stack.append((k, []))
                continue
            built = build(td, vals)
            stack.pop()
            if not stack:
                out = built
                break
            stack[-1][1].append(built)
    rest = list(it)
    if rest:
        raise ValueError(f"{len(rest)} unconsumed wires during unflatten")
    return out


def count_wires(treedef: Any) -> int:
    total = 0
    stack = [treedef]
    while stack:
        td = stack.pop()
        kind = td[0]
        if kind == "w":
            total += 1
        elif kind in ("l", "t"):
            stack.extend(td[1])
        elif kind == "c":
            stack.extend(td[3])
        else:
            raise AssertionError(kind)
    return total


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

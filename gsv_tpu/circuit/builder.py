"""Circuit tracer: components, templates, and the tracing context.

The reference interleaves a metadata (fanout-counting) pass and an execution
pass per component, caching ``ComponentMetaTemplate``s in an LRU pool
(``src/circuit/streaming_mode.rs``, ``component_meta.rs``,
``component_template_pool.rs``).  On TPU the same idea becomes fully static:
each distinct component key is traced **once** into a ``Template`` — a
program of gates and child calls with template-local wire numbering — and all
scheduling/liveness/slot work happens later at compile time
(``gsv_tpu.circuit.tape``).

Wire numbering inside a template (matches ``WireId::MIN = 2``,
src/core/wire.rs:6): 0 = FALSE constant, 1 = TRUE constant, 2.. = inputs,
then internal wires in allocation order.  Gate-id order is program order —
the load-bearing order for AES tweaks and ciphertext streams
(``garble_mode.rs:120-124``).
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np

from gsv_tpu.core.gate_types import GateType, N_GATE_TYPES, is_free
from gsv_tpu.circuit.wires import (
    flatten_wires,
    param_key_bytes,
    unflatten_wires,
)

FALSE_WIRE = 0
TRUE_WIRE = 1
_FIRST_INPUT = 2


@dataclass
class Call:
    """A child-component invocation inside a template."""

    template: "Template"
    inputs: list[int]  # parent-local wire ids read by the child
    outputs: list[int]  # parent-local wire ids receiving child outputs
    # outputs[i] is -1 when the child's i-th output is aliased to a child
    # input or constant (no parent wire is issued); alias_map records those.
    alias: list[tuple[int, int]] = field(default_factory=list)  # (out_pos, parent_wire)


@dataclass
class Template:
    """A traced component: gates + child calls, in program order."""

    key: Any
    name: str
    n_inputs: int
    # gates stored as parallel numpy arrays in program order
    gate_type: np.ndarray = None  # uint8
    gate_a: np.ndarray = None  # int32, template-local wire ids
    gate_b: np.ndarray = None
    gate_c: np.ndarray = None
    # program order: items[i] = ("g", gate_index_range) | ("c", call_index)
    runs: list[tuple] = field(default_factory=list)
    calls: list[Call] = field(default_factory=list)
    outputs: list[int] = field(default_factory=list)
    out_treedef: Any = None
    n_wires: int = _FIRST_INPUT  # includes constants + inputs + internals
    # aggregate stats (computed at trace end, liveness-independent)
    total_gates: int = 0  # own + children, all gates
    own_gates: int = 0
    hist: np.ndarray = None  # (11,) uint64 aggregated histogram
    # barrier templates are never inlined into a flat tape: their wiring
    # references constant wires that must stay in step *headers* (arena
    # slots 0/1) so the child tapes' contents stay constant-independent —
    # the mechanism behind the uniform-shape constant gadgets (TPU fast
    # path; see gadgets/bn254/fp254.py::mul_by_constant_montgomery)
    barrier: bool = False

    def __repr__(self):
        return (
            f"Template({self.name}, inputs={self.n_inputs}, "
            f"outputs={len(self.outputs)}, total_gates={self.total_gates:,})"
        )


class TemplateCache:
    """Maps component keys to traced templates.

    Reference parity: ``ComponentTemplatePool`` (component_template_pool.rs:10,
    LRU capped at 5,000).  Distinct component shapes in the Groth16 circuit
    number in the hundreds, so the cap never binds there — but an unbounded
    memo is a footgun for adversarial circuits that generate unbounded
    distinct keys, so the same cap applies (evicting least-recently-used;
    override with max_entries=None for an unbounded pool).
    """

    def __init__(self, uniform_constants: bool = False,
                 max_entries: int | None = 5000):
        from collections import OrderedDict

        self.templates: OrderedDict[Any, Template] = OrderedDict()
        self.max_entries = max_entries
        self.hits = 0
        self.misses = 0
        # trace-wide config: constant-mul gadgets emit constant-independent
        # shapes (constants as FALSE/TRUE header wires through the generic
        # multiplier) instead of the reference's baked zero-skipping streams.
        # Snapshotted per cache so one trace can't mix modes.
        self.uniform_constants = uniform_constants

    def get(self, key):
        t = self.templates.get(key)
        if t is not None:
            self.hits += 1
            self.templates.move_to_end(key)
        return t

    def put(self, key, template: Template):
        self.misses += 1
        self.templates[key] = template
        self.templates.move_to_end(key)
        if self.max_entries is not None and len(self.templates) > self.max_entries:
            self.templates.popitem(last=False)


class TraceCtx:
    """Tracing context handed to gadget functions (``CircuitContext``)."""

    __slots__ = (
        "cache",
        "name",
        "_key",
        "_n_inputs",
        "_next_wire",
        "_gt",
        "_ga",
        "_gb",
        "_gc",
        "_runs",
        "_calls",
        "_run_start",
        "depth",
    )

    FALSE = FALSE_WIRE
    TRUE = TRUE_WIRE

    @property
    def uniform_constants(self) -> bool:
        """Trace-wide constant-gadget mode (see TemplateCache)."""
        return getattr(self.cache, "uniform_constants", False)

    # Nesting guard: real gadget stacks are < 30 deep (Groth16) and the
    # reference's own stress test is 1000; hitting thousands almost always
    # means an int parameter that should have been declared ``offcircuit``
    # is being folded into a never-hitting cache key (infinite self-trace).
    MAX_DEPTH = 5000

    def __init__(
        self, cache: TemplateCache, name: str, key: Any, n_inputs: int, depth: int = 0
    ):
        self.cache = cache
        self.name = name
        self._key = key
        self._n_inputs = n_inputs
        self.depth = depth
        self._next_wire = _FIRST_INPUT + n_inputs
        self._gt: list[int] = []
        self._ga: list[int] = []
        self._gb: list[int] = []
        self._gc: list[int] = []
        self._runs: list[tuple] = []
        self._calls: list[Call] = []
        self._run_start = 0

    # -- CircuitContext surface ------------------------------------------

    def issue_wire(self) -> int:
        w = self._next_wire
        self._next_wire += 1
        return w

    def add_gate(self, gt: int, a: int, b: int, c: int) -> None:
        self._gt.append(int(gt))
        self._ga.append(a)
        self._gb.append(b)
        self._gc.append(c)

    def gate(self, gt: int, a: int, b: int) -> int:
        """Emit a two-input gate onto a fresh output wire."""
        c = self.issue_wire()
        self.add_gate(gt, a, b, c)
        return c

    # convenience constructors mirroring Gate::{and,or,...}
    def and_(self, a, b):
        return self.gate(GateType.AND, a, b)

    def nand(self, a, b):
        return self.gate(GateType.NAND, a, b)

    def nimp(self, a, b):
        return self.gate(GateType.NIMP, a, b)

    def imp(self, a, b):
        return self.gate(GateType.IMP, a, b)

    def ncimp(self, a, b):
        return self.gate(GateType.NCIMP, a, b)

    def cimp(self, a, b):
        return self.gate(GateType.CIMP, a, b)

    def nor(self, a, b):
        return self.gate(GateType.NOR, a, b)

    def or_(self, a, b):
        return self.gate(GateType.OR, a, b)

    def xor(self, a, b):
        return self.gate(GateType.XOR, a, b)

    def xnor(self, a, b):
        return self.gate(GateType.XNOR, a, b)

    def not_(self, a):
        """Free NOT onto a fresh wire (label = a ^ Δ)."""
        c = self.issue_wire()
        self.add_gate(GateType.NOT, a, a, c)
        return c

    def and_variant(self, a, b, f: tuple[bool, bool, bool]) -> int:
        """``((a ^ f0) & (b ^ f1)) ^ f2`` (Gate::and_variant, core/gate.rs:180)."""
        gt = (int(f[0]) << 2) | (int(f[1]) << 1) | int(f[2])
        return self.gate(gt, a, b)

    # -- child components -------------------------------------------------

    def child(
        self,
        key: Any,
        name: str,
        input_wires: list[int],
        body: Callable[["TraceCtx", list[int]], tuple[list[int], Any]],
        barrier: bool = False,
    ) -> tuple[list[int], Any]:
        """Invoke a child component (``with_named_child``).

        ``body(child_ctx, child_input_ids) -> (child_output_ids, out_treedef)``
        is only executed on a cache miss.  Returns parent-local output wires
        and the output treedef.
        """
        template = self.cache.get(key)
        if template is None:
            if self.depth >= self.MAX_DEPTH:
                raise RecursionError(
                    f"component nesting exceeded {self.MAX_DEPTH} at "
                    f"{name!r} — is a host-side parameter (e.g. a depth or "
                    f"length int) missing from the component's `offcircuit` "
                    f"list, so recursion never changes the cache key?"
                )
            child_ctx = TraceCtx(
                self.cache, name, key, len(input_wires), depth=self.depth + 1
            )
            child_inputs = list(range(_FIRST_INPUT, _FIRST_INPUT + len(input_wires)))
            out_ids, out_treedef = body(child_ctx, child_inputs)
            template = child_ctx.finish(out_ids, out_treedef)
            template.barrier = barrier
            self.cache.put(key, template)

        # map child outputs to parent wires
        in_set = {
            _FIRST_INPUT + i: pw for i, pw in enumerate(input_wires)
        }  # child input id -> parent wire
        parent_out: list[int] = []
        seen: dict[int, int] = {}
        for o in template.outputs:
            if o == FALSE_WIRE or o == TRUE_WIRE:
                parent_out.append(o)
            elif o in in_set:
                parent_out.append(in_set[o])
            elif o in seen:
                parent_out.append(seen[o])
            else:
                w = self.issue_wire()
                seen[o] = w
                parent_out.append(w)

        self._flush_run()
        self._runs.append(("c", len(self._calls)))
        self._calls.append(
            Call(template=template, inputs=list(input_wires), outputs=parent_out)
        )
        return parent_out, template.out_treedef

    # -- finalization ------------------------------------------------------

    def _flush_run(self):
        n = len(self._gt)
        if n > self._run_start:
            self._runs.append(("g", self._run_start, n))
        self._run_start = n

    def finish(self, outputs: list[int], out_treedef: Any) -> Template:
        self._flush_run()
        t = Template(
            key=self._key,
            name=self.name,
            n_inputs=self._n_inputs,
            gate_type=np.asarray(self._gt, dtype=np.uint8),
            gate_a=np.asarray(self._ga, dtype=np.int64),
            gate_b=np.asarray(self._gb, dtype=np.int64),
            gate_c=np.asarray(self._gc, dtype=np.int64),
            runs=self._runs,
            calls=self._calls,
            outputs=list(outputs),
            out_treedef=out_treedef,
            n_wires=self._next_wire,
        )
        t.own_gates = len(self._gt)
        hist = np.zeros(N_GATE_TYPES, dtype=np.uint64)
        if t.own_gates:
            np.add.at(hist, t.gate_type, 1)
        total = t.own_gates
        for call in t.calls:
            total += call.template.total_gates
            hist += call.template.hist
        t.total_gates = total
        t.hist = hist
        return t


# ----------------------------------------------------------------------
# The @component decorator (the reference's #[component] proc-macro)
# ----------------------------------------------------------------------


def component(
    fn=None,
    *,
    offcircuit: tuple[str, ...] = (),
    name: str | None = None,
    barrier: bool = False,
):
    """Mark a gadget function as a cached circuit component.

    The wrapped function must take the tracing context as its first
    parameter; all other parameters are wire structures except those named in
    ``offcircuit``, which are host-side values folded into the component key
    (reference: ``offcircuit_args``, circuit_component_macro/src/lib.rs:96-154).

    On a template-cache hit the body is **not** re-executed — outputs are
    rebuilt from the cached template, which is what makes tracing the
    11B-gate Groth16 circuit tractable.
    """

    def wrap(f):
        sig = inspect.signature(f)
        params = list(sig.parameters.keys())
        if not params:
            raise TypeError("component function needs a ctx parameter")
        ctx_name = params[0]
        wire_params = [p for p in params[1:] if p not in offcircuit]
        qualname = name or f"{f.__module__}.{f.__qualname__}"

        def wrapper(ctx: TraceCtx, *args, **kwargs):
            bound = sig.bind(ctx, *args, **kwargs)
            bound.apply_defaults()
            wire_args = {p: bound.arguments[p] for p in wire_params}
            off_args = {p: bound.arguments[p] for p in offcircuit}

            flat_in, in_treedef = flatten_wires([wire_args[p] for p in wire_params])
            off_bytes = b"".join(
                param_key_bytes(off_args[p]) for p in offcircuit
            )
            key = (qualname, off_bytes, len(flat_in))

            def body(child_ctx: TraceCtx, child_inputs: list[int]):
                structured = unflatten_wires(in_treedef, child_inputs)
                call_kwargs = dict(zip(wire_params, structured))
                call_kwargs.update(off_args)
                result = f(child_ctx, **call_kwargs)
                if result is None:
                    raise TypeError(f"component {qualname} returned no outputs")
                out_ids, out_treedef = flatten_wires(result)
                return out_ids, out_treedef

            out_ids, out_treedef = ctx.child(key, qualname, flat_in, body, barrier=barrier)
            return unflatten_wires(out_treedef, out_ids)

        wrapper.__name__ = f.__name__
        wrapper.__qualname__ = f.__qualname__
        wrapper.__doc__ = f.__doc__
        wrapper.__wrapped__ = f
        return wrapper

    if fn is not None:
        return wrap(fn)
    return wrap


def trace_circuit(
    fn: Callable,
    n_inputs: int,
    cache: TemplateCache | None = None,
    uniform_constants: bool = False,
):
    """Trace a root circuit function into a Template.

    ``fn(ctx, input_wires: list[int]) -> wire structure`` — the root closure
    (the reference's ``f`` in ``run_streaming``).  Returns (template, cache).
    """
    # Deeply nested components (the reference exercises 1000 levels,
    # circuit/mod.rs:604-835) recurse through Python frames at trace time;
    # lift the interpreter limit so gadget depth, not CPython, is the bound.
    import sys

    if sys.getrecursionlimit() < 100_000:
        sys.setrecursionlimit(100_000)

    cache = cache or TemplateCache(uniform_constants=uniform_constants)
    assert cache.uniform_constants == uniform_constants, (
        "a TemplateCache cannot be shared across constant-gadget modes"
    )
    root_ctx = TraceCtx(cache, "<root>", key=("<root>",), n_inputs=n_inputs)
    inputs = list(range(_FIRST_INPUT, _FIRST_INPUT + n_inputs))
    result = fn(root_ctx, inputs)
    out_ids, out_treedef = flatten_wires(result)
    template = root_ctx.finish(out_ids, out_treedef)
    return template, cache

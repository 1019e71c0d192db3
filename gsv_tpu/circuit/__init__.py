"""Circuit tracer, templates, compiled tapes and execution modes.

Reference parity: ``src/circuit/`` + ``src/storage.rs``.  The reference
interleaves a per-component metadata pass with streaming per-gate execution;
this framework instead *traces* each distinct component once into a
``Template`` (a reusable program of gates and child calls), compiles templates
into static ``CompiledTape``s (topological wave schedule + register-allocated
slot frames), links the whole circuit into a flat run plan, and executes the
plan on TPU as vectorized label algebra.

Public surface:

- ``component`` — decorator marking a gadget function as a cached circuit
  component (the reference's ``#[component]`` proc-macro, ``circuit_component_macro/``).
- ``TraceCtx`` — the tracing context passed to gadget functions
  (``CircuitContext``, src/circuit/circuit_context_trait.rs).
- ``CircuitBuilder.streaming_execute / streaming_garbling / streaming_evaluation``
  — mode entry points (src/circuit/mod.rs:124-250).
- ``FALSE_WIRE = 0``, ``TRUE_WIRE = 1`` constants.
"""

from gsv_tpu.circuit.wires import (  # noqa: F401
    flatten_wires,
    unflatten_wires,
    WireStruct,
)
from gsv_tpu.circuit.builder import (  # noqa: F401
    FALSE_WIRE,
    TRUE_WIRE,
    TraceCtx,
    Template,
    TemplateCache,
    component,
    trace_circuit,
)

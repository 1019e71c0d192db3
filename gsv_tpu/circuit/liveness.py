"""Wire liveness / dead-gate analysis on templates.

Reference parity: the metadata (fanout) pass of ``src/circuit/component_meta.rs``
— a wire's credits count one per read (gate inputs and child-call inputs;
writes don't count; constants ignored), plus credits routed from the parent
for output positions.  A gate whose output wire has zero credits is never
executed: the garbler skips it entirely (no AES, no ciphertext) while still
advancing the gate-id counter (``storage.rs:119-132`` zero-credit elision,
``garble_mode.rs:192-197`` UNREACHABLE skip).

Deadness does **not** cascade: the reference consumes input credits even for
skipped gates, so a wire read only by dead gates still counts as read.  That
makes liveness a single non-iterative pass, and it depends on which template
*outputs* the caller reads — so compiled artifacts are specialized per
``(template, live-output mask)``.
"""

from __future__ import annotations

import numpy as np

from gsv_tpu.circuit.builder import Call, FALSE_WIRE, TRUE_WIRE, Template

_N_CONST = 2  # wires 0/1 are global constants


def wire_live(template: Template, live_out: tuple[bool, ...]) -> np.ndarray:
    """Boolean liveness per template-local wire id, given live output mask."""
    reads = np.zeros(template.n_wires, dtype=np.int64)
    if template.own_gates:
        np.add.at(reads, template.gate_a, 1)
        np.add.at(reads, template.gate_b, 1)
    for call in template.calls:
        for w in call.inputs:
            reads[w] += 1
    assert len(live_out) == len(template.outputs), (
        f"{template.name}: live mask {len(live_out)} != outputs {len(template.outputs)}"
    )
    for pos, w in enumerate(template.outputs):
        if live_out[pos] and w >= _N_CONST:
            reads[w] += 1
    live = reads > 0
    live[FALSE_WIRE] = True
    live[TRUE_WIRE] = True
    live[_N_CONST : _N_CONST + template.n_inputs] = True  # inputs owned by parent
    return live


def call_live_mask(call: Call, live: np.ndarray) -> tuple[bool, ...]:
    """Live-output mask to propagate into a child call.

    Positions aliased to child inputs/constants get False — they don't drive
    any gate inside the child.
    """
    mask = []
    child_out = call.template.outputs
    for pos, parent_w in enumerate(call.outputs):
        child_w = child_out[pos]
        if child_w < _N_CONST + call.template.n_inputs:
            mask.append(False)  # aliased to child input or constant
        else:
            mask.append(bool(live[parent_w]))
    return tuple(mask)


def all_live(template: Template) -> tuple[bool, ...]:
    return (True,) * len(template.outputs)

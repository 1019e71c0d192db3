"""Sequential reference interpreters for Execute / Garble / Evaluate.

These walk the template tree gate by gate on the host — slow (Python speed)
but *exact*, including dead-gate elision, global gate-id assignment and
ciphertext stream order.  They are the semantic oracle the vectorized TPU
runtime is tested against, mirroring how the reference's ExecuteMode serves
as the oracle for its cryptographic modes (SURVEY §4.2).

Reference parity:
- gate semantics: ``src/circuit/modes/execute_mode.rs:70-89``
- garbling: ``src/circuit/modes/garble_mode/halfgates_garbling.rs:5-38``
- evaluation: ``halfgates_garbling.rs:40-69``, ``evaluate_mode.rs:123-158``
- gate-id/ciphertext ordering: ``garble_mode.rs:160-222``
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from gsv_tpu.core.gate_types import (
    GateType,
    GateCount,
    alphas,
    execute_gate,
    is_free,
)
from gsv_tpu.core.labels import MASK128
from gsv_tpu.core.rng import GarblerRng
from gsv_tpu.circuit.builder import FALSE_WIRE, TRUE_WIRE, Template
from gsv_tpu.circuit.liveness import all_live, call_live_mask, wire_live
from gsv_tpu.ops.aes_host import aes_hash_with_gate

HashFn = Callable[[int, int], int]  # (label, gate_id) -> label


def _walk(template: Template, live_out, frame: dict, visit_gate, enter_call):
    """Shared recursive traversal in program order.

    ``frame`` maps template-local wire id -> mode value.  ``visit_gate`` is
    called for every gate (live or dead) and must advance its own gate
    counter; ``enter_call`` recurses.
    """
    live = wire_live(template, live_out)
    for item in template.runs:
        if item[0] == "g":
            _, start, end = item
            gt_arr, a_arr, b_arr, c_arr = (
                template.gate_type,
                template.gate_a,
                template.gate_b,
                template.gate_c,
            )
            for i in range(start, end):
                visit_gate(
                    int(gt_arr[i]),
                    int(a_arr[i]),
                    int(b_arr[i]),
                    int(c_arr[i]),
                    bool(live[c_arr[i]]),
                    frame,
                )
        else:
            call = template.calls[item[1]]
            child_mask = call_live_mask(call, live)
            enter_call(call, child_mask, frame)


@dataclass
class ExecuteInterp:
    """Boolean execution (the correctness oracle)."""

    gate_count: GateCount = field(default_factory=GateCount)

    def run(self, template: Template, input_bits: list[bool]) -> list[bool]:
        assert len(input_bits) == template.n_inputs
        frame = {FALSE_WIRE: False, TRUE_WIRE: True}
        for i, b in enumerate(input_bits):
            frame[2 + i] = bool(b)
        self._run_frame(template, all_live(template), frame)
        return [frame[w] for w in template.outputs]

    def _run_frame(self, template, live_out, frame):
        def visit_gate(gt, a, b, c, live, fr):
            self.gate_count.handle(gt)
            if not live:
                return
            fr[c] = execute_gate(gt, fr[a], fr[b])

        def enter_call(call, child_mask, fr):
            child_frame = {FALSE_WIRE: False, TRUE_WIRE: True}
            for i, w in enumerate(call.inputs):
                child_frame[2 + i] = fr[w]
            self._run_frame(call.template, child_mask, child_frame)
            for pos, parent_w in enumerate(call.outputs):
                child_w = call.template.outputs[pos]
                if parent_w >= 2 and child_w in child_frame:
                    fr[parent_w] = child_frame[child_w]

        _walk(template, live_out, frame, visit_gate, enter_call)


@dataclass
class GarbleInterp:
    """Half-gates garbling with global gate ids and streamed ciphertexts.

    Stores only label0 per wire (label1 = label0 ^ delta on demand), like
    ``GarbleMode`` (garble_mode.rs:71-72).
    """

    seed: int = 0
    hash_fn: HashFn = staticmethod(aes_hash_with_gate)
    gate_index: int = 0
    ciphertexts: list[int] = field(default_factory=list)
    gate_count: GateCount = field(default_factory=GateCount)

    def __post_init__(self):
        self.rng = GarblerRng(self.seed)
        self.delta = self.rng.delta
        self.false_label0 = self.rng.false_label0
        self.true_label0 = self.rng.true_label0

    def run(self, template: Template, input_labels: list[int] | None = None):
        """Garble; input label0s default to fresh draws in allocation order.

        Returns (output_label0s, input_label0s).
        """
        if input_labels is None:
            input_labels = [self.rng.issue_label0() for _ in range(template.n_inputs)]
        assert len(input_labels) == template.n_inputs
        frame = {FALSE_WIRE: self.false_label0, TRUE_WIRE: self.true_label0}
        for i, l in enumerate(input_labels):
            frame[2 + i] = l
        self._run_frame(template, all_live(template), frame)
        return [frame[w] for w in template.outputs], input_labels

    def _garble_gate(self, gt, a0, b0, gid):
        delta = self.delta
        if gt == GateType.XOR:
            return a0 ^ b0, None
        if gt == GateType.XNOR:
            return a0 ^ b0 ^ delta, None
        if gt == GateType.NOT:
            return a0 ^ delta, None
        aa, ab, ac = alphas(gt)
        sel_a = a0 ^ delta if aa else a0
        other_a = sel_a ^ delta
        h_sel = self.hash_fn(sel_a, gid)
        h_other = self.hash_fn(other_a, gid)
        b_sel = b0 ^ delta if ab else b0
        ct = h_sel ^ h_other ^ b_sel
        w0 = h_sel ^ delta if ac else h_sel
        return w0, ct

    def _run_frame(self, template, live_out, frame):
        def visit_gate(gt, a, b, c, live, fr):
            self.gate_count.handle(gt)
            gid = self.gate_index
            self.gate_index += 1
            if not live:
                return  # UNREACHABLE output: skip garbling, id already advanced
            w0, ct = self._garble_gate(gt, fr[a], fr[b], gid)
            if ct is not None:
                self.ciphertexts.append(ct)
            fr[c] = w0

        def enter_call(call, child_mask, fr):
            child_frame = {FALSE_WIRE: self.false_label0, TRUE_WIRE: self.true_label0}
            for i, w in enumerate(call.inputs):
                child_frame[2 + i] = fr[w]
            self._run_frame(call.template, child_mask, child_frame)
            for pos, parent_w in enumerate(call.outputs):
                child_w = call.template.outputs[pos]
                if parent_w >= 2 and child_w in child_frame:
                    fr[parent_w] = child_frame[child_w]

        _walk(template, live_out, frame, visit_gate, enter_call)


@dataclass
class EvalWire:
    """Active label + known plaintext value (``EvaluatedWire``)."""

    label: int
    value: bool


@dataclass
class EvaluateInterp:
    """Half-gates evaluation from a ciphertext stream."""

    true_label: int = 0  # active label of the TRUE constant (garbler label1)
    false_label: int = 0  # active label of the FALSE constant (garbler label0)
    hash_fn: HashFn = staticmethod(aes_hash_with_gate)
    gate_index: int = 0
    ct_pos: int = 0
    gate_count: GateCount = field(default_factory=GateCount)

    def run(
        self,
        template: Template,
        inputs: list[EvalWire],
        ciphertexts: list[int],
    ) -> list[EvalWire]:
        assert len(inputs) == template.n_inputs
        self._cts = ciphertexts
        frame = {
            FALSE_WIRE: EvalWire(self.false_label, False),
            TRUE_WIRE: EvalWire(self.true_label, True),
        }
        for i, ew in enumerate(inputs):
            frame[2 + i] = ew
        self._run_frame(template, all_live(template), frame)
        return [frame[w] for w in template.outputs]

    def _degarble(self, gt, aw: EvalWire, bw: EvalWire, gid):
        if gt == GateType.XOR:
            return EvalWire((aw.label ^ bw.label) & MASK128, aw.value ^ bw.value)
        if gt == GateType.XNOR:
            return EvalWire((aw.label ^ bw.label) & MASK128, not (aw.value ^ bw.value))
        if gt == GateType.NOT:
            return EvalWire(aw.label, not aw.value)
        ct = self._cts[self.ct_pos]
        self.ct_pos += 1
        h = self.hash_fn(aw.label, gid)
        aa, _, _ = alphas(gt)
        if aw.value != aa:
            label = ct ^ h ^ bw.label
        else:
            label = h
        return EvalWire(label & MASK128, execute_gate(gt, aw.value, bw.value))

    def _run_frame(self, template, live_out, frame):
        def visit_gate(gt, a, b, c, live, fr):
            self.gate_count.handle(gt)
            gid = self.gate_index
            self.gate_index += 1
            if not live:
                return
            fr[c] = self._degarble(gt, fr[a], fr[b], gid)

        def enter_call(call, child_mask, fr):
            child_frame = {
                FALSE_WIRE: EvalWire(self.false_label, False),
                TRUE_WIRE: EvalWire(self.true_label, True),
            }
            for i, w in enumerate(call.inputs):
                child_frame[2 + i] = fr[w]
            self._run_frame(call.template, child_mask, child_frame)
            for pos, parent_w in enumerate(call.outputs):
                child_w = call.template.outputs[pos]
                if parent_w >= 2 and child_w in child_frame:
                    fr[parent_w] = child_frame[child_w]

        _walk(template, live_out, frame, visit_gate, enter_call)

"""Streaming mode entry points — the reference's ``CircuitBuilder`` facade.

Reference parity: ``CircuitBuilder::{streaming_execute, streaming_garbling,
streaming_evaluation}`` + ``StreamingResult`` (src/circuit/mod.rs:81-300).

A circuit function has signature ``fn(ctx, input_wires: list[int]) -> wire
structure``; inputs are a flat bit/label list in allocation order.  The
``CircuitRunner`` caches trace → compile → link per circuit so the expensive
static work happens once and is reused across modes and protocol instances —
the reference re-runs its metadata pass per call; we never do.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from gsv_tpu.core.gate_types import GateCount
from gsv_tpu.core.labels import (
    int_array_from_words,
    words_from_int,
    words_from_int_array,
)
from gsv_tpu.core.rng import GarblerRng
from gsv_tpu.circuit.builder import TemplateCache, trace_circuit
from gsv_tpu.circuit.ciphertext import CollectHandler
from gsv_tpu.circuit.link import Plan, link
from gsv_tpu.circuit.runtime import PlanExecutor
from gsv_tpu.circuit.tape import Compiler
from gsv_tpu.circuit.wires import ArityError, arity_check


@dataclass
class GarbledWire:
    """(label0, label1) pair; label1 = label0 ^ delta (garble_mode.rs:21-24)."""

    label0: int
    label1: int

    def select(self, bit: bool) -> int:
        return self.label1 if bit else self.label0

    def toggle_not(self) -> "GarbledWire":
        return GarbledWire(self.label1, self.label0)


@dataclass
class EvaluatedWire:
    """Active label + semantic value (evaluate_mode.rs:14-18)."""

    active_label: int
    value: bool


@dataclass
class StreamingResult:
    """Mirror of ``StreamingResult`` (circuit/mod.rs:81-107)."""

    output_value: object
    output_bits: list | None
    gate_count: GateCount
    input_wire_values: list
    false_wire_constant: object
    true_wire_constant: object
    ciphertext_handler_result: object = None


class CircuitRunner:
    """Trace/compile/link once; run in any mode, optionally batched."""

    def __init__(
        self,
        fn: Callable,
        n_inputs: int,
        flatten_max: int = 1 << 20,
        cache: TemplateCache | None = None,
        uniform_constants: bool = False,
    ):
        self.fn = fn
        self.n_inputs = n_inputs
        self.template, self.cache = trace_circuit(
            fn, n_inputs, cache, uniform_constants=uniform_constants
        )
        self.compiler = Compiler(flatten_max=flatten_max)
        self.spec = self.compiler.compile(self.template)
        self.plan: Plan = link(self.spec, n_inputs)
        self._executors: dict = {}

    @property
    def gate_count(self) -> GateCount:
        return GateCount(self.template.hist)

    def executor(self, batch: int | None = None, hasher: str = "aes") -> PlanExecutor:
        ex = self._executors.get((batch, hasher))
        if ex is None:
            ex = PlanExecutor(self.plan, batch=batch, hasher=hasher)
            self._executors[(batch, hasher)] = ex
        return ex

    # -- execute -------------------------------------------------------

    def execute(self, input_bits: list[bool]) -> StreamingResult:
        if len(input_bits) != self.n_inputs:
            raise ArityError(
                f"input bits: expected {self.n_inputs}, got {len(input_bits)}"
            )
        bits = np.asarray([int(b) for b in input_bits], dtype=np.uint8)
        out = self.executor().execute(bits)
        return StreamingResult(
            output_value=[bool(v) for v in out],
            output_bits=[bool(v) for v in out],
            gate_count=self.gate_count,
            input_wire_values=[bool(b) for b in input_bits],
            false_wire_constant=False,
            true_wire_constant=True,
        )

    # -- garble --------------------------------------------------------

    def garble(
        self,
        seed: int,
        ct_handler=None,
        input_labels: list[int] | None = None,
        hasher: str = "aes",
    ) -> StreamingResult:
        """Garble one instance from a u64 seed (labels drawn in allocation
        order exactly like ``GarbleMode::new`` + input encoding)."""
        rng = GarblerRng(seed)
        if input_labels is None:
            input_labels = [rng.issue_label0() for _ in range(self.n_inputs)]
        else:
            arity_check(list(input_labels), self.n_inputs, "input labels")
        handler = ct_handler if ct_handler is not None else CollectHandler()
        outw, _ = self.executor(hasher=hasher).garble(
            words_from_int_array(input_labels),
            words_from_int(rng.delta),
            words_from_int(rng.false_label0),
            words_from_int(rng.true_label0),
            ct_handler=handler,
        )
        out_l0 = int_array_from_words(outw)
        delta = rng.delta
        return StreamingResult(
            output_value=[GarbledWire(l, l ^ delta) for l in out_l0],
            output_bits=None,
            gate_count=self.gate_count,
            input_wire_values=[
                GarbledWire(l, l ^ delta) for l in input_labels
            ],
            false_wire_constant=GarbledWire(
                rng.false_label0, rng.false_label0 ^ delta
            ),
            true_wire_constant=GarbledWire(rng.true_label0, rng.true_label0 ^ delta),
            ciphertext_handler_result=handler,
        )

    def garble_batch(self, seeds: list[int], ct_handler=None, mesh=None):
        """Garble many instances at once (the cut-and-choose axis).

        ``mesh``: optional Mesh with an ``instances`` axis to shard the
        batch across chips (SPMD; see PlanExecutor.garble).
        """
        B = len(seeds)
        rngs = [GarblerRng(s) for s in seeds]
        in_labels = np.stack(
            [
                words_from_int_array([r.issue_label0() for _ in range(self.n_inputs)])
                for r in rngs
            ]
        )
        handler = ct_handler if ct_handler is not None else CollectHandler()
        outw, _ = self.executor(batch=B).garble(
            in_labels,
            np.stack([words_from_int(r.delta) for r in rngs]),
            np.stack([words_from_int(r.false_label0) for r in rngs]),
            np.stack([words_from_int(r.true_label0) for r in rngs]),
            ct_handler=handler,
            mesh=mesh,
        )
        return outw, handler, rngs

    # -- evaluate ------------------------------------------------------

    def evaluate(
        self,
        input_wires: list[EvaluatedWire],
        true_label: int,
        false_label: int,
        ct_source,
        hasher: str = "aes",
    ) -> StreamingResult:
        if len(input_wires) != self.n_inputs:
            raise ArityError(
                f"input wires: expected {self.n_inputs}, got {len(input_wires)}"
            )
        labels = words_from_int_array([w.active_label for w in input_wires])
        bits = np.asarray([int(w.value) for w in input_wires], dtype=np.uint8)
        outl, outv = self.executor(hasher=hasher).evaluate(
            labels,
            bits,
            words_from_int(false_label),
            words_from_int(true_label),
            ct_source=ct_source,
        )
        out_labels = int_array_from_words(outl)
        return StreamingResult(
            output_value=[
                EvaluatedWire(l, bool(v)) for l, v in zip(out_labels, outv)
            ],
            output_bits=[bool(v) for v in outv],
            gate_count=self.gate_count,
            input_wire_values=list(input_wires),
            false_wire_constant=EvaluatedWire(false_label, False),
            true_wire_constant=EvaluatedWire(true_label, True),
        )


class CircuitBuilder:
    """Name-compatible one-shot entry points (circuit/mod.rs:124-250).

    Prefer ``CircuitRunner`` when running the same circuit repeatedly.
    """

    @staticmethod
    def streaming_execute(input_bits, n_inputs: int, fn) -> StreamingResult:
        return CircuitRunner(fn, n_inputs).execute(input_bits)

    @staticmethod
    def streaming_garbling(seed: int, n_inputs: int, ct_handler, fn) -> StreamingResult:
        return CircuitRunner(fn, n_inputs).garble(seed, ct_handler=ct_handler)

    @staticmethod
    def streaming_evaluation(
        input_wires, n_inputs: int, true_label: int, false_label: int, source, fn
    ) -> StreamingResult:
        return CircuitRunner(fn, n_inputs).evaluate(
            input_wires, true_label, false_label, source
        )

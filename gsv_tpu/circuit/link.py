"""Linker: unroll a compiled spec into a flat device-dispatch plan.

The whole circuit is static, so every frame base, gate-id base, ciphertext
offset and wire binding is resolved ahead of time on the host.  The result
(``Plan``) is a list of ``TapeStep``s (one device dispatch each, executing a
``CompiledTape`` against the global slot arena) plus occasional ``CopyStep``s
that forward a SuperProgram's outputs into its parent's frame.

Arena layout (absolute uint32 slot indices):

    [0] FALSE constant   [1] TRUE constant   [2] trash (dead scatters)
    [3 .. 3+n_inputs)    circuit inputs
    [.. + root frame + stacked child frames)   working slots
    [top .. top+n_live_root_outputs)           root output region

The same plan drives Execute, Garble and Evaluate — and every cut-and-choose
instance — which is what amortizes compilation across the protocol
(the TPU answer to the reference re-running its metadata pass per instance).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from gsv_tpu.circuit.tape import (
    CompiledTape,
    N_SPECIAL,
    SuperProgram,
)

TRASH = 2
_N_RESERVED = 3  # FALSE, TRUE, TRASH


@dataclass
class TapeStep:
    tape: CompiledTape
    header_map: np.ndarray  # (2 + n_inputs,) absolute arena indices
    outputs_map: np.ndarray  # absolute arena indices for live internal outs
    frame_base: int
    gid_base: int
    ct_base: int


@dataclass
class CopyStep:
    src: np.ndarray  # absolute arena indices
    dst: np.ndarray


@dataclass
class Plan:
    steps: list
    arena_size: int
    n_inputs: int
    input_abs: np.ndarray
    output_abs: np.ndarray  # absolute index per live root output position
    output_positions: np.ndarray  # template-output positions those represent
    total_gates: int
    ct_count: int

    def max_tape_ct(self) -> int:
        return max((s.tape.ct_count for s in self.steps if isinstance(s, TapeStep)), default=0)


def link(root, n_inputs: int) -> Plan:
    """Link a compiled root spec (CompiledTape | SuperProgram) into a Plan."""
    input_abs = np.arange(_N_RESERVED, _N_RESERVED + n_inputs, dtype=np.int32)
    frame0 = _N_RESERVED + n_inputs
    root_frame_total = (
        root.frame_size if isinstance(root, CompiledTape) else root.total_frame
    )
    out_region = frame0 + root_frame_total
    n_live_out = len(root.out_positions)
    arena_size = out_region + n_live_out

    steps: list = []

    def resolve_ops(ops: np.ndarray, header_map: np.ndarray, frame_base: int, H: int):
        ops = np.asarray(ops, dtype=np.int64)
        out = np.where(ops < H, header_map[np.clip(ops, 0, H - 1)], frame_base + ops - H)
        return out.astype(np.int32)

    def walk(spec, header_map: np.ndarray, frame_base: int, out_abs: np.ndarray, gid_base: int, ct_base: int):
        H = spec.header_size
        if isinstance(spec, CompiledTape):
            steps.append(
                TapeStep(
                    tape=spec,
                    header_map=header_map,
                    outputs_map=np.asarray(out_abs, dtype=np.int32),
                    frame_base=frame_base,
                    gid_base=gid_base,
                    ct_base=ct_base,
                )
            )
            return
        assert isinstance(spec, SuperProgram)
        child_base = frame_base + spec.frame_size
        for st in spec.steps:
            child_header = np.concatenate(
                [
                    np.array([0, 1], dtype=np.int32),
                    resolve_ops(st.input_ops, header_map, frame_base, H),
                ]
            )
            child_out = np.where(
                st.out_slots < 0, TRASH, frame_base + st.out_slots
            ).astype(np.int32)
            walk(
                st.child,
                child_header,
                child_base,
                child_out,
                gid_base + st.gid_offset,
                ct_base + st.ct_offset,
            )
        # forward the super's own outputs to the parent's chosen positions
        src = resolve_ops(spec.out_ops, header_map, frame_base, H)
        dst = np.asarray(out_abs, dtype=np.int32)
        keep = dst != TRASH
        if keep.any() and not np.array_equal(src[keep], dst[keep]):
            steps.append(CopyStep(src=src[keep], dst=dst[keep]))

    root_header = np.concatenate([np.array([0, 1], dtype=np.int32), input_abs])
    root_out_abs = np.arange(out_region, out_region + n_live_out, dtype=np.int32)
    walk(root, root_header, frame0, root_out_abs, 0, 0)

    # absolute index for EVERY root output position: live internal ones live
    # in the output region; const/input-aliased ones resolve directly.
    n_out = len(root.out_all_ops)
    full = np.full(n_out, -1, dtype=np.int32)
    H = root.header_size
    for k, pos in enumerate(root.out_positions):
        full[int(pos)] = root_out_abs[k]
    for pos in range(n_out):
        if full[pos] >= 0:
            continue
        code = int(root.out_all_ops[pos])
        if 0 <= code < H:
            full[pos] = root_header[code]

    return Plan(
        steps=steps,
        arena_size=arena_size,
        n_inputs=n_inputs,
        input_abs=input_abs,
        output_abs=full,
        output_positions=np.asarray(root.out_positions, dtype=np.int32),
        total_gates=root.total_gates,
        ct_count=root.ct_count,
    )

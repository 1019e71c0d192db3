"""Template compiler: flatten -> wave-schedule -> register-allocate.

Converts traced ``Template``s (gsv_tpu.circuit.builder) into static executable
artifacts:

- ``CompiledTape`` — a template subtree flattened into parallel numpy gate
  arrays, partitioned into **topological waves** (all gates in a wave are
  independent and execute as one vectorized step), with template-local wires
  mapped onto a minimal **slot frame** by linear-scan register allocation
  (the static replacement for the reference's credit-based ``Storage``,
  src/storage.rs — every wire's slot is freed at its statically-known last
  read instead of at a runtime credit hitting zero).

- ``SuperProgram`` — for subtrees larger than ``flatten_max`` gates: a
  sequence of child invocations (tapes or nested supers) with slot-frame
  bindings, so the 11B-gate Groth16 circuit is a shallow tree of reusable
  compiled tapes rather than one impossible flat array.

Specialization: artifacts are memoized per ``(template, live-output mask)``
because dead-gate elision (and hence the ciphertext stream layout) depends on
which outputs the caller reads — mirroring how the reference's metadata
instance routes parent credits (component_meta.rs:177-219).

Gate-id bookkeeping: every gate (including dead ones) advances the id
counter, matching ``garble_mode.rs:192-197``; ids feed the AES tweaks so this
is load-bearing for bit-exactness.  Ciphertext positions are ranks among
*live non-free* gates in original program order.
"""

from __future__ import annotations

import heapq
import os
from dataclasses import dataclass, field
from typing import Union

import numpy as np

from gsv_tpu.core.gate_types import (
    ALPHA_A,
    ALPHA_B,
    ALPHA_C,
    GateType,
    TRUTH_TABLE,
)
from gsv_tpu.circuit.builder import FALSE_WIRE, TRUE_WIRE, Template
from gsv_tpu.circuit.liveness import call_live_mask, wire_live

# Operand encoding inside a tape: constants, inputs, then frame slots.
OP_FALSE = 0
OP_TRUE = 1
N_SPECIAL = 2  # operands below this are constants


@dataclass
class TapeStreams:
    """Wave-ordered flat gate streams with per-wave offset tables.

    Waves are topological levels; all gates in a wave are independent.  Free
    gates (``out_label = a ^ (b & b_mask) ^ (delta & delta_mask)``) and
    AND-variants (half-gates) form two parallel streams; wave w spans
    ``f_off[w]:f_off[w+1]`` / ``n_off[w]:n_off[w+1]``.
    """

    n_waves: int
    f_off: np.ndarray  # (n_waves+1,) int64
    n_off: np.ndarray
    f_a: np.ndarray  # operand codes, int32
    f_b: np.ndarray
    f_c: np.ndarray  # frame slot, int32
    f_bmask: np.ndarray  # uint8 0/1 (0 for NOT)
    f_flip: np.ndarray  # uint8 0/1 (1 for XNOR/NOT)
    n_a: np.ndarray
    n_b: np.ndarray
    n_c: np.ndarray
    n_gid: np.ndarray  # uint32 local gate id
    n_ct: np.ndarray  # int32 ciphertext stream position (tape-local)
    n_aa: np.ndarray  # uint8 alpha_a
    n_ab: np.ndarray
    n_ac: np.ndarray
    n_tt: np.ndarray  # uint8 truth table (execute/evaluate value path)

    @classmethod
    def empty(cls) -> "TapeStreams":
        z32 = np.zeros(0, dtype=np.int32)
        z8 = np.zeros(0, dtype=np.uint8)
        off = np.zeros(1, dtype=np.int64)
        return cls(
            n_waves=0, f_off=off, n_off=off,
            f_a=z32, f_b=z32, f_c=z32, f_bmask=z8, f_flip=z8,
            n_a=z32, n_b=z32, n_c=z32,
            n_gid=np.zeros(0, dtype=np.uint32), n_ct=z32,
            n_aa=z8, n_ab=z8, n_ac=z8, n_tt=z8,
        )


@dataclass
class Segment:
    """A run of consecutive waves padded to uniform widths for scan execution.

    ``n_waves`` waves; free gates padded to ``cf`` lanes, non-free to ``cn``.
    Padded lanes carry sentinel -1 in the c-slot (scattered to the global
    trash slot) and operand code 0 (reads the FALSE constant — harmless).
    All arrays have leading dim n_waves.
    """

    n_waves: int
    cf: int
    cn: int
    f_a: np.ndarray  # (n, cf) int32 operand codes
    f_b: np.ndarray
    f_c: np.ndarray  # (n, cf) int32 frame slot, -1 = padding
    f_bmask: np.ndarray  # (n, cf) uint8
    f_flip: np.ndarray
    n_a: np.ndarray  # (n, cn)
    n_b: np.ndarray
    n_c: np.ndarray
    n_gid: np.ndarray  # (n, cn) uint32
    n_ct: np.ndarray  # (n, cn) int32; padding points at ct_count (dropped)
    n_aa: np.ndarray
    n_ab: np.ndarray
    n_ac: np.ndarray
    n_tt: np.ndarray


_CLASSES = np.array(
    [16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536, 1 << 20],
    dtype=np.int64,
)


def _classes_v2(max_val: int = 1 << 20, ratio: float = 1.25) -> np.ndarray:
    """Fine-grained width classes: multiples of 16 (the bitsliced-AES block
    quantum) growing by ~1.25x, so per-wave padding is bounded at ~25%
    instead of the pow2 grid's ~2x."""
    g, v = [], 16
    while v < max_val:
        g.append(v)
        v = max(v + 16, ((int(v * ratio) + 15) // 16) * 16)
    g.append(max_val)
    return np.array(g, dtype=np.int64)


_CLASSES_V2 = _classes_v2()


def _classes_v3(max_val: int = 1 << 20, ratio: float = 1.125) -> np.ndarray:
    """Exact classes 1..16 (narrow chain waves pay zero padding), then
    4-lane multiples growing by ~1.125x (wide-wave padding bounded ~12.5%;
    no 16/32 alignment need — group lanes are S*cn and the runtime pads
    sub-32 AES batches in-program)."""
    g = list(range(1, 17))
    v = 16
    while v < max_val:
        # 64-lane quantum above 1024 keeps wide classes power-of-two
        # chunkable for the per-wave lane budget (_chunk_factor)
        q = 4 if v < 1024 else 64
        v = max(v + q, ((int(v * ratio) + q - 1) // q) * q)
        g.append(v)
    return np.array(g, dtype=np.int64)


_CLASSES_V3 = _classes_v3()

# Segmentation v2 (opt-in: GSV_SEG_V2=1): fine width classes + cost-based
# segment merging instead of the pow2 grid + max-window smoothing.  Round-1
# census: the v1 scheme computes 14.7B AES lanes for 2.9B real ones (19.4%
# utilization) on the full verifier — a lone wide wave inflates up to 16
# neighbors to its class.  v2 changes every tape's segment shapes, so it
# REQUIRES its own plan pickle + compile-cache fill; never flip the default
# while a cache built under v1 is in use.
SEG_V2 = os.environ.get("GSV_SEG_V2") == "1"

# Segmentation v3 (opt-in: GSV_SEG_V3=1, supersedes V2): width classes all
# the way down to 1 and a tighter growth ratio.  The 16-lane quantum existed
# so the doubled AES batch stayed a multiple of 32, but group steps hash
# S*cn lanes per wave and the runtime pads sub-32 batches in-program
# (_pad32), so narrow chain waves — 2.37B of the seg-v2 plan's 8.49B lanes
# are width<16 padding (scripts/census_breakdown.py, r4) — can run at their
# true width.  Like V2 this changes every segment shape => own plan pickle
# + compile fill.
SEG_V3 = os.environ.get("GSV_SEG_V3") == "1"
if SEG_V3:
    SEG_V2 = True  # v3 keeps v2's cost-based merging

# Cumulative padded-lane budget a merged segment may carry (calibrated on
# the full-verifier plan: 1024 cuts computed AES lanes 13.1B -> 8.5B with
# only 16% more segments and no program-count growth; 0 would reach 7.1B
# but at 26x the segments).
_SEG_MERGE_LANES = 1024


def _width_classes(widths: np.ndarray) -> np.ndarray:
    """Smallest padded class per width (0 stays 0).  V1/V2 classes are
    multiples of 16 so the doubled AES batch is 32-aligned at S=1; V3 drops
    that (group lanes are S*cn and the runtime pads sub-32 batches)."""
    classes = _CLASSES_V3 if SEG_V3 else _CLASSES_V2 if SEG_V2 else _CLASSES
    idx = np.searchsorted(classes, widths)
    out = classes[np.minimum(idx, len(classes) - 1)]
    return np.where(widths == 0, 0, out)


def _merge_runs(cls: np.ndarray) -> np.ndarray:
    """Cost-based alternative to max-window smoothing: start from
    runs-of-equal-class and greedily merge adjacent segments while the
    padding a merge adds costs less than a segment's fixed overhead.
    Returns the per-wave effective class after merging."""
    n = len(cls)
    if n == 0:
        return cls
    # runs: (start, length, class, cumulative pad spent merging into this run)
    bounds = np.concatenate([[0], np.nonzero(np.diff(cls))[0] + 1, [n]])
    runs = [
        [int(bounds[i]), int(bounds[i + 1] - bounds[i]), int(cls[bounds[i]]), 0]
        for i in range(len(bounds) - 1)
    ]
    merged = True
    while merged and len(runs) > 1:
        merged = False
        out = [runs[0]]
        for r in runs[1:]:
            s, l, c, spent = out[-1]
            s2, l2, c2, spent2 = r
            hi = max(c, c2)
            pad_cost = (l + l2) * hi - (l * c + l2 * c2)
            # budget the CUMULATIVE padding a merged segment may carry, so a
            # wide run cannot keep chain-eating narrow neighbors one at a time
            if spent + spent2 + pad_cost <= _SEG_MERGE_LANES:
                out[-1] = [s, l + l2, hi, spent + spent2 + pad_cost]
                merged = True
            else:
                out.append(r)
        runs = out
    eff = np.empty(n, dtype=cls.dtype)
    for s, l, c, _ in runs:
        eff[s : s + l] = c
    return eff


def _smooth_max(x: np.ndarray, win: int) -> np.ndarray:
    n = len(x)
    if n <= 1:
        return x
    out = x.copy()
    for s in range(1, win + 1):
        out[:-s] = np.maximum(out[:-s], x[s:])
        out[s:] = np.maximum(out[s:], x[:-s])
    return out


def _pad_rows(flat: np.ndarray, starts: np.ndarray, widths: np.ndarray, c: int, fill):
    """(flat stream, per-row starts/widths) -> (n_rows, c) padded matrix."""
    n = len(starts)
    col = np.arange(c, dtype=np.int64)[None, :]
    idx = starts[:, None] + col
    valid = col < widths[:, None]
    idx = np.minimum(idx, max(len(flat) - 1, 0))
    if len(flat) == 0:
        return np.full((n, c), fill, dtype=flat.dtype)
    return np.where(valid, flat[idx], np.asarray(fill, dtype=flat.dtype))


def build_segments(streams: TapeStreams, ct_count: int) -> list[Segment]:
    """Group consecutive waves by (free, nonfree) width class and pad —
    fully vectorized per segment.

    Wave order is preserved (dependencies); a new segment starts whenever
    either smoothed width class changes (max-window smoothing keeps
    alternating widths from fragmenting segments)."""
    nw = streams.n_waves
    if nw == 0:
        return []
    fw = np.diff(streams.f_off)
    nww = np.diff(streams.n_off)
    if SEG_V2:
        cfs = _merge_runs(_width_classes(fw))
        cns = _merge_runs(_width_classes(nww))
    else:
        cfs = _smooth_max(_width_classes(fw), 8)
        cns = _smooth_max(_width_classes(nww), 8)

    key = cfs * (1 << 32) + cns
    bounds = np.concatenate([[0], np.nonzero(np.diff(key))[0] + 1, [nw]])

    segs: list[Segment] = []
    for s in range(len(bounds) - 1):
        w0, w1 = int(bounds[s]), int(bounds[s + 1])
        cf, cn = int(cfs[w0]), int(cns[w0])
        n = w1 - w0
        fs = streams.f_off[w0:w1]
        fwid = fw[w0:w1]
        ns = streams.n_off[w0:w1]
        nwid = nww[w0:w1]
        segs.append(
            Segment(
                n_waves=n,
                cf=cf,
                cn=cn,
                f_a=_pad_rows(streams.f_a, fs, fwid, cf, 0),
                f_b=_pad_rows(streams.f_b, fs, fwid, cf, 0),
                f_c=_pad_rows(streams.f_c, fs, fwid, cf, -1),
                f_bmask=_pad_rows(streams.f_bmask, fs, fwid, cf, 0),
                f_flip=_pad_rows(streams.f_flip, fs, fwid, cf, 0),
                n_a=_pad_rows(streams.n_a, ns, nwid, cn, 0),
                n_b=_pad_rows(streams.n_b, ns, nwid, cn, 0),
                n_c=_pad_rows(streams.n_c, ns, nwid, cn, -1),
                n_gid=_pad_rows(streams.n_gid, ns, nwid, cn, 0),
                n_ct=_pad_rows(streams.n_ct, ns, nwid, cn, ct_count),
                n_aa=_pad_rows(streams.n_aa, ns, nwid, cn, 0),
                n_ab=_pad_rows(streams.n_ab, ns, nwid, cn, 0),
                n_ac=_pad_rows(streams.n_ac, ns, nwid, cn, 0),
                n_tt=_pad_rows(streams.n_tt, ns, nwid, cn, 0),
            )
        )
    return segs


@dataclass
class CompiledTape:
    name: str
    n_inputs: int
    frame_size: int
    total_gates: int  # including dead; the gate-id span
    ct_count: int  # live non-free gates = ciphertext count
    streams: TapeStreams
    # live internal outputs: operand codes to read, aligned with out_positions
    out_ops: np.ndarray  # int32 operand codes
    out_positions: np.ndarray  # int32 positions in template.outputs order
    # operand code per template-output position (-2 = dead/unavailable);
    # aliased const/input outputs resolve through this without a scatter
    out_all_ops: np.ndarray = None
    live_mask: tuple = ()

    @property
    def header_size(self) -> int:
        return N_SPECIAL + self.n_inputs

    _content_key: str = None
    _segments: list = None

    @property
    def segments(self) -> list:
        """Scan-execution form (built lazily, cached)."""
        if self._segments is None:
            object.__setattr__(
                self, "_segments", build_segments(self.streams, self.ct_count)
            )
        return self._segments

    @property
    def n_waves(self) -> int:
        return self.streams.n_waves

    @property
    def content_key(self) -> str:
        """Structural hash: identical tapes share jit compilations even when
        they came from distinct component keys (e.g. the reference keys
        identical inverse chunks by index)."""
        if self._content_key is None:
            import hashlib

            h = hashlib.blake2b(digest_size=16)
            h.update(
                f"{self.n_inputs},{self.frame_size},{self.ct_count},{self.total_gates}".encode()
            )
            st = self.streams
            for arr in (
                st.f_off, st.n_off, st.f_a, st.f_b, st.f_c, st.f_bmask, st.f_flip,
                st.n_a, st.n_b, st.n_c, st.n_gid, st.n_ct,
                st.n_aa, st.n_ab, st.n_ac, st.n_tt,
            ):
                h.update(np.ascontiguousarray(arr).tobytes())
                h.update(b"|")
            h.update(np.ascontiguousarray(self.out_ops).tobytes())
            object.__setattr__(self, "_content_key", h.hexdigest())
        return self._content_key


@dataclass
class SuperStep:
    child: Union["CompiledTape", "SuperProgram"]
    input_ops: np.ndarray  # super-local operand codes per child input
    # absolute parent-frame slots for the child's live internal outputs
    out_slots: np.ndarray  # int32, -1 = discard
    gid_offset: int
    ct_offset: int


@dataclass
class SuperProgram:
    name: str
    n_inputs: int
    frame_size: int
    scratch_size: int  # max over steps of child's (frame + scratch)
    total_gates: int
    ct_count: int
    steps: list[SuperStep]
    out_ops: np.ndarray
    out_positions: np.ndarray
    out_all_ops: np.ndarray = None
    live_mask: tuple = ()

    @property
    def header_size(self) -> int:
        return N_SPECIAL + self.n_inputs

    @property
    def total_frame(self) -> int:
        return self.frame_size + self.scratch_size


def _tape_total_frame(c: Union[CompiledTape, SuperProgram]) -> int:
    if isinstance(c, CompiledTape):
        return c.frame_size
    return c.total_frame


# ----------------------------------------------------------------------
# Flattening
# ----------------------------------------------------------------------


class _FlatBuilder:
    """Accumulates the flattened live-gate arrays of a template subtree."""

    __slots__ = ("gt", "a", "b", "c", "gid", "next_wire", "gid_counter")

    def __init__(self, n_inputs: int):
        self.gt: list[np.ndarray] = []
        self.a: list[np.ndarray] = []
        self.b: list[np.ndarray] = []
        self.c: list[np.ndarray] = []
        self.gid: list[np.ndarray] = []
        self.next_wire = N_SPECIAL + n_inputs
        self.gid_counter = 0


def _call_meta(call: Call):
    """Cached vectorized views of a call's wire bindings."""
    meta = getattr(call, "_meta", None)
    if meta is None:
        inputs_arr = np.asarray(call.inputs, dtype=np.int64)
        pw, cw = [], []
        for pos, parent_w in enumerate(call.outputs):
            child_w = call.template.outputs[pos]
            if parent_w >= N_SPECIAL:
                pw.append(parent_w)
                cw.append(child_w)
        meta = (inputs_arr, np.asarray(pw, dtype=np.int64), np.asarray(cw, dtype=np.int64))
        call._meta = meta
    return meta


def _flatten_into(
    fb: _FlatBuilder,
    template: Template,
    live_out: tuple,
    wire_map: np.ndarray,
    live_cache: dict,
):
    """Inline ``template``; wire_map is an (n_wires,) int64 array mapping
    template-local ids -> flat ids (constants + inputs pre-seeded, -1 =
    unmapped).  Exploits SSA (every wire written once, before any read) to
    process whole gate runs vectorized."""
    ck = (id(template), live_out)
    live = live_cache.get(ck)
    if live is None:
        live = wire_live(template, live_out)
        live_cache[ck] = live

    for item in template.runs:
        if item[0] == "g":
            _, start, end = item
            c = template.gate_c[start:end]
            live_g = live[c]
            n_live = int(live_g.sum())
            if n_live:
                new_ids = fb.next_wire + np.cumsum(live_g) - 1
                wire_map[c[live_g]] = new_ids[live_g]
                fb.next_wire += n_live
                fb.gt.append(template.gate_type[start:end][live_g])
                fb.a.append(wire_map[template.gate_a[start:end][live_g]])
                fb.b.append(wire_map[template.gate_b[start:end][live_g]])
                fb.c.append(wire_map[c[live_g]])
                fb.gid.append(
                    fb.gid_counter + np.nonzero(live_g)[0].astype(np.int64)
                )
            fb.gid_counter += end - start
        else:
            call = template.calls[item[1]]
            child_mask = call_live_mask(call, live)
            inputs_arr, out_pw, out_cw = _call_meta(call)
            child_map = np.full(call.template.n_wires, -1, dtype=np.int64)
            child_map[FALSE_WIRE] = FALSE_WIRE
            child_map[TRUE_WIRE] = TRUE_WIRE
            if len(inputs_arr):
                child_map[N_SPECIAL : N_SPECIAL + len(inputs_arr)] = wire_map[inputs_arr]
            _flatten_into(fb, call.template, child_mask, child_map, live_cache)
            if len(out_pw):
                # dead-in-child outputs stay -1 (reads of them fail loudly)
                wire_map[out_pw] = child_map[out_cw]


def flatten_template(template: Template, live_out: tuple):
    fb = _FlatBuilder(template.n_inputs)
    wire_map = np.full(template.n_wires, -1, dtype=np.int64)
    wire_map[FALSE_WIRE] = FALSE_WIRE
    wire_map[TRUE_WIRE] = TRUE_WIRE
    for i in range(template.n_inputs):
        wire_map[2 + i] = N_SPECIAL + i
    _flatten_into(fb, template, live_out, wire_map, {})
    assert fb.gid_counter == template.total_gates
    out_flat = [int(wire_map[w]) for w in template.outputs]
    return fb, out_flat


# ----------------------------------------------------------------------
# Wave scheduling + slot allocation
# ----------------------------------------------------------------------


def compile_tape(template: Template, live_out: tuple) -> CompiledTape:
    fb, out_flat = flatten_template(template, live_out)
    n_in = template.n_inputs
    header = N_SPECIAL + n_in

    def cat(parts, dtype):
        if not parts:
            return np.zeros(0, dtype=dtype)
        return np.concatenate(parts).astype(dtype, copy=False)

    gt = cat(fb.gt, np.uint8)
    a = cat(fb.a, np.int64)
    b = cat(fb.b, np.int64)
    c = cat(fb.c, np.int64)
    gids = cat(fb.gid, np.uint32)
    n = len(gt)

    # ciphertext positions: rank among live non-free gates in program order
    free_flag = np.isin(gt, (GateType.XOR, GateType.XNOR, GateType.NOT))
    ct_pos = np.where(~free_flag, np.cumsum(~free_flag) - 1, -1).astype(np.int64)
    ct_count = int((~free_flag).sum())

    # ASAP levels (wires indexed flat; header wires = level 0)
    from gsv_tpu import native

    gate_level = native.compute_levels(a, b, c, fb.next_wire)
    if gate_level is None:  # pure-Python fallback
        wire_level = np.zeros(fb.next_wire, dtype=np.int64)
        gate_level = np.zeros(n, dtype=np.int64)
        for i in range(n):
            lv = wire_level[a[i]]
            lb = wire_level[b[i]]
            g = (lv if lv >= lb else lb) + 1
            gate_level[i] = g
            wire_level[c[i]] = g

    # last read level per wire (live template outputs pinned to the end)
    INF = np.iinfo(np.int64).max
    last_read = np.full(fb.next_wire, -1, dtype=np.int64)
    np.maximum.at(last_read, a, gate_level)
    np.maximum.at(last_read, b, gate_level)
    live_out_positions = [
        pos
        for pos, is_live in enumerate(live_out)
        if is_live and out_flat[pos] >= header
    ]
    for pos in live_out_positions:
        last_read[out_flat[pos]] = INF

    # linear-scan slot allocation in wave order
    order = np.argsort(gate_level, kind="stable")
    alloc = native.alloc_slots(order, gate_level, c, last_read, fb.next_wire, INF)
    if alloc is not None:
        slot_of, frame_size = alloc
    else:
        slot_of = np.full(fb.next_wire, -1, dtype=np.int64)
        free_slots: list[int] = []
        frame_size = 0
        expiries: list[tuple[int, int]] = []  # heap of (level, slot)
        prev_level = 0
        for idx in order:
            g = gate_level[idx]
            if g != prev_level:
                while expiries and expiries[0][0] <= g:
                    _, s = heapq.heappop(expiries)
                    heapq.heappush(free_slots, s)
                prev_level = g
            w = c[idx]
            if free_slots:
                s = heapq.heappop(free_slots)
            else:
                s = frame_size
                frame_size += 1
            slot_of[w] = s
            lr = last_read[w]
            if lr == -1:
                lr = g  # write-only wire: reusable at the next level
            if lr != INF:
                heapq.heappush(expiries, (lr + 1, s))

    # operand codes: header wires keep their index; internal wires -> header + slot
    def opcode(w_arr):
        w_arr = np.asarray(w_arr, dtype=np.int64)
        internal = w_arr >= header
        codes = np.where(internal, header + slot_of[np.clip(w_arr, 0, None)], w_arr)
        return codes.astype(np.int32)

    a_op = opcode(a)
    b_op = opcode(b)
    c_slot = slot_of[c].astype(np.int32)
    assert (c_slot >= 0).all()

    # Flat wave-ordered streams: stable level sort preserves program order
    # within each wave; free and non-free gates become two parallel streams
    # with per-wave offset tables (everything vectorized — no per-wave work).
    if n:
        sorted_levels = gate_level[order]
        boundaries = np.nonzero(np.diff(sorted_levels))[0] + 1
        n_waves = len(boundaries) + 1
        fmask_sorted = free_flag[order]
        f_idx = order[fmask_sorted]
        n_idx = order[~fmask_sorted]
        # per-wave counts via boundary positions in each stream
        csum_f = np.concatenate([[0], np.cumsum(fmask_sorted)])
        wave_bounds = np.concatenate([[0], boundaries, [n]])
        f_off = csum_f[wave_bounds].astype(np.int64)
        n_off = (wave_bounds - f_off).astype(np.int64)

        gt_f = gt[f_idx]
        gt_n = gt[n_idx]
        streams = TapeStreams(
            n_waves=n_waves,
            f_off=f_off,
            n_off=n_off,
            f_a=a_op[f_idx],
            f_b=b_op[f_idx],
            f_c=c_slot[f_idx],
            f_bmask=(gt_f != GateType.NOT).astype(np.uint8),
            f_flip=np.isin(gt_f, (GateType.XNOR, GateType.NOT)).astype(np.uint8),
            n_a=a_op[n_idx],
            n_b=b_op[n_idx],
            n_c=c_slot[n_idx],
            n_gid=gids[n_idx],
            n_ct=ct_pos[n_idx].astype(np.int32),
            n_aa=ALPHA_A[gt_n],
            n_ab=ALPHA_B[gt_n],
            n_ac=ALPHA_C[gt_n],
            n_tt=TRUTH_TABLE[gt_n],
        )
    else:
        streams = TapeStreams.empty()

    out_ops = opcode([out_flat[pos] for pos in live_out_positions])
    out_all = np.full(len(template.outputs), -2, dtype=np.int32)
    for pos, w in enumerate(out_flat):
        if w >= 0:
            out_all[pos] = opcode([w])[0]
    return CompiledTape(
        name=template.name,
        n_inputs=n_in,
        frame_size=int(frame_size),
        total_gates=template.total_gates,
        ct_count=ct_count,
        streams=streams,
        out_ops=out_ops,
        out_positions=np.asarray(live_out_positions, dtype=np.int32),
        out_all_ops=out_all,
        live_mask=tuple(live_out),
    )


# ----------------------------------------------------------------------
# Hierarchical compilation
# ----------------------------------------------------------------------


def _has_barrier(template: Template) -> bool:
    """True when the subtree contains a barrier component (never inlined
    into a flat tape — its constant wiring must stay in step headers)."""
    hb = getattr(template, "_hb", None)
    if hb is None:
        hb = getattr(template, "barrier", False) or any(
            _has_barrier(c.template) for c in template.calls
        )
        template._hb = hb
    return hb


class Compiler:
    """Compiles (template, live-mask) specs with memoization.

    ``flatten_max``: subtrees with at most this many total gates become one
    CompiledTape; larger ones become SuperPrograms over their children.
    Subtrees containing barrier components always stay SuperPrograms.
    """

    def __init__(self, flatten_max: int = 1 << 20):
        self.flatten_max = flatten_max
        self._cache: dict = {}

    def compile(self, template: Template, live_out: tuple | None = None):
        if live_out is None:
            live_out = (True,) * len(template.outputs)
        key = (id(template), tuple(live_out))
        got = self._cache.get(key)
        if got is None:
            flat_ok = template.total_gates <= self.flatten_max or not template.calls
            if flat_ok and not (template.calls and _has_barrier(template)):
                got = compile_tape(template, tuple(live_out))
            else:
                got = self._compile_super(template, tuple(live_out))
            self._cache[key] = got
        return got

    def _compile_super(self, template: Template, live_out: tuple) -> SuperProgram:
        live = wire_live(template, live_out)
        header = N_SPECIAL + template.n_inputs

        # Super-local wires get slots via linear scan over the step sequence.
        # First, build the step list with wire references, tracking gid/ct
        # offsets in program order.
        steps_raw = []  # (child_spec, input_wires, out_wire_by_pos, gid_off, ct_off)
        gid_off = 0
        ct_off = 0

        for item in template.runs:
            if item[0] == "g":
                _, start, end = item
                sub, run_inputs, run_outputs = _gate_run_template(template, start, end)
                mask = tuple(bool(live[w]) for w in run_outputs)
                child = self.compile(sub, mask)
                steps_raw.append((child, run_inputs, run_outputs, gid_off, ct_off))
                gid_off += child.total_gates
                ct_off += child.ct_count
            else:
                call = template.calls[item[1]]
                child_mask = call_live_mask(call, live)
                child = self.compile(call.template, child_mask)
                steps_raw.append((child, call.inputs, call.outputs, gid_off, ct_off))
                gid_off += call.template.total_gates
                ct_off += child.ct_count

        assert gid_off == template.total_gates

        # lifetimes of parent-local wires over the step sequence
        n_steps = len(steps_raw)
        last_read_arr = np.full(template.n_wires, -1, dtype=np.int64)
        for si, (child, in_wires, _, _, _) in enumerate(steps_raw):
            iw = np.asarray(in_wires, dtype=np.int64)
            if len(iw):
                last_read_arr[iw] = si
        last_read_arr[:N_SPECIAL] = -1
        last_read = {
            int(w): int(last_read_arr[w]) for w in np.nonzero(last_read_arr >= 0)[0]
        }
        INF = 1 << 60
        first_internal = N_SPECIAL + template.n_inputs
        for pos, is_live in enumerate(live_out):
            w = template.outputs[pos]
            if is_live and w >= first_internal:
                last_read[w] = INF

        # linear scan: assign slots to wires written by steps
        slot_of = np.full(template.n_wires, -1, dtype=np.int64)
        free_slots: list[int] = []
        expir: list[tuple[int, int]] = []
        frame_size = 0
        steps: list[SuperStep] = []
        scratch = 0

        def op_of(w: int) -> int:
            if w < header:
                return w
            s_ = int(slot_of[w])
            assert s_ >= 0, f"read of unwritten wire {w}"
            return header + s_

        def ops_of(ws) -> np.ndarray:
            ws = np.asarray(ws, dtype=np.int64)
            slots = slot_of[ws]
            assert (slots[ws >= header] >= 0).all(), "read of unwritten wire"
            return np.where(ws < header, ws, header + slots).astype(np.int32)

        for si, (child, in_wires, out_by_pos, g_off, c_off) in enumerate(steps_raw):
            while expir and expir[0][0] <= si:
                _, s = heapq.heappop(expir)
                heapq.heappush(free_slots, s)
            input_ops = ops_of(in_wires)
            out_slots = []
            for pos in child.out_positions:
                w = out_by_pos[int(pos)]
                if w < N_SPECIAL or not live[w]:
                    out_slots.append(-1)
                    continue
                if slot_of[w] >= 0:  # duplicated output position (same parent wire)
                    out_slots.append(int(slot_of[w]))
                    continue
                if free_slots:
                    s = heapq.heappop(free_slots)
                else:
                    s = frame_size
                    frame_size += 1
                slot_of[w] = s
                lr = last_read.get(w, si)
                if lr != INF:
                    heapq.heappush(expir, (lr + 1, s))
                out_slots.append(s)
            steps.append(
                SuperStep(
                    child=child,
                    input_ops=input_ops,
                    out_slots=np.asarray(out_slots, dtype=np.int32),
                    gid_offset=g_off,
                    ct_offset=c_off,
                )
            )
            scratch = max(scratch, _tape_total_frame(child))

        first_internal = N_SPECIAL + template.n_inputs
        live_positions = [
            pos
            for pos, is_live in enumerate(live_out)
            if is_live and template.outputs[pos] >= first_internal
        ]
        out_ops = np.asarray(
            [op_of(template.outputs[pos]) for pos in live_positions], dtype=np.int32
        )
        out_all = np.full(len(template.outputs), -2, dtype=np.int32)
        for pos, w in enumerate(template.outputs):
            if w < first_internal:
                out_all[pos] = w  # const or input code
            elif slot_of[w] >= 0:
                out_all[pos] = header + int(slot_of[w])
        return SuperProgram(
            name=template.name,
            n_inputs=template.n_inputs,
            frame_size=frame_size,
            scratch_size=scratch,
            total_gates=template.total_gates,
            ct_count=ct_off,
            steps=steps,
            out_ops=out_ops,
            out_positions=np.asarray(live_positions, dtype=np.int32),
            out_all_ops=out_all,
            live_mask=tuple(live_out),
        )


def _gate_run_template(template: Template, start: int, end: int):
    """Wrap a run of parent gates [start, end) as a synthetic leaf template.

    Returns (sub_template, run_inputs, run_outputs) where run_inputs/outputs
    are *parent-local* wire ids: inputs = wires read before being written
    inside the run; outputs = every wire written by the run (the parent's
    liveness decides which of those are live).

    The tracer always issues a fresh wire per gate output, so each c in the
    run is unique.
    """
    gt = template.gate_type[start:end]
    a = template.gate_a[start:end]
    b = template.gate_b[start:end]
    c = template.gate_c[start:end]
    n = len(gt)
    written: set[int] = set()
    inputs: list[int] = []
    seen_in: set[int] = set()
    for i in range(n):
        for w in (int(a[i]), int(b[i])):
            if w >= N_SPECIAL and w not in written and w not in seen_in:
                seen_in.add(w)
                inputs.append(w)
        written.add(int(c[i]))
    outputs = [int(w) for w in c]  # fresh + unique, program order

    remap = {FALSE_WIRE: FALSE_WIRE, TRUE_WIRE: TRUE_WIRE}
    for j, w in enumerate(inputs):
        remap[w] = N_SPECIAL + j
    next_id = N_SPECIAL + len(inputs)
    new_a = np.empty(n, dtype=np.int64)
    new_b = np.empty(n, dtype=np.int64)
    new_c = np.empty(n, dtype=np.int64)
    for i in range(n):
        new_a[i] = remap[int(a[i])]
        new_b[i] = remap[int(b[i])]
        w = int(c[i])
        remap[w] = next_id
        next_id += 1
        new_c[i] = remap[w]

    sub = Template(
        key=None,
        name=f"{template.name}#run{start}",
        n_inputs=len(inputs),
        gate_type=gt.copy(),
        gate_a=new_a,
        gate_b=new_b,
        gate_c=new_c,
        runs=[("g", 0, n)],
        calls=[],
        outputs=[remap[w] for w in outputs],
        out_treedef=None,
        n_wires=next_id,
    )
    sub.own_gates = n
    sub.total_gates = n
    hist = np.zeros(11, dtype=np.uint64)
    if n:
        np.add.at(hist, gt, 1)
    sub.hist = hist
    return sub, inputs, outputs

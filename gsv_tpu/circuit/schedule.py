"""Grouped execution scheduler: turn a sequential Plan into a GroupPlan.

The sequential plan dispatches one device program per TapeStep (~178k for
the Groth16 verifier) and its per-tape wave loops run back-to-back, so both
host dispatch count and the device's sequential wave count scale with step
count.  This pass exploits the circuit's step-level parallelism:

1. build the true dataflow DAG over steps (slot last-writer relation — slots
   are SSA between writes, so this is exact, not conservative);
2. greedy ready-max list scheduling: repeatedly emit ALL currently-ready
   steps that share one tape content as a single **GroupStep** (one device
   dispatch running S sites of the same tape side by side — the wave loop
   runs once, its lanes widened S-fold);
3. rename every value — identified by (producer step, slot) — to a fresh
   arena slot (free-list allocation, freed at its last scheduled read) so
   reordered/concurrent steps never collide: the sequential plan's
   scratch-frame and slot reuse (link.py) assumed program order;
4. stack per-site header/output maps, frame bases, gate-id bases and
   ciphertext bases into per-group arrays; sites get disjoint scratch
   frames in a reused scratch region at the top of the arena.

For the 10.7B-gate verifier this cuts ~178k dispatches to ~35-37k and 207M
sequential waves to ~37-42M (scripts/sim_greedy.py), putting the
dispatch-and-latency floor (~0.5us/wave, ~0.34ms/dispatch measured) well
below the AES-compute time — the pass wall is then the padded AES-block
census divided by the hasher rate (docs/perf-model.md).

Group sizes are padded up to a bucket grid so group programs are shared
across groups (the executor keys compilations on shapes only); padded
sites read the trash slot and scatter to trash.  Per-site gate-id bases
and ciphertext stream offsets are the ORIGINAL sequential ones, so AES
tweaks and the reassembled ciphertext stream are bit-identical to the
sequential executor's.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

import numpy as np

import os

from gsv_tpu.circuit.link import CopyStep, Plan, TapeStep, TRASH
from gsv_tpu.circuit.tape import SEG_V3

# Group-size buckets: coarse to keep the compiled-program count tiny; padded
# sites are nearly free because narrow tapes are latency-bound per wave.
# GSV_S_GRID=fine (opt-in; changes program shapes => needs its own compile
# fill) trades ~54 extra programs for site-padding utilization 78%->93% on
# the full verifier (measured round 2).
_S_GRID = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
if __import__("os").environ.get("GSV_S_GRID") == "fine":
    _S_GRID = tuple(sorted({
        1, 2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32, 40, 48, 64, 80, 96,
        128, 160, 192, 256, 320, 384, 512, 640, 768, 1024,
    }))


def _pick_bucket(n: int, grid) -> int:
    for b in grid:
        if n <= b:
            return b
    return n


# ----------------------------------------------------------------------
# Exact site chunking (on by default under SEG_V3; GSV_EXACT_SITES=0/1
# overrides).  Site-bucket rounding costs 2.02B of the seg-v2 plan's 8.49B
# AES lanes (scripts/census_breakdown.py, r4).  Any n_real decomposes
# exactly into grid buckets (binary decomposition on the coarse grid), so
# instead of padding the tail of a ready batch up to a bucket we can split
# it into further chunks — trading padded-lane AES work for one extra
# dispatch plus a replay of the tape's wave loop per extra chunk.  The
# trade is resolved by an explicit cost model in AES-block units
# (per instance, calibrated for B=32 / ~1 B blocks/s, r4 probes:
# 0.34 ms pipelined dispatch ≈ 10.6k blocks; 0.55 us wave iteration ≈ 17).
# No new program shapes are created: every chunk lands on an existing
# grid bucket.
# ----------------------------------------------------------------------

_EXACT_SITES = os.environ.get("GSV_EXACT_SITES", "1" if SEG_V3 else "0") == "1"
_SPLIT_DISPATCH_COST = float(os.environ.get("GSV_SPLIT_DISPATCH_COST", 10600.0))
_SPLIT_WAVE_COST = float(os.environ.get("GSV_SPLIT_WAVE_COST", 17.0))


def _site_cost_blocks(tape) -> int:
    """AES blocks (per instance) one padded site costs: 2 hash blocks per
    class lane plus 1 digest row per ciphertext."""
    lanes = sum(sv.cn * sv.n_waves for sv in tape.segments)
    return 2 * lanes + tape.ct_count


def _chunk_sizes(n: int, cap: int, grid, tape, cost_cache: dict) -> list:
    """Chunk lengths (real sites) for a ready batch of n sites.

    Greedy largest-bucket-first; at each tail, padding up to the next
    bucket is compared against the cost of one more chunk."""
    if not _EXACT_SITES:
        return [cap] * (n // cap) + ([n % cap] if n % cap else [])
    ck = tape.content_key
    costs = cost_cache.get(ck)
    if costs is None:
        extra = _SPLIT_DISPATCH_COST + tape.streams.n_waves * _SPLIT_WAVE_COST
        costs = (_site_cost_blocks(tape), extra)
        cost_cache[ck] = costs
    site_cost, extra_chunk = costs
    sizes = []
    rem = n
    while rem > cap:
        sizes.append(cap)
        rem -= cap
    while rem:
        b_up = _pick_bucket(rem, grid)
        if b_up == rem:
            sizes.append(rem)
            break
        if (b_up - rem) * site_cost <= extra_chunk:
            sizes.append(rem)  # pad: the group constructor buckets it up
            break
        b_dn = _cap_to_bucket(rem, grid)
        sizes.append(b_dn)
        rem -= b_dn
    return sizes


def _cap_to_bucket(cap: int, grid) -> int:
    """Largest grid bucket <= cap (chunking by this keeps padded sizes
    within budget; _pick_bucket can only round up to it)."""
    b = 1
    for g in grid:
        if g <= cap:
            b = g
    return b


@dataclass
class GroupStep:
    """S sites of one tape executed as a single device dispatch."""

    tape: object  # CompiledTape (same content for every site)
    header_maps: np.ndarray  # (S, H) int32 absolute arena indices
    outputs_maps: np.ndarray  # (S, O) int32 (TRASH rows for pad sites)
    frame_bases: np.ndarray  # (S,) int32 disjoint scratch frames
    gid_bases: np.ndarray  # (S,) int64 original gate-id bases (AES tweaks)
    ct_bases: np.ndarray  # (S,) int64 original ciphertext stream offsets
    n_real: int  # real sites (<= S; the rest are padding)


@dataclass
class GroupPlan:
    steps: list  # GroupStep | CopyStep
    arena_size: int
    n_inputs: int
    input_abs: np.ndarray
    output_abs: np.ndarray
    output_positions: np.ndarray
    total_gates: int
    ct_count: int
    scratch_base: int
    n_dispatches: int
    seq_waves: int


def scatter_group_cts(g: "GroupStep", cts: np.ndarray, ctb: int, out: np.ndarray):
    """Reassemble a group's device ciphertext buffer into the global stream.

    ``cts``: (..., S*ctb+1, 4) buffer from the group executor; site s's real
    rows are ``[s*ctb, s*ctb + ct)`` and belong at stream offset
    ``g.ct_bases[s]``.  Writes into ``out`` (..., total_cts, 4).
    """
    ct = g.tape.ct_count
    for s in range(g.n_real):
        base = int(g.ct_bases[s])
        out[..., base : base + ct, :] = cts[..., s * ctb : s * ctb + ct, :]


def schedule_plan(
    plan: Plan,
    scratch_budget: int = 2_000_000,
    s_grid: tuple = _S_GRID,
    ct_budget_rows: int = 2_000_000,
) -> GroupPlan:
    """Greedy ready-max grouping + value renaming over a linked Plan."""
    steps = plan.steps
    n = len(steps)
    A = plan.arena_size

    def step_io(s):
        if isinstance(s, TapeStep):
            return (
                np.asarray(s.header_map, dtype=np.int64),
                np.asarray(s.outputs_map, dtype=np.int64),
            )
        return np.asarray(s.src, dtype=np.int64), np.asarray(s.dst, dtype=np.int64)

    # ---- 1. dataflow: per-read producer step, reader refcounts ---------
    writer = np.full(A, -1, dtype=np.int64)
    producer_of_read: list = [None] * n
    preds: list = [None] * n
    refcount: dict = {}  # (prod*A + slot) -> number of reader STEPS
    for i, s in enumerate(steps):
        ins, outs = step_io(s)
        prod = writer[ins]
        producer_of_read[i] = prod
        keys = prod * A + ins
        live = keys[prod >= 0]
        for k in np.unique(live).tolist():
            refcount[k] = refcount.get(k, 0) + 1
        preds[i] = np.unique(prod[prod >= 0])
        w = outs[outs != TRASH]
        writer[w] = i

    # plan outputs pin their final-producer values forever
    pinned = set()
    for sl in np.asarray(plan.output_abs).tolist():
        if sl >= 0 and writer[sl] >= 0:
            pinned.add(int(writer[sl]) * A + int(sl))

    # ---- 2. greedy ready-max list scheduling ---------------------------
    succs: list = [[] for _ in range(n)]
    indeg = np.zeros(n, dtype=np.int64)
    for i in range(n):
        indeg[i] = len(preds[i])
        for j in preds[i].tolist():
            succs[j].append(i)

    def content_of(i):
        s = steps[i]
        return s.tape.content_key if isinstance(s, TapeStep) else "__copy__"

    ready: dict = defaultdict(list)
    for i in range(n):
        if indeg[i] == 0:
            ready[content_of(i)].append(i)

    order_groups: list = []
    done = 0
    split_costs: dict = {}
    while done < n:
        best = max(ready.items(), key=lambda kv: len(kv[1]))[0]
        batch = ready.pop(best)
        if best != "__copy__":
            tape0 = steps[batch[0]].tape
            # budget both scratch slots and the garble ciphertext buffer
            # (S * ct_count rows per dispatch — device-memory bound at
            # batch>=32); clamp to a grid bucket so padding can't exceed it
            cap = max(1, scratch_budget // max(tape0.frame_size, 1))
            cap = min(cap, max(1, ct_budget_rows // max(tape0.ct_count, 1)))
            cap = _cap_to_bucket(cap, s_grid)
            sizes = _chunk_sizes(len(batch), cap, s_grid, tape0, split_costs)
        else:
            sizes = [len(batch)]
        k = 0
        for sz in sizes:
            order_groups.append((best, batch[k : k + sz]))
            k += sz
        done += len(batch)
        for i in batch:
            for j in succs[i]:
                indeg[j] -= 1
                if indeg[j] == 0:
                    ready[content_of(j)].append(j)

    # ---- 3. value renaming + slot allocation ---------------------------
    n_reserved = 3 + plan.n_inputs
    name_of: dict = {}  # value key (prod*A + slot) -> renamed slot
    free_slots: list = []
    # Slots freed DURING a group must not be reallocated within the same
    # group: concurrent sites would share a physical slot (scatter order
    # between sites is undefined).  Frees are deferred to group end.
    deferred_free: list = []
    next_slot = n_reserved

    def alloc() -> int:
        nonlocal next_slot
        if free_slots:
            return free_slots.pop()
        s_ = next_slot
        next_slot += 1
        return s_

    def rename_reads(read_slots, producers) -> np.ndarray:
        out = np.empty(len(read_slots), dtype=np.int32)
        for q, (sl, p_) in enumerate(
            zip(np.asarray(read_slots).tolist(), producers.tolist())
        ):
            if p_ < 0:
                out[q] = sl if sl < n_reserved else TRASH
            else:
                out[q] = name_of[p_ * A + sl]
        return out

    def write_outputs(i: int, out_slots) -> np.ndarray:
        res = np.empty(len(out_slots), dtype=np.int32)
        for q, sl in enumerate(np.asarray(out_slots).tolist()):
            if sl == TRASH:
                res[q] = TRASH
                continue
            key = i * A + sl
            ns = name_of.get(key)
            if ns is None:
                ns = alloc()
                name_of[key] = ns
                if key not in pinned and key not in refcount:
                    deferred_free.append(ns)  # written, never read
            res[q] = ns
        return res

    def consume_reads(read_slots, producers):
        keys = producers * A + np.asarray(read_slots, dtype=np.int64)
        for k in np.unique(keys[producers >= 0]).tolist():
            if k in pinned:
                continue
            rc = refcount.get(k)
            if rc is None:
                continue
            if rc <= 1:
                del refcount[k]
                deferred_free.append(name_of[k])
            else:
                refcount[k] = rc - 1

    out_steps: list = []
    n_dispatches = 0
    seq_waves = 0
    max_scratch = 0

    for content, batch in order_groups:
        if content == "__copy__":
            srcs, dsts = [], []
            for i in batch:
                st = steps[i]
                prod = producer_of_read[i]
                srcs.append(rename_reads(st.src, prod))
                dsts.append(write_outputs(i, st.dst))
                consume_reads(st.src, prod)
            src = np.concatenate(srcs)
            dst = np.concatenate(dsts)
            keep = dst != TRASH
            out_steps.append(CopyStep(src=src[keep], dst=dst[keep]))
            n_dispatches += 1
            seq_waves += 1
            free_slots.extend(deferred_free)
            deferred_free.clear()
            continue

        tape = steps[batch[0]].tape
        S_real = len(batch)
        S = _pick_bucket(S_real, s_grid)
        H = len(steps[batch[0]].header_map)
        O = len(steps[batch[0]].outputs_map)
        hms = np.full((S, H), TRASH, dtype=np.int32)
        oms = np.full((S, O), TRASH, dtype=np.int32)
        gids = np.zeros(S, dtype=np.int64)
        cbs = np.zeros(S, dtype=np.int64)
        for k, i in enumerate(batch):
            st = steps[i]
            prod = producer_of_read[i]
            hms[k] = rename_reads(st.header_map, prod)
            oms[k] = write_outputs(i, st.outputs_map)
            gids[k] = st.gid_base
            cbs[k] = st.ct_base
            consume_reads(st.header_map, prod)
        out_steps.append(
            GroupStep(
                tape=tape,
                header_maps=hms,
                outputs_maps=oms,
                frame_bases=np.zeros(S, dtype=np.int32),
                gid_bases=gids,
                ct_bases=cbs,
                n_real=S_real,
            )
        )
        n_dispatches += 1
        seq_waves += tape.streams.n_waves
        max_scratch = max(max_scratch, S * tape.frame_size)
        free_slots.extend(deferred_free)
        deferred_free.clear()

    # ---- 4. scratch frames above the value region -----------------------
    scratch_base = next_slot
    for g in out_steps:
        if isinstance(g, GroupStep):
            S = len(g.frame_bases)
            g.frame_bases[:] = (
                scratch_base + np.arange(S, dtype=np.int64) * g.tape.frame_size
            )
    arena_size = scratch_base + max_scratch

    # plan outputs -> renamed slots
    out_abs = []
    for sl in np.asarray(plan.output_abs).tolist():
        if sl < 0:
            out_abs.append(-1)
        elif sl < n_reserved or writer[sl] < 0:
            out_abs.append(sl)
        else:
            out_abs.append(name_of[int(writer[sl]) * A + int(sl)])
    output_abs = np.asarray(out_abs, dtype=np.int64)

    return GroupPlan(
        steps=out_steps,
        arena_size=int(arena_size),
        n_inputs=plan.n_inputs,
        input_abs=plan.input_abs,
        output_abs=output_abs,
        output_positions=plan.output_positions,
        total_gates=plan.total_gates,
        ct_count=plan.ct_count,
        scratch_base=int(scratch_base),
        n_dispatches=n_dispatches,
        seq_waves=int(seq_waves),
    )

"""Build the grouped full-verifier plan (uniform-constant fast path).

trace (uniform_constants=True) -> compile -> link -> schedule_plan ->
pickle, and print the redesign's key numbers: dispatches, sequential waves,
arena size, distinct (signature, S) programs to compile, device-resident
content bytes.

Usage: python scripts/build_gplan.py [k] [flatten_max] [out.pkl] [--compressed]
"""

import os
import pickle
import sys
import time
from collections import Counter

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gsv_tpu.bn254_host.groth16 import dummy_proof
    from gsv_tpu.circuit.runtime import padded_seg_args_group, tape_signature
    from gsv_tpu.circuit.schedule import GroupStep, schedule_plan
    from gsv_tpu.models.groth16_verifier import Groth16VerifierModel

    compressed = "--compressed" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(args[0]) if args else 6
    flatten_max = int(args[1]) if len(args) > 1 else (1 << 20)
    tag = "compressed_" if compressed else ""
    out = args[2] if len(args) > 2 else f".gplan_k{k}_{tag}uniform_{flatten_max}.pkl"

    t0 = time.time()
    vk, proof, publics = dummy_proof(k=k, seed=0)
    model = Groth16VerifierModel(
        vk=vk,
        n_public=len(publics),
        compressed=compressed,
        flatten_max=flatten_max,
        uniform_constants=True,
    )
    plan = model.runner.plan
    gc = model.runner.gate_count
    print(f"plan ready in {time.time()-t0:.0f}s: steps={len(plan.steps)} "
          f"gates={gc.total:,} nonfree={gc.nonfree:,} arena={plan.arena_size}",
          flush=True)

    t0 = time.time()
    gplan = schedule_plan(plan)
    print(f"scheduled in {time.time()-t0:.0f}s: dispatches={gplan.n_dispatches} "
          f"seq_waves={gplan.seq_waves:,} arena={gplan.arena_size:,} "
          f"(scratch_base={gplan.scratch_base:,})", flush=True)

    # program set: (tape signature, S bucket)
    progs = Counter()
    content_bytes = 0
    seen = set()
    for g in gplan.steps:
        if not isinstance(g, GroupStep):
            continue
        S = g.header_maps.shape[0]
        sig = (tape_signature(g.tape), S)
        progs[sig] += 1
        ck = g.tape.content_key
        if ck not in seen:
            seen.add(ck)
            segs, _, _ = padded_seg_args_group(g.tape)
            content_bytes += sum(sum(a.nbytes for a in d.values()) for d in segs)
    # per-group map bytes
    map_bytes = sum(
        g.header_maps.nbytes + g.outputs_maps.nbytes
        for g in gplan.steps
        if isinstance(g, GroupStep)
    )
    print(f"programs to compile: {len(progs)}; distinct contents={len(seen)} "
          f"content={content_bytes/1e9:.2f} GB; maps={map_bytes/1e9:.2f} GB",
          flush=True)
    for (sig, S), cnt in progs.most_common(20):
        print(f"   S={S:5d} uses={cnt:6d} sig[:60]={str(sig)[:60]}", flush=True)

    t0 = time.time()
    with open(out + ".tmp", "wb") as fh:
        pickle.dump(gplan, fh, protocol=5)
    os.replace(out + ".tmp", out)
    print(f"pickled to {out} in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()

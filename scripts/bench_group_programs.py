"""Per-program timing over a grouped plan on the real chip.

For each distinct (tape signature, S) group program: run it a few times on
dummy data and report ms/dispatch, then aggregate Σ(uses × t) per program
to predict a full-pass wall time and rank the optimization targets
(wide-wave AES vs narrow-wave loop latency vs dispatch overhead).

Usage: python scripts/bench_group_programs.py [B] [gplan.pkl] [reps]
Requires a warm cache (garble_nocts variant).
"""

import pickle
import sys
import time
from collections import Counter

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    from gsv_tpu.core.jitcache import enable_if_tpu

    enable_if_tpu()

    from gsv_tpu.circuit.runtime import (
        _generic_group_jit,
        padded_seg_args_group,
        tape_signature,
    )
    from gsv_tpu.circuit.schedule import GroupStep

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    path = sys.argv[2] if len(sys.argv) > 2 else ".gplan_k6_uniform_1048576.pkl"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    with open(path, "rb") as fh:
        gplan = pickle.load(fh)

    progs = {}
    uses = Counter()
    gates = Counter()
    for g in gplan.steps:
        if isinstance(g, GroupStep):
            key = (tape_signature(g.tape), g.header_maps.shape[0])
            progs.setdefault(key, g)
            uses[key] += 1
            gates[key] += g.tape.total_gates * g.n_real

    jfn = _generic_group_jit("garble", "aes", B if B > 1 else None, True,
                             emit_cts=False)
    arena = np.zeros((B, gplan.arena_size, 4), np.uint32)
    delta = np.zeros((B, 4), np.uint32)
    digest = np.zeros((B, 4), np.uint32)
    import jax.numpy as jnp

    arena_d = jnp.asarray(arena)
    digest_d = jnp.asarray(digest)
    delta_d = jnp.asarray(delta)

    rows = []
    for n, (key, g) in enumerate(progs.items(), 1):
        segs_np, oo_np, meta = padded_seg_args_group(g.tape)
        Hb, ctb, ob = meta["Hb"], meta["ctb"], meta["ob"]
        S = g.header_maps.shape[0]
        hm = np.full((S, Hb), 2, np.int32)
        hm[:, : g.header_maps.shape[1]] = g.header_maps
        om = np.full((S, max(ob, 1)), 2, np.int32)
        if g.outputs_maps.shape[1]:
            om[:, : g.outputs_maps.shape[1]] = g.outputs_maps
        fb = jnp.asarray(g.frame_bases.astype(np.int32))
        ghi = jnp.asarray((g.gid_bases >> 32).astype(np.uint32))
        glo = jnp.asarray((g.gid_bases & 0xFFFFFFFF).astype(np.uint32))
        ct_loc = jnp.asarray(
            (np.arange(S, dtype=np.int64) * ctb).astype(np.int32)
        )
        token = jnp.zeros((S * ctb + 1, 0), jnp.uint32)
        segs = [{f: jnp.asarray(v) for f, v in d.items()} for d in segs_np]
        oo = jnp.asarray(oo_np)
        hm_d, om_d = jnp.asarray(hm), jnp.asarray(om)
        # warm (compile-cache hit + upload)
        a, d2 = jfn(arena_d, token, hm_d, om_d, oo, fb, delta_d, ghi, glo,
                    ct_loc, digest_d, jnp.uint32(0), segs)
        jax.block_until_ready(d2)
        arena_d, digest_d = a, d2
        t0 = time.perf_counter()
        for _ in range(reps):
            arena_d, digest_d = jfn(
                arena_d, token, hm_d, om_d, oo, fb, delta_d, ghi, glo,
                ct_loc, digest_d, jnp.uint32(0), segs,
            )
        jax.block_until_ready(digest_d)
        dt = (time.perf_counter() - t0) / reps
        waves = sum(np.asarray(d["n_a"]).shape[0] for d in segs_np)
        lanes = sum(np.asarray(d["n_a"]).size for d in segs_np)
        rows.append((key, dt, uses[key], gates[key], S, waves, lanes))
        print(
            f"{n}/{len(progs)}: {dt*1e3:8.2f} ms  uses={uses[key]:6d} "
            f"S={S:5d} waves={waves:6d} nlanes={lanes:9d} "
            f"total={dt*uses[key]:7.2f}s",
            flush=True,
        )

    total = sum(dt * u for _, dt, u, _, _, _, _ in rows)
    tg = sum(gates.values())
    print(f"\npredicted pass: {total:.1f}s -> "
          f"{tg * max(B,1) / total / 1e6:.0f} Mgates/s at B={B}")
    print("top programs by aggregate time:")
    for key, dt, u, gt, S, waves, lanes in sorted(
        rows, key=lambda r: -r[1] * r[2]
    )[:12]:
        print(f"  {dt*u:7.2f}s  ms={dt*1e3:8.2f} uses={u:6d} S={S:5d} "
              f"waves={waves:6d} nlanes={lanes:9d} gates={gt/1e6:8.1f}M")


if __name__ == "__main__":
    main()

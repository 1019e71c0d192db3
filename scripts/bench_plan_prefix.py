"""Diagnose WHERE full-plan garble time goes: run the grouped plan with a
device sync every K dispatches and print per-segment wall / gates / rate.

The full bench (examples/bench_groth16_garble_group.py) enqueues all 34,760
dispatches asynchronously, so its progress lines measure ENQUEUE, and the
terminal block_until_ready hides the device-time distribution.  This script
checkpoints (blocks on the digest) every --sync dispatches: segment wall
clock then equals device time for that segment (plus one sync RTT), which
separates per-dispatch overhead (narrow tail) from AES compute (wide
groups).

Usage: python scripts/bench_plan_prefix.py [B] [gplan.pkl] [--sync 500]
       [--max-steps N]
"""

import pickle
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a.split("=")[0].lstrip("-"): a.split("=", 1)[1] if "=" in a else True
             for a in sys.argv[1:] if a.startswith("--")}
    B = int(args[0]) if args else 32
    path = args[1] if len(args) > 1 else ".gplan_k6_uniform_1048576.pkl"
    sync_every = int(flags.get("sync", 500))
    max_steps = int(flags.get("max-steps", 0)) or None

    import jax

    from gsv_tpu.core.jitcache import enable_if_tpu

    enable_if_tpu()

    from gsv_tpu.circuit.runtime import GroupExecutor, _generic_group_jit
    from gsv_tpu.circuit.link import CopyStep
    from gsv_tpu.circuit.schedule import GroupStep
    from gsv_tpu.core.labels import words_from_int, words_from_int_array
    from gsv_tpu.core.rng import GarblerRng

    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    with open(path, "rb") as fh:
        gplan = pickle.load(fh)
    steps = gplan.steps[:max_steps] if max_steps else gplan.steps
    print(f"gplan loaded in {time.time()-t0:.0f}s; driving {len(steps)} / "
          f"{len(gplan.steps)} dispatches at B={B}, sync every {sync_every}",
          flush=True)

    batch = B if B > 1 else None
    ex = GroupExecutor(gplan, batch=batch)
    rngs = [GarblerRng(1 + i) for i in range(max(B, 1))]
    in_l0 = np.stack(
        [words_from_int_array([r.issue_label0() for r in rngs])
         for _ in range(gplan.n_inputs)], axis=1)
    delta = words_from_int_array([r.delta for r in rngs])
    f0 = words_from_int_array([r.false_label0 for r in rngs])
    t0s = words_from_int_array([r.true_label0 for r in rngs])
    if batch is None:
        in_l0, delta, f0, t0s = in_l0[0], delta[0], f0[0], t0s[0]

    import jax.numpy as jnp
    import os

    shape = (batch, gplan.arena_size, 4) if batch else (gplan.arena_size, 4)
    arena = np.zeros(shape, dtype=np.uint32)
    arena[..., 0, :] = f0
    arena[..., 1, :] = t0s
    arena[..., gplan.input_abs, :] = in_l0
    arena = jnp.asarray(arena)
    delta = jnp.asarray(np.asarray(delta, np.uint32))
    digest = jnp.zeros((batch, 4) if batch else (4,), jnp.uint32)
    print("packed segs:", ex.packed, flush=True)

    def segment_pass(tag):
        nonlocal arena, digest
        seg_t = time.time()
        seg_gates = 0
        seg_disp = 0
        for gi, g in enumerate(steps):
            if isinstance(g, GroupStep):
                fn, oo, meta, tail = ex._dispatch("garble", True, False, g.tape, g.header_maps.shape[0])
                hm, om, fb, ghi, glo, ct_loc, token, gid = ex._group_dev(g, gi)
                arena, digest = fn(arena, token, hm, om, oo, fb, delta,
                                   ghi, glo, ct_loc, digest, gid, *tail)
                seg_gates += g.tape.total_gates * g.n_real
            else:
                src, dst = ex._copy_dev(g)
                arena = ex._copy_fn("execute")(arena, src, dst)
            seg_disp += 1
            if seg_disp % sync_every == 0 or gi == len(steps) - 1:
                # block_until_ready through the axon tunnel can acknowledge
                # BEFORE remote completion; a D2H value fetch is the only
                # honest sync (measured 04:58 r3: 16-byte fetch waited 189s
                # after ready returned)
                np.asarray(digest)
                dt = time.time() - seg_t
                print(f"[{tag}] disp {gi+1:6d}  seg {seg_disp:5d} in "
                      f"{dt:7.2f}s = {dt*1000/seg_disp:6.1f} ms/disp, "
                      f"{seg_gates/max(dt,1e-9)/1e6:8.1f} Mgates/s "
                      f"({seg_gates/1e6:.0f}M gates)", flush=True)
                seg_t = time.time()
                seg_gates = 0
                seg_disp = 0

    segment_pass("warm")
    print("=== timed pass (everything resident) ===", flush=True)
    segment_pass("timed")


if __name__ == "__main__":
    main()

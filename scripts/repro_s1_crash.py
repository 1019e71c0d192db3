"""Isolate the S=1 wm-residual TPU worker crash (r5).

All three residual-fill crashes were S=1/n_real=1 groups (gi 5579, 517,
569 under the v3 plan); this runs exactly one such program on the chip.

Usage: python scripts/repro_s1_crash.py [gi] [variant]
  variant: pallas (default, as-production) | xla (force the XLA bitsliced
  AES path by raising the Pallas min-blocks floor) — if pallas crashes and
  xla survives, the wm Pallas AES kernel is the faulter.  | pad — the
  S=2-padded dispatch (mega.group_dev_s1pad); survives where pallas dies.
  Pass cpu as a 4th arg to run on XLA:CPU (bit-exactness oracle: the
  unpadded S=1 program works there, so pallas-vs-pad digests must match).
"""

import os
import pickle
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    gi_want = int(sys.argv[1]) if len(sys.argv) > 1 else 5579
    variant = sys.argv[2] if len(sys.argv) > 2 else "pallas"

    from gsv_tpu.core.jitcache import enable_if_tpu

    if "cpu" in sys.argv[4:]:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        enable_if_tpu()
        import jax
    import jax.numpy as jnp
    import numpy as np

    jax.devices()

    from gsv_tpu.circuit import runtime as rt

    if variant == "xla":
        rt._PALLAS_MIN_BLOCKS = 1 << 30  # every wave takes the XLA path

    from gsv_tpu.circuit.runtime import GroupExecutor, _generic_group_jit_wm
    from gsv_tpu.circuit.schedule import GroupStep

    with open(".gplan_k6_uniform_1048576_v3.pkl", "rb") as fh:
        gplan = pickle.load(fh)
    g = gplan.steps[gi_want]
    assert isinstance(g, GroupStep)
    print(f"gi={gi_want} S={g.header_maps.shape[0]} n_real={g.n_real} "
          f"gates={g.tape.total_gates} cts={g.tape.ct_count}", flush=True)
    for i, sv in enumerate(g.tape._segments or ()):
        shp = {k: tuple(getattr(sv, k).shape) for k in vars(sv)
               if hasattr(getattr(sv, k), "shape")}
        print(f"  seg{i}: {shp}", flush=True)

    B = 32
    ex = GroupExecutor(gplan, batch=B, hasher="aes_wm")
    A = ex.arena_size
    # deterministic nonzero contents so pallas-vs-pad digests are a real
    # bit-exactness check, not a zeros fixed point
    rs = np.random.RandomState(7)
    arena = jnp.asarray(rs.randint(0, 2**32, (4 * B, A), np.uint64)
                        .astype(np.uint32))
    delta = jnp.asarray(rs.randint(0, 2**32, (4 * B,), np.uint64)
                        .astype(np.uint32) | 1)
    digest = jnp.zeros((4 * B,), jnp.uint32)
    fnr = _generic_group_jit_wm(B)
    segs, oo, meta = ex._seg_dev(g.tape)
    if len(sys.argv) > 3 and ":" in sys.argv[3]:  # "0:5" — seg slice only
        lo, hi = (int(x) for x in sys.argv[3].split(":"))
        segs = segs[lo:hi]
        print(f"running segs[{lo}:{hi}] of {len(g.tape._segments)}",
              flush=True)
    if variant == "pad":
        from gsv_tpu.circuit.mega import group_dev_s1pad

        hm, om, fb, ghi, glo, ct_loc, token, gid = group_dev_s1pad(
            ex, g, gi_want)
    else:
        hm, om, fb, ghi, glo, ct_loc, token, gid = ex._group_dev(g, gi_want)
    t0 = time.time()
    arena, digest = fnr(arena, token, hm, om, oo, fb, delta,
                        ghi, glo, ct_loc, digest, gid, segs)
    d = np.asarray(digest)
    print(f"variant={variant} SURVIVED in {time.time()-t0:.0f}s "
          f"digest[:4]={d[:4]}", flush=True)


if __name__ == "__main__":
    main()

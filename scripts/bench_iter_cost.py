"""Measure per-wave-iteration cost of the generic garble executor on the
real chip, across (cf, cn, n_waves, B) — the inputs to an analytic whole-plan
cost model (time = sum over segments of n_waves * iter_cost(cf, cn, B)).

Builds synthetic single-segment tapes (self-contained, no model imports) and
times the jitted generic step.  ~1 compile per (shape) point via the
persistent cache.

Usage: python scripts/bench_iter_cost.py [B]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def synth_tape(n_waves: int, cf: int, cn: int, H: int = 256, frame: int = 4096):
    """A synthetic CompiledTape with one segment of uniform width."""
    from gsv_tpu.circuit.tape import CompiledTape, Segment, TapeStreams

    rng = np.random.default_rng(0)
    nf = n_waves * cf
    nn = n_waves * cn
    ct_count = nn

    def ops(n):
        # mix header refs and frame refs; frame refs point at low slots
        # (already written region is irrelevant for timing)
        return rng.integers(0, H + frame // 2, size=n).astype(np.int32)

    seg = Segment(
        n_waves=n_waves, cf=cf, cn=cn,
        f_a=ops(nf).reshape(n_waves, cf),
        f_b=ops(nf).reshape(n_waves, cf),
        f_c=rng.integers(0, frame, size=nf).astype(np.int32).reshape(n_waves, cf),
        f_bmask=rng.integers(0, 2, size=nf).astype(np.uint8).reshape(n_waves, cf),
        f_flip=rng.integers(0, 2, size=nf).astype(np.uint8).reshape(n_waves, cf),
        n_a=ops(nn).reshape(n_waves, cn),
        n_b=ops(nn).reshape(n_waves, cn),
        n_c=rng.integers(0, frame, size=nn).astype(np.int32).reshape(n_waves, cn),
        n_gid=np.arange(nn, dtype=np.uint32).reshape(n_waves, cn),
        n_ct=np.arange(nn, dtype=np.int32).reshape(n_waves, cn),
        n_aa=rng.integers(0, 2, size=nn).astype(np.uint8).reshape(n_waves, cn),
        n_ab=rng.integers(0, 2, size=nn).astype(np.uint8).reshape(n_waves, cn),
        n_ac=rng.integers(0, 2, size=nn).astype(np.uint8).reshape(n_waves, cn),
        n_tt=np.full(nn, 8, dtype=np.uint8).reshape(n_waves, cn),
    )
    streams = TapeStreams.empty()  # unused by the executor once segments exist
    t = CompiledTape(
        name=f"synth_{n_waves}x{cf}x{cn}",
        n_inputs=H - 3,
        frame_size=frame,
        total_gates=nf + nn,
        ct_count=ct_count,
        streams=streams,
        out_ops=np.zeros(0, dtype=np.int32),
        out_positions=np.zeros(0, dtype=np.int32),
        out_all_ops=np.zeros(0, dtype=np.int32),
    )
    object.__setattr__(t, "_segments", [seg])
    object.__setattr__(t, "_content_key", t.name)
    return t


def main():
    import jax
    import jax.numpy as jnp

    from gsv_tpu.core.jitcache import enable_if_tpu

    print("persistent cache:", enable_if_tpu(), flush=True)
    print("devices:", jax.devices(), flush=True)

    from gsv_tpu.circuit.link import Plan, TapeStep
    from gsv_tpu.circuit.runtime import PlanExecutor

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    H = 256
    arena_size = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    frame = arena_size - H - 16

    plan = Plan(
        steps=[], arena_size=arena_size, n_inputs=H - 3,
        input_abs=np.arange(3, H, dtype=np.int32),
        output_abs=np.zeros(0, dtype=np.int32),
        output_positions=np.zeros(0, dtype=np.int32),
        total_gates=0, ct_count=0,
    )
    ex = PlanExecutor(plan, batch=B if B > 1 else None)

    shape = (B, arena_size, 4) if B > 1 else (arena_size, 4)
    arena = jnp.zeros(shape, jnp.uint32)
    delta = jnp.zeros((B, 4) if B > 1 else (4,), jnp.uint32)

    cases = []
    for cf, cn in [(16, 16), (64, 32), (256, 128), (1024, 512), (4096, 2048)]:
        for n_waves in (256, 1024):
            cases.append((n_waves, cf, cn))
    cases += [(256, 0, 256), (256, 256, 0), (64, 16384, 4096)]

    print(f"B={B}; timing {len(cases)} cases", flush=True)
    results = []
    for n_waves, cf, cn in cases:
        t = synth_tape(n_waves, cf, cn, H=H, frame=frame)
        st = TapeStep(
            tape=t,
            header_map=np.arange(H, dtype=np.int32),
            outputs_map=np.zeros(0, dtype=np.int32),
            frame_base=H,
            gid_base=0,
            ct_base=0,
        )
        try:
            fn = ex._fn(t, "garble")
            hm, om, ghi, glo = ex._step_maps(st)
            t0 = time.time()
            arena, cts = fn(arena, hm, om, st.frame_base, delta, ghi, glo)
            jax.block_until_ready(cts)
            compile_s = time.time() - t0
            # timed runs
            reps = 3 if n_waves >= 1024 else 6
            t0 = time.time()
            for _ in range(reps):
                arena, cts = fn(arena, hm, om, st.frame_base, delta, ghi, glo)
            jax.block_until_ready(cts)
            dt = (time.time() - t0) / reps
            per_iter = dt / n_waves * 1e6
            gates = n_waves * (cf + cn) * (B if B > 1 else 1)
            rate = gates / dt / 1e9
            print(
                f"  waves={n_waves:5d} cf={cf:5d} cn={cn:5d}: "
                f"{dt*1e3:8.2f} ms  {per_iter:7.2f} us/iter  {rate:6.2f} Bg/s "
                f"(compile+warm {compile_s:.0f}s)",
                flush=True,
            )
            results.append((n_waves, cf, cn, dt))
        except Exception as e:  # noqa: BLE001
            print(f"  waves={n_waves} cf={cf} cn={cn}: {type(e).__name__}: {str(e)[:120]}", flush=True)
        # drop cached buffers so the next shape starts clean
        ex._fns.pop(("segs", t.content_key), None)
        ex._fns.pop((t.content_key, "garble", ex.hasher), None)

    # fixed dispatch cost: time many calls of the smallest case without sync
    t = synth_tape(16, 16, 16, H=H, frame=frame)
    st = TapeStep(tape=t, header_map=np.arange(H, dtype=np.int32),
                  outputs_map=np.zeros(0, dtype=np.int32), frame_base=H,
                  gid_base=0, ct_base=0)
    fn = ex._fn(t, "garble")
    hm, om, ghi, glo = ex._step_maps(st)
    arena, cts = fn(arena, hm, om, st.frame_base, delta, ghi, glo)
    jax.block_until_ready(cts)
    N = 300
    t0 = time.time()
    for _ in range(N):
        arena, cts = fn(arena, hm, om, st.frame_base, delta, ghi, glo)
    host_done = time.time() - t0  # host dispatch loop time (async)
    jax.block_until_ready(cts)
    total = time.time() - t0
    print(f"dispatch: host-side {host_done/N*1e3:.3f} ms/call; "
          f"wall {total/N*1e3:.3f} ms/call over {N} calls", flush=True)


if __name__ == "__main__":
    main()

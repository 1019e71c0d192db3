"""Measure the tunnel's H2D transfer cost structure (honest D2H syncs).

The r3 warm pass enqueued at ~64ms/group (~7 small uploads + 1 execute),
so the warm wall is per-TRANSFER fixed cost, not bandwidth.  This probe
measures the knobs a pooled-upload design can turn:

  small_seq     : N sequential 4KB device_puts (the status quo)
  small_thr8    : same N through an 8-thread pool (RTT overlap?)
  pool_seq      : 256MB as 8MB chunks, sequential (h2d status quo)
  pool_thr4     : same chunks through 4 threads
  unpack_rate   : tiny jitted dynamic-slice programs, pipelined enqueue
                  (the per-group unpack dispatch a pooled design needs)

Usage: python scripts/probe_transfers.py
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    from gsv_tpu.core.jitcache import enable_if_tpu

    enable_if_tpu()
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)

    def sync(x):
        np.asarray(x.reshape(-1)[:1])

    # --- small transfers
    N = 256
    small = [np.random.randint(0, 2**32, (256, 4), dtype=np.uint32)
             for _ in range(N)]
    t = time.time()
    devs = [jnp.asarray(a) for a in small]
    sync(devs[-1])
    dt = time.time() - t
    print(f"small_seq: {N} x 4KB in {dt:.2f}s = {dt/N*1e3:.2f} ms/transfer",
          flush=True)

    for nthr in (4, 8, 16):
        t = time.time()
        with ThreadPoolExecutor(nthr) as ex:
            devs = list(ex.map(jnp.asarray, small))
        for d in devs[-nthr:]:
            sync(d)
        dt = time.time() - t
        print(f"small_thr{nthr}: {N} x 4KB in {dt:.2f}s = "
              f"{dt/N*1e3:.2f} ms/transfer", flush=True)

    # --- bulk pool upload
    MB = 1 << 20
    chunk = 8 * MB
    total = 256 * MB
    big = np.random.randint(0, 2**32, (total // 4,), dtype=np.uint32)
    parts = [big[i:i + chunk // 4] for i in range(0, big.size, chunk // 4)]
    t = time.time()
    dparts = [jnp.asarray(p) for p in parts]
    pool = jnp.concatenate(dparts)
    sync(pool)
    dt = time.time() - t
    print(f"pool_seq: 256MB (8MB chunks) in {dt:.1f}s = {total/MB/dt:.1f} MB/s",
          flush=True)
    del dparts

    for nthr in (2, 4, 8):
        t = time.time()
        with ThreadPoolExecutor(nthr) as ex:
            dparts = list(ex.map(jnp.asarray, parts))
        pool2 = jnp.concatenate(dparts)
        sync(pool2)
        dt = time.time() - t
        print(f"pool_thr{nthr}: 256MB in {dt:.1f}s = {total/MB/dt:.1f} MB/s",
              flush=True)
        del dparts, pool2

    # --- unpack dispatch rate: one jitted multi-output dynamic-slice per call
    @jax.jit
    def unpack(pool, offs):
        a = lax.dynamic_slice(pool, (offs[0],), (1024,)).reshape(256, 4)
        b = lax.dynamic_slice(pool, (offs[1],), (512,)).reshape(512,)
        c = lax.dynamic_slice(pool, (offs[2],), (64,))
        return a, b, c

    offs = jnp.zeros((3,), jnp.int32)
    o = unpack(pool, offs)
    sync(o[0])
    M = 2000
    t = time.time()
    outs = []
    for i in range(M):
        outs.append(unpack(pool, offs + (i % 7)))
    sync(outs[-1][0])
    dt = time.time() - t
    print(f"unpack_rate: {M} dispatches in {dt:.2f}s = "
          f"{dt/M*1e3:.2f} ms/dispatch", flush=True)

    # --- same via 8 threads (enqueue contention check)
    t = time.time()
    with ThreadPoolExecutor(8) as ex:
        outs = list(ex.map(lambda i: unpack(pool, offs + (i % 7)), range(M)))
    sync(outs[-1][0])
    dt = time.time() - t
    print(f"unpack_thr8: {M} dispatches in {dt:.2f}s = "
          f"{dt/M*1e3:.2f} ms/dispatch", flush=True)


if __name__ == "__main__":
    main()

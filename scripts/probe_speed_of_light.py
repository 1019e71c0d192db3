"""Ground-truth TPU probes: honest AES throughput + dispatch RTT.

Round-3 finding: through the axon tunnel, ``block_until_ready`` can return
before remote completion; only a D2H value fetch is an honest sync.  This
probe establishes, under controlled conditions (nothing else on the chip):

  1. AES speed-of-light: ONE compiled program applies bitsliced AES k times
     to an (n,4) block buffer (k is a dynamic ``fori_loop`` bound, so a
     single compile serves all k) and XOR-folds the result to a (4,) digest.
     Fetching the 16-byte digest forces all compute.  If wall time is linear
     in k, the fetch is honest and the slope is the real blocks/s.
  2. Dispatch RTT: a trivial chained program dispatched D times with a
     single terminal fetch (pipelined cost/dispatch) and with a fetch per
     dispatch (full round-trip cost).

Usage: python scripts/probe_speed_of_light.py [n_blocks]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20

    import jax

    from gsv_tpu.core.jitcache import enable_if_tpu

    enable_if_tpu()

    import jax.numpy as jnp
    from jax import lax

    from gsv_tpu.ops.aes_jax import aes_encrypt_words

    print("devices:", jax.devices(), flush=True)

    @jax.jit
    def aes_chain(x, k):
        def body(i, v):
            return aes_encrypt_words(v, xp=jnp)

        y = lax.fori_loop(0, k, body, x)
        return jnp.bitwise_xor.reduce(y, axis=0)

    x = jnp.asarray(np.random.randint(0, 2**32, (n, 4), dtype=np.uint32))
    np.asarray(x[0])  # sync the upload

    print(f"--- AES chain scaling, n={n} blocks ({n*16/1e6:.0f} MB state) ---",
          flush=True)
    # warm-up / compile
    t = time.time()
    d = aes_chain(x, jnp.int32(1))
    np.asarray(d)
    print(f"compile+first run: {time.time()-t:.1f}s", flush=True)

    results = []
    for k in (1, 2, 4, 8, 16, 32, 64):
        t = time.time()
        d = aes_chain(x, jnp.int32(k))
        np.asarray(d)
        dt = time.time() - t
        rate = n * k / dt
        results.append((k, dt))
        print(f"k={k:3d}: {dt:8.3f}s  -> {rate/1e9:7.3f} B blocks/s "
              f"(cumulative incl. fixed cost)", flush=True)
    # slope between the two largest k isolates pure compute
    (k1, t1), (k2, t2) = results[-2], results[-1]
    if t2 > t1:
        slope = n * (k2 - k1) / (t2 - t1)
        print(f"marginal rate (k={k1}->{k2}): {slope/1e9:.3f} B blocks/s",
              flush=True)
        print(f"fixed cost per dispatch+fetch: {t1 - k1 * n / slope:.3f}s",
              flush=True)
    else:
        print("NON-LINEAR: t(k) not increasing -> fetch is NOT honest",
              flush=True)

    print("--- dispatch RTT (tiny chained program) ---", flush=True)

    @jax.jit
    def bump(v):
        return v + 1

    v = jnp.zeros((8,), jnp.uint32)
    np.asarray(bump(v))  # compile
    D = 200
    t = time.time()
    for _ in range(D):
        v = bump(v)
    np.asarray(v)
    dt = time.time() - t
    print(f"{D} chained dispatches, one terminal fetch: "
          f"{dt*1000/D:.2f} ms/dispatch", flush=True)
    t = time.time()
    for _ in range(20):
        v = bump(v)
        np.asarray(v)
    dt = time.time() - t
    print(f"20 dispatches with per-dispatch fetch: {dt*1000/20:.2f} ms/RTT",
          flush=True)


if __name__ == "__main__":
    main()

"""On-chip A/B: XLA bitsliced AES vs the Pallas kernel (honest D2H sync).

Three variants, all as ONE compiled program iterating k times over a
resident (n,4) buffer (dynamic fori_loop bound -> single compile each):

  words_xla    : aes_encrypt_words (pack -> rounds -> unpack, all XLA)
  words_pallas : aes_encrypt_words_pallas (pack/unpack XLA, rounds Pallas)
  planes_*     : rounds only, state stays in plane layout across iterations
                 (isolates the pack/unpack cost)

Usage: python scripts/probe_aes_pallas.py [n_blocks]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21

    import jax

    from gsv_tpu.core.jitcache import enable_if_tpu

    enable_if_tpu()

    import jax.numpy as jnp
    from jax import lax

    from gsv_tpu.ops.aes_jax import (aes_encrypt_planes, aes_encrypt_words,
                                     pack_planes)
    from gsv_tpu.ops.aes_pallas import (aes_encrypt_planes_pallas,
                                        aes_encrypt_words_fused,
                                        aes_encrypt_words_fused2,
                                        aes_encrypt_words_pallas)

    print("devices:", jax.devices(), flush=True)

    variants = {
        "words_xla": lambda v: aes_encrypt_words(v, xp=jnp),
        "words_pallas": lambda v: aes_encrypt_words_pallas(v),
        "words_fused": lambda v: aes_encrypt_words_fused(v),
        "words_fused2": lambda v: aes_encrypt_words_fused2(v),
        "planes_xla": lambda v: aes_encrypt_planes(v, xp=jnp),
        "planes_pallas": lambda v: aes_encrypt_planes_pallas(v),
    }

    x_words = jnp.asarray(np.random.randint(0, 2**32, (n, 4), dtype=np.uint32))
    x_planes = jax.jit(lambda b: pack_planes(b, xp=jnp))(x_words)
    np.asarray(x_planes[0, 0, 0])

    for name, step in variants.items():
        @jax.jit
        def chain(x, k, step=step):
            y = lax.fori_loop(0, k, lambda i, v: step(v), x)
            return y.reshape(-1)[:4]

        x = x_planes if name.startswith("planes") else x_words
        t = time.time()
        np.asarray(chain(x, jnp.int32(1)))
        print(f"{name}: compile+first {time.time()-t:.1f}s", flush=True)
        ts = {}
        for k in (8, 32):
            t = time.time()
            np.asarray(chain(x, jnp.int32(k)))
            ts[k] = time.time() - t
        rate = n * (32 - 8) / (ts[32] - ts[8])
        print(f"{name}: k=8 {ts[8]:.3f}s  k=32 {ts[32]:.3f}s  marginal "
              f"{rate/1e9:.3f} B blocks/s", flush=True)


if __name__ == "__main__":
    main()

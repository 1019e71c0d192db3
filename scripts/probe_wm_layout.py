"""On-chip A/B: word-major (planar) arena vs row-major arena for the
garble inner wave.

The r4 probes show the planes-resident Pallas AES kernel at ~1.28B
blocks/s vs 0.55B for the words_fused kernel whose XLA-side (n,4)->
(4,32,m) transpose eats 2.3x (docs/perf-model.md).  The transpose exists
because the arena stores labels row-major ((slots, 4): one 16-byte row
per wire).  A word-major arena (4, slots) lets the gather emit the wt
layout directly — wt[j, :] = arena[j, idx] is a clean 1D row gather —
and (4, n) reshapes to the kernel's (4, 32, m) STRIDED (lane g holds
blocks {g, m+g, 2m+g, ...}) with no data movement at all.  AES is
per-block elementwise, so strided lane packing is bit-identical as long
as pack and unpack share the convention.

Unknown this probe resolves: whether 4x 1D u32 gathers (+ scatters) on
TPU cost more than the row-major 16-byte row gathers they replace — and
the true end-to-end in-situ rate of each variant (gather + xor + AES +
scatter + digest fold), not the kernel-only microbench.

Usage: python scripts/probe_wm_layout.py [B] [n_per_inst] [waves]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    from gsv_tpu.core.jitcache import enable_if_tpu

    print("persistent cache:", enable_if_tpu(), flush=True)
    import jax
    import jax.numpy as jnp

    jax.devices()

    from gsv_tpu.ops.aes_pallas import _aes_wt_pallas, aes_encrypt_words_fused
    from gsv_tpu.core.hw import tpu_available

    interp = not tpu_available()

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096  # gates per inst/wave
    waves = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    A = 420_628  # r1 full-verifier arena size

    rng = np.random.default_rng(0)
    # per-wave gather/scatter indices (shared across instances, as in prod).
    # --seq: contiguous ranges (the linear-scan allocator's common case) —
    # isolates AES cost from random-gather cost.
    if "--seq" in sys.argv:
        base = rng.integers(0, A - n, size=(waves, 3))
        IDXA = (base[:, 0, None] + np.arange(n)).astype(np.int32)
        IDXB = (base[:, 1, None] + np.arange(n)).astype(np.int32)
        IDXC = (base[:, 2, None] + np.arange(n)).astype(np.int32)
    else:
        IDXA = rng.integers(0, A, size=(waves, n), dtype=np.int32)
        IDXB = rng.integers(0, A, size=(waves, n), dtype=np.int32)
        # scatter targets are genuinely unique per wave (as in real tapes)
        IDXC = np.stack([rng.permutation(A)[:n] for _ in range(waves)]
                        ).astype(np.int32)

    def hash_row(blocks):  # row-major (nb, 4) -> (nb, 4), fused kernel
        return aes_encrypt_words_fused(blocks, interpret=interp)

    def hash_wm(bw):  # word-major (4, nb) -> (4, nb), strided wt, no transpose
        from gsv_tpu.ops.aes_pallas import _lane_tile

        nb = bw.shape[1]
        m = nb // 32
        pad = (-m) % _lane_tile(m)
        wt = bw.reshape(4, 32, m)
        if pad:
            wt = jnp.pad(wt, ((0, 0), (0, 0), (0, pad)))
        out = _aes_wt_pallas(wt, interpret=interp)
        if pad:
            out = out[..., :m]
        return out.reshape(4, nb)

    # ---- variant R: row-major arena (B, A, 4) --------------------------
    def wave_r(arena, delta, ia, ib, ic):
        a0 = arena[:, ia]            # (B, n, 4)
        b0 = arena[:, ib]
        d1 = delta[:, None, :]
        sel = a0 ^ d1
        blocks = jnp.concatenate([sel, sel ^ d1], axis=1).reshape(-1, 4)
        h = hash_row(blocks).reshape(B, 2 * n, 4)
        w0 = h[:, :n] ^ (h[:, n:] ^ b0)
        arena = jax.vmap(lambda ar, w: ar.at[ic].set(w))(arena, w0)
        return arena

    def pass_r(arena, delta):
        for w in range(waves):
            arena = wave_r(arena, delta, IDXA[w], IDXB[w], IDXC[w])
        return arena, arena[:, 0]

    # ---- variant W: word-major arena (4, B, A), batch inside -----------
    # (4, B, n) -> (4, B*n) is a FREE contiguous reshape in this layout,
    # so batch collapse into kernel lanes costs nothing (the row-major
    # path's vmap costs nothing either — its collapse is along blocks)
    def wave_w(arena, delta, ia, ib, ic):
        a0 = arena[:, :, ia]         # (4, B, n)
        b0 = arena[:, :, ib]
        d1 = delta[:, :, None]
        sel = a0 ^ d1
        blocks = jnp.concatenate(
            [sel.reshape(4, -1), (sel ^ d1).reshape(4, -1)], axis=1)
        h = hash_wm(blocks)
        Bn = B * n
        w0 = (h[:, :Bn] ^ h[:, Bn:]).reshape(4, B, n) ^ b0
        arena = arena.at[:, :, ic].set(w0)
        return arena

    def pass_w(arena, delta):
        for w in range(waves):
            arena = wave_w(arena, delta, IDXA[w], IDXB[w], IDXC[w])
        return arena, arena[:, :, 0]

    # ---- variant S: slot-major arena (A, B, 4) -------------------------
    # each gathered row is B*16 = 512 CONTIGUOUS bytes (vs 16B in the
    # row-major layout) — the granularity TPU gathers like; AES feed is a
    # (n*B, 4) reshape of the gathered (n, B, 4) block (free, row-major)
    def wave_s(arena, delta, ia, ib, ic):
        a0 = arena[ia]               # (n, B, 4)
        b0 = arena[ib]
        d1 = delta[None, :, :]
        sel = a0 ^ d1
        blocks = jnp.concatenate([sel, sel ^ d1], axis=0).reshape(-1, 4)
        h = hash_row(blocks).reshape(2 * n, B, 4)
        w0 = h[:n] ^ (h[n:] ^ b0)
        arena = arena.at[ic].set(w0)
        return arena

    def pass_s(arena, delta):
        for w in range(waves):
            arena = wave_s(arena, delta, IDXA[w], IDXB[w], IDXC[w])
        return arena, arena[0]

    def mk_s():
        return (jnp.asarray(rng.integers(0, 2**32, (A, B, 4), dtype=np.uint32)),
                jnp.asarray(rng.integers(0, 2**32, (B, 4), dtype=np.uint32)))

    # ---- scatter-semantics variants: XLA emits a slow duplicate-safe
    # scatter unless told indices are unique and in bounds; real tapes
    # write distinct slots per wave, so the production path can promise
    # both.  Same for the bounds mask on gathers.
    def pass_r0u(arena, delta):
        for w in range(waves):
            a0 = arena[:, IDXA[w]]
            b0 = arena[:, IDXB[w]]
            d1 = delta[:, None, :]
            w0 = (a0 ^ d1) ^ b0
            arena = jax.vmap(
                lambda ar, wv, ic=IDXC[w]: ar.at[ic].set(
                    wv, unique_indices=True, mode="promise_in_bounds"))(
                arena, w0)
        return arena, arena[:, 0]

    def pass_rg(arena, delta):  # gathers only, one scatter at the end
        acc = jnp.zeros((B, n, 4), jnp.uint32)
        for w in range(waves):
            a0 = arena[:, IDXA[w]]
            b0 = arena[:, IDXB[w]]
            acc = acc ^ a0 ^ b0
        arena = jax.vmap(
            lambda ar, wv: ar.at[IDXC[0]].set(
                wv, unique_indices=True, mode="promise_in_bounds"))(
            arena, acc)
        return arena, arena[:, 0]

    # ---- formulation variants: what exactly makes the gather slow? -----
    # flat absolute indices (B*n,) over a (B*A, 4) arena: no batch dims in
    # the gather at all (index arithmetic runs on device — cheap vs the
    # gather itself)
    def pass_f0(arena, delta):  # arena (B*A, 4), no AES
        d = jnp.repeat(delta, n, axis=0)  # (B*n, 4)
        boff = (jnp.arange(B, dtype=jnp.int32) * A)[:, None]

        def flat(idx):
            return (boff + jnp.asarray(idx)[None, :]).reshape(-1)

        for w in range(waves):
            a0 = arena[flat(IDXA[w])]
            b0 = arena[flat(IDXB[w])]
            w0 = (a0 ^ d) ^ b0
            arena = arena.at[flat(IDXC[w])].set(
                w0, unique_indices=True, mode="promise_in_bounds")
        return arena, arena[0]

    def mk_f():
        return (jnp.asarray(
            rng.integers(0, 2**32, (B * A, 4), dtype=np.uint32)),
            jnp.asarray(rng.integers(0, 2**32, (B, 4), dtype=np.uint32)))

    # contiguous dynamic-slice read/write ceiling (no gather at all)
    BASES = rng.integers(0, A - n, size=(waves, 3))

    def pass_dsl(arena, delta):
        import jax.lax as lax

        d1 = delta[:, None, :]
        for w in range(waves):
            a0 = lax.dynamic_slice(arena, (0, BASES[w][0], 0), (B, n, 4))
            b0 = lax.dynamic_slice(arena, (0, BASES[w][1], 0), (B, n, 4))
            w0 = (a0 ^ d1) ^ b0
            arena = lax.dynamic_update_slice(arena, w0, (0, BASES[w][2], 0))
        return arena, arena[:, 0]

    # ---- identity-hash variants: pure gather/xor/scatter ceiling -------
    def pass_r0(arena, delta):
        for w in range(waves):
            a0 = arena[:, IDXA[w]]
            b0 = arena[:, IDXB[w]]
            d1 = delta[:, None, :]
            w0 = (a0 ^ d1) ^ b0
            arena = jax.vmap(lambda ar, wv, ic=IDXC[w]: ar.at[ic].set(wv))(
                arena, w0)
        return arena, arena[:, 0]

    def pass_s0(arena, delta):
        for w in range(waves):
            a0 = arena[IDXA[w]]
            b0 = arena[IDXB[w]]
            w0 = (a0 ^ delta[None]) ^ b0
            arena = arena.at[IDXC[w]].set(w0)
        return arena, arena[0]

    # ---- run ----------------------------------------------------------
    blocks_per_pass = 2 * n * B * waves

    def bench(name, fn, mk):
        f = jax.jit(fn, donate_argnums=(0,))
        arena, delta = mk()
        arena, tok = f(arena, delta)          # compile + warm
        np.asarray(tok)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            arena, tok = f(arena, delta)
            np.asarray(tok)
        dt = (time.perf_counter() - t0) / reps
        rate = blocks_per_pass / dt
        print(f"{name}: {dt*1e3:.0f} ms/pass, {rate/1e9:.3f} B blocks/s",
              flush=True)

    def mk_r():
        return (jnp.asarray(rng.integers(0, 2**32, (B, A, 4), dtype=np.uint32)),
                jnp.asarray(rng.integers(0, 2**32, (B, 4), dtype=np.uint32)))

    def mk_w():
        return (jnp.asarray(rng.integers(0, 2**32, (4, B, A), dtype=np.uint32)),
                jnp.asarray(rng.integers(0, 2**32, (4, B), dtype=np.uint32)))

    print(f"B={B} n={n} waves={waves} blocks/pass={blocks_per_pass/1e6:.1f}M",
          flush=True)
    bench("row-major + words_fused", pass_r, mk_r)
    bench("word-major + wt-direct ", pass_w, mk_w)
    bench("slot-major + words_fused", pass_s, mk_s)
    bench("row-major, no AES      ", pass_r0, mk_r)
    bench("slot-major, no AES     ", pass_s0, mk_s)
    bench("row-major, no AES, uniq", pass_r0u, mk_r)
    bench("row-major, gathers only", pass_rg, mk_r)
    bench("flat-idx,  no AES, uniq", pass_f0, mk_f)
    bench("dyn-slice slab ceiling ", pass_dsl, mk_r)


if __name__ == "__main__":
    main()

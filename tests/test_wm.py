"""Word-major ("wm") garble path vs the standard executor: output labels
and the committed digest must be bit-identical — the wm arena layout
changes only how data is laid out on device (gathers per word row, strided
AES lane packing), never a single computed value (runtime.py wm section;
ops/aes_pallas.aes_encrypt_wm; ops/tweaks.tweak_words_wm)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from gsv_tpu.circuit import trace_circuit
from gsv_tpu.circuit.link import link
from gsv_tpu.circuit.mega import build_mega, mega_garble
from gsv_tpu.circuit.runtime import GroupExecutor
from gsv_tpu.circuit.schedule import schedule_plan
from gsv_tpu.circuit.tape import Compiler
from gsv_tpu.core.labels import words_from_int, words_from_int_array
from gsv_tpu.core.rng import GarblerRng
from gsv_tpu.gadgets import bigint
from gsv_tpu.gadgets.bigint import BigIntWires

W = 8
N_IN = 4 * W


def _circ(ctx, ins):
    a = BigIntWires(ins[0:W])
    b = BigIntWires(ins[W : 2 * W])
    c = BigIntWires(ins[2 * W : 3 * W])
    d = BigIntWires(ins[3 * W : 4 * W])
    ab = bigint.add_without_carry(ctx, a, b)
    cd = bigint.add_without_carry(ctx, c, d)
    ac = bigint.add_without_carry(ctx, a, c)
    bd = bigint.add_without_carry(ctx, b, d)
    x = bigint.add_without_carry(ctx, ab, cd)
    y = bigint.add_without_carry(ctx, ac, bd)
    m = bigint.mul(ctx, x, y)
    return m.bits


@pytest.fixture(scope="module")
def gplan():
    tmpl, _ = trace_circuit(_circ, N_IN)
    plan = link(Compiler(flatten_max=200).compile(tmpl), N_IN)
    return schedule_plan(plan)


def _args(batch):
    if batch:
        rngs = [GarblerRng(1 + i) for i in range(batch)]
        in_l0 = np.stack(
            [words_from_int_array([r.issue_label0() for r in rngs])
             for _ in range(N_IN)], axis=1)
        return (in_l0,
                words_from_int_array([r.delta for r in rngs]),
                words_from_int_array([r.false_label0 for r in rngs]),
                words_from_int_array([r.true_label0 for r in rngs]))
    rng = GarblerRng(5)
    in_l0 = words_from_int_array([rng.issue_label0() for _ in range(N_IN)])
    return (in_l0, words_from_int(rng.delta),
            words_from_int(rng.false_label0), words_from_int(rng.true_label0))


@pytest.mark.parametrize("batch", [None, 3])
@pytest.mark.parametrize("top_k,chunk", [(40, 8), (2, 4)])
def test_wm_mega_matches_sequential(gplan, batch, top_k, chunk):
    """wm mega garble (covered branches, copy buckets, AND the wm residual
    fallback at top_k=2) == standard sequential garble, bit for bit."""
    args = _args(batch)
    want, _, want_dig = GroupExecutor(gplan, batch=batch).garble(
        *args, ct_handler=None, commit=True)
    ex = GroupExecutor(gplan, batch=batch, hasher="aes_wm")
    st = build_mega(gplan, top_k=top_k, chunk=chunk)
    if top_k == 2:
        assert st.n_excluded > 0, "want the wm residual path exercised"
    got, _, got_dig = mega_garble(ex, *args, top_k=top_k, chunk=chunk)
    assert (np.asarray(want) == np.asarray(got)).all()
    assert (np.asarray(want_dig) == np.asarray(got_dig)).all()


def test_aes_wm_matches_row_major():
    """aes_encrypt_wm == aes_encrypt_words on the same blocks (strided
    lane packing is bit-transparent)."""
    import jax.numpy as jnp

    from gsv_tpu.ops.aes_jax import aes_encrypt_words
    from gsv_tpu.ops.aes_pallas import aes_encrypt_wm

    rng = np.random.default_rng(7)
    blocks = rng.integers(0, 2**32, (4096, 4), dtype=np.uint32)
    want = np.asarray(aes_encrypt_words(jnp.asarray(blocks), xp=jnp))
    got = np.asarray(aes_encrypt_wm(jnp.asarray(blocks.T), interpret=True)).T
    assert (want == got).all()


def test_tweak_words_wm_matches():
    from gsv_tpu.ops.tweaks import tweak_words, tweak_words_wm

    hi = np.arange(100, dtype=np.uint32) * 977
    lo = np.arange(100, dtype=np.uint32) * 131071 + 5
    assert (tweak_words(hi, lo).T == tweak_words_wm(hi, lo)).all()

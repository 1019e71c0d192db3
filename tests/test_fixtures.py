"""Byte-level pinned fixtures: garbling a 6-gate circuit from seed 42 must
produce EXACTLY these ciphertext bytes, labels and digests, forever.

The pins below were produced by two independent implementations agreeing
bit-for-bit: the pure-Python interpreter walker (``GarbleInterp`` over
python-int labels + OpenSSL-backed ``aes_host`` hashing) and the compiled
XLA runtime (bitsliced AES from the tower-field S-box construction).  Any
change that moves these bytes is a protocol break — gate ordering, gate-id
assignment, tweak schedule, label serialization, RNG draw order, S-box —
and must be caught here rather than at an 11B-gate bench.

What a rustc environment would add on top (tracked in PARITY.md): running
the reference's ``tests/fq12_mul_e2e.rs`` to produce ITS bytes for the same
seed and asserting ours equal them.  Everything on our side of that diff —
ChaCha20 RNG bit-compat (test_core), AES KATs vs OpenSSL (test_aes),
half-gates ordering vs the walker (here) — is already pinned.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from gsv_tpu.circuit import trace_circuit
from gsv_tpu.circuit.ciphertext import CollectHandler, HashHandler
from gsv_tpu.circuit.interp import GarbleInterp
from gsv_tpu.circuit.link import link
from gsv_tpu.circuit.runtime import GroupExecutor, PlanExecutor
from gsv_tpu.circuit.schedule import schedule_plan
from gsv_tpu.circuit.tape import Compiler
from gsv_tpu.core.labels import (
    words_from_int,
    words_from_int_array,
    words_to_bytes,
)
from gsv_tpu.core.rng import GarblerRng

SEED = 42
N_IN = 4

# -- pinned values (seed 42, the circuit below) -----------------------------
PIN_DELTA = 0x6902C9F9A31763998398BC11D7B54878
PIN_FALSE0 = 0x2ADBD0E8C9394918190A545D007167D5
PIN_TRUE0 = 0x58657584FBF586AA29C45DA7A992F255
PIN_IN_L0 = [
    0x7290410DEB7B20B4D3D4A8E42D0A21C5,
    0x5FBD69C872E1666F101CEEC979C72CA2,
    0xB8609A87F97894E41B550032C4B40D8F,
    0x9EF62B9267204E04F05DA78FF74FF232,
]
PIN_OUT_L0 = [
    0x8556BCA2626410448B585983AFC942BB,
    0x469F09B32CD99B7C3AA72F83CDB4C450,
]
PIN_CTS_HEX = (
    "5224a02cd05e372398cbd5520357dd921aef3e7d60cbbc31da74740cafdd857d"
    "024eb932a41f5b32cb3a78196aa4d591fdc59ca6fe434964fdd06edb10e6ead1"
)
PIN_CBC_HEX = "adfb8999e00528156f22d4bc8be10871"  # reference-style AES chain
PIN_COMMIT_WORDS = [2691903657, 769206908, 2774667080, 1075713717]  # XOR fold


def _circ(ctx, ins):
    x = ctx.xor(ins[0], ins[1])
    y = ctx.and_(x, ins[2])
    z = ctx.or_(y, ctx.nand(ins[0], ins[3]))
    return [ctx.xnor(z, ins[1]), ctx.and_(z, x)]


def test_rng_draws_pinned():
    rng = GarblerRng(SEED)
    assert rng.delta == PIN_DELTA
    assert rng.false_label0 == PIN_FALSE0
    assert rng.true_label0 == PIN_TRUE0
    assert [rng.issue_label0() for _ in range(N_IN)] == PIN_IN_L0


def test_interp_walker_bytes_pinned():
    tmpl, _ = trace_circuit(_circ, N_IN)
    gi = GarbleInterp(seed=SEED)
    out_l0, in_l0 = gi.run(tmpl)
    assert in_l0 == PIN_IN_L0
    assert out_l0 == PIN_OUT_L0
    assert b"".join(c.to_bytes(16, "big") for c in gi.ciphertexts).hex() == PIN_CTS_HEX


def test_compiled_runtime_bytes_pinned():
    tmpl, _ = trace_circuit(_circ, N_IN)
    plan = link(Compiler(flatten_max=200).compile(tmpl), N_IN)
    rng = GarblerRng(SEED)
    in_l0 = [rng.issue_label0() for _ in range(N_IN)]
    col = CollectHandler()
    cbc = HashHandler()
    out, _ = PlanExecutor(plan).garble(
        words_from_int_array(in_l0),
        words_from_int(rng.delta),
        words_from_int(rng.false_label0),
        words_from_int(rng.true_label0),
        ct_handler=lambda c: (col(c), cbc(c)),
    )
    assert words_to_bytes(col.stream()).hex() == PIN_CTS_HEX
    assert cbc.finalize().hex() == PIN_CBC_HEX
    assert words_to_bytes(np.asarray(out)).hex() == b"".join(
        v.to_bytes(16, "big") for v in PIN_OUT_L0
    ).hex()


def test_grouped_commitment_pinned():
    tmpl, _ = trace_circuit(_circ, N_IN)
    plan = link(Compiler(flatten_max=200).compile(tmpl), N_IN)
    gplan = schedule_plan(plan)
    rng = GarblerRng(SEED)
    in_l0 = [rng.issue_label0() for _ in range(N_IN)]
    out, _, digest = GroupExecutor(gplan).garble(
        words_from_int_array(in_l0),
        words_from_int(rng.delta),
        words_from_int(rng.false_label0),
        words_from_int(rng.true_label0),
        ct_handler=None,
        commit=True,
    )
    assert np.asarray(digest).tolist() == PIN_COMMIT_WORDS
    assert words_to_bytes(np.asarray(out)).hex() == b"".join(
        v.to_bytes(16, "big") for v in PIN_OUT_L0
    ).hex()

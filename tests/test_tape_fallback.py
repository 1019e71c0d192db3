"""The pure-Python tape-compiler fallbacks (no g++/native lib) must produce
plans that garble bit-identically to the native-compiled ones.  The native
lib (gsv_tpu/native) supplies ASAP levels and linear-scan slot allocation;
the heapq fallbacks in tape.py:516-568 are near-dead on machines with a
toolchain — this test forces them so they cannot rot (VERDICT r2 weak #8)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from gsv_tpu import native
from gsv_tpu.circuit import trace_circuit
from gsv_tpu.circuit.ciphertext import CollectHandler
from gsv_tpu.circuit.interp import GarbleInterp
from gsv_tpu.circuit.link import link
from gsv_tpu.circuit.runtime import PlanExecutor
from gsv_tpu.circuit.tape import Compiler
from gsv_tpu.core.labels import (
    int_array_from_words,
    words_from_int,
    words_from_int_array,
)
from gsv_tpu.core.rng import GarblerRng
from gsv_tpu.gadgets import bigint
from gsv_tpu.gadgets.bigint import BigIntWires

N = 24


def _circ(ctx, ins):
    a = BigIntWires(ins[: N // 2])
    b = BigIntWires(ins[N // 2 :])
    s = bigint.add_without_carry(ctx, a, b)
    return bigint.mul(ctx, s, a).bits


def _garble(plan):
    rng = GarblerRng(3)
    in_l0 = [rng.issue_label0() for _ in range(N)]
    col = CollectHandler()
    out, _ = PlanExecutor(plan).garble(
        words_from_int_array(in_l0),
        words_from_int(rng.delta),
        words_from_int(rng.false_label0),
        words_from_int(rng.true_label0),
        ct_handler=col,
    )
    return np.asarray(out), col.stream()


def test_python_fallback_matches_native(monkeypatch):
    assert native.compute_levels(
        np.zeros(1, np.int64), np.zeros(1, np.int64), np.ones(1, np.int64), 2
    ) is not None, "native lib unavailable — fallback comparison is vacuous"

    tmpl, _ = trace_circuit(_circ, N)
    plan_native = link(Compiler(flatten_max=120).compile(tmpl), N)

    monkeypatch.setattr(native, "compute_levels", lambda *a, **k: None)
    monkeypatch.setattr(native, "alloc_slots", lambda *a, **k: None)
    plan_py = link(Compiler(flatten_max=120).compile(tmpl), N)

    out_n, stream_n = _garble(plan_native)
    out_p, stream_p = _garble(plan_py)
    assert (out_n == out_p).all()
    assert (stream_n == stream_p).all()

    # and both equal the interpreter oracle
    gi = GarbleInterp(seed=3)
    out_ref, _ = gi.run(tmpl)
    assert int_array_from_words(out_n) == out_ref
    assert int_array_from_words(stream_n) == gi.ciphertexts

"""Gate-count parity: our trace vs the analytic reference cost model.

`scripts/ref_cost_model.py` transcribes the reference's Rust gadget code
into exact gate counts (see PARITY.md "Gate-count parity").  These tests pin
(a) per-gadget equality between our traced templates and the model, and
(b) the full-verifier stage totals predicted by the model — so any future
change that breaks gate-stream parity with the reference source fails here.
"""

import importlib.util
import os

import pytest

from gsv_tpu.bn254_host.field import Fq2 as HFq2
from gsv_tpu.circuit import trace_circuit
from gsv_tpu.gadgets import bigint as bi
from gsv_tpu.gadgets.bigint import BigIntWires
from gsv_tpu.gadgets.bn254 import fp254
from gsv_tpu.gadgets.bn254.fp254 import FQ_PARAMS
from gsv_tpu.gadgets.bn254.fq import FqWire
from gsv_tpu.gadgets.bn254.fq2 import Fq2Ops, Fq2Wire
from gsv_tpu.gadgets.bn254.fq6 import Fq6Ops, Fq6Wire
from gsv_tpu.gadgets.bn254.fq12 import Fq12Ops, Fq12Wire

_spec = importlib.util.spec_from_file_location(
    "ref_cost_model",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "ref_cost_model.py"),
)
M = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(M)


def model_cost(fn, *args, **kwargs):
    start = M.G.total
    fn(*args, **kwargs)
    return M.G.total - start


def traced_cost(circ, n_inputs):
    from gsv_tpu.circuit.wires import flatten_wires

    tmpl, _ = trace_circuit(lambda c, i: flatten_wires(circ(c, i))[0][:1], n_inputs)
    return tmpl.total_gates


N = 254


def _fq(ins, k):
    return BigIntWires(ins[k * N : (k + 1) * N])


def _fqw(ins, k):
    return FqWire(_fq(ins, k))


def _fq2(ins, k):
    return Fq2Wire(_fqw(ins, 2 * k), _fqw(ins, 2 * k + 1))


def _fq6(ins, k):
    return Fq6Wire(_fq2(ins, 3 * k), _fq2(ins, 3 * k + 1), _fq2(ins, 3 * k + 2))


def _fq12(ins, k):
    return Fq12Wire(_fq6(ins, 2 * k), _fq6(ins, 2 * k + 1))


CASES = [
    # (name, model fn+args, circuit fn, n_inputs)
    ("bigint.mul", lambda: M.bi_mul(N), lambda c, i: [bi.mul(c, _fq(i, 0), _fq(i, 1))], 2 * N),
    ("fp254.reduce", lambda: M.fq_montgomery_reduce(),
     lambda c, i: [fp254.montgomery_reduce(c, BigIntWires(i), fp=FQ_PARAMS)], 2 * N),
    ("fp254.add", lambda: M.fq_add(), lambda c, i: [fp254.add(c, _fq(i, 0), _fq(i, 1), fp=FQ_PARAMS)], 2 * N),
    ("fp254.sub", lambda: M.fq_sub(), lambda c, i: [fp254.sub(c, _fq(i, 0), _fq(i, 1), fp=FQ_PARAMS)], 2 * N),
    ("fp254.neg", lambda: M.fq_neg(), lambda c, i: [fp254.neg(c, _fq(i, 0), fp=FQ_PARAMS)], N),
    ("fp254.double", lambda: M.fq_double(), lambda c, i: [fp254.double(c, _fq(i, 0), fp=FQ_PARAMS)], N),
    ("fp254.half", lambda: M.fq_half(), lambda c, i: [fp254.half(c, _fq(i, 0), fp=FQ_PARAMS)], N),
    ("fp254.div6", lambda: M.fq_div6(), lambda c, i: [fp254.div6(c, _fq(i, 0), fp=FQ_PARAMS)], N),
    ("fq2.mul", lambda: M.fq2_mul(), lambda c, i: [Fq2Ops.mul_montgomery(c, _fq2(i, 0), _fq2(i, 1))], 4 * N),
    ("fq2.square", lambda: M.fq2_square(), lambda c, i: [Fq2Ops.square_montgomery(c, _fq2(i, 0))], 2 * N),
    ("fq6.mul", lambda: M.fq6_mul(), lambda c, i: [Fq6Ops.mul_montgomery(c, _fq6(i, 0), _fq6(i, 1))], 12 * N),
    ("fq6.square", lambda: M.fq6_square(), lambda c, i: [Fq6Ops.square_montgomery(c, _fq6(i, 0))], 6 * N),
    ("fq12.mul", lambda: M.fq12_mul(), lambda c, i: [Fq12Ops.mul_montgomery(c, _fq12(i, 0), _fq12(i, 1)).c0], 24 * N),
    ("fq12.square", lambda: M.fq12_square(), lambda c, i: [Fq12Ops.square_montgomery(c, _fq12(i, 0)).c0], 12 * N),
    ("fq12.mul_by_034", lambda: M.fq12_mul_by_034(None),
     lambda c, i: [Fq12Ops.mul_by_034_montgomery(c, _fq12(i, 0), _fq2(i, 12), _fq2(i, 13), _fq2(i, 14)).c0],
     30 * N),
    ("fq12.inverse", lambda: M.fq12_inverse(),
     lambda c, i: [Fq12Ops.inverse_montgomery(c, _fq12(i, 0)).c0], 12 * N),
]


@pytest.mark.parametrize("name,model_fn,circ,n_inputs", CASES, ids=[c[0] for c in CASES])
def test_gadget_matches_reference_model(name, model_fn, circ, n_inputs):
    assert traced_cost(circ, n_inputs) == model_cost(model_fn)


def test_cyclotomic_square_matches_model():
    from gsv_tpu.gadgets.bn254.fq12 import Fq12Ops

    got = traced_cost(
        lambda c, i: [Fq12Ops.cyclotomic_square_montgomery(c, _fq12(i, 0)).c0],
        12 * N,
    )
    assert got == model_cost(M.fq12_cyclotomic_square_exact)


def test_verifier_totals_pinned():
    """Full-verifier totals predicted by the reference model (trace-verified
    in round 2 — see PARITY.md table; the 218s trace itself is exercised by
    scripts/gate_census.py / the GSV_SLOW suite)."""
    from gsv_tpu.bn254_host.groth16 import dummy_proof

    vk, proof, publics = dummy_proof(k=6, seed=0)
    ab = M.hp.multi_pairing([(vk.alpha_g1, -vk.beta_g2)]).inv()

    start = M.G.total
    M.groth16_verify(vk, len(publics), ab)
    assert M.G.total - start == 10_683_587_487

    start = M.G.total
    M.decompress_g1()
    M.decompress_g2()
    M.decompress_g1()
    assert M.G.total - start == 11_456_302_131 - 10_683_587_487

"""Groth16 verifier model: trace/compile/run wrapper + benchmark sub-models.

The flagship "model" is the ~10.5B-gate (uncompressed; ~11.2B compressed)
Groth16-over-BN254 verifier circuit executed in Execute / Garble / Evaluate
modes (reference: ``examples/groth16_mpc.rs``, ``groth16_garble.rs``).
Sub-models (Fq mul, Fq12 mul) mirror the reference's micro-benchmarks and
integration tests (``tests/fq12_mul_e2e.rs``).
"""

from __future__ import annotations

from dataclasses import dataclass

from gsv_tpu.bn254_host.groth16 import VerifyingKey
from gsv_tpu.circuit.streaming import CircuitRunner
from gsv_tpu.gadgets.bigint import BigIntWires
from gsv_tpu.protocol.garbled_groth16 import build_2pc_circuit


@dataclass
class Groth16VerifierModel:
    """Lazy trace/compile holder for a verifying key's verifier circuit."""

    vk: VerifyingKey
    n_public: int
    compressed: bool = True
    flatten_max: int = 1 << 20
    # uniform-shape constant gadgets (TPU fast path: collapses compile
    # signatures and tape content; gate stream deviates ~+0.8% from the
    # reference's — keep False for parity/badge work)
    uniform_constants: bool = False

    _runner: CircuitRunner = None

    @property
    def runner(self) -> CircuitRunner:
        if self._runner is None:
            fn, n_inputs = build_2pc_circuit(self.vk, self.n_public, self.compressed)
            self._runner = CircuitRunner(
                fn,
                n_inputs,
                flatten_max=self.flatten_max,
                uniform_constants=self.uniform_constants,
            )
        return self._runner


def fq_mul_model(flatten_max: int = 1 << 20) -> CircuitRunner:
    """Single Montgomery Fq multiply (~414k gates)."""
    from gsv_tpu.gadgets.bn254 import fp254
    from gsv_tpu.gadgets.bn254.fp254 import FQ_PARAMS

    def circ(ctx, ins):
        a = BigIntWires(ins[:254])
        b = BigIntWires(ins[254:])
        return fp254.mul_montgomery(ctx, a, b, fp=FQ_PARAMS)

    return CircuitRunner(circ, 508, flatten_max=flatten_max)


def fq12_mul_model(flatten_max: int = 1 << 20) -> CircuitRunner:
    """Fq12 Montgomery multiply (~20M gates) — the reference's
    ``tests/fq12_mul_e2e.rs`` workload."""
    from gsv_tpu.gadgets.bn254.fq import FqWire
    from gsv_tpu.gadgets.bn254.fq2 import Fq2Wire
    from gsv_tpu.gadgets.bn254.fq6 import Fq6Wire
    from gsv_tpu.gadgets.bn254.fq12 import Fq12, Fq12Wire

    def wrap(ins):
        fqs = [FqWire(BigIntWires(ins[i * 254 : (i + 1) * 254])) for i in range(12)]
        return Fq12Wire(
            Fq6Wire(*[Fq2Wire(fqs[2 * i], fqs[2 * i + 1]) for i in range(3)]),
            Fq6Wire(*[Fq2Wire(fqs[6 + 2 * i], fqs[7 + 2 * i]) for i in range(3)]),
        )

    def circ(ctx, ins):
        a = wrap(ins[: 12 * 254])
        b = wrap(ins[12 * 254 :])
        return Fq12.mul_montgomery(ctx, a, b)

    return CircuitRunner(circ, 24 * 254, flatten_max=flatten_max)

"""Cut-and-choose demo: garbler/evaluator message flow
(reference: examples/groth16_cut_and_choose.rs with TOTAL=4, FINALIZE=2;
runs on the Fq12-mul workload by default for a quick turnaround — the FULL
compressed-verifier flow is examples/groth16_cut_and_choose_full.py).

Steps: batched garbling -> commits -> random challenge -> open seeds +
stream ciphertexts for finalized -> evaluator re-garbles opened & checks ->
evaluates finalized with full consistency checks.
"""

import random
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

from gsv_tpu.circuit.ciphertext import ArraySource, CollectHandler, HashHandler, TeeHandler
from gsv_tpu.circuit.streaming import EvaluatedWire
from gsv_tpu.models.groth16_verifier import fq12_mul_model
from gsv_tpu.protocol.cut_and_choose import Config, Evaluator, Garbler

TOTAL = 4
TO_FINALIZE = 2


def main():
    runner = fq12_mul_model()
    cfg = Config(total=TOTAL, to_finalize=TO_FINALIZE)
    print(f"instances: {TOTAL} x {runner.template.total_gates:,} gates")

    t0 = time.time()
    garbler = Garbler(runner, cfg)
    garbler.create()
    commits = garbler.commit()
    print(f"[garbler] batched garbling + commits in {time.time() - t0:.0f}s")

    ev = Evaluator(random.Random(), cfg, commits)
    print(f"[evaluator] challenge: finalize {ev.to_finalize}")

    open_seeds, regarble = garbler.open_commit(ev.to_finalize)
    streams, hashes = {}, {}

    def factory(i):
        col, hsh = CollectHandler(), HashHandler()
        streams[i], hashes[i] = col, hsh
        return TeeHandler(col, hsh)

    t0 = time.time()
    regarble(factory)
    print(f"[garbler] streamed finalized ciphertexts in {time.time() - t0:.0f}s")

    t0 = time.time()
    ev.check_opened(runner, open_seeds)
    print(f"[evaluator] opened instances re-garbled + commits verified in {time.time() - t0:.0f}s")

    rng = random.Random(1)
    bits = [bool(rng.getrandbits(1)) for _ in range(runner.n_inputs)]
    for i in ev.to_finalize:
        ev.check_finalized_stream_hash(i, hashes[i].finalize())
        inst = garbler.instances[i]
        inputs = [
            EvaluatedWire(gw.select(b), b) for gw, b in zip(inst.input_labels, bits)
        ]
        out = ev.evaluate(
            runner,
            i,
            inputs,
            true_label=inst.true_wire.select(True),
            false_label=inst.false_wire.select(False),
            ct_source=ArraySource(streams[i].stream()),
        )
        print(f"[evaluator] instance {i}: value={out.value} (all checks passed)")


if __name__ == "__main__":
    main()

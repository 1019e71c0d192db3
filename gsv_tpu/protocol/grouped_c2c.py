"""Cut-and-choose over the grouped executor (device-resident streams).

Same roles, challenge flow, and commitment record as
``gsv_tpu.protocol.cut_and_choose`` (reference ``src/cut_and_choose/``),
re-mapped to the grouped TPU runtime for flagship-scale circuits:

- garbling all ``total`` instances is ONE batched GroupExecutor pass;
- the ciphertext commitment is the device-side streaming digest
  (``runtime._digest_update``) rather than the host CBC chain
  (reference ciphertext_hasher.rs:16-33): grouped scheduling reorders the
  stream, and re-serializing ~58GB/instance through the host to chain it
  would defeat the architecture.  Both parties fold the digest over the
  same deterministic buffer layout, so it plays the same pre-challenge
  consistency-check role (cut_and_choose/garbler.rs:60-141) — neither
  construction is a keyed MAC;
- a finalized instance is evaluated group-locked against the re-garbling
  garbler (``GroupExecutor.garble_evaluate_2pc``): every ciphertext buffer
  is consumed on device the moment it is produced, so the full stream
  never exists at once (the in-process stand-in for the reference's
  crossbeam garbler->evaluator channel, examples/groth16_garble.rs:88-268).
"""

from __future__ import annotations

import secrets

import numpy as np

from gsv_tpu.circuit.runtime import GroupExecutor
from gsv_tpu.circuit.streaming import EvaluatedWire
from gsv_tpu.core.labels import (
    int_array_from_words,
    words_from_int,
    words_from_int_array,
)
from gsv_tpu.core.rng import GarblerRng
from gsv_tpu.protocol.cut_and_choose import (
    Config,
    ConsistencyError,
    Evaluator,
    GarbledInstance,
    GarbledInstanceCommit,
    commit_label,
)
from gsv_tpu.circuit.streaming import GarbledWire


class GroupedRunner:
    """Pairs a GroupPlan with cached per-batch GroupExecutors."""

    def __init__(self, gplan, hasher: str = "aes", mesh=None):
        self.gplan = gplan
        self.n_inputs = gplan.n_inputs
        self.hasher = hasher
        self.mesh = mesh  # optional instances-axis Mesh (SPMD batched passes)
        self._ex: dict = {}

    def executor(self, batch: int | None = None) -> GroupExecutor:
        ex = self._ex.get(batch)
        if ex is None:
            ex = GroupExecutor(
                self.gplan, batch=batch, hasher=self.hasher, mesh=self.mesh
            )
            self._ex[batch] = ex
        return ex


def _garble_args(rngs, n_inputs):
    l0_ints = [[r.issue_label0() for _ in range(n_inputs)] for r in rngs]
    l0 = np.stack([words_from_int_array(v) for v in l0_ints])
    delta = np.stack([words_from_int(r.delta) for r in rngs])
    f0 = np.stack([words_from_int(r.false_label0) for r in rngs])
    t0 = np.stack([words_from_int(r.true_label0) for r in rngs])
    return l0, delta, f0, t0


def _instances_from(seeds, outw, digests, n_inputs):
    insts = []
    for i, seed in enumerate(seeds):
        rng = GarblerRng(seed)
        labels = [rng.issue_label0() for _ in range(n_inputs)]
        delta = rng.delta
        out_l0 = int_array_from_words(np.asarray(outw[i]).reshape(-1, 4))[0]
        insts.append(
            GarbledInstance(
                seed=seed,
                input_labels=[GarbledWire(l, l ^ delta) for l in labels],
                output_label=GarbledWire(out_l0, out_l0 ^ delta),
                true_wire=GarbledWire(rng.true_label0, rng.true_label0 ^ delta),
                false_wire=GarbledWire(rng.false_label0, rng.false_label0 ^ delta),
                ciphertext_hash=np.asarray(digests[i]).tobytes(),
            )
        )
    return insts


class GroupedGarbler:
    """Garbles ``total`` instances as one grouped batch; keeps only seeds,
    label pairs, and the 16-byte stream digests (ciphertexts reproducible
    from seeds, exactly the reference's checkpoint story)."""

    def __init__(self, runner: GroupedRunner, config: Config,
                 seeds: list[int] | None = None):
        self.runner = runner
        self.config = config
        self.seeds = seeds or [secrets.randbits(64) for _ in range(config.total)]
        assert len(self.seeds) == config.total
        self.instances: list[GarbledInstance] = []

    def create(self) -> None:
        B = self.config.total
        rngs = [GarblerRng(s) for s in self.seeds]
        l0, delta, f0, t0 = _garble_args(rngs, self.runner.n_inputs)
        ex = self.runner.executor(batch=B if B > 1 else None)
        if B == 1:
            l0, delta, f0, t0 = l0[0], delta[0], f0[0], t0[0]
        outw, _, digest = ex.garble(l0, delta, f0, t0, ct_handler=None, commit=True)
        digest = np.asarray(digest).reshape(B, 4)
        outw = np.asarray(outw).reshape(B, -1, 4)
        self.instances = _instances_from(self.seeds, outw, digest, self.runner.n_inputs)

    def commit(self) -> list[GarbledInstanceCommit]:
        return [GarbledInstanceCommit.of(inst) for inst in self.instances]

    def open_commit(self, finalize_indices: list[int]) -> dict[int, int]:
        """Reveal seeds of the non-finalized (opened) instances.  Finalized
        ciphertexts are NOT streamed here — they materialize group-by-group
        during the fused finalize_evaluate, consumed on device."""
        finalize = set(finalize_indices)
        return {
            i: inst.seed
            for i, inst in enumerate(self.instances)
            if i not in finalize
        }


class GroupedEvaluator(Evaluator):
    """Challenge selection inherited; opened-instance auditing and finalized
    evaluation re-mapped to the grouped runtime."""

    def check_opened(self, runner: GroupedRunner, open_seeds: dict[int, int]) -> None:
        expected_open = [
            i for i in range(self.config.total) if i not in self.to_finalize
        ]
        if sorted(open_seeds.keys()) != expected_open:
            raise ConsistencyError(
                f"opened indices {sorted(open_seeds)} != expected {expected_open}"
            )
        if not expected_open:
            return
        idxs = sorted(open_seeds)
        seeds = [open_seeds[i] for i in idxs]
        B = len(seeds)
        rngs = [GarblerRng(s) for s in seeds]
        l0, delta, f0, t0 = _garble_args(rngs, runner.n_inputs)
        ex = runner.executor(batch=B if B > 1 else None)
        if B == 1:
            l0, delta, f0, t0 = l0[0], delta[0], f0[0], t0[0]
        outw, _, digest = ex.garble(l0, delta, f0, t0, ct_handler=None, commit=True)
        insts = _instances_from(
            seeds,
            np.asarray(outw).reshape(B, -1, 4),
            np.asarray(digest).reshape(B, 4),
            runner.n_inputs,
        )
        for k, i in enumerate(idxs):
            if GarbledInstanceCommit.of(insts[k]) != self.commits[i]:
                raise ConsistencyError(f"opened instance {i}: commit mismatch")

    def evaluate_finalized(
        self,
        runner: GroupedRunner,
        garbler: GroupedGarbler,
        index: int,
        input_wires: list[EvaluatedWire],
        true_label: int,
        false_label: int,
    ) -> EvaluatedWire:
        """Full consistency-checked finalized evaluation
        (evaluator.rs:338-477), fused with the garbler's re-garble so the
        stream is consumed on device.  ``garbler`` stands in for the
        channel: the walker holds both parties' arenas."""
        commit = self.commits[index]
        if commit_label(true_label) != commit.true_constant_commit:
            raise ConsistencyError(f"instance {index}: TRUE constant commit mismatch")
        if commit_label(false_label) != commit.false_constant_commit:
            raise ConsistencyError(f"instance {index}: FALSE constant commit mismatch")
        for k, ew in enumerate(input_wires):
            lc = commit.input_labels_commit[k]
            if commit_label(ew.active_label) != lc.commit_for_value(ew.value):
                raise ConsistencyError(
                    f"instance {index}: input label {k} does not match commit"
                )

        seed = garbler.instances[index].seed
        rng = GarblerRng(seed)
        l0_ints = [rng.issue_label0() for _ in range(runner.n_inputs)]
        bits = np.asarray([int(w.value) for w in input_wires], dtype=np.uint8)
        res = runner.executor().garble_evaluate_2pc(
            words_from_int_array(l0_ints),
            bits,
            words_from_int(rng.delta),
            words_from_int(rng.false_label0),
            words_from_int(rng.true_label0),
            eval_active=words_from_int_array(
                [w.active_label for w in input_wires]
            ),
            eval_false_active=words_from_int(false_label),
            eval_true_active=words_from_int(true_label),
        )
        # the protocol's finalized-stream-hash check: the digest of the
        # stream the evaluator consumed must equal the pre-challenge commit
        if np.asarray(res["evaluate_digest"]).tobytes() != commit.ciphertext_commit:
            raise ConsistencyError(f"instance {index}: ciphertext digest mismatch")
        out_label = int_array_from_words(
            np.asarray(res["out_active"]).reshape(-1, 4)
        )[0]
        out_value = bool(np.asarray(res["out_bits"]).reshape(-1)[0])
        want = (
            commit.output_label1_commit
            if out_value
            else commit.output_label0_commit
        )
        if commit_label(out_label) != want:
            raise ConsistencyError(f"instance {index}: output label commit mismatch")
        return EvaluatedWire(out_label, out_value)

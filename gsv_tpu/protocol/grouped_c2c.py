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
    """Pairs a GroupPlan with cached per-batch GroupExecutors.

    ``batch_bucket``: round every phase's batch UP to this size (padding
    with throwaway instances) so create / re-garble audit / finalized
    evaluation all dispatch the SAME compiled (mode, batch) programs —
    each distinct batch size otherwise costs its own 82-program remote
    compile fill.  ``arena_size`` is forwarded to the executors for the
    same reason across *plans* (see GroupExecutor).
    """

    def __init__(self, gplan, hasher: str = "aes", mesh=None,
                 batch_bucket: int | None = None,
                 arena_size: int | None = None):
        self.gplan = gplan
        self.n_inputs = gplan.n_inputs
        self.hasher = hasher
        self.mesh = mesh  # optional instances-axis Mesh (SPMD batched passes)
        self.batch_bucket = batch_bucket
        self.arena_size = arena_size
        self._ex: dict = {}

    def bucket(self, n: int) -> int:
        """Effective batch for a phase that needs ``n`` live instances."""
        return max(n, self.batch_bucket or 0)

    def executor(self, batch: int | None = None) -> GroupExecutor:
        ex = self._ex.get(batch)
        if ex is None:
            ex = GroupExecutor(
                self.gplan, batch=batch, hasher=self.hasher, mesh=self.mesh,
                arena_size=self.arena_size,
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


_FILLER_SEED = 0xF111E0_5EED  # deterministic throwaway-instance seeds


def _pad_seeds(seeds: list[int], bucket: int) -> list[int]:
    """Pad a phase's seed list to the runner's batch bucket with filler
    instances (garbled and discarded) so the phase reuses the bucket-batch
    compiled programs instead of forcing a new (mode, batch) compile fill."""
    pad = bucket - len(seeds)
    return list(seeds) + [_FILLER_SEED + i for i in range(pad)]


def _batched_garble(runner: GroupedRunner, seeds: list[int]):
    """Commit-garble ``seeds`` at the runner's batch bucket; returns
    (outw, digest) sliced back to ``len(seeds)`` rows."""
    n = len(seeds)
    B = runner.bucket(n)
    rngs = [GarblerRng(s) for s in _pad_seeds(seeds, B)]
    l0, delta, f0, t0 = _garble_args(rngs, runner.n_inputs)
    ex = runner.executor(batch=B if B > 1 else None)
    if B == 1:
        l0, delta, f0, t0 = l0[0], delta[0], f0[0], t0[0]
    outw, _, digest = ex.garble(l0, delta, f0, t0, ct_handler=None, commit=True)
    return (
        np.asarray(outw).reshape(B, -1, 4)[:n],
        np.asarray(digest).reshape(B, 4)[:n],
    )


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
        outw, digest = _batched_garble(self.runner, self.seeds)
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
        outw, digest = _batched_garble(runner, seeds)
        insts = _instances_from(seeds, outw, digest, runner.n_inputs)
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
        B = runner.bucket(1)
        rngs = [GarblerRng(s) for s in _pad_seeds([seed], B)]
        l0, delta, f0, t0 = _garble_args(rngs, runner.n_inputs)
        bits = np.zeros((B, runner.n_inputs), np.uint8)
        bits[0] = [int(w.value) for w in input_wires]
        # lane 0 evaluates the protocol-received actives; filler lanes
        # self-select (label0 ^ bit*delta) and are discarded
        ea = l0 ^ (bits[..., None].astype(np.uint32) * delta[:, None, :])
        ea[0] = words_from_int_array([w.active_label for w in input_wires])
        efa, eta = f0.copy(), t0 ^ delta
        efa[0] = words_from_int(false_label)
        eta[0] = words_from_int(true_label)
        if B == 1:
            l0, delta, f0, t0 = l0[0], delta[0], f0[0], t0[0]
            bits, ea, efa, eta = bits[0], ea[0], efa[0], eta[0]
        res = runner.executor(batch=B if B > 1 else None).garble_evaluate_2pc(
            l0, bits, delta, f0, t0,
            eval_active=ea, eval_false_active=efa, eval_true_active=eta,
        )
        # the protocol's finalized-stream-hash check: the digest of the
        # stream the evaluator consumed must equal the pre-challenge commit
        dig = np.asarray(res["evaluate_digest"]).reshape(B, 4)[0]
        if dig.tobytes() != commit.ciphertext_commit:
            raise ConsistencyError(f"instance {index}: ciphertext digest mismatch")
        out_label = int_array_from_words(
            np.asarray(res["out_active"]).reshape(B, -1, 4)[0]
        )[0]
        out_value = bool(np.asarray(res["out_bits"]).reshape(B, -1)[0, 0])
        want = (
            commit.output_label1_commit
            if out_value
            else commit.output_label0_commit
        )
        if commit_label(out_label) != want:
            raise ConsistencyError(f"instance {index}: output label commit mismatch")
        return EvaluatedWire(out_label, out_value)

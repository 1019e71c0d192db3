"""Cut-and-choose protocol: batched garbler, evaluator, commitments.

Reference parity: ``src/cut_and_choose/`` — N independently-seeded garbled
instances; the evaluator randomly selects ``to_finalize`` to evaluate and the
rest are *opened*: their seeds are revealed and re-garbled to check every
commitment (the protocol's byzantine-fault detection, SURVEY §5).

TPU-first redesign: instead of a pinned rayon pool garbling instances on
separate cores (cut_and_choose/mod.rs:131-186), instances are a **batch
axis** — one vmapped plan execution garbles all instances simultaneously,
and re-garbling batches the opened subset the same way.  Seeds remain the
checkpoint/replication story: a garbled instance is fully reproducible from
its u64 seed, so only (seed, commit) pairs ever persist.

Commitments (cut_and_choose/garbler.rs:60-141): AES_static(label) per input
label pair, output label0/label1, the two constant labels, and the running
AES hash of the ciphertext stream.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass, field

import numpy as np

from gsv_tpu.core.labels import s_to_bytes, words_from_int
from gsv_tpu.core.rng import GarblerRng
from gsv_tpu.circuit.ciphertext import CollectHandler, HashHandler, TeeHandler
from gsv_tpu.circuit.streaming import CircuitRunner, EvaluatedWire, GarbledWire
from gsv_tpu.ops.aes_host import Aes128

_AES = Aes128()


def commit_label(label: int) -> bytes:
    """AES-128 of the label under the static key (AesLabelCommitHasher)."""
    return _AES.encrypt_block(s_to_bytes(label))


@dataclass
class LabelCommit:
    commit_label0: bytes
    commit_label1: bytes

    @classmethod
    def of(cls, gw: GarbledWire) -> "LabelCommit":
        return cls(commit_label(gw.label0), commit_label(gw.label1))

    def commit_for_value(self, bit: bool) -> bytes:
        return self.commit_label1 if bit else self.commit_label0


@dataclass
class GarbledInstanceCommit:
    ciphertext_commit: bytes
    input_labels_commit: list[LabelCommit]
    output_label1_commit: bytes
    output_label0_commit: bytes
    true_constant_commit: bytes
    false_constant_commit: bytes

    @classmethod
    def of(cls, instance: "GarbledInstance") -> "GarbledInstanceCommit":
        return cls(
            ciphertext_commit=instance.ciphertext_hash,
            input_labels_commit=[LabelCommit.of(gw) for gw in instance.input_labels],
            output_label1_commit=commit_label(instance.output_label.label1),
            output_label0_commit=commit_label(instance.output_label.label0),
            true_constant_commit=commit_label(instance.true_wire.select(True)),
            false_constant_commit=commit_label(instance.false_wire.select(False)),
        )


@dataclass
class GarbledInstance:
    seed: int
    input_labels: list[GarbledWire]
    output_label: GarbledWire
    true_wire: GarbledWire
    false_wire: GarbledWire
    ciphertext_hash: bytes


@dataclass
class Config:
    total: int
    to_finalize: int

    def __post_init__(self):
        assert self.to_finalize <= self.total


class ConsistencyError(Exception):
    pass


def _instance_from_batch(runner: CircuitRunner, seed: int, outw_i, hash_i: bytes) -> GarbledInstance:
    from gsv_tpu.core.labels import int_array_from_words

    rng = GarblerRng(seed)
    input_labels = [rng.issue_label0() for _ in range(runner.n_inputs)]
    delta = rng.delta
    out_l0 = int_array_from_words(outw_i)[0]
    return GarbledInstance(
        seed=seed,
        input_labels=[GarbledWire(l, l ^ delta) for l in input_labels],
        output_label=GarbledWire(out_l0, out_l0 ^ delta),
        true_wire=GarbledWire(rng.true_label0, rng.true_label0 ^ delta),
        false_wire=GarbledWire(rng.false_label0, rng.false_label0 ^ delta),
        ciphertext_hash=hash_i,
    )


class Garbler:
    """Garbles ``total`` instances as one batch (garbler.rs:173-242)."""

    def __init__(self, runner: CircuitRunner, config: Config, seeds: list[int] | None = None, mesh=None):
        self.runner = runner
        self.config = config
        self.seeds = seeds or [secrets.randbits(64) for _ in range(config.total)]
        assert len(self.seeds) == config.total
        self.instances: list[GarbledInstance] = []
        self.mesh = mesh  # optional instances-axis Mesh: shard garbling SPMD

    def create(self) -> None:
        """Garble all instances batched; keep labels + ciphertext hashes only
        (ciphertexts are reproducible from seeds)."""
        hasher = HashHandler(batch=self.config.total)
        outw, handler, _rngs = self.runner.garble_batch(
            self.seeds, ct_handler=hasher, mesh=self.mesh
        )
        hashes = hasher.finalize()
        self.instances = [
            _instance_from_batch(self.runner, s, outw[i], hashes[i])
            for i, s in enumerate(self.seeds)
        ]

    def commit(self) -> list[GarbledInstanceCommit]:
        return [GarbledInstanceCommit.of(inst) for inst in self.instances]

    def open_commit(self, finalize_indices: list[int]):
        """Reveal seeds for opened instances; re-garble the finalized ones
        streaming their ciphertexts (garbler.rs:259-319).

        Returns (open_seeds: {index: seed}, regarble(ct_handler_factory)) —
        the caller invokes ``regarble`` with a factory mapping instance index
        to a ciphertext handler to drive the streams.
        """
        finalize = set(finalize_indices)
        open_seeds = {
            i: inst.seed for i, inst in enumerate(self.instances) if i not in finalize
        }

        def regarble(handler_factory):
            idxs = sorted(finalize)
            if not idxs:
                return
            handlers = {i: handler_factory(i) for i in idxs}

            class _Demux:
                def __call__(self, block):
                    block = np.asarray(block)
                    for k, i in enumerate(idxs):
                        handlers[i](block[k])

            seeds = [self.instances[i].seed for i in idxs]
            if len(idxs) == 1:
                h = handlers[idxs[0]]
                self.runner.garble(seeds[0], ct_handler=lambda blk: h(np.asarray(blk)))
            else:
                self.runner.garble_batch(seeds, ct_handler=_Demux())
            return handlers

        return open_seeds, regarble


class Evaluator:
    """Chooses instances, checks opened ones, evaluates finalized ones
    (evaluator.rs:24-477)."""

    def __init__(self, rng, config: Config, commits: list[GarbledInstanceCommit]):
        self.config = config
        self.commits = commits
        # Fisher-Yates sample without replacement (evaluator.rs:45-70)
        idxs = list(range(config.total))
        for i in range(len(idxs) - 1, 0, -1):
            j = rng.randrange(0, i + 1)
            idxs[i], idxs[j] = idxs[j], idxs[i]
        self.to_finalize = sorted(idxs[: config.to_finalize])

    def check_opened(self, runner: CircuitRunner, open_seeds: dict[int, int]) -> None:
        """Re-garble opened instances from their revealed seeds and compare
        the full commitment (evaluator.rs:83-181)."""
        expected_open = [i for i in range(self.config.total) if i not in self.to_finalize]
        if sorted(open_seeds.keys()) != expected_open:
            raise ConsistencyError(
                f"opened indices {sorted(open_seeds)} != expected {expected_open}"
            )
        if not expected_open:
            return
        idxs = sorted(open_seeds)
        seeds = [open_seeds[i] for i in idxs]
        hasher = HashHandler(batch=len(idxs)) if len(idxs) > 1 else HashHandler()
        if len(idxs) == 1:
            res = runner.garble(seeds[0], ct_handler=hasher)
            hashes = [hasher.finalize()]
            outw = None
            insts = [_instance_from_batch(runner, seeds[0],
                                          _gw_words(res.output_value[0].label0),
                                          hashes[0])]
        else:
            outw, handler, _ = runner.garble_batch(seeds, ct_handler=hasher)
            hashes = hasher.finalize()
            insts = [
                _instance_from_batch(runner, s, outw[k], hashes[k])
                for k, s in enumerate(seeds)
            ]
        for k, i in enumerate(idxs):
            if GarbledInstanceCommit.of(insts[k]) != self.commits[i]:
                raise ConsistencyError(f"opened instance {i}: commit mismatch")

    def check_finalized_stream_hash(self, index: int, stream_hash: bytes) -> None:
        if stream_hash != self.commits[index].ciphertext_commit:
            raise ConsistencyError(f"instance {index}: ciphertext hash mismatch")

    def evaluate(
        self,
        runner: CircuitRunner,
        index: int,
        input_wires: list[EvaluatedWire],
        true_label: int,
        false_label: int,
        ct_source,
    ) -> EvaluatedWire:
        """Full consistency-checked evaluation (evaluator.rs:338-477)."""
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
        res = runner.evaluate(input_wires, true_label, false_label, ct_source)
        out = res.output_value[0]
        want = (
            commit.output_label1_commit if out.value else commit.output_label0_commit
        )
        if commit_label(out.active_label) != want:
            raise ConsistencyError(f"instance {index}: output label commit mismatch")
        return out


def _gw_words(label0: int):
    return words_from_int(label0)[None, :]

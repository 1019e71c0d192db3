"""File spool round-trip: FileHandler → FileSource with bounded memory.

Reference parity: ``FileCiphertextHandler`` / ``FileSource``
(cut_and_choose/ciphertext_repository.rs:52-160,
circuit/ciphertext_source.rs:36-107) — streaming 16-byte records through a
fixed-size buffer, hashing while reading/writing.
"""

import os

import numpy as np

from gsv_tpu.circuit.ciphertext import FileHandler, FileSource
from gsv_tpu.circuit.streaming import CircuitRunner, EvaluatedWire
from gsv_tpu.gadgets import bigint as bi
from gsv_tpu.gadgets.bigint import BigIntWires
from gsv_tpu.ops.aes_host import AesAccumulatingHash

N = 16


def _circ(ctx, ins):
    a = BigIntWires(ins[:N])
    b = BigIntWires(ins[N:])
    prod = bi.mul(ctx, a, b)
    return [bi.equal_constant(ctx, prod, b=391 * 17), prod.bits[0]]


def test_spool_and_replay_bounded_window(tmp_path):
    path = str(tmp_path / "gc_0.bin")
    # small flatten_max → many plan steps → many small forward reads,
    # exercising the windowed path instead of one whole-stream request
    runner = CircuitRunner(_circ, 2 * N, flatten_max=512)

    fh = FileHandler(path)
    res = runner.garble(31, ct_handler=fh)
    garbler_digest = fh.finalize()
    n_records = fh.count
    assert os.path.getsize(path) == 16 * n_records

    # evaluate from the spool through a window far smaller than the file,
    # proving the old read-whole-file path is gone
    src = FileSource(path, buffer_bytes=1024)  # 64-record window
    max_window = 0
    orig_call = FileSource.__call__

    def tracking_call(self, base, count):
        nonlocal max_window
        out = orig_call(self, base, count)
        max_window = max(max_window, len(self._buf))
        return out

    FileSource.__call__ = tracking_call
    try:
        x, y = 391, 17
        bits = [bool((x >> i) & 1) for i in range(N)] + [
            bool((y >> i) & 1) for i in range(N)
        ]
        inputs = [
            EvaluatedWire(gw.select(b), b)
            for gw, b in zip(res.input_wire_values, bits)
        ]
        eres = runner.evaluate(
            inputs,
            res.true_wire_constant.label1,
            res.false_wire_constant.label0,
            ct_source=src,
        )
    finally:
        FileSource.__call__ = orig_call

    assert [w.value for w in eres.output_value] == [True, True]
    # hash-while-reading digest matches the garbler's hash-while-writing one
    assert src.accumulated_hash() == garbler_digest
    # bounded memory: window stayed well under the full stream
    assert n_records > 200
    assert max_window < n_records // 2, (max_window, n_records)
    src.close()


def test_file_source_forward_only(tmp_path):
    path = str(tmp_path / "s.bin")
    data = os.urandom(16 * 100)
    with open(path, "wb") as f:
        f.write(data)
    src = FileSource(path, buffer_bytes=16 * 8)
    a = np.asarray(src(0, 4)).copy()
    b = np.asarray(src(50, 8)).copy()
    assert a.shape == (4, 4) and b.shape == (8, 4)
    try:
        src(10, 2)
    except ValueError as e:
        assert "forward-only" in str(e)
    else:
        raise AssertionError("expected forward-only rejection")
    # digest equals a one-shot chain over the whole file
    h = AesAccumulatingHash()
    h.update(data)
    assert src.accumulated_hash() == h.finalize()
    src.close()

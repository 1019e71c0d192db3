"""2PC protocol layer: garbled Groth16 encodings and cut-and-choose.

Reference parity: ``src/garbled_groth16.rs``, ``src/cut_and_choose/``.
"""

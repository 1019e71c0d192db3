"""Crypto kernels: fixed-key AES-128 tweakable gate hash (host oracle,
bitsliced JAX, Pallas TPU), BLAKE3, accumulating ciphertext hash.

Reference parity: ``src/hashers/`` (mod.rs, aes_ni.rs), ``src/ciphertext_hasher.rs``.
"""

"""Gadget library: boolean-circuit building blocks.

Reference parity: ``src/gadgets/`` — basic cells, u254 bigint arithmetic,
the BN254 field tower, curve operations, pairing, and the Groth16 verifier.
Gate emission order mirrors the reference gadget-for-gadget, because gate
ids feed AES tweaks and ciphertext stream order (bit-exactness).
"""

"""BN254 circuit gadgets: 254-bit fields, tower extensions, curves, pairing.

Reference parity: ``src/gadgets/bn254/``.
"""

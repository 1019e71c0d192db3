"""Host-side Groth16 over BN254: setup / prove / verify + test fixtures.

Replaces arkworks' ``ark-groth16`` for the roles the reference uses it in:
generating deterministic proof fixtures (the ``DummyCircuit`` a*b=c with
padded constraints, ``src/gadgets/groth16.rs:541-572``), computing
verifying-key preprocessing for the in-circuit verifier, and acting as the
correctness oracle.

The trusted setup keeps tau in memory ("simulation" setup), so the prover can
evaluate h(tau)t(tau)/delta directly — proofs are distributed identically to
CRS-based proving and verify with the standard equation:

    e(A, B) = e(alpha, beta) * e(sum_i x_i * gamma_abc_i, gamma) * e(C, delta)
"""

from __future__ import annotations

from dataclasses import dataclass

from gsv_tpu.bn254_host.curve import G1, G2, g1_gen, g2_gen
from gsv_tpu.bn254_host.field import Fr, R
from gsv_tpu.bn254_host.pairing import multi_pairing, pairing


@dataclass
class R1CS:
    """Constraints (A, B, C) as sparse dicts var_index -> coeff.

    Variable order: [one, public..., witness...] (arkworks convention).
    """

    num_public: int  # excluding the leading `one`
    num_vars: int  # total including `one`
    constraints: list[tuple[dict, dict, dict]]


@dataclass
class VerifyingKey:
    alpha_g1: G1
    beta_g2: G2
    gamma_g2: G2
    delta_g2: G2
    gamma_abc_g1: list[G1]

    def to_key_bytes(self) -> bytes:
        parts = [self.alpha_g1.to_compressed(), self.beta_g2.to_compressed(),
                 self.gamma_g2.to_compressed(), self.delta_g2.to_compressed()]
        parts += [p.to_compressed() for p in self.gamma_abc_g1]
        return b"".join(parts)


@dataclass
class ProvingKey:
    vk: VerifyingKey
    # simulation trapdoor (kept host-side only; never enters circuits)
    tau: Fr
    alpha: Fr
    beta: Fr
    gamma: Fr
    delta: Fr
    r1cs: R1CS
    domain_size: int


@dataclass
class Proof:
    a: G1
    b: G2
    c: G1


def _domain(n_constraints: int) -> tuple[int, Fr]:
    n = 1
    while n < n_constraints + 1:
        n *= 2
    # generator of the size-n subgroup of Fr*
    g = Fr(5).pow((R - 1) // n)
    assert g.pow(n) == Fr(1) and g.pow(n // 2) != Fr(1)
    return n, g


def _qap_evals(r1cs: R1CS, tau: Fr, n: int, omega: Fr):
    """u_i(tau), v_i(tau), w_i(tau) for all variables, plus t(tau).

    Lagrange over the radix-2 domain: L_j(tau) = (tau^n - 1) omega^j /
    (n (tau - omega^j)).
    """
    zt = tau.pow(n) - Fr(1)
    n_inv = Fr(n).inv()
    m = r1cs.num_vars
    u = [Fr(0)] * m
    v = [Fr(0)] * m
    w = [Fr(0)] * m
    wj = Fr(1)
    for j, (A, B, C) in enumerate(r1cs.constraints):
        wj = omega.pow(j)
        lj = zt * wj * n_inv * (tau - wj).inv()
        for idx, coeff in A.items():
            u[idx] = u[idx] + coeff * lj
        for idx, coeff in B.items():
            v[idx] = v[idx] + coeff * lj
        for idx, coeff in C.items():
            w[idx] = w[idx] + coeff * lj
    return u, v, w, zt


def setup(r1cs: R1CS, rng) -> ProvingKey:
    tau = Fr(rng.randrange(1, R))
    alpha = Fr(rng.randrange(1, R))
    beta = Fr(rng.randrange(1, R))
    gamma = Fr(rng.randrange(1, R))
    delta = Fr(rng.randrange(1, R))
    n, omega = _domain(len(r1cs.constraints))
    u, v, w, _ = _qap_evals(r1cs, tau, n, omega)
    g1, g2 = g1_gen(), g2_gen()
    ginv = gamma.inv()
    gamma_abc = [
        g1.mul((beta * u[i] + alpha * v[i] + w[i]) * ginv)
        for i in range(r1cs.num_public + 1)
    ]
    vk = VerifyingKey(
        alpha_g1=g1.mul(alpha),
        beta_g2=g2.mul(beta),
        gamma_g2=g2.mul(gamma),
        delta_g2=g2.mul(delta),
        gamma_abc_g1=gamma_abc,
    )
    return ProvingKey(vk, tau, alpha, beta, gamma, delta, r1cs, n)


def prove(pk: ProvingKey, assignment: list[Fr], rng) -> Proof:
    """``assignment``: full variable vector [1, publics..., witnesses...]."""
    r1cs = pk.r1cs
    assert len(assignment) == r1cs.num_vars
    n, omega = pk.domain_size, _domain(len(r1cs.constraints))[1]
    u, v, w, zt = _qap_evals(r1cs, pk.tau, n, omega)

    ua = sum((a * u[i] for i, a in enumerate(assignment)), Fr(0))
    va = sum((a * v[i] for i, a in enumerate(assignment)), Fr(0))
    wa = sum((a * w[i] for i, a in enumerate(assignment)), Fr(0))
    ht = ua * va - wa  # = h(tau) * t(tau)

    r = Fr(rng.randrange(0, R))
    s = Fr(rng.randrange(0, R))
    dinv = pk.delta.inv()

    a_scalar = pk.alpha + ua + r * pk.delta
    b_scalar = pk.beta + va + s * pk.delta
    priv = sum(
        (
            assignment[i] * (pk.beta * u[i] + pk.alpha * v[i] + w[i])
            for i in range(r1cs.num_public + 1, r1cs.num_vars)
        ),
        Fr(0),
    )
    c_scalar = (priv + ht) * dinv + a_scalar * s + r * b_scalar - r * s * pk.delta

    g1, g2 = g1_gen(), g2_gen()
    return Proof(a=g1.mul(a_scalar), b=g2.mul(b_scalar), c=g1.mul(c_scalar))


def verify(vk: VerifyingKey, proof: Proof, public_inputs: list[Fr]) -> bool:
    assert len(public_inputs) == len(vk.gamma_abc_g1) - 1
    acc = vk.gamma_abc_g1[0]
    for x, base in zip(public_inputs, vk.gamma_abc_g1[1:]):
        acc = acc + base.mul(x)
    lhs = pairing(proof.a, proof.b)
    rhs = multi_pairing(
        [
            (vk.alpha_g1, vk.beta_g2),
            (acc, vk.gamma_g2),
            (proof.c, vk.delta_g2),
        ]
    )
    return lhs == rhs


# ----------------------------------------------------------------------
# The reference's deterministic test fixture
# ----------------------------------------------------------------------


def dummy_circuit(a: Fr, b: Fr, num_variables: int = 10, num_constraints: int = 64):
    """``DummyCircuit`` (groth16.rs:541-572): witnesses a, b (+ padding),
    public input c = a*b, (num_constraints-1) copies of a*b=c plus one empty
    constraint.  Returns (r1cs, assignment, public_inputs)."""
    c = a * b
    # vars: [one, c, a, b, padding...]
    num_wit = num_variables - 1  # a, b, padding (arkworks counts a,b,c + pads)
    r1cs_vars = 2 + num_wit  # one + public c + witnesses
    A_IDX, B_IDX, C_IDX = 2, 3, 1  # a, b witnesses; c public
    constraints = []
    for _ in range(num_constraints - 1):
        constraints.append(({A_IDX: Fr(1)}, {B_IDX: Fr(1)}, {C_IDX: Fr(1)}))
    constraints.append(({}, {}, {}))  # the empty constraint
    r1cs = R1CS(num_public=1, num_vars=r1cs_vars, constraints=constraints)
    assignment = [Fr(1), c, a, b] + [a] * (num_wit - 2)
    return r1cs, assignment, [c]


def dummy_proof(k: int = 6, seed: int = 0):
    """Deterministic fixture: setup+prove the DummyCircuit with 2^k constraints.

    Returns (vk, proof, public_inputs).
    """
    import random

    rng = random.Random(seed)
    a = Fr(rng.randrange(1, R))
    b = Fr(rng.randrange(1, R))
    r1cs, assignment, publics = dummy_circuit(a, b, 10, 1 << k)
    pk = setup(r1cs, rng)
    proof = prove(pk, assignment, rng)
    return pk.vk, proof, publics

"""Search for the reference's literal ATE_LOOP_COUNT digit array.

Background (VERDICT r1 Missing #1): our traced verifier (uncompressed k=6) is
10,683,587,487 gates; the reference's published per-instance figure is
11,174,708,821 (README.md:12, examples/groth16_cut_and_choose.rs:83).  The
validated cost model shows weight-33 signed-digit arrays for 6x+2 land within
0.02% of that figure, while ours (the classic weight-26 pseudo-binary
expansion) is 491M short — i.e. ark-bn254's literal ATE_LOOP_COUNT has 32
add-steps below the top digit, not 25.

This script enumerates ALL signed-digit representations of 6x+2 (digits in
{-1,0,1}) of a given (length, weight) via carry DP, evaluates the exact model
total for each with a fast (constant-folded) variant of ref_cost_model, and
prints arrays whose total equals the published figure exactly.  The published
total acts as a strong checksum: every candidate changes the host-computed
line-coefficient constants, whose popcounts shift the total by ~1e5-1e6.

Usage: python scripts/ate_search.py [--target 11174708821] [--weight 33]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import importlib

hp = importlib.import_module("gsv_tpu.bn254_host.pairing")
import scripts.ref_cost_model as m
from gsv_tpu.bn254_host.groth16 import dummy_proof

N_6X2 = 6 * hp.BN_X + 2


# ---------------------------------------------------------------- fast model
# Pre-measure every sub-gadget whose gate cost does not depend on the digit
# array, then patch them with constant adders.  What remains data-dependent:
# ell_by_constant_montgomery (host line-coeff constants change per array) and
# the loop structure itself.

CONST_FNS = [
    "fq12_square",
    "ell_montgomery",
    "g2_double_in_place",
    "g2_add_in_place",
    "g2_mul_by_char",
    "g2_neg_evaluate",
    "final_exponentiation",
    "g1_add",
    "projective_to_affine",
]


def _measure_constants(vk, n_public, ab):
    costs = {}
    for name in CONST_FNS:
        m.G.total = 0
        getattr(m, name)()
        costs[name] = m.G.total
    m.G.total = 0
    m.g1_msm(n_public, w=10)
    costs["g1_msm"] = m.G.total
    m.G.total = 0
    m.fq12_equal_constant(ab)
    costs["fq12_equal_constant"] = m.G.total
    return costs


def make_fast_total(vk, publics, ab):
    costs = _measure_constants(vk, len(publics), ab)
    originals = {name: getattr(m, name) for name in CONST_FNS}

    # extra O(1) leaf folds (all genuinely data-independent costs)
    m.G.total = 0
    m.fq_montgomery_reduce()
    reduce_cost = m.G.total
    bi_add_cost = {n: 2 + 5 * (n - 1) for n in range(1, 600)}
    extra_orig = {
        "fq_montgomery_reduce": m.fq_montgomery_reduce,
        "bi_mul_by_constant": m.bi_mul_by_constant,
        "fq_mul": m.fq_mul,
        "fq_square": m.fq_square,
    }
    fq_mul_cost = 414_284

    def patch():
        for name in CONST_FNS:
            c = costs[name]
            setattr(m, name, (lambda c=c: m.G.add(c)))
        m.fq_montgomery_reduce = lambda: m.G.add(reduce_cost)
        m.bi_mul_by_constant = lambda n, c: m.G.add(m.pop(c) * bi_add_cost[n])
        m.fq_mul = lambda: m.G.add(fq_mul_cost)
        m.fq_square = lambda: m.G.add(fq_mul_cost)

    def unpatch():
        for name, fn in originals.items():
            setattr(m, name, fn)
        for name, fn in extra_orig.items():
            setattr(m, name, fn)

    q1 = -vk.gamma_g2
    q2 = -vk.delta_g2

    def fast_total(arr):
        hp.ATE_LOOP_COUNT[:] = arr
        q1ell = hp.ell_coeffs(q1)
        q2ell = hp.ell_coeffs(q2)
        m.G.total = 0
        m.G.add(costs["g1_msm"])
        m.G.add(costs["g1_add"])
        m.G.add(costs["projective_to_affine"])
        m.multi_miller_loop_groth16(q1ell, q2ell)
        m.G.add(costs["final_exponentiation"])
        m.G.add(costs["fq12_equal_constant"])
        return m.G.total

    return patch, unpatch, fast_total


# ---------------------------------------------------------------- enumerator


def enumerate_reps(n, length, weight):
    """Yield all digit arrays (LSB-first, digits in {-1,0,1}, top digit 1)
    with sum(d_i 2^i) == n, len == length, nonzero count == weight."""

    # DP over (position, remaining) counting completions per residual weight,
    # used to prune the DFS to exactly the requested weight.
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def completions(pos, rem):
        """map residual_weight -> count, for digits pos..length-1."""
        if pos == length:
            return {0: 1} if rem == 0 else {}
        out = {}
        if rem % 2 == 0:
            for w, c in completions(pos + 1, rem // 2).items():
                out[w] = out.get(w, 0) + c
        else:
            for d in (1, -1):
                for w, c in completions(pos + 1, (rem - d) // 2).items():
                    out[w + 1] = out.get(w + 1, 0) + c
        return out

    total = completions(0, n).get(weight, 0)
    yield total  # first yield = count

    digits = [0] * length

    def dfs(pos, rem, w_left):
        if pos == length:
            if rem == 0 and w_left == 0:
                yield list(digits)
            return
        if rem % 2 == 0:
            if completions(pos + 1, rem // 2).get(w_left):
                digits[pos] = 0
                yield from dfs(pos + 1, rem // 2, w_left)
        else:
            for d in (1, -1):
                if completions(pos + 1, (rem - d) // 2).get(w_left - 1):
                    digits[pos] = d
                    yield from dfs(pos + 1, (rem - d) // 2, w_left - 1)
        digits[pos] = 0

    yield from dfs(0, n, weight)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=int, default=11_174_708_821)
    ap.add_argument("--weight", type=int, default=33)
    ap.add_argument("--length", type=int, default=65)
    ap.add_argument("--limit", type=int, default=0, help="stop after N candidates")
    args = ap.parse_args()

    vk, proof, publics = dummy_proof(k=6, seed=0)
    ab = m.hp.multi_pairing([(vk.alpha_g1, -vk.beta_g2)]).inv()

    orig = list(hp.ATE_LOOP_COUNT)
    patch, unpatch, fast_total = make_fast_total(vk, publics, ab)

    # calibration: fast model must reproduce the full model on the original
    patch()
    try:
        cal = fast_total(orig)
        print(f"calibration (weight-26 array): {cal:,} (expect 10,683,587,487)")
        assert cal == 10_683_587_487, cal

        gen = enumerate_reps(N_6X2, args.length, args.weight)
        count = next(gen)
        print(f"{count:,} candidate arrays at length={args.length} weight={args.weight}")

        t0 = time.time()
        hits = []
        for i, arr in enumerate(gen, 1):
            tot = fast_total(arr)
            if tot == args.target:
                hits.append(list(arr))
                print(f"*** EXACT HIT at candidate {i}: {arr}")
            if i % 500 == 0:
                rate = i / (time.time() - t0)
                print(
                    f"  {i}/{count} ({rate:.0f}/s, eta {((count-i)/rate)/60:.0f}m,"
                    f" {len(hits)} hits)",
                    flush=True,
                )
            if args.limit and i >= args.limit:
                break
        print(f"done: {len(hits)} exact hits")
        for h in hits:
            print(h)
    finally:
        unpatch()
        hp.ATE_LOOP_COUNT[:] = orig


if __name__ == "__main__":
    main()

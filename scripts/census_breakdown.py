"""Decompose the grouped plan's AES-lane padding into its three sources:

  1. narrow-wave padding  — true width < 16 padded up to the 16-lane class
                            quantum (the seg-v3 target: group lanes are
                            S*cn, so cn has no 16-alignment need once S>=16)
  2. wave-class padding   — true width >= 16 padded to its width class
  3. site padding         — padded sites (n_real < S bucket)

Reads the pickled GroupPlan; everything derives from the n_c != -1 padding
sentinel.  Usage: python scripts/census_breakdown.py [plan.pkl]
"""

import pickle
import sys

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from gsv_tpu.circuit.schedule import GroupStep

pkl = sys.argv[1] if len(sys.argv) > 1 else ".gplan_k6_uniform_1048576.pkl"
with open(pkl, "rb") as fh:
    g = pickle.load(fh)

per_tape = {}  # content_key -> (true_lane_sum, class_lane_sum, narrow_pad, wide_pad, n_waves, ct)


def tape_stats(tape):
    ck = tape.content_key
    st = per_tape.get(ck)
    if st is None:
        true_sum = cls_sum = narrow_pad = wide_pad = nw = 0
        for sv in tape.segments:
            nc = sv.n_c if hasattr(sv, "n_c") else sv["n_c"]
            if nc.shape[1] == 0:
                nw += nc.shape[0] if nc.shape[0] else 0
                continue
            widths = (nc != -1).sum(axis=1)  # true nonfree width per wave
            cn = nc.shape[1]
            nw += nc.shape[0]
            true_sum += int(widths.sum())
            cls_sum += cn * nc.shape[0]
            pad = cn - widths
            narrow = widths < 16
            narrow_pad += int(pad[narrow].sum())
            wide_pad += int(pad[~narrow].sum())
        st = (true_sum, cls_sum, narrow_pad, wide_pad, nw, tape.ct_count)
        per_tape[ck] = st
    return st


true_l = cls_l = narrow_l = wide_l = site_l = 0
digest_real = digest_site_pad = digest_ctb_pad = 0
nw_narrow = nw_wide = 0
for st in g.steps:
    if not isinstance(st, GroupStep):
        continue
    S = st.header_maps.shape[0]
    nr = st.n_real
    t_sum, c_sum, n_pad, w_pad, nw, ct = tape_stats(st.tape)
    true_l += nr * t_sum
    cls_l += S * c_sum
    narrow_l += nr * n_pad
    wide_l += nr * w_pad
    site_l += (S - nr) * c_sum
    digest_real += nr * ct
    digest_site_pad += (S - nr) * ct

tot = true_l + narrow_l + wide_l + site_l
assert tot == cls_l, (tot, cls_l)
print(f"plan: {pkl}")
print(f"lanes real     : {true_l/1e9:.2f}B ({true_l/tot:5.1%})")
print(f"lanes narrow-pad: {narrow_l/1e9:.2f}B ({narrow_l/tot:5.1%})  (width<16 -> 16 quantum)")
print(f"lanes wide-pad  : {wide_l/1e9:.2f}B ({wide_l/tot:5.1%})  (>=16 class rounding)")
print(f"lanes site-pad  : {site_l/1e9:.2f}B ({site_l/tot:5.1%})  (S bucket rounding)")
print(f"hash blocks/instance (2x lanes, pre-pad32): {2*tot/1e9:.2f}B")
print(f"digest rows real {digest_real/1e9:.2f}B site-pad {digest_site_pad/1e9:.2f}B")

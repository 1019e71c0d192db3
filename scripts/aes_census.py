import pickle, sys
sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from gsv_tpu.circuit.schedule import GroupStep

with open(".gplan_k6_uniform_1048576.pkl", "rb") as fh:
    g = pickle.load(fh)

hash_blocks = 0   # garble: 2 AES per nonfree lane (padded to 32)
digest_rows = 0   # commit: 1 AES per ct row (padded)
seq_waves = 0
tapes = {}
for st in g.steps:
    if not isinstance(st, GroupStep):
        continue
    S = st.header_maps.shape[0]
    key = (st.tape.content_key, S)
    if key not in tapes:
        hb = db = wv = 0
        for sv in st.tape.segments:  # segment descriptors
            n_waves = sv.f_a.shape[0] if hasattr(sv, "f_a") else sv["f_a"].shape[0]
            cn = (sv.n_a if hasattr(sv, "n_a") else sv["n_a"]).shape[1]
            wv += n_waves
            if cn:
                lanes = 2 * S * cn
                hb += n_waves * ((lanes + 31) // 32) * 32
        db = S * st.tape.ct_count  # padded ct rows per site bucket
        tapes[key] = (hb, db, wv)
    hb, db, wv = tapes[key]
    hash_blocks += hb
    digest_rows += db
    seq_waves += wv
print(f"hash blocks (padded, per instance): {hash_blocks/1e9:.2f}B")
print(f"digest rows (padded, per instance): {digest_rows/1e9:.2f}B")
print(f"sequential waves: {seq_waves/1e6:.1f}M")
tot32 = 32 * (hash_blocks + digest_rows)
print(f"B=32 total AES blocks/pass: {tot32/1e9:.0f}B -> at 0.322B/s = {tot32/0.322e9:.0f}s")
print(f"implied gates/s at that wall: {g.total_gates*32/(tot32/0.322e9)/1e6:.0f}M")

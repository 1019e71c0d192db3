"""Persistent-cache version stamp: detect (and prune) dead entries.

The XLA persistent-cache key hashes jax/jaxlib/libtpu versions, so a
round-boundary re-image that bumps any of them silently turns every
committed ``.jit_cache`` entry into dead weight (r4 round-start finding:
a "filled" cache recompiled everything).  This stamps the current versions
into ``.jit_cache/VERSIONS.json``; on mismatch it prints a loud warning
and, with ``--prune``, deletes the stale entries so the repo does not
carry ~2GB of unreachable artifacts.

Usage: python scripts/check_cache_stamp.py [--prune]
Exit code: 0 = stamp matches (or was just created), 3 = mismatch.
"""

import glob
import json
import os
import sys

sys.path.insert(0, ".")

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jit_cache")
STAMP = os.path.join(CACHE, "VERSIONS.json")


def current() -> dict:
    import importlib.metadata as md

    out = {}
    for p in ("jax", "jaxlib", "libtpu"):
        try:
            out[p] = md.version(p)
        except Exception:
            out[p] = None
    return out


def main() -> int:
    cur = current()
    os.makedirs(CACHE, exist_ok=True)
    if not os.path.exists(STAMP):
        with open(STAMP, "w") as fh:
            json.dump(cur, fh)
        print(f"cache stamp created: {cur}")
        return 0
    with open(STAMP) as fh:
        old = json.load(fh)
    if old == cur:
        print(f"cache stamp OK: {cur}")
        return 0
    print(f"*** CACHE STAMP MISMATCH: committed {old} vs current {cur}")
    print("*** every committed .jit_cache entry is DEAD (key hashes these")
    print("*** versions) — refill via scripts/warm_fill.py (~1h cold)")
    if "--prune" in sys.argv:
        n = 0
        for f in glob.glob(os.path.join(CACHE, "*-cache")):
            os.remove(f)
            n += 1
        print(f"pruned {n} stale entries")
        with open(STAMP, "w") as fh:
            json.dump(cur, fh)
    return 3


if __name__ == "__main__":
    sys.exit(main())

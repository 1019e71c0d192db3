"""Single-instance garble monitor.

Reference parity: ``.scripts/garble_monitor.py:1-31`` — tails the log of one
garbling run (no ``instance=`` tags) and prints throughput + ETA for the
default Groth16 verifier target.

Usage: python scripts/garble_monitor.py <logfile> [--target N] [--window S]
"""

import argparse
import re
import sys
import time

LINE = re.compile(r"garbled?:\s*(?P<count>[\d.]+)(?P<suffix>[kmbt]?) gates")
MULT = {"": 1, "k": 1e3, "m": 1e6, "b": 1e9, "t": 1e12}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logfile")
    ap.add_argument("--target", type=float, default=11_174_708_821)
    ap.add_argument("--window", type=float, default=30.0)
    args = ap.parse_args()

    hist = []
    with open(args.logfile) as f:
        f.seek(0, 2)
        while True:
            where = f.tell()
            line = f.readline()
            if not line:
                time.sleep(0.5)
                f.seek(where)  # clear any latched EOF state
                continue
            m = LINE.search(line)
            if not m:
                continue
            count = float(m.group("count")) * MULT[m.group("suffix") or ""]
            now = time.time()
            hist.append((now, count))
            cutoff = now - args.window
            while len(hist) > 2 and hist[0][0] < cutoff:
                hist.pop(0)
            if len(hist) >= 2:
                dt = hist[-1][0] - hist[0][0]
                dc = hist[-1][1] - hist[0][1]
                rate = dc / dt if dt > 0 else 0
                eta = (args.target - count) / rate if rate > 0 else float("inf")
                sys.stdout.write(
                    f"\r{count/1e9:.2f}B/{args.target/1e9:.2f}B gates "
                    f"{rate/1e6:.0f} Mgates/s ETA {eta:.0f}s    "
                )
                sys.stdout.flush()


if __name__ == "__main__":
    main()

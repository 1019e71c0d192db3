"""Live progress monitor: tails a log and reports per-instance throughput.

Reference parity: ``.scripts/gates_monitor.py`` — parses the runtime's
progress lines (``<phase>: instance=<i> <count> gates``) emitted every 50M
gates by ``gsv_tpu.core.progress``, printing sliding-window rates and ETA
against a target gate count.

Usage: python scripts/gates_monitor.py <logfile> [--target 11174708821]
        [--window 30]
"""

import argparse
import re
import sys
import time

LINE = re.compile(
    r"(?P<phase>garble|regarble|evaluate|execute)d?:\s*(instance=(?P<inst>\d+))?\s*"
    r"(?P<count>[\d.]+)(?P<suffix>[kmbt]?) gates"
)

MULT = {"": 1, "k": 1e3, "m": 1e6, "b": 1e9, "t": 1e12}


def parse_count(m):
    return float(m.group("count")) * MULT[m.group("suffix") or ""]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logfile")
    ap.add_argument("--target", type=float, default=11_174_708_821)
    ap.add_argument("--window", type=float, default=30.0)
    args = ap.parse_args()

    history = {}  # instance -> list of (t, count)
    with open(args.logfile) as f:
        f.seek(0, 2)
        while True:
            line = f.readline()
            if not line:
                time.sleep(0.5)
                continue
            m = LINE.search(line)
            if not m:
                continue
            inst = int(m.group("inst") or 0)
            count = parse_count(m)
            now = time.time()
            hist = history.setdefault(inst, [])
            hist.append((now, count))
            cutoff = now - args.window
            while len(hist) > 2 and hist[0][0] < cutoff:
                hist.pop(0)
            if len(hist) >= 2:
                dt = hist[-1][0] - hist[0][0]
                dc = hist[-1][1] - hist[0][1]
                rate = dc / dt if dt > 0 else 0
                remaining = max(args.target - count, 0)
                eta = remaining / rate if rate > 0 else float("inf")
                sys.stdout.write(
                    f"\r[inst {inst}] {count/1e9:.2f}B/{args.target/1e9:.2f}B gates "
                    f"{rate/1e6:.0f} Mgates/s ETA {eta:.0f}s    "
                )
                sys.stdout.flush()


if __name__ == "__main__":
    main()

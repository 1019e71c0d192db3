"""Progress logging for the billion-gate hot loops.

Reference parity: ``src/core/progress.rs`` — one log line every
``GATE_LOG_STEP = 50_000_000`` gates with k/m/b/t humanized counts, consumed
by the monitor scripts in ``scripts/``.
"""

from __future__ import annotations

import logging
import time

logger = logging.getLogger("gsv_tpu")

GATE_LOG_STEP = 50_000_000


def humanize(n: int) -> str:
    """k/m/b/t formatting, matching ``src/core/progress.rs:8-28``."""
    if n >= 1_000_000_000_000:
        return f"{n / 1_000_000_000_000:.2f}t"
    if n >= 1_000_000_000:
        return f"{n / 1_000_000_000:.2f}b"
    if n >= 1_000_000:
        return f"{n / 1_000_000:.2f}m"
    if n >= 1_000:
        return f"{n / 1_000:.2f}k"
    return str(n)


class ProgressLogger:
    """Logs ``<phase>: <count> gates`` once per GATE_LOG_STEP crossing.

    Unlike the reference's per-gate check, callers report *batches* of gates
    (a wave or a whole template instance); we log once per 50M-boundary
    crossed, tagging the instance like the reference's tracing spans do.
    """

    def __init__(self, phase: str, instance: int | None = None, step: int = GATE_LOG_STEP):
        self.phase = phase
        self.instance = instance
        self.step = step
        self.count = 0
        self._next = step
        self._t0 = time.monotonic()

    def advance(self, n_gates: int) -> None:
        self.count += n_gates
        if self.count >= self._next:
            elapsed = time.monotonic() - self._t0
            rate = self.count / elapsed if elapsed > 0 else 0.0
            tag = f" instance={self.instance}" if self.instance is not None else ""
            logger.info(
                "%s:%s %s gates (%.1fs, %s gates/s)",
                self.phase,
                tag,
                humanize(self.count),
                elapsed,
                humanize(int(rate)),
            )
            while self._next <= self.count:
                self._next += self.step

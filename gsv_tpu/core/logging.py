"""Logging/tracing setup.

Reference parity: ``src/logging.rs:14-39`` — ``init_tracing()`` installs a
compact, ANSI-free formatter with an environment filter.  Here the filter is
``GSV_LOG`` (e.g. ``info``, ``debug``, ``gsv_tpu.circuit=debug``), mirroring
``RUST_LOG`` semantics for the subset we need: a default level plus optional
per-logger overrides, comma-separated.
"""

from __future__ import annotations

import logging
import os
import sys

_INITIALIZED = False


def init_tracing(default: str = "info", stream=None) -> None:
    """Install the compact log format once; later calls are no-ops.

    ``GSV_LOG=warn`` or ``GSV_LOG=info,gsv_tpu.circuit=debug`` style filters.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    _INITIALIZED = True

    spec = os.environ.get("GSV_LOG", default)
    base_level = logging.INFO
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            name, _, lvl = part.partition("=")
            logging.getLogger(name.strip()).setLevel(
                getattr(logging, lvl.strip().upper(), logging.INFO)
            )
        else:
            base_level = getattr(logging, part.upper(), logging.INFO)

    handler = logging.StreamHandler(stream or sys.stderr)
    handler.setFormatter(
        logging.Formatter(
            "%(asctime)s %(levelname).1s %(name)s: %(message)s",
            datefmt="%H:%M:%S",
        )
    )
    root = logging.getLogger("gsv_tpu")
    root.addHandler(handler)
    root.setLevel(base_level)
    root.propagate = False

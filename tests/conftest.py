"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests must be hermetic and multi-chip-sharding-capable without TPU hardware,
so we force the CPU platform with 8 virtual devices.  The driver separately
dry-runs the multi-chip path; benches run on the real chip.

NOTE: this environment injects an ``axon`` PJRT plugin via sitecustomize that
programmatically sets ``jax_platforms="axon,cpu"`` at interpreter start (env
vars alone cannot override it).  ``jax.config.update`` after import wins, so
we do that here — before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The plugin's lazy bind re-asserts jax_platforms="axon,cpu" mid-session,
# which silently moves later tests onto the (single-tenant, tunneled) TPU and
# deadlocks against any running bench.  Remove the axon backend factory
# entirely so tests can never touch it.
try:  # noqa: SIM105
    from jax._src import xla_bridge as _xb

    for _k in list(getattr(_xb, "_backend_factories", {})):
        if "axon" in _k:
            _xb._backend_factories.pop(_k, None)
except Exception:
    pass

"""Boot-time device preflight.

The reference fails fast at boot when its storage is unhealthy
(redb_storage.rs:126-158); this is the accelerator-side analog. On a
network-attached (tunneled) TPU, the very first backend touch —
`jax.devices()` — is a handshake RPC with NO client-side deadline: a
wedged transport blocks it forever, in native code, where even SIGINT
cannot interrupt it. Observed live: `serve` hung >10 minutes with zero
log output, stuck before the (deadline-bounded) warmup could even arm.

`preflight_device` runs that first touch in a daemon thread and bounds
it. On timeout it raises `DeviceUnavailable` with an actionable
message; the abandoned thread keeps blocking harmlessly (daemon) and
its init still lands process-wide if the transport ever recovers.

Once any backend touch has succeeded, `jax.devices()` is memoized and
the preflight costs one no-op thread round-trip (~100 us), so callers
run it unconditionally on every open.
"""

from __future__ import annotations

import logging
import os
import threading
from typing import Optional

from ..errors import DeviceUnavailable

log = logging.getLogger("cortex.device")

#: default handshake deadline. A healthy tunneled backend initializes
#: in ~5-20 s; a local backend in <1 s. 90 s tolerates a congested
#: tunnel without making a wedged one look like a slow boot.
DEFAULT_TIMEOUT_S = 90.0

_ENV_KNOB = "CORTEX_DEVICE_PREFLIGHT_TIMEOUT_S"

# set after the first success: the backend is initialized process-wide,
# so later opens skip even the thread round-trip
_passed = False


def preflight_device(timeout_s: Optional[float] = None) -> None:
    """Bound the first accelerator-backend touch; raise
    `DeviceUnavailable` if it does not complete in time.

    timeout_s defaults to $CORTEX_DEVICE_PREFLIGHT_TIMEOUT_S (90).
    Setting the env var to 0 (or negative) disables the preflight —
    boot then blocks indefinitely on a wedged transport, the
    pre-preflight behavior."""
    global _passed
    if _passed:
        return
    if timeout_s is None:
        timeout_s = float(os.environ.get(_ENV_KNOB, DEFAULT_TIMEOUT_S))
    if timeout_s <= 0:
        return

    result: list = []

    def touch() -> None:
        try:
            import jax
            result.append(jax.devices())
        except Exception as e:        # noqa: BLE001 — re-raised below
            result.append(e)

    t = threading.Thread(target=touch, name="device-preflight",
                         daemon=True)
    t.start()
    t.join(timeout_s)
    if not result:
        raise DeviceUnavailable(
            f"accelerator backend init did not complete within "
            f"{timeout_s:.0f}s — the device transport is likely wedged "
            f"or unreachable. Restart the device tunnel/runtime, force "
            f"the CPU backend (JAX_PLATFORMS=cpu or "
            f"jax.config.update('jax_platforms', 'cpu')), or raise "
            f"${_ENV_KNOB}.")
    if isinstance(result[0], Exception):
        raise DeviceUnavailable(
            f"accelerator backend init failed: {result[0]}"
        ) from result[0]
    _passed = True
    log.debug("device preflight: %d device(s)", len(result[0]))

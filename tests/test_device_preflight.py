"""Boot-time device preflight (utils/device.py).

A wedged device tunnel blocks `jax.devices()` forever in native code;
the preflight must turn that into a loud, bounded DeviceUnavailable
instead of a silent hang (observed live: serve boot stuck >10 min with
zero log output)."""

import threading
import time

import pytest

from cortex_tpu.errors import DeviceUnavailable
from cortex_tpu.utils import device as device_mod
from cortex_tpu.utils.device import preflight_device


@pytest.fixture(autouse=True)
def _reset_memo(monkeypatch):
    monkeypatch.setattr(device_mod, "_passed", False)


class TestPreflight:
    def test_healthy_backend_passes_and_memoizes(self):
        preflight_device(timeout_s=60)
        assert device_mod._passed is True
        # memoized: a second call returns without touching jax at all
        t0 = time.perf_counter()
        preflight_device(timeout_s=0.0001)
        assert time.perf_counter() - t0 < 0.05

    def test_wedged_backend_raises_within_deadline(self, monkeypatch):
        release = threading.Event()

        class FakeJax:
            @staticmethod
            def devices():
                release.wait(30)        # a wedged handshake: never returns
                return []

        import sys
        monkeypatch.setitem(sys.modules, "jax", FakeJax())
        t0 = time.perf_counter()
        with pytest.raises(DeviceUnavailable, match="wedged"):
            preflight_device(timeout_s=0.3)
        assert time.perf_counter() - t0 < 5
        assert device_mod._passed is False
        release.set()                   # unblock the daemon thread

    def test_backend_init_error_surfaces(self, monkeypatch):
        class FakeJax:
            @staticmethod
            def devices():
                raise RuntimeError("no backend could be initialized")

        import sys
        monkeypatch.setitem(sys.modules, "jax", FakeJax())
        with pytest.raises(DeviceUnavailable,
                           match="no backend could be initialized"):
            preflight_device(timeout_s=5)

    def test_env_zero_disables(self, monkeypatch):
        monkeypatch.setenv("CORTEX_DEVICE_PREFLIGHT_TIMEOUT_S", "0")

        class Boom:
            @staticmethod
            def devices():              # must never be called
                raise AssertionError("preflight ran while disabled")

        import sys
        monkeypatch.setitem(sys.modules, "jax", Boom())
        preflight_device()              # no raise, no touch

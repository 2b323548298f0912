"""Stub of lightgbm.basic: the engine only touches _LIB.LGBM_NetworkFree
(reference core.py:81) and _safe_call."""

import os


class _Lib:
    def __init__(self):
        self.network_free_calls = 0

    def LGBM_NetworkFree(self):
        self.network_free_calls += 1
        # cross-process observability for the wheel-day contract test:
        # python workers are separate processes, so the in-memory counter
        # is invisible to the driver; when the env var is set, every
        # NetworkFree appends a line the test can count — including on
        # the fit-FAILURE path, where no model survives to carry state
        log = os.environ.get("LIGHTGBM_STUB_NF_LOG")
        if log:
            with open(log, "a") as fh:
                fh.write(f"{os.getpid()}\n")
        return 0


_LIB = _Lib()


def _safe_call(ret):
    if ret != 0:
        raise RuntimeError(f"lightgbm stub call failed: {ret}")

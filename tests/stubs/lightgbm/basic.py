"""Stub of lightgbm.basic: the engine only touches _LIB.LGBM_NetworkFree
(reference core.py:81) and _safe_call."""


class _Lib:
    def __init__(self):
        self.network_free_calls = 0

    def LGBM_NetworkFree(self):
        self.network_free_calls += 1
        return 0


_LIB = _Lib()


def _safe_call(ret):
    if ret != 0:
        raise RuntimeError(f"lightgbm stub call failed: {ret}")

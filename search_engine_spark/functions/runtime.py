"""Per-worker runtime hygiene for Arrow/pandas kernels.

Allocation-heavy object-string kernels (tokenize, block encode) across
many concurrent Python workers can collide with kernel transparent-
huge-page compaction: measured on this host, the identical 32-process
tokenize run swings 4.6s ↔ 45s depending on memory-fragmentation
state, with all cores "busy" in stalled cycles. Opting the worker out
of THP (PR_SET_THP_DISABLE) removes the compaction trigger for these
short-lived object heaps. Best-effort and Linux-only; a no-op anywhere
else. Called once per worker process at kernel entry.
"""

from __future__ import annotations

_PR_SET_THP_DISABLE = 41
_done = False


def disable_thp() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.prctl(_PR_SET_THP_DISABLE, 1, 0, 0, 0)
    except Exception:  # noqa: BLE001 - non-Linux / restricted: keep going
        pass

"""FIFO-fair reentrant device lock.

``threading.RLock`` has no fairness guarantee: under the GIL, a thread that
releases the lock and immediately re-acquires it (a busy batched-generate
worker looping over a full queue) wins essentially every handoff and
starves other waiters. Measured on the mixed streaming + batch load
(scripts/bench_stream_concurrent.py --mixed): with a plain RLock the
4-stream group's TTFA degraded to ~20 s and per-stream RTF to ~4 while the
generate loop ran back-to-back batches; with FIFO handoff the stream worker
gets the device after at most one batch.

``FairRLock`` keeps a ticket queue of per-waiter events; ``release`` hands
ownership directly to the longest-waiting thread instead of racing.
Reentrant like RLock (the service's cold-voice path nests acquisitions).
"""

import threading
from collections import deque


class FairRLock:
    def __init__(self):
        self._mu = threading.Lock()
        self._owner = None
        self._count = 0
        self._waiters = deque()  # (thread_ident, Event) in arrival order

    def acquire(self, blocking: bool = True, timeout: float = -1):
        me = threading.get_ident()
        with self._mu:
            if self._owner == me:
                self._count += 1
                return True
            if self._owner is None and not self._waiters:
                self._owner = me
                self._count = 1
                return True
            if not blocking:
                return False
            ev = threading.Event()
            entry = (me, ev)
            self._waiters.append(entry)
        ok = ev.wait(timeout if timeout and timeout > 0 else None)
        if not ok:  # timed out: withdraw the ticket (unless just handed off)
            with self._mu:
                if ev.is_set():
                    return True  # handoff raced the timeout; we own it
                try:
                    self._waiters.remove(entry)
                except ValueError:
                    pass
            return False
        return True

    def release(self):
        with self._mu:
            if self._owner != threading.get_ident():
                raise RuntimeError("cannot release un-acquired FairRLock")
            self._count -= 1
            if self._count > 0:
                return
            if self._waiters:
                tid, ev = self._waiters.popleft()
                self._owner = tid  # direct FIFO handoff, no re-race
                self._count = 1
                ev.set()
            else:
                self._owner = None

    def __enter__(self):
        self.acquire()
        return self

    def __exit__(self, *exc):
        self.release()

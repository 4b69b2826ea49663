"""FairRLock: FIFO handoff under a hogging re-acquirer, reentrancy, and
timeout semantics (the serving device lock -- serve/fairlock.py)."""

import threading
import time

from chatterbox_tpu.serve.fairlock import FairRLock


def test_reentrant():
    lk = FairRLock()
    with lk:
        with lk:
            assert lk.acquire()
            lk.release()
    # fully released: another thread can take it immediately
    got = []
    t = threading.Thread(target=lambda: (lk.acquire(), got.append(1), lk.release()))
    t.start()
    t.join(timeout=5)
    assert got == [1]


def test_nonblocking_and_timeout():
    lk = FairRLock()
    lk.acquire()
    res = []
    t = threading.Thread(target=lambda: res.append(lk.acquire(blocking=False)))
    t.start(); t.join(5)
    assert res == [False]
    t = threading.Thread(target=lambda: res.append(lk.acquire(timeout=0.05)))
    t.start(); t.join(5)
    assert res == [False, False]
    lk.release()


def test_fifo_handoff_beats_hog():
    """A release->immediate-reacquire loop must NOT starve a waiter: the
    waiter gets the lock on the hog's next release (the RLock failure mode
    measured on the mixed stream+batch load)."""
    lk = FairRLock()
    acquired_by_waiter = threading.Event()
    stop = threading.Event()
    hog_cycles_after_wait = []

    def hog():
        cycles = 0
        while not stop.is_set():
            with lk:
                time.sleep(0.002)
            if waiting.is_set() and not acquired_by_waiter.is_set():
                cycles += 1
                if not hog_cycles_after_wait:
                    hog_cycles_after_wait.append(cycles)
                else:
                    hog_cycles_after_wait[0] = cycles
            # no sleep here: immediately re-acquires, like a saturated worker

    waiting = threading.Event()

    def waiter():
        time.sleep(0.05)  # let the hog spin up
        waiting.set()
        with lk:
            acquired_by_waiter.set()

    th, tw = threading.Thread(target=hog), threading.Thread(target=waiter)
    th.start(); tw.start()
    ok = acquired_by_waiter.wait(timeout=5.0)
    stop.set()
    th.join(5); tw.join(5)
    assert ok, "waiter starved behind the re-acquiring hog"
    # FIFO: the waiter got in within a couple of hog cycles, not hundreds
    assert not hog_cycles_after_wait or hog_cycles_after_wait[0] <= 3, (
        hog_cycles_after_wait
    )


def test_fifo_order():
    """Waiters are served in arrival order."""
    lk = FairRLock()
    lk.acquire()
    order = []
    threads = []

    def w(i):
        with lk:
            order.append(i)
            time.sleep(0.01)

    for i in range(4):
        t = threading.Thread(target=w, args=(i,))
        t.start()
        time.sleep(0.05)  # deterministic arrival order
        threads.append(t)
    lk.release()
    for t in threads:
        t.join(5)
    assert order == [0, 1, 2, 3], order

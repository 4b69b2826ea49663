"""Dynamic request batching for the serving layer (continuous-batching
style coalescing).

The reference server is strictly one-request-at-a-time (synchronous FastAPI
handler over a single CUDA model, src/server/server.py:188-299). On TPU the
batched pipeline is the whole performance story -- measured r2: batch 16 is
~3.3x more audio-sec/s than batch 1 -- so the server should not pay
single-stream throughput just because requests arrive one HTTP call at a
time.

Design:
  - every /generate request is submitted as a Job to one worker thread;
    the worker drains the queue every ``window_ms`` and groups compatible
    jobs into ONE ``ChatterboxTTS.generate_batch`` call. Dispatches take a
    shared ``device_lock`` so streaming handlers and cold-voice
    conditioning (which run on HTTP threads) cannot race the jit caches or
    duplicate multi-minute remote compiles.
  - compatible = identical sampling/generation params and stackable
    conditionals (``Conditionals.stack`` row-stacks mixed voices, so
    different emotion profiles DO batch together).
  - requests with an explicit ``seed`` form their own single-request group:
    sampling draws are shared across a batch, so batching would change the
    draw a seeded request sees; solo execution keeps the deterministic-seed
    contract (seed X -> identical audio to an unbatched call).
  - cost of coalescing: after a job arrives the worker holds it up to
    ``window_ms`` waiting for companions, so a solo request pays the window
    as added latency (default 25 ms ~ 4% of a typical generation; set
    CHATTERBOX_BATCH_WINDOW_MS=0 to disable batching entirely).
"""

import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)


@dataclass
class Job:
    text: str
    conds: Any  # single-voice Conditionals (leading dim 1)
    params: Dict[str, Any]  # generate_batch kwargs (sampling + max_new_tokens)
    seed: Optional[int]  # explicit request seed -> solo group
    done: threading.Event = field(default_factory=threading.Event)
    result: Any = None
    error: Optional[BaseException] = None

    def group_key(self) -> Tuple:
        import jax

        cond_shapes = jax.tree.map(lambda x: tuple(x.shape[1:]), self.conds)
        return (
            tuple(sorted(self.params.items())),
            cond_shapes,
            self.seed,  # None for all batchable jobs; a seeded job is unique
            id(self) if self.seed is not None else 0,
        )


class DynamicBatcher:
    """Coalesces concurrent generate requests into batched pipeline calls.

    ``submit`` blocks the calling (HTTP handler) thread until its request's
    row is synthesized; all device work runs on the single worker thread.
    """

    def __init__(self, tts, max_batch: int = 16, window_ms: float = 25.0,
                 device_lock: Optional[threading.RLock] = None):
        self.tts = tts
        self.max_batch = max_batch
        self.window_ms = window_ms
        # serializes pipeline dispatch/compile against OTHER device users
        # (streaming handlers, cold-voice conditioning) -- see service.py
        self.device_lock = device_lock or threading.RLock()
        self.queue: "queue.Queue[Job]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "rows_in_batches": 0, "max_batch_seen": 0}
        self._stop = False
        self.worker = threading.Thread(target=self._run, name="tts-batcher", daemon=True)
        self.worker.start()

    # ------------------------------------------------------------------ api
    def submit(self, text: str, conds, params: Dict[str, Any], seed: Optional[int],
               timeout: Optional[float] = None):
        job = Job(text=text, conds=conds, params=dict(params), seed=seed)
        self.stats["requests"] += 1
        self.queue.put(job)
        if not job.done.wait(timeout):
            raise TimeoutError("generation timed out")
        if job.error is not None:
            raise job.error
        return job.result

    def shutdown(self):
        self._stop = True
        self.queue.put(None)  # wake the worker
        self.worker.join(timeout=5)

    # --------------------------------------------------------------- worker
    def _collect_window(self, first: Job) -> List[Job]:
        """Gather jobs arriving within window_ms of the first (bounded by
        max_batch); a lone request proceeds after at most one window."""
        jobs = [first]
        deadline = time.monotonic() + self.window_ms / 1000.0
        while len(jobs) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                j = self.queue.get(timeout=remaining)
            except queue.Empty:
                break
            if j is None:
                self._stop = True
                break
            jobs.append(j)
        return jobs

    def _run(self):
        while not self._stop:
            try:
                first = self.queue.get()
            except Exception:
                continue
            if first is None:
                break
            jobs = self._collect_window(first)
            # group by compatibility; preserve arrival order within groups
            groups: Dict[Tuple, List[Job]] = {}
            for j in jobs:
                groups.setdefault(j.group_key(), []).append(j)
            for group in groups.values():
                self._execute(group)

    def _execute(self, group: List[Job]):
        from ..pipeline.conditionals import Conditionals

        try:
            texts = [j.text for j in group]
            conds = Conditionals.stack([j.conds for j in group])
            params = group[0].params
            seed = group[0].seed
            if seed is None:
                # fresh draw per batch; no request asked for determinism
                seed = int(time.time() * 1000) % (2**31)
            with self.device_lock:
                wavs = self.tts.generate_batch(texts, conds=conds, seed=seed, **params)
            self.stats["batches"] += 1
            self.stats["rows_in_batches"] += len(group)
            self.stats["max_batch_seen"] = max(self.stats["max_batch_seen"], len(group))
            for j, w in zip(group, wavs):
                j.result = w
                j.done.set()
        except BaseException as e:  # propagate to every waiting handler
            logger.exception("batched generation failed")
            for j in group:
                j.error = e
                j.done.set()

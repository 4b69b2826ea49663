"""Dynamic request batcher (serve/batcher.py): coalescing, mixed-voice
stacking, deterministic-seed solo groups, and error propagation."""

import threading

import numpy as np
import pytest

import jax.numpy as jnp

from chatterbox_tpu.models.s3gen.s3gen import RefDict
from chatterbox_tpu.pipeline.conditionals import Conditionals, T3CondData
from chatterbox_tpu.pipeline.tts import ChatterboxTTS
from chatterbox_tpu.serve.batcher import DynamicBatcher

from test_pipeline import TINY_S3GEN, TINY_T3


def _conds(seed: int, p_len: int = 25) -> Conditionals:
    rng = np.random.default_rng(seed)
    return Conditionals(
        T3CondData(
            jnp.asarray(rng.standard_normal((1, 256)).astype(np.float32)),
            jnp.asarray(rng.integers(0, 6561, (1, 150)).astype(np.int32)),
            jnp.full((1,), 0.5),
        ),
        RefDict(
            jnp.asarray(rng.integers(0, 6561, (1, p_len)).astype(np.int32)),
            jnp.full((1,), p_len, jnp.int32),
            jnp.asarray(rng.standard_normal((1, 2 * p_len, 80)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32)),
        ),
    )


PARAMS = dict(max_new_tokens=16, repetition_penalty=1.2, min_p=0.05, top_p=1.0,
              exaggeration=0.5, cfg_weight=0.5, temperature=0.8)


@pytest.fixture(scope="module")
def tts():
    return ChatterboxTTS.from_random(seed=0, t3_cfg=TINY_T3, s3gen_cfg=TINY_S3GEN)


def test_concurrent_requests_coalesce(tts):
    batcher = DynamicBatcher(tts, max_batch=8, window_ms=200.0)
    try:
        c1, c2 = _conds(1), _conds(2)  # two different voices in one batch
        results = [None] * 4
        errs = []

        def worker(i, conds):
            try:
                results[i] = batcher.submit(f"request number {i}", conds, PARAMS, None)
            except BaseException as e:  # pragma: no cover
                errs.append(e)

        threads = [
            threading.Thread(target=worker, args=(i, c1 if i % 2 == 0 else c2))
            for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errs
        assert all(r is not None and np.isfinite(r).all() and len(r) > 0 for r in results)
        # the 200 ms window must have coalesced at least one multi-row batch
        assert batcher.stats["max_batch_seen"] >= 2, batcher.stats
        assert batcher.stats["requests"] == 4
    finally:
        batcher.shutdown()


def test_seeded_request_matches_direct_call(tts):
    """A request with an explicit seed runs as a solo group and must be
    sample-for-sample identical to an unbatched generate_batch call."""
    conds = _conds(3)
    direct = tts.generate_batch(["determinism check"], conds=conds, seed=123, **PARAMS)[0]
    batcher = DynamicBatcher(tts, max_batch=8, window_ms=50.0)
    try:
        got = batcher.submit("determinism check", conds, PARAMS, 123)
        np.testing.assert_array_equal(got, direct)
        # submit alongside a concurrent seedless request: still identical
        other = threading.Thread(
            target=lambda: batcher.submit("background noise", _conds(4), PARAMS, None)
        )
        other.start()
        got2 = batcher.submit("determinism check", conds, PARAMS, 123)
        other.join(timeout=600)
        np.testing.assert_array_equal(got2, direct)
    finally:
        batcher.shutdown()


def test_error_propagates_to_caller(tts):
    batcher = DynamicBatcher(tts, max_batch=4, window_ms=10.0)
    try:
        bad = dict(PARAMS, nonexistent_kwarg=1)
        with pytest.raises(TypeError):
            batcher.submit("boom", _conds(5), bad, None)
        # the worker must survive the failure and serve the next request
        ok = batcher.submit("recovery", _conds(6), PARAMS, None)
        assert np.isfinite(ok).all() and len(ok) > 0
    finally:
        batcher.shutdown()


def test_mixed_emotion_rows_flattened_order_independent(tts):
    """Stacked conds may carry per-profile emotion values; the per-call
    exaggeration must override EVERY row (not just row 0), so results are
    identical regardless of which voice lands in row 0."""
    from chatterbox_tpu.pipeline.conditionals import Conditionals

    a = _conds(7)  # emotion_adv 0.5 == request exaggeration
    b = _conds(8).with_exaggeration(0.7)  # profile-cached at 0.7
    flat_ab = Conditionals.stack([a, b]).with_exaggeration(0.5)
    texts = ["first voice", "second voice"]

    got = tts.generate_batch(texts, conds=Conditionals.stack([a, b]), seed=9,
                             exaggeration=0.5, **{k: v for k, v in PARAMS.items()
                                                  if k != "exaggeration"})
    want = tts.generate_batch(texts, conds=flat_ab, seed=9, exaggeration=0.5,
                              **{k: v for k, v in PARAMS.items() if k != "exaggeration"})
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_chunked_batch_slices_stacked_conds(tts):
    """b > max_device_batch with per-row conds: each chunk must receive its
    own conds rows (the full stack used to reach every chunk -> shape
    mismatch). Chunked output == per-chunk direct calls with sliced rows."""
    from chatterbox_tpu.pipeline.conditionals import Conditionals

    stack = Conditionals.stack([_conds(20 + i) for i in range(4)])
    texts = [f"chunked row {i}" for i in range(4)]
    old_dev, old_pipe = tts.max_device_batch, tts.max_pipelined_batch
    try:
        tts.max_device_batch = tts.max_pipelined_batch = 2
        chunked = tts.generate_batch(texts, conds=stack, seed=5, **PARAMS)
    finally:
        tts.max_device_batch, tts.max_pipelined_batch = old_dev, old_pipe
    assert len(chunked) == 4
    direct = []
    for c in range(2):
        direct += tts.generate_batch(
            texts[2 * c : 2 * c + 2], conds=stack.rows(2 * c, 2 * c + 2),
            seed=5 + c, device_chain=True, **PARAMS
        )
    for g, w in zip(chunked, direct):
        np.testing.assert_array_equal(g, w)


def test_preemptible_matches_one_shot(tts):
    """generate_batch_preemptible is sample-identical to generate_batch for
    the same seed (chunked carry == one-shot decode; single s3gen dispatch),
    so the admission-control path preserves the deterministic-seed contract
    for solo (b=1) seeded requests."""
    conds = _conds(30)
    direct = tts.generate_batch(["preemptible check"], conds=conds, seed=44, **PARAMS)[0]
    chunked = tts.generate_batch_preemptible(
        ["preemptible check"], conds=conds, seed=44, t3_chunk_tokens=5, **PARAMS
    )[0]
    np.testing.assert_array_equal(chunked, direct)


def test_preemptible_row_split_and_lock(tts):
    """Multi-row preemptible with s3gen row-splitting: valid audio per row,
    and the lock is actually acquired/released many times (one per bounded
    dispatch), which is the admission-control property."""
    acquires = []

    class CountingLock:
        def __enter__(self):
            acquires.append(1)

        def __exit__(self, *a):
            return False

    stack = Conditionals.stack([_conds(31), _conds(32)])
    wavs = tts.generate_batch_preemptible(
        ["row one text", "row two text"], conds=stack, lock=CountingLock(),
        seed=2, t3_chunk_tokens=4, s3gen_max_rows=1, **PARAMS
    )
    assert len(wavs) == 2
    for w in wavs:
        assert len(w) > 0 and np.isfinite(w).all()
    # prefill + >=ceil(16/4) decode chunks + 2 s3gen row dispatches
    assert len(acquires) >= 1 + 2 + 2, acquires


def test_admission_control_routes_bulk_preemptibly(tts):
    """With live streams reported, the DynamicBatcher executes bulk groups
    through the preemptible path -- and a seeded solo request stays
    identical to the direct call."""
    conds = _conds(33)
    direct = tts.generate_batch(["admission check"], conds=conds, seed=77, **PARAMS)[0]
    batcher = DynamicBatcher(
        tts, max_batch=8, window_ms=10.0, stream_active_fn=lambda: True,
        bulk_chunk_tokens=5, bulk_rows_with_streams=1,
    )
    try:
        got = batcher.submit("admission check", conds, PARAMS, 77)
        np.testing.assert_array_equal(got, direct)
        assert batcher.stats["preempted_batches"] >= 1
    finally:
        batcher.shutdown()


def test_admission_control_off_when_no_streams(tts):
    batcher = DynamicBatcher(
        tts, max_batch=8, window_ms=10.0, stream_active_fn=lambda: False,
        bulk_chunk_tokens=5,
    )
    try:
        got = batcher.submit("no streams live", _conds(34), PARAMS, None)
        assert np.isfinite(got).all() and len(got) > 0
        assert batcher.stats["preempted_batches"] == 0
    finally:
        batcher.shutdown()

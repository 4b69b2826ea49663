"""Benchmark: audio-seconds synthesized per second per chip (the BASELINE.json
metric). Runs the full-size pipeline (random-init weights -- no checkpoint
egress in this environment; throughput is weight-value-independent) end to
end: text tokens -> T3 CFG decode -> S3Gen flow -> HiFT vocoder.

Default run (no config flags) emits the measured matrix, one JSON line per
config on stdout, ORDERED so a driver kill costs the least important tail
(r4 lesson: the run died mid-matrix and the artifact recorded a tail point
as the round's number): b8 headline -> int8-weight -> turbo (wquant+flow4)
-> b1 turbo -> VC -> streams -> b1/b16/b32/b64 grid (b32/b64 with
repeat-based spread) -> long-form -> stretch. Each point reserves its
worst-case cost against CHATTERBOX_BENCH_BUDGET_S (default 1560 s,
calibrated to finish inside the driver's ~30 min kill window) BEFORE
starting, and the b8 headline is re-printed as the LAST stdout line even on
errors (the driver parses the last line).

Passing --batch/--tokens/--vc/--tiny/--real-conds selects a single config
(legacy behavior).

Reference floor: ~1.3 audio-sec/s single-stream GPU (BASELINE.md).
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def emit(result, headline=False):
    print(json.dumps(result), flush=True)
    return result


# --------------------------------------------------------------------- models
def tiny_cfgs():
    from chatterbox_tpu.models.s3gen.conformer import ConformerConfig
    from chatterbox_tpu.models.s3gen.flow import FlowConfig
    from chatterbox_tpu.models.s3gen.s3gen import S3GenConfig
    from chatterbox_tpu.models.s3gen.unet import UNetConfig
    from chatterbox_tpu.models.s3tokenizer import S3TokenizerConfig
    from chatterbox_tpu.models.t3.llama import LlamaConfig
    from chatterbox_tpu.models.t3.t3 import T3Config

    t3_cfg = T3Config(
        llama=LlamaConfig(hidden_size=128, intermediate_size=256, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=4, head_dim=32)
    )
    s3_cfg = S3GenConfig(
        flow=FlowConfig(
            input_size=128,
            encoder=ConformerConfig(input_size=128, output_size=128, attention_heads=4,
                                    linear_units=256, num_blocks=2, num_up_blocks=1),
            estimator=UNetConfig(channels=64, n_blocks=1, num_mid_blocks=2, num_heads=4),
        ),
        tokenizer=S3TokenizerConfig(n_state=64, n_head=4, n_layer=2),
    )
    return t3_cfg, s3_cfg


def synthetic_conds(rng):
    import jax.numpy as jnp

    from chatterbox_tpu.models.s3gen.s3gen import RefDict
    from chatterbox_tpu.pipeline.conditionals import Conditionals, T3CondData

    p_len = 125  # 5 s prompt at 25 tok/s
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


def make_tts(args):
    from chatterbox_tpu.pipeline.tts import ChatterboxTTS

    if args.tiny:
        t3_cfg, s3_cfg = tiny_cfgs()
        tts = ChatterboxTTS.from_random(seed=0, t3_cfg=t3_cfg, s3gen_cfg=s3_cfg)
        args.tokens = min(args.tokens or 250, 32)
    else:
        tts = ChatterboxTTS.from_random(seed=0, synthetic=True)
        if not args.fp32:
            from chatterbox_tpu.runtime.precision import apply_tts_precision

            apply_tts_precision(tts)
    return tts


def make_vc(args, s3gen_params=None, s3gen_cfg=None):
    """Build the VC pipeline; pass the TTS pipeline's s3gen params/cfg to
    share the device weights (the matrix runs VC mid-sequence with the TTS
    model resident -- a second 0.5 GB s3gen copy is pure waste)."""
    import jax.numpy as jnp

    from chatterbox_tpu.models.s3gen.s3gen import RefDict, S3GenConfig, init_s3gen
    from chatterbox_tpu.pipeline.vc import ChatterboxVC
    from chatterbox_tpu.runtime.fast_init import synthetic_init
    from chatterbox_tpu.runtime.precision import cast_floating_jit

    if s3gen_params is None:
        if args.tiny:
            _, s3gen_cfg = tiny_cfgs()
        else:
            s3gen_cfg = S3GenConfig()
        s3gen_params = synthetic_init(lambda k: init_s3gen(k, s3gen_cfg))
        if not args.fp32:
            s3gen_params = dict(s3gen_params)
            s3gen_params["flow"] = cast_floating_jit(s3gen_params["flow"], jnp.bfloat16)
            s3gen_params["tokenizer"] = cast_floating_jit(
                s3gen_params["tokenizer"], jnp.bfloat16
            )
    vc = ChatterboxVC(s3gen_params=s3gen_params, s3gen_cfg=s3gen_cfg)
    rng = np.random.default_rng(0)
    p_len = 125
    vc.ref_dict = RefDict(
        jnp.asarray(rng.integers(0, 6561, (1, p_len)).astype(np.int32)),
        jnp.full((1,), p_len, jnp.int32),
        jnp.asarray(rng.standard_normal((1, 2 * p_len, 80)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32)),
    )
    return vc


# ------------------------------------------------------------------- configs
def bench_tts_config(tts, batch, tokens, iters, extra_detail=None, tag="",
                     flow_steps=None, repeats=1):
    """One TTS throughput point: pipelined batches at (batch, tokens).

    ``repeats`` > 1 re-runs the timed block and reports the MEDIAN with the
    run-to-run spread in the detail line (r4 verdict #6: single-run points
    at b32/b64 carry a measured +-10% spread -- a lone number there cannot
    distinguish a 9% regression from noise)."""
    import jax

    text = "The quick brown fox jumps over the lazy dog near the river bank today."
    texts = [text] * batch
    gen_kw = dict(max_new_tokens=tokens, min_new_tokens=tokens - 1,
                  flow_steps=flow_steps)

    t0 = time.time()
    # warm through the SAME path the timed loop uses (batches larger than
    # the HBM cap are chunked -- the chunk graphs must be compiled here,
    # not inside the timed iterations)
    tts.generate_batches_pipelined([texts], seed=0, **gen_kw)
    compile_s = time.time() - t0
    log(f"tts b{batch}@{tokens}{tag}: first call (compile+run) {compile_s:.1f}s")

    # steady state: pipelined batches (host collection overlaps device work);
    # only the total is truly measured -- collection interleaves batches, so
    # per-iteration splits would be invented numbers.
    # iters >= 6 preferred: at 2, the final batch's exposed host readback
    # (~13 MB/s tunnel, scripts/probe_transfer*.py) skews throughput ~4% low
    runs = []
    for r in range(repeats):
        t0 = time.time()
        batch_results = tts.generate_batches_pipelined(
            [texts] * iters, seed=1 + r, **gen_kw
        )
        total_t = time.time() - t0
        audio_secs = [sum(len(w) for w in wavs) / 24000.0 for wavs in batch_results]
        runs.append((float(np.sum(audio_secs) / total_t), total_t, audio_secs))
    runs.sort(key=lambda x: x[0])
    thr, total_t, audio_secs = runs[len(runs) // 2]  # median by throughput

    suffix = (f"_b{batch}" if tokens == 250 else f"_b{batch}_t{tokens}") + tag
    result = {
        "metric": f"audio_sec_per_s_per_chip{suffix}",
        "value": round(thr, 3),
        "unit": "audio-sec/s/chip",
        "vs_baseline": round(thr / 1.3, 3),
    }
    detail = {
        "compile_s": round(compile_s, 1),
        "total_s": round(total_t, 2),
        "iters": iters,
        "iter_s_mean": round(total_t / iters, 2),
        "audio_s_per_iter": [round(a, 1) for a in audio_secs],
        "platform": jax.devices()[0].platform,
        "batch": batch,
        "tokens": tokens,
        **(extra_detail or {}),
    }
    if repeats > 1:
        vals = [r[0] for r in runs]
        detail["repeat_thr"] = [round(v, 2) for v in vals]
        detail["spread_pct"] = round(100 * (max(vals) - min(vals)) / thr, 1)
    print(json.dumps({"detail": {result["metric"]: detail}}), file=sys.stderr, flush=True)
    return result


def bench_vc_config(vc, batch, tokens, iters, tag="", flow_steps=None):
    """Batched end-to-end voice conversion (BASELINE config 5): source wavs
    -> S3 tokens -> S3Gen resynthesis with target conditioning -> watermark."""
    import jax

    rng = np.random.default_rng(0)
    secs = tokens / 25.0
    sources = [
        (rng.standard_normal(int(secs * 16000)) * 0.1).astype(np.float32)
        for _ in range(batch)
    ]
    t0 = time.time()
    vc.generate_batch(sources, seed=0, flow_steps=flow_steps)
    compile_s = time.time() - t0
    log(f"vc b{batch}{tag}: first call (compile+run) {compile_s:.1f}s")

    t0 = time.time()
    all_outs = vc.generate_batches_pipelined(
        [sources] * iters, seed=1, flow_steps=flow_steps
    )
    total = time.time() - t0
    audio_s = sum(len(w) for w in all_outs[-1]) / 24000.0
    thr = audio_s * iters / total
    result = {
        "metric": f"vc_audio_sec_per_s_per_chip_b{batch}{tag}",
        "value": round(thr, 3),
        "unit": "audio-sec/s/chip",
        "vs_baseline": round(thr / 1.3, 3),
    }
    print(json.dumps({"detail": {result["metric"]: {
        "compile_s": round(compile_s, 1),
        "total_s": round(total, 2),
        "iters": iters,
        "iter_s_mean": round(total / iters, 2),
        "audio_s_per_iter": round(audio_s, 1),
        "platform": jax.devices()[0].platform,
        "batch": batch,
    }}}), file=sys.stderr, flush=True)
    return result


STREAM_TEXTS = [
    "The quick brown fox jumps over the lazy dog near the river bank today.",
    "A second speaker reads an entirely different sentence about mountains.",
    "Stream three narrates the weather forecast for the coming weekend now.",
    "Speaker four describes a recipe for fresh bread with honey and butter.",
]


def bench_stream_config(tts, n_streams, tokens, tag="", flow_steps=None):
    """N lockstep concurrent streams: per-stream TTFA + RTF, aggregate
    throughput (scripts/bench_stream_concurrent.py is the full sweep)."""
    from chatterbox_tpu.pipeline.streaming import StreamConfig, stream_generate_batch

    texts = (STREAM_TEXTS * ((n_streams + 3) // 4))[:n_streams]
    st = StreamConfig(max_new_tokens=tokens, flow_steps=flow_steps)
    kw = dict(seed=0, min_new_tokens=tokens - 1)

    t0 = time.time()
    for _ in stream_generate_batch(tts, texts, stream=st, **kw):
        pass  # warm every shape bucket (compiles persist-cache across runs)
    log(f"stream N={n_streams}{tag}: warm pass {time.time() - t0:.1f}s")

    t0 = time.time()
    ttfa = [None] * n_streams
    audio = [0.0] * n_streams
    for chunks in stream_generate_batch(tts, texts, stream=st, **kw):
        now = time.time()
        for i, c in enumerate(chunks):
            if c is not None and len(c):
                if ttfa[i] is None:
                    ttfa[i] = now - t0
                audio[i] += len(c) / 24000.0
    wall = time.time() - t0
    agg = sum(audio) / wall
    result = {
        "metric": f"stream_aggregate_audio_sec_per_s_n{n_streams}{tag}",
        "value": round(agg, 3),
        "unit": "audio-sec/s/chip",
        "vs_baseline": round(agg / 1.3, 3),
    }
    print(json.dumps({"detail": {result["metric"]: {
        "wall_s": round(wall, 2),
        "ttfa_s": [round(t, 3) if t is not None else None for t in ttfa],
        "per_stream_rtf": [round(wall / a, 3) if a else None for a in audio],
        "audio_s_per_stream": [round(a, 1) for a in audio],
        "tokens": tokens,
    }}}), file=sys.stderr, flush=True)
    return result


# ---------------------------------------------------------------------- main
def run_matrix(args):
    """Full measured matrix, most-important points first; each line prints
    as soon as it is measured and the b8 headline repeats as the LAST stdout
    line (even on error -- try/finally). A failing config logs and is
    skipped. Every point declares a worst-case cost (seconds, calibrated on
    hardware with a warm persistent compile cache + margin) and is SKIPPED
    unless it fits the remaining CHATTERBOX_BENCH_BUDGET_S wall-clock
    budget -- the r4 run was killed by the driver timeout with the guard
    only checking between configs."""
    budget_s = float(os.environ.get("CHATTERBOX_BENCH_BUDGET_S", "1560"))
    t_start = time.time()
    headline = None

    tts = make_tts(args)
    rng = np.random.default_rng(0)
    tts.conds = synthetic_conds(rng)
    log("tts model ready")

    def guarded(name, fn, cost=120.0):
        nonlocal headline
        elapsed = time.time() - t_start
        if elapsed + cost > budget_s:
            log(f"SKIP {name}: {elapsed:.0f}s elapsed + {cost:.0f}s reserve "
                f"> {budget_s:.0f}s budget")
            return
        t0 = time.time()
        try:
            r = emit(fn())
            if headline is None:
                headline = r
        except Exception as e:  # keep the rest of the matrix alive
            log(f"FAIL {name}: {type(e).__name__}: {e}")
        log(f"POINT {name}: {time.time() - t0:.0f}s "
            f"(reserved {cost:.0f}, total {time.time() - t_start:.0f})")

    def reset_jits():
        # drop cached executables between phases: their device programs +
        # constants stay resident otherwise, and the accumulated footprint
        # measurably degraded the in-matrix b8@1000 run (23.5 s/iter vs 8.3
        # standalone; warm re-load is only ~30 s)
        tts._jit_t3.clear()
        tts._jit_s3gen.clear()

    iters = args.iters
    wquant_ok = False

    if args.tiny:  # CPU smoke of the matrix plumbing
        guarded("tts_b2", lambda: bench_tts_config(tts, 2, 16, iters), cost=600)
        guarded("tts_b2_turbo",
                lambda: bench_tts_config(tts, 2, 16, iters, tag="_flow4", flow_steps=4),
                cost=600)
        guarded("stream_n2", lambda: bench_stream_config(tts, 2, 16), cost=600)
        guarded("tts_b2_rep",
                lambda: bench_tts_config(tts, 2, 16, 2, repeats=2), cost=600)
        vc = make_vc(args)
        guarded("vc_b2", lambda: bench_vc_config(vc, 2, 16, iters), cost=600)
        guarded("vc_b2_flow4",
                lambda: bench_vc_config(vc, 2, 16, iters, tag="_flow4", flow_steps=4),
                cost=600)
        if headline is not None:
            emit(headline)
        return

    try:
        # ---- tier 1: the headline + the round's opt-in claims ----
        guarded("tts_b8", lambda: bench_tts_config(tts, 8, 250, iters), cost=200)

        def wquant_point():
            # int8 T3 weights (CHATTERBOX_W_QUANT surface): measured as its
            # own metric; the bf16 headline above stays the default config
            nonlocal wquant_ok
            import jax

            from chatterbox_tpu.models.t3.llama import quantize_llama_weights

            tts._t3_params_bf16 = tts.t3_params  # restored for default points
            t3p = dict(tts.t3_params)
            t3p["llama"] = jax.jit(quantize_llama_weights)(t3p["llama"])
            tts.t3_params = t3p  # new pytree structure -> fresh jit traces
            r = bench_tts_config(tts, 8, 250, iters, tag="_wquant")
            wquant_ok = True
            return r

        guarded("tts_b8_wquant", wquant_point, cost=100)

        def _turbo_tag():
            # compound tag only when the int8 weights actually landed
            # (otherwise the point is bf16+flow4 and must say so)
            return "_wquant_flow4" if wquant_ok else "_flow4"

        guarded("tts_b8_turbo",
                lambda: bench_tts_config(tts, 8, 250, iters, tag=_turbo_tag(),
                                         flow_steps=4),
                cost=100)
        guarded("tts_b1_turbo",
                lambda: bench_tts_config(tts, 1, 250, iters, tag=_turbo_tag(),
                                         flow_steps=4),
                cost=120)

        # ---- tier 2: VC + streams ----
        vc = None
        try:
            vc = make_vc(args, s3gen_params=tts.s3gen_params, s3gen_cfg=tts.s3gen_cfg)
            log("vc model ready (shared s3gen params)")
        except Exception as e:
            log(f"FAIL vc setup: {type(e).__name__}: {e}")
        if vc is not None:
            guarded("vc_b8", lambda: bench_vc_config(vc, 8, 250, iters), cost=120)
            guarded("vc_b8_flow4",
                    lambda: bench_vc_config(vc, 8, 250, iters, tag="_flow4",
                                            flow_steps=4),
                    cost=80)

        guarded("stream_n4_turbo",
                lambda: bench_stream_config(tts, 4, 250, tag=_turbo_tag(),
                                            flow_steps=4),
                cost=220)

        # ---- tier 3: the default-numerics grid (bf16 weights restored) ----
        if getattr(tts, "_t3_params_bf16", None) is not None:
            tts.t3_params = tts._t3_params_bf16
        guarded("stream_n4", lambda: bench_stream_config(tts, 4, 250), cost=140)
        # drop phase-1/2 executables before the grid: resident programs +
        # constants degraded r4's in-matrix long-form runs (23.5 vs 8.3
        # s/iter); the grid compiles its own batch buckets anyway
        reset_jits()
        if vc is not None:
            vc._jit.clear()
        guarded("tts_b1", lambda: bench_tts_config(tts, 1, 250, iters), cost=110)
        guarded("tts_b16", lambda: bench_tts_config(tts, 16, 250, iters), cost=140)
        # b32/b64 with repeat-based spread (verdict #6); b64 shares the
        # pipelined chunk graphs b32 compiled, so its marginal cost is
        # mostly measure time
        guarded("tts_b32",
                lambda: bench_tts_config(tts, 32, 250, 4, repeats=3), cost=90)
        guarded("tts_b64",
                lambda: bench_tts_config(tts, 64, 250, 3, repeats=3), cost=130)

        # ---- tier 4: long-form grid ----
        reset_jits()
        guarded("tts_b8_long", lambda: bench_tts_config(tts, 8, 1000, iters), cost=180)
        guarded("tts_b8_500", lambda: bench_tts_config(tts, 8, 500, iters), cost=120)
        guarded("tts_b16_long", lambda: bench_tts_config(tts, 16, 1000, 4), cost=190)
        guarded("tts_b32_long", lambda: bench_tts_config(tts, 32, 1000, 3), cost=160)

        # ---- tier 5: stretch ----
        if vc is not None:
            guarded("vc_b32_flow4",
                    lambda: bench_vc_config(vc, 32, 250, iters, tag="_flow4",
                                            flow_steps=4),
                    cost=120)
    finally:
        if headline is not None:
            emit(headline)  # the driver parses the LAST line


def run_single(args):
    """One config (legacy CLI: --batch/--tokens/--vc/--real-conds/--tiny)."""
    if args.vc:
        vc = make_vc(args)
        log("vc model ready")
        emit(bench_vc_config(vc, args.batch, args.tokens, args.iters,
                             tag="_flow4" if args.flow4 else "",
                             flow_steps=4 if args.flow4 else None))
        return

    tts = make_tts(args)
    log("model init done")
    rng = np.random.default_rng(0)
    conds_detail = {}
    if args.real_conds:
        ref = (rng.standard_normal(5 * 24000) * 0.1).astype(np.float32)
        t0 = time.time()
        tts.prepare_conditionals(ref, exaggeration=0.5)
        compile_and_run = time.time() - t0
        # steady-state conditioning cost (compiled): the per-voice number a
        # serving deployment pays (reference: 0.93 s / RTF 0.11, BASELINE.md)
        t0 = time.time()
        tts.prepare_conditionals(ref, exaggeration=0.5)
        conds_s = time.time() - t0
        conds_detail = {
            "conditioning_s": round(conds_s, 3),
            "conditioning_rtf": round(conds_s / 5.0, 3),
            "conditioning_compile_s": round(compile_and_run, 1),
        }
        log(f"conditioning: {conds_s:.3f}s steady (ref wav 5s)")
    else:
        # synthetic conditionals: the metric is SYNTHESIS throughput; voice
        # conditioning is a one-time per-voice cost (reference: 0.93 s,
        # BASELINE.md) and its conditioning models compile for ~12 min on
        # the tunneled remote-compile backend. --real-conds exercises it.
        tts.conds = synthetic_conds(rng)
    log("conditioning done")
    emit(bench_tts_config(tts, args.batch, args.tokens, args.iters, conds_detail,
                          tag="_flow4" if args.flow4 else "",
                          flow_steps=4 if args.flow4 else None))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--tokens", type=int, default=None,
                    help="max new speech tokens (25/s)")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--tiny", action="store_true", help="CPU smoke mode")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fp32", action="store_true", help="disable bf16 hot path")
    ap.add_argument("--flow4", action="store_true",
                    help="single-config runs: 4-step CFM (the turbo tier)")
    ap.add_argument("--real-conds", action="store_true",
                    help="run the real conditioning models (slow remote compile)")
    ap.add_argument("--vc", action="store_true",
                    help="benchmark batched voice conversion (BASELINE config 5)")
    ap.add_argument("--matrix", action="store_true",
                    help="force the full matrix (also the no-flag default)")
    args = ap.parse_args()

    single = (
        args.batch is not None or args.tokens is not None or args.vc
        or args.real_conds
    ) and not args.matrix
    args.batch = args.batch if args.batch is not None else 8
    args.tokens = args.tokens if args.tokens is not None else 250

    import jax

    # persistent compilation cache: first-run compiles amortize across runs
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    if args.cpu or args.tiny:
        jax.config.update("jax_platforms", "cpu")

    if single:
        run_single(args)
    else:
        run_matrix(args)


if __name__ == "__main__":
    main()

"""ChatterboxTTS: the end-to-end zero-shot voice-cloning TTS pipeline.

Parity target: reference tts.py (punc_norm, Conditionals, ChatterboxTTS
.from_local/.from_pretrained/.prepare_conditionals/.generate), re-designed
for TPU serving:
  - every device stage is a jitted, shape-bucketed function (text length,
    generated-token length); compiled executables are cached per bucket
  - batched generation is first-class (the reference is hard B=1)
  - all randomness flows from an explicit seed
  - conditionals are immutable values, not mutated model state
"""

import logging
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import S3GEN_SR, S3_SR, SPEECH_VOCAB_SIZE
from ..core.sampling import SamplingConfig
from ..core.resample import resample
from ..checkpoint.safetensors_io import load_safetensors
from ..models.s3gen.s3gen import (
    S3GenConfig,
    RefDict,
    convert_s3gen,
    embed_ref,
    flow_steps_from_env,
    init_s3gen,
    s3gen_wav,
)
from ..models.s3tokenizer import pad_to_token_multiple
from ..models.t3.t3 import T3Config, convert_t3, init_t3, t3_generate
from ..models.tokenizer import EnTokenizer
from ..models.voice_encoder import (
    VoiceEncoderConfig,
    convert_voice_encoder,
    init_voice_encoder,
)
from ..models.watermark import PerthImplicitWatermarker
from .audio import load_wav, trim_silence
from .conditionals import Conditionals, T3CondData

logger = logging.getLogger(__name__)


def punc_norm(text: str) -> str:
    """Text cleanup, mirrors tts.py:22-61."""
    if len(text) == 0:
        return "You need to add some text for me to talk."
    if text[0].islower():
        text = text[0].upper() + text[1:]
    text = " ".join(text.split())
    for old, new in [
        ("...", ", "), ("…", ", "), (":", ","), (" - ", ", "), (";", ", "),
        ("—", "-"), ("–", "-"), (" ,", ","), ("“", '"'), ("”", '"'),
        ("‘", "'"), ("’", "'"),
    ]:
        text = text.replace(old, new)
    text = text.rstrip(" ")
    if not any(text.endswith(p) for p in {".", "!", "?", "-", ","}):
        text += "."
    return text


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


TEXT_BUCKETS = (32, 64, 128, 256, 512)
TOKEN_BUCKETS = (64, 125, 250, 500, 750, 1000)


def _compact_tokens(tokens, lengths):
    """Device-side drop_invalid_tokens (tts.py:256-262): stable-partition
    valid (< SPEECH_VOCAB_SIZE) tokens to the front of each row."""
    t = tokens.shape[1]
    valid = (jnp.arange(t)[None] < lengths[:, None]) & (tokens < SPEECH_VOCAB_SIZE)
    order = jnp.argsort(~valid, axis=1, stable=True)
    compacted = jnp.take_along_axis(tokens, order, axis=1)
    new_lens = jnp.sum(valid, axis=1).astype(jnp.int32)
    return jnp.where(
        jnp.arange(t)[None] < new_lens[:, None], compacted, 0
    ), new_lens


@dataclass
class ChatterboxTTS:
    """Functional TTS pipeline holding parameter pytrees + jit caches."""

    t3_params: dict
    s3gen_params: dict
    ve_params: dict
    tokenizer: Optional[EnTokenizer]
    t3_cfg: T3Config = field(default_factory=T3Config)
    s3gen_cfg: S3GenConfig = field(default_factory=S3GenConfig)
    ve_cfg: VoiceEncoderConfig = field(default_factory=VoiceEncoderConfig)
    conds: Optional[Conditionals] = None
    sr: int = S3GEN_SR
    # largest per-dispatch batch: T3 runs 2x rows (CFG) with a bf16 KV cache.
    # The pad-free (D,S) cache layout (ops/flash_decode.py) fits the b=64
    # decode graph on one v5e chip (the (S,D) layout padded D 2x and OOM'd
    # at 20G). Bigger requests are chunked through the pipelined path.
    max_device_batch: int = 64
    # largest chunk in the PIPELINED path, which keeps two dispatches in
    # flight (collect overlaps dispatch): two b=64 full-chain graphs exceed
    # HBM together, two b=32 fit (measured r2)
    max_pipelined_batch: int = 32
    # int8 KV cache with per-token scales in the flash-decode path: halves
    # the decode loop's dominant HBM read (~1% attention-output error,
    # measured on hardware -- scripts/probe_int8_cache.py / test_ops.py).
    # None = auto policy (_kv_quant_for): ON for token budgets >= 500 where
    # the measured win is ~+4%, OFF at short budgets where the truncated
    # cache read makes it neutral. Env override: CHATTERBOX_KV_QUANT=1/0.
    kv_quant: Optional[bool] = field(
        default_factory=lambda: {"1": True, "0": False}.get(
            os.environ.get("CHATTERBOX_KV_QUANT", "auto")
        )
    )
    # bf16 HiFT conv trunk (sine source + exp/sin/iSTFT head stay fp32):
    # 37-44 dB SNR vs the fp32 vocoder but MEASURED PERF-NEUTRAL on v5e
    # (the vocoder is VPU-bound; scripts/probe_hift_precision.py) -- halves
    # vocoder activation memory only. Env: CHATTERBOX_HIFT_BF16=1/0.
    hift_bf16: bool = field(
        default_factory=lambda: os.environ.get("CHATTERBOX_HIFT_BF16", "0") == "1"
    )

    ENC_COND_LEN = 6 * S3_SR  # tts.py:107
    DEC_COND_LEN = 10 * S3GEN_SR  # tts.py:108

    def __post_init__(self):
        # CFM Euler step-count knob (CHATTERBOX_FLOW_STEPS; measured curve
        # in docs/PERFORMANCE.md). No-op unless the env opt-in is set.
        self.s3gen_cfg = flow_steps_from_env(self.s3gen_cfg)
        self.watermarker = PerthImplicitWatermarker()
        # fixed CFM noise buffer, mirroring flow_matching.py:191 rand_noise
        # (host-generated: zero device ops at construction)
        self._cfm_noise = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 15000, 80)).astype(np.float32)
        )
        self._jit_t3 = {}
        self._jit_s3gen = {}
        self._jit_embed_ref = {}
        self.mesh = None  # set via with_mesh() for multi-chip execution

    def _unfuse_qkv(self):
        """Restore the canonical dense separate-q/k/v T3 layout if the
        runtime fused or int8-quantized it (runtime/precision)."""
        if self._runtime_llama_layout(self.t3_params):
            from ..models.t3.llama import canonicalize_llama_params

            t3p = dict(self.t3_params)
            t3p["llama"] = jax.jit(
                lambda p: canonicalize_llama_params(p, self.t3_cfg.llama)
            )(t3p["llama"])
            self.t3_params = t3p

    @staticmethod
    def _runtime_llama_layout(t3_params) -> bool:
        """True if the llama params carry a runtime-only layout (fused qkv
        and/or int8 weights) rather than the canonical dense q/k/v one."""
        layers = t3_params.get("llama", {}).get("layers", {})
        return "qkv" in layers or any(
            isinstance(v, dict) and "w8" in v for v in layers.values()
        )

    def with_mesh(self, mesh, model_sharded: bool = False) -> "ChatterboxTTS":
        """Place params on a ("data","model") mesh for sharded generation.

        Batches shard over "data"; T3 weights optionally tensor-shard over
        "model" (parallel/sharding.py specs). Batch size must be a multiple
        of the data-axis size."""
        from ..parallel.sharding import replicated, shard_params, t3_param_specs

        self.mesh = mesh
        self._unfuse_qkv()  # sharding specs address the canonical q/k/v layout
        specs = t3_param_specs(self.t3_params) if model_sharded else None
        self.t3_params = shard_params(self.t3_params, mesh, specs)
        self.s3gen_params = jax.tree.map(
            lambda x: jax.device_put(x, replicated(mesh)), self.s3gen_params
        )
        return self

    # ------------------------------------------------------------------ load
    @classmethod
    def from_local(cls, ckpt_dir, conds_path: str = None) -> "ChatterboxTTS":
        """Load the reference checkpoint set (ve/t3_cfg/s3gen safetensors +
        tokenizer.json [+ conds]), converting torch layouts once
        (tts.py:128-165)."""
        ckpt_dir = Path(ckpt_dir)
        t3_cfg, s3gen_cfg, ve_cfg = T3Config(), S3GenConfig(), VoiceEncoderConfig()
        ve_sd = load_safetensors(ckpt_dir / "ve.safetensors")
        t3_sd = load_safetensors(ckpt_dir / "t3_cfg.safetensors")
        # the reference defensively unwraps a "model"-keyed t3 state
        # (tts.py:146-147); the safetensors-representable variant of that is
        # a uniform "model." key prefix -- strip it if present
        if t3_sd and all(k.startswith("model.") for k in t3_sd):
            t3_sd = {k[len("model."):]: v for k, v in t3_sd.items()}
        s3_sd = load_safetensors(ckpt_dir / "s3gen.safetensors")
        from ..models.s3gen.s3gen import infer_s3gen_config

        s3gen_cfg = infer_s3gen_config(s3_sd, s3gen_cfg)
        obj = cls(
            t3_params=jax.tree.map(jnp.asarray, convert_t3(t3_sd, t3_cfg)),
            s3gen_params=jax.tree.map(jnp.asarray, convert_s3gen(s3_sd, s3gen_cfg)),
            ve_params=jax.tree.map(jnp.asarray, convert_voice_encoder(ve_sd, ve_cfg)),
            tokenizer=EnTokenizer(str(ckpt_dir / "tokenizer.json")),
            t3_cfg=t3_cfg,
            s3gen_cfg=s3gen_cfg,
            ve_cfg=ve_cfg,
        )
        conds_file = conds_path or (ckpt_dir / "conds.pt")
        if Path(conds_file).exists():
            obj.conds = Conditionals.load_torch(conds_file)
        elif (ckpt_dir / "conds.safetensors").exists():
            obj.conds = Conditionals.load(ckpt_dir / "conds.safetensors")
        return obj

    @classmethod
    def from_pretrained(cls, ckpt_dir=None) -> "ChatterboxTTS":
        """Offline equivalent of tts.py:167-180: expects the artifact set
        already on disk (no hub egress in this environment)."""
        if ckpt_dir is None:
            raise ValueError(
                "No network egress: pass ckpt_dir containing ve/t3_cfg/s3gen "
                ".safetensors + tokenizer.json (the ResembleAI/chatterbox set)"
            )
        return cls.from_local(ckpt_dir)

    @classmethod
    def from_random(
        cls,
        seed: int = 0,
        t3_cfg: T3Config = None,
        s3gen_cfg: S3GenConfig = None,
        synthetic: bool = False,
    ) -> "ChatterboxTTS":
        """Random-init pipeline (benchmarks / tests without weights).

        ``synthetic=True`` uses the RNG-free iota init (runtime/fast_init.py)
        -- required on the tunneled TPU where threefry compiles in minutes."""
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        t3_cfg = t3_cfg or T3Config()
        s3gen_cfg = s3gen_cfg or S3GenConfig()
        if synthetic:
            from ..runtime.fast_init import synthetic_init

            t3_params = synthetic_init(lambda k: init_t3(k, t3_cfg))
            s3gen_params = synthetic_init(lambda k: init_s3gen(k, s3gen_cfg))
            ve_params = synthetic_init(init_voice_encoder)
        else:
            # jit the inits: one fused executable each instead of thousands
            # of tiny RNG dispatches
            t3_params = jax.jit(lambda k: init_t3(k, t3_cfg))(k1)
            s3gen_params = jax.jit(lambda k: init_s3gen(k, s3gen_cfg))(k2)
            ve_params = jax.jit(init_voice_encoder)(k3)
        return cls(
            t3_params=t3_params,
            s3gen_params=s3gen_params,
            ve_params=ve_params,
            tokenizer=None,
            t3_cfg=t3_cfg,
            s3gen_cfg=s3gen_cfg,
        )

    def save_native(self, out_dir):
        """Write the converted JAX params as native safetensors pytrees so
        later loads skip the torch-layout conversion (checkpoint/pytree_io)."""
        from ..checkpoint.config_io import save_configs
        from ..checkpoint.pytree_io import save_params

        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        # checkpoints keep the canonical dense q/k/v layout; save a
        # canonicalized COPY (reassigning self.t3_params would force a
        # retrace of every cached T3 executable on a live server and drop
        # the fused/quantized-layout speedup)
        t3_to_save = self.t3_params
        if self._runtime_llama_layout(t3_to_save):
            from ..models.t3.llama import canonicalize_llama_params

            t3_to_save = dict(t3_to_save)
            t3_to_save["llama"] = jax.jit(
                lambda p: canonicalize_llama_params(p, self.t3_cfg.llama)
            )(t3_to_save["llama"])
        save_params(t3_to_save, out / "t3.jax.safetensors")
        save_params(self.s3gen_params, out / "s3gen.jax.safetensors")
        save_params(self.ve_params, out / "ve.jax.safetensors")
        save_configs(out / "config.json", self.t3_cfg, self.s3gen_cfg, self.ve_cfg)
        if self.conds is not None:
            self.conds.save(out / "conds.safetensors")

    @classmethod
    def from_native(cls, ckpt_dir, tokenizer_json=None) -> "ChatterboxTTS":
        """Load a save_native() checkpoint."""
        from ..checkpoint.pytree_io import load_params

        ckpt = Path(ckpt_dir)
        tok = None
        tok_path = tokenizer_json or (ckpt / "tokenizer.json")
        if Path(tok_path).exists():
            tok = EnTokenizer(str(tok_path))
        cfg_kw = {}
        if (ckpt / "config.json").exists():
            from ..checkpoint.config_io import load_configs

            t3c, s3c, vec = load_configs(ckpt / "config.json")
            cfg_kw = dict(t3_cfg=t3c, s3gen_cfg=s3c, ve_cfg=vec)
        obj = cls(
            t3_params=load_params(ckpt / "t3.jax.safetensors"),
            s3gen_params=load_params(ckpt / "s3gen.jax.safetensors"),
            ve_params=load_params(ckpt / "ve.jax.safetensors"),
            tokenizer=tok,
            **cfg_kw,
        )
        if (ckpt / "conds.safetensors").exists():
            obj.conds = Conditionals.load(ckpt / "conds.safetensors")
        return obj

    # ---------------------------------------------------------- conditioning
    def prepare_conditionals(self, wav_fpath_or_array, exaggeration: float = 0.5) -> Conditionals:
        """Reference wav -> Conditionals (tts.py:182-206). Pure function of
        inputs; also stored on self for generate() convenience parity."""
        from ..core.dsp import ve_mel_spectrogram
        from ..models.s3tokenizer import s3_tokenize
        from ..models.voice_encoder import frame_step, num_wins, ve_embed_from_mels

        if isinstance(wav_fpath_or_array, (str, Path)):
            ref24 = load_wav(wav_fpath_or_array, S3GEN_SR)
        else:
            ref24 = np.asarray(wav_fpath_or_array, np.float32)
        ref16 = np.asarray(resample(jnp.asarray(ref24), S3GEN_SR, S3_SR))

        # S3Gen ref: cap 10 s, pad to whole 40 ms tokens for clean 2:1 mel:token
        dec_ref = pad_to_token_multiple(ref24[: self.DEC_COND_LEN], S3GEN_SR)

        # T3 prompt source: 6 s cap (tts.py:192-195)
        enc_ref = pad_to_token_multiple(ref16[: self.ENC_COND_LEN])

        # VoiceEncoder input: trim silence host-side, bucket to 0.5 s, mask
        # the padded windows out of the partial average
        ve_wav = trim_silence(ref16, top_db=20)
        bucket = 8000  # 0.5 s at 16 kHz
        ve_len = max(int(np.ceil(len(ve_wav) / bucket)) * bucket, bucket)
        ve_padded = np.zeros(ve_len, np.float32)
        ve_padded[: len(ve_wav)] = ve_wav
        step = frame_step(self.ve_cfg, self.ve_cfg.default_rate)
        valid_mel_frames = 1 + len(ve_wav) // 160  # center=True mel frames
        n_valid = num_wins(max(valid_mel_frames, 1), step, self.ve_cfg)

        # three separate cached jits: one mega-graph compiles super-linearly
        # slowly on remote-compile backends (~12 min vs ~3 min split)
        s3gen_cfg, ve_cfg, t3_cfg = self.s3gen_cfg, self.ve_cfg, self.t3_cfg
        kd = ("dec", len(dec_ref))
        if kd not in self._jit_embed_ref:
            self._jit_embed_ref[kd] = jax.jit(
                lambda sp, w: embed_ref(sp, s3gen_cfg, w, S3GEN_SR)
            )
        ke = ("enc", len(enc_ref))
        if ke not in self._jit_embed_ref:
            self._jit_embed_ref[ke] = jax.jit(
                lambda sp, w: s3_tokenize(
                    sp["tokenizer"], s3gen_cfg.tokenizer, w,
                    max_len=t3_cfg.speech_cond_prompt_len,
                )[0]
            )
        kv = ("ve", ve_len)
        if kv not in self._jit_embed_ref:
            self._jit_embed_ref[kv] = jax.jit(
                lambda vp, w, nv: ve_embed_from_mels(
                    vp, ve_cfg, ve_mel_spectrogram(w).transpose(0, 2, 1), n_valid_windows=nv
                )
            )

        ref_dict = self._jit_embed_ref[kd](self.s3gen_params, jnp.asarray(dec_ref)[None])
        prompt_tokens = self._jit_embed_ref[ke](self.s3gen_params, jnp.asarray(enc_ref)[None])
        ve_embed = self._jit_embed_ref[kv](
            self.ve_params, jnp.asarray(ve_padded)[None], jnp.asarray([n_valid], jnp.int32)
        )

        conds = Conditionals(
            T3CondData(ve_embed, prompt_tokens.astype(jnp.int32), jnp.full((1,), exaggeration)),
            ref_dict,
        )
        self.conds = conds
        return conds

    # ------------------------------------------------------------- generate
    def generate(
        self,
        text: str,
        repetition_penalty: float = 1.2,
        min_p: float = 0.05,
        top_p: float = 1.0,
        audio_prompt_path=None,
        exaggeration: float = 0.5,
        cfg_weight: float = 0.5,
        temperature: float = 0.8,
        seed: int = 0,
        max_new_tokens: int = 1000,
        min_new_tokens: int = 0,
        num_return_sequences: int = 1,
        greedy: bool = False,
        flow_steps: Optional[int] = None,
        alignment: bool = False,
    ) -> np.ndarray:
        """Single-utterance API-parity generate (tts.py:208-272) -> (k, T)
        with k = ``num_return_sequences`` (k=1 default -> (1, T)).

        ``num_return_sequences > 1`` samples k distinct variants in one
        batched decode (reference T3.inference kwarg, t3.py:215) -- each
        batch row consumes independent RNG draws -- and returns ALL of them,
        right-padded to the longest."""
        wavs = self.generate_batch(
            [text] * num_return_sequences,
            conds=None if audio_prompt_path is None else self.prepare_conditionals(audio_prompt_path, exaggeration),
            repetition_penalty=repetition_penalty,
            min_p=min_p,
            top_p=top_p,
            exaggeration=exaggeration,
            cfg_weight=cfg_weight,
            temperature=temperature,
            seed=seed,
            max_new_tokens=max_new_tokens,
            min_new_tokens=min_new_tokens,
            greedy=greedy,
            flow_steps=flow_steps,
            alignment=alignment,
        )
        t = max(len(w) for w in wavs)
        out = np.zeros((len(wavs), t), np.float32)
        for i, w in enumerate(wavs):
            out[i, : len(w)] = w
        return out

    def generate_batch(
        self,
        texts: List[str],
        conds: Optional[Conditionals] = None,
        repetition_penalty: float = 1.2,
        min_p: float = 0.05,
        top_p: float = 1.0,
        exaggeration: float = 0.5,
        cfg_weight: float = 0.5,
        temperature: float = 0.8,
        seed: int = 0,
        max_new_tokens: int = 1000,
        min_new_tokens: int = 0,
        greedy: bool = False,
        device_chain: bool = False,
        defer_collect: bool = False,
        flow_steps: Optional[int] = None,
        alignment: bool = False,
    ) -> List[np.ndarray]:
        """Batched generation: one T3 decode + one S3Gen over the batch.

        ``device_chain=True`` keeps the whole chain on device (invalid-token
        compaction included) with no host sync between T3 and S3Gen -- best
        throughput when generations run near max_new_tokens (the flow then
        always runs at the max_new bucket).

        ``flow_steps`` overrides the CFM Euler step count for THIS call (the
        serving quality tier: 4 = "turbo", None = the pipeline default).
        Executables are jit-cache-keyed per step count, so tiers coexist warm.

        ``alignment=True`` runs the hallucination watchdog inside the decode
        loop (models/t3/alignment.py: false-start/long-tail/repetition
        detection with forced EOS, the reference's AlignmentStreamAnalyzer
        capability, alignment_stream_analyzer.py:29-154). It selects the XLA
        decode step (the Pallas kernel does not collect attention maps) --
        measured cost in docs/PERFORMANCE.md."""
        conds = conds or self.conds
        assert conds is not None, "prepare_conditionals first or pass conds"
        # check EVERY row: stacked mixed-voice conds (Conditionals.stack) may
        # carry per-profile emotion values -- the per-call exaggeration must
        # override all of them, not just row 0 (order-independent)
        if bool(np.any(np.asarray(conds.t3.emotion_adv) != exaggeration)):
            conds = conds.with_exaggeration(exaggeration)

        b = len(texts)
        tok_rows = [self._cap_text_row(self._encode_text(t)) for t in texts]
        lens = np.array([len(r) for r in tok_rows], np.int32)
        tmax = _bucket(int(lens.max()), TEXT_BUCKETS)
        if b > self._budget_batch_cap(max_new_tokens, pipelined=False, text_bucket=tmax):
            # chunk through the pipelined path: each chunk's decode graph
            # fits HBM; chip work stays saturated via async dispatch
            assert not defer_collect, "defer_collect requires b <= max_device_batch"
            # split EVENLY under the cap (16 at cap 11 -> 8+8, not 11+5: the
            # straggler chunk wastes most of its dispatch)
            cap0 = self._budget_batch_cap(max_new_tokens, pipelined=True, text_bucket=tmax)
            step = -(-b // -(-b // cap0))
            rows = self.generate_batches_pipelined(
                [texts[i : i + step] for i in range(0, b, step)],
                conds=conds,
                repetition_penalty=repetition_penalty,
                min_p=min_p,
                top_p=top_p,
                exaggeration=exaggeration,
                cfg_weight=cfg_weight,
                temperature=temperature,
                seed=seed,
                max_new_tokens=max_new_tokens,
                min_new_tokens=min_new_tokens,
                greedy=greedy,
                flow_steps=flow_steps,
                alignment=alignment,
            )
            return [w for chunk in rows for w in chunk]
        text_tokens = np.zeros((b, tmax), np.int32)
        for i, r in enumerate(tok_rows):
            text_tokens[i, : len(r)] = r

        sampling = SamplingConfig(
            temperature=temperature,
            top_p=top_p,
            min_p=min_p,
            repetition_penalty=repetition_penalty,
            cfg_weight=cfg_weight,
            min_new_tokens=min_new_tokens,
            greedy=greedy,
        )

        t3 = self._get_t3_fn(b, tmax, max_new_tokens, sampling, alignment=alignment)
        t3c = conds.t3
        tok_in, lens_in = jnp.asarray(text_tokens), jnp.asarray(lens)
        spk, ptk, emo = t3c.speaker_emb, t3c.prompt_tokens, t3c.emotion_adv
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dsh = NamedSharding(self.mesh, P("data"))
            rsh = NamedSharding(self.mesh, P())
            tok_in, lens_in = jax.device_put(tok_in, dsh), jax.device_put(lens_in, dsh)
            # shared conditioning is replicated; tiled to the batch inside jit
            spk, ptk, emo = (jax.device_put(x, rsh) for x in (spk, ptk, emo))
        res = t3(
            self.t3_params,
            tok_in,
            lens_in,
            spk,
            ptk,
            emo,
            jax.random.PRNGKey(seed),
        )
        if device_chain:
            # all-device chain: drop-invalid compaction runs on device and
            # S3Gen is dispatched without waiting for the T3 readback
            # (flow runs at the full max_new bucket)
            key = ("compact", res.tokens.shape)
            cfn = self._jit_s3gen.get(key)
            if cfn is None:
                cfn = jax.jit(_compact_tokens)
                self._jit_s3gen[key] = cfn
            speech_j, clean_lens_j = cfn(res.tokens, res.lengths)
            wav, wav_lens = self._run_s3gen(
                speech_j, clean_lens_j, conds.gen, b, seed, flow_steps=flow_steps
            )
            if defer_collect:
                return (wav, wav_lens)
        else:
            tokens = np.asarray(res.tokens)
            tok_lens = np.asarray(res.lengths)

            # host: drop invalid tokens per row (tts.py:256-262)
            clean_rows, clean_lens = [], []
            for i in range(b):
                row = tokens[i, : tok_lens[i]]
                row = row[row < SPEECH_VOCAB_SIZE]
                clean_rows.append(row)
                clean_lens.append(len(row))
            tbucket = _bucket(max(max(clean_lens), 2), TOKEN_BUCKETS)
            speech = np.zeros((b, tbucket), np.int32)
            for i, r in enumerate(clean_rows):
                speech[i, : len(r)] = r

            wav, wav_lens = self._run_s3gen(
                jnp.asarray(speech), jnp.asarray(np.array(clean_lens, np.int32)),
                conds.gen, b, seed, flow_steps=flow_steps,
            )
        return self.collect((wav, wav_lens))

    def _kv_quant_for(self, max_new_tokens: int) -> bool:
        """Effective int8-KV policy for a token budget. An explicit flag
        (constructor / CHATTERBOX_KV_QUANT) wins; the auto default enables
        quantization only at long budgets, where the measured win is ~+4%
        @1000 tokens vs neutral @250 (docs/PERFORMANCE.md A/B)."""
        if self.kv_quant is not None:
            return self.kv_quant
        return max_new_tokens >= 500

    def _budget_batch_cap(
        self, max_new_tokens: int, pipelined: bool, text_bucket: int = 64
    ) -> int:
        """Largest per-dispatch batch whose decode graph fits HBM at this
        token budget. The KV cache dominates: (L, 2, 2b CFG rows, H, D, S)
        bf16 with S ~ cond + text + budget. Measured anchors (v5e, 16 GB,
        64-token text bucket): b16 @1000 tokens (8.6 GB cache) OOM'd at the
        watermark dispatch; b8 @1000 (4.3 GB) ran pipelined (two graphs in
        flight); b64 @250 (12.1 GB) fits one-shot but not two
        (max_pipelined_batch=32). ``text_bucket`` is the caller's actual
        padded text length -- a 512-bucket batch carries ~1.4x the cache of
        the 64-bucket anchors at 1000 tokens and caps lower. int8 KV
        (kv_quant / auto policy) halves the cache bytes."""
        cfg = self.t3_cfg.llama
        s = 34 + text_bucket + 2 + max_new_tokens  # cond + text bucket + BOS
        s = -(-s // 128) * 128
        itemsize = 1 if self._kv_quant_for(max_new_tokens) else 2
        per_row = (
            cfg.num_hidden_layers * 2 * 2 * cfg.num_key_value_heads
            * cfg.head_dim * s * itemsize
        )
        # cache-byte budgets calibrated to the anchors above: activations
        # (flow/hift) scale with b*S too, and the pipelined path keeps TWO
        # graphs in flight -- b16@1000 (4.5 GB cache) OOM'd pipelined while
        # b32@250 (3.0 GB) and b8@1000 (2.3 GB) ran
        budget = 3.2e9 if pipelined else 7.0e9
        cap = max(1, int(budget // max(per_row, 1)))
        hard = min(self.max_device_batch, self.max_pipelined_batch) if pipelined else self.max_device_batch
        return min(hard, cap)

    def collect(self, handle) -> List[np.ndarray]:
        """Materialize a deferred generate_batch result (device -> host)."""
        wav, wav_lens = handle
        marked = np.asarray(wav)
        if marked.dtype == np.int16:
            marked = marked.astype(np.float32) / 32767.0
        lens = np.asarray(wav_lens)
        return [marked[i, : int(lens[i])] for i in range(marked.shape[0])]

    def generate_batches_pipelined(self, batches: List[List[str]], **kw) -> List[List[np.ndarray]]:
        """Generate several batches, overlapping each batch's host collection
        with the next batch's device dispatch (jax async dispatch).

        Batches larger than ``max_device_batch`` are split into sub-batches
        (each decode graph must fit HBM) and their outputs re-joined."""
        base_seed = kw.pop("seed", 0)
        conds = kw.pop("conds", None)
        batched_conds = (
            conds is not None and conds.t3.speaker_emb.shape[0] > 1
        )
        if batched_conds:
            # per-row conds must partition exactly like the texts do
            total = sum(len(t) for t in batches)
            assert conds.t3.speaker_emb.shape[0] == total, (
                "batched conds rows must match the total text count",
                conds.t3.speaker_emb.shape[0], total,
            )
        # size chunks for the LONGEST text bucket any chunk will pad to (the
        # cap must hold for the worst chunk; re-encoding later is cheap)
        row_lens = [
            len(self._cap_text_row(self._encode_text(t)))
            for texts in batches
            for t in texts
        ]
        tb = _bucket(max(row_lens, default=2), TEXT_BUCKETS)
        cap = self._budget_batch_cap(
            kw.get("max_new_tokens", 1000), pipelined=True, text_bucket=tb
        )
        chunks = []  # (orig batch index, texts, conds row offset)
        off = 0
        for i, texts in enumerate(batches):
            # even split under the cap (see generate_batch)
            step = -(-len(texts) // -(-len(texts) // cap)) if texts else cap
            for j in range(0, len(texts), step):
                chunks.append((i, texts[j : j + step], off + j))
            off += len(texts)
        handles = []  # (orig batch index, handle)
        out = [[] for _ in batches]
        for c, (i, texts, o) in enumerate(chunks):
            ck = conds.rows(o, o + len(texts)) if conds is not None else None
            handles.append(
                (i, self.generate_batch(
                    texts, conds=ck, seed=base_seed + c,
                    device_chain=True, defer_collect=True, **kw
                ))
            )
            if len(handles) > 1:
                oi, h = handles.pop(0)
                out[oi].extend(self.collect(h))
        while handles:
            oi, h = handles.pop(0)
            out[oi].extend(self.collect(h))
        return out

    def generate_batch_preemptible(
        self,
        texts: List[str],
        conds: Optional[Conditionals] = None,
        lock=None,
        t3_chunk_tokens: int = 50,
        s3gen_max_rows: Optional[int] = None,
        repetition_penalty: float = 1.2,
        min_p: float = 0.05,
        top_p: float = 1.0,
        exaggeration: float = 0.5,
        cfg_weight: float = 0.5,
        temperature: float = 0.8,
        seed: int = 0,
        max_new_tokens: int = 1000,
        min_new_tokens: int = 0,
        flow_steps: Optional[int] = None,
        alignment: bool = False,
    ) -> List[np.ndarray]:
        """generate_batch with BOUNDED device dispatches: the T3 decode runs
        as resumable ``t3_chunk_tokens``-step chunks (the streaming carry,
        token-identical to one-shot decoding) and the synthesis stage splits
        to <= ``s3gen_max_rows`` rows per dispatch, releasing ``lock``
        between dispatches.

        This is the serving layer's mixed-load admission control
        (serve/batcher.py): under the FIFO device lock a whole-batch
        dispatch makes concurrent realtime streams wait ~1.6 s per tick
        (measured per-stream RTF ~2.4, docs/PERFORMANCE.md); chunked bulk
        work bounds a stream tick's wait to one sub-second dispatch. The
        TPU-native answer to the reference's one-request-at-a-time server
        (src/server/server.py:188-299). Costs the bulk batch the per-chunk
        dispatch overhead -- measured delta in docs/PERFORMANCE.md."""
        import contextlib

        lock = lock if lock is not None else contextlib.nullcontext()
        if alignment:
            # the watchdog needs the in-loop attention path; run whole-batch
            # under the lock (alignment requests are a debug/QA surface)
            with lock:
                return self.generate_batch(
                    texts, conds=conds, repetition_penalty=repetition_penalty,
                    min_p=min_p, top_p=top_p, exaggeration=exaggeration,
                    cfg_weight=cfg_weight, temperature=temperature, seed=seed,
                    max_new_tokens=max_new_tokens,
                    min_new_tokens=min_new_tokens, flow_steps=flow_steps,
                    alignment=True,
                )
        conds = conds or self.conds
        assert conds is not None, "prepare_conditionals first or pass conds"
        if bool(np.any(np.asarray(conds.t3.emotion_adv) != exaggeration)):
            conds = conds.with_exaggeration(exaggeration)

        b = len(texts)
        tok_rows = [self._cap_text_row(self._encode_text(t)) for t in texts]
        lens = np.array([len(r) for r in tok_rows], np.int32)
        tmax = _bucket(int(lens.max()), TEXT_BUCKETS)
        cap = self._budget_batch_cap(max_new_tokens, pipelined=False, text_bucket=tmax)
        if b > cap:
            step = -(-b // -(-b // cap))
            out = []
            for j, i0 in enumerate(range(0, b, step)):
                sub = texts[i0 : i0 + step]
                out.extend(
                    self.generate_batch_preemptible(
                        sub, conds=conds.rows(i0, i0 + len(sub)), lock=lock,
                        t3_chunk_tokens=t3_chunk_tokens,
                        s3gen_max_rows=s3gen_max_rows,
                        repetition_penalty=repetition_penalty, min_p=min_p,
                        top_p=top_p, exaggeration=exaggeration,
                        cfg_weight=cfg_weight, temperature=temperature,
                        seed=seed + j, max_new_tokens=max_new_tokens,
                        min_new_tokens=min_new_tokens, flow_steps=flow_steps,
                    )
                )
            return out
        text_tokens = np.zeros((b, tmax), np.int32)
        for i, r in enumerate(tok_rows):
            text_tokens[i, : len(r)] = r

        sampling = SamplingConfig(
            temperature=temperature, top_p=top_p, min_p=min_p,
            repetition_penalty=repetition_penalty, cfg_weight=cfg_weight,
            min_new_tokens=min_new_tokens,
        )
        kvq = self._kv_quant_for(max_new_tokens)
        from .streaming import t3_chunked_start_fn, t3_chunked_step_fn

        start_fn = t3_chunked_start_fn(self, b, tmax, max_new_tokens, sampling, kvq)
        step_fn = t3_chunked_step_fn(
            self, b, tmax, max_new_tokens, sampling, t3_chunk_tokens, kvq
        )

        t3c = conds.t3
        lens_j = jnp.asarray(lens)
        with lock:
            carry = start_fn(
                self.t3_params, jnp.asarray(text_tokens), lens_j,
                t3c.speaker_emb, t3c.prompt_tokens, t3c.emotion_adv,
                jax.random.PRNGKey(seed),
            )
        while True:
            with lock:
                carry, res = step_fn(self.t3_params, carry, lens_j)
                steps = int(res.steps)  # sync: the chunk finished on device
                finished = bool(np.asarray(carry.done).all())
            if finished or steps >= max_new_tokens:
                break
        tokens = np.asarray(res.tokens)
        tok_lens = np.asarray(res.lengths)

        # host: drop invalid tokens per row (tts.py:256-262)
        clean_rows = []
        for i in range(b):
            row = tokens[i, : tok_lens[i]]
            clean_rows.append(row[row < SPEECH_VOCAB_SIZE])
        clean_lens = np.array([len(r) for r in clean_rows], np.int32)
        tbucket = _bucket(max(int(clean_lens.max()), 2), TOKEN_BUCKETS)
        speech = np.zeros((b, tbucket), np.int32)
        for i, r in enumerate(clean_rows):
            speech[i, : len(r)] = r

        rows_cap = s3gen_max_rows or b
        handles = []
        for i0 in range(0, b, rows_cap):
            i1 = min(b, i0 + rows_cap)
            ref = conds.rows(i0, i1).gen
            with lock:
                handles.append(
                    self._run_s3gen(
                        jnp.asarray(speech[i0:i1]), jnp.asarray(clean_lens[i0:i1]),
                        ref, i1 - i0, seed, flow_steps=flow_steps,
                    )
                )
        out = []
        for h in handles:  # readbacks don't occupy the device: no lock
            out.extend(self.collect(h))
        return out

    def _apply_watermark_device(self, wav):
        """Watermark a (B, T) device array via a cached jit -- keeps the data
        on device (fusing into the synthesis graph blows up remote compile).
        Returns int16 PCM: halves the device->host readback.

        Neural (Perth-checkpoint) engines have no precomputable band pattern;
        they run their own jitted apply on the batch instead."""
        wm = self.watermarker
        if not hasattr(wm, "band_pattern"):
            y = wm.apply_watermark(np.asarray(wav))
            return jnp.round(jnp.clip(jnp.asarray(y), -1.0, 1.0) * 32767.0).astype(jnp.int16)
        key = ("wm", wav.shape)
        fn = self._jit_s3gen.get(key)
        if fn is None:

            @jax.jit
            def fn(w, pattern):
                y = wm.apply_in_graph(w, pattern)
                return jnp.round(jnp.clip(y, -1.0, 1.0) * 32767.0).astype(jnp.int16)

            self._jit_s3gen[key] = fn
        return fn(wav, jnp.asarray(self.watermarker.band_pattern()))

    # ------------------------------------------------------------- internals
    def _encode_text(self, text: str) -> np.ndarray:
        text = punc_norm(text)
        if self.tokenizer is not None:
            ids = self.tokenizer.encode(text)
        else:  # random-weights mode: hash chars into the text vocab
            ids = [(ord(c) % 700) + 1 for c in text]
        sot, eot = self.t3_cfg.start_text_token, self.t3_cfg.stop_text_token
        return np.array([sot] + list(ids) + [eot], np.int32)

    def _cap_text_row(self, row: np.ndarray) -> np.ndarray:
        """Truncate an encoded row to the largest text bucket, keeping the
        EOT framing token. ``_bucket`` clamps to buckets[-1], so an
        over-long row would otherwise crash the fixed-width assignment --
        and inside a coalesced server batch that exception would fail every
        co-batched request."""
        cap = TEXT_BUCKETS[-1]
        if len(row) <= cap:
            return row
        return np.concatenate([row[: cap - 1], row[-1:]]).astype(np.int32)

    @staticmethod
    def _tile_conds_in_jit(t3c: T3CondData, b) -> T3CondData:
        def tile(x):
            return jnp.broadcast_to(x, (b,) + x.shape[1:]) if x.shape[0] == 1 else x

        return T3CondData(tile(t3c.speaker_emb), tile(t3c.prompt_tokens), tile(t3c.emotion_adv))

    def _get_t3_fn(self, b, tmax, max_new, sampling: SamplingConfig,
                   alignment: bool = False):
        kvq = self._kv_quant_for(max_new)
        key = (b, tmax, max_new, sampling, self.mesh is None, kvq, alignment)
        fn = self._jit_t3.get(key)
        if fn is None:
            cfg = self.t3_cfg
            # the flash-decode kernel has no shard_map wrapper yet: under a
            # real GSPMD mesh, fall back to the XLA scan step (which GSPMD
            # partitions natively); single-chip keeps the kernel. The
            # alignment watchdog rides the kernel too (r5): it emits its
            # softmax stats and the text-window probs are reconstructed with
            # one small XLA read (measured 3.38 vs 6.27 ms/step on the old
            # XLA fallback). int8 KV is not plumbed through that read.
            use_pallas = self.mesh is None
            cache_quant = kvq and use_pallas and not alignment

            @jax.jit
            def run(p, text, lens, spk, prompt, emo, rng):
                bb = text.shape[0]
                t3c = self._tile_conds_in_jit(T3CondData(spk, prompt, emo), bb)
                return t3_generate(
                    p, cfg, text, lens, t3c.speaker_emb, t3c.prompt_tokens,
                    t3c.emotion_adv, rng, sampling, max_new,
                    alignment=alignment,
                    use_pallas=use_pallas, cache_quant=cache_quant,
                )

            fn = run
            self._jit_t3[key] = fn
        return fn

    def _effective_flow_steps(self, flow_steps: Optional[int]) -> int:
        """Per-call CFM step-count override (serving quality tier), falling
        back to the pipeline default. Validated like flow_steps_from_env."""
        if flow_steps is None:
            return self.s3gen_cfg.flow.n_timesteps
        if flow_steps < 1:
            raise ValueError(f"flow_steps must be >= 1, got {flow_steps}")
        return int(flow_steps)

    def _run_s3gen(self, speech, speech_lens, ref: RefDict, b: int, seed: int,
                   flow_steps: Optional[int] = None):
        p_len = ref.prompt_token.shape[1]
        tbucket = speech.shape[1]
        n_steps = self._effective_flow_steps(flow_steps)
        key = (b, p_len, tbucket, self.mesh is None, self.hift_bf16, n_steps)
        fn = self._jit_s3gen.get(key)
        if fn is None:
            from dataclasses import replace

            cfg = self.s3gen_cfg
            if n_steps != cfg.flow.n_timesteps:
                cfg = replace(cfg, flow=replace(cfg.flow, n_timesteps=n_steps))
            hift_dtype = jnp.bfloat16 if self.hift_bf16 else None
            # flash attention lacks a shard_map wrapper; meshed runs take the
            # XLA attention path (GSPMD-partitionable). The module flag is
            # read at trace time -- the first call below traces immediately.
            from ..models.s3gen import unet as unet_mod

            unet_mod.FLASH_ATTENTION = self.mesh is None

            @jax.jit
            def run(p, tokens, lens, ref, noise, rng):
                # broadcast shared conditioning/noise inside the jit region
                bb = tokens.shape[0]
                noise = jnp.broadcast_to(noise, (bb,) + noise.shape[1:])
                ref = RefDict(
                    *[
                        jnp.broadcast_to(x, (bb,) + x.shape[1:]) if x.shape[0] == 1 else x
                        for x in ref
                    ]
                )
                return s3gen_wav(
                    p, cfg, tokens, lens, ref, noise, rng=rng,
                    hift_dtype=hift_dtype,
                )[:2]

            fn = run
            self._jit_s3gen[key] = fn
        total = 2 * (p_len + tbucket)
        noise = self._cfm_noise[:, :total]
        wav, wav_lens = fn(
            self.s3gen_params, speech, speech_lens, ref, noise, jax.random.PRNGKey(seed + 1)
        )
        # separate small jit (cached by shape), input stays on device
        wav = self._apply_watermark_device(wav)
        return wav, wav_lens

"""ChatterboxVC: voice conversion (source speech -> target speaker voice).

Parity target: reference vc.py (set_target_voice / generate): tokenize the
source speech with the S3 tokenizer, re-synthesize through S3Gen with the
target-voice RefDict, watermark. Batched and bucketed like the TTS pipeline.
"""

import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import S3GEN_SR, S3_SR
from ..checkpoint.safetensors_io import load_safetensors
from ..models.s3gen.s3gen import (
    RefDict,
    S3GenConfig,
    convert_s3gen,
    embed_ref,
    flow_steps_from_env,
    init_s3gen,
    s3gen_wav,
)
from ..models.s3tokenizer import pad_to_token_multiple, s3_tokenize
from ..models.watermark import PerthImplicitWatermarker
from .audio import load_wav
from .tts import TOKEN_BUCKETS, _bucket


@dataclass
class ChatterboxVC:
    s3gen_params: dict
    s3gen_cfg: S3GenConfig = field(default_factory=S3GenConfig)
    ref_dict: Optional[RefDict] = None
    sr: int = S3GEN_SR
    # bf16 HiFT conv trunk (phase math stays fp32); see pipeline/tts.py
    hift_bf16: bool = field(
        default_factory=lambda: os.environ.get("CHATTERBOX_HIFT_BF16", "0") == "1"
    )

    ENC_COND_LEN = 6 * S3_SR
    DEC_COND_LEN = 10 * S3GEN_SR

    def __post_init__(self):
        # CFM Euler step-count knob (CHATTERBOX_FLOW_STEPS; measured curve
        # in docs/PERFORMANCE.md). No-op unless the env opt-in is set.
        self.s3gen_cfg = flow_steps_from_env(self.s3gen_cfg)
        self.watermarker = PerthImplicitWatermarker()
        self._cfm_noise = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 15000, 80)).astype(np.float32)
        )
        self._jit = {}
        self.mesh = None

    def with_mesh(self, mesh) -> "ChatterboxVC":
        """Data-parallel VC over a ("data","model") mesh (BASELINE config 5:
        batched E2E VC across hosts): params replicated, source batch sharded."""
        from ..parallel.sharding import replicated, shard_params

        self.mesh = mesh
        self.s3gen_params = shard_params(self.s3gen_params, mesh)
        return self

    @classmethod
    def from_local(cls, ckpt_dir) -> "ChatterboxVC":
        ckpt_dir = Path(ckpt_dir)
        cfg = S3GenConfig()
        sd = load_safetensors(ckpt_dir / "s3gen.safetensors")
        obj = cls(s3gen_params=jax.tree.map(jnp.asarray, convert_s3gen(sd, cfg)), s3gen_cfg=cfg)
        conds = ckpt_dir / "conds.pt"
        if conds.exists():
            from .conditionals import Conditionals

            obj.ref_dict = Conditionals.load_torch(conds).gen
        return obj

    @classmethod
    def from_random(cls, seed: int = 0, s3gen_cfg: S3GenConfig = None) -> "ChatterboxVC":
        s3gen_cfg = s3gen_cfg or S3GenConfig()
        params = jax.jit(lambda k: init_s3gen(k, s3gen_cfg))(jax.random.PRNGKey(seed))
        return cls(s3gen_params=params, s3gen_cfg=s3gen_cfg)

    def set_target_voice(self, wav_fpath_or_array):
        """vc.py:76-81: 10 s cap on the reference voice."""
        if isinstance(wav_fpath_or_array, (str, Path)):
            ref = load_wav(wav_fpath_or_array, S3GEN_SR)
        else:
            ref = np.asarray(wav_fpath_or_array, np.float32)
        ref = pad_to_token_multiple(ref[: self.DEC_COND_LEN], S3GEN_SR)
        fn = self._jit.get(("embed", len(ref)))
        if fn is None:
            fn = jax.jit(lambda p, w: embed_ref(p, self.s3gen_cfg, w, S3GEN_SR))
            self._jit[("embed", len(ref))] = fn
        self.ref_dict = fn(self.s3gen_params, jnp.asarray(ref)[None])
        return self.ref_dict

    def generate(self, audio, target_voice_path=None, seed: int = 0,
                 flow_steps: Optional[int] = None) -> np.ndarray:
        """Single-source API parity (vc.py:83-104) -> (1, T) waveform."""
        return self.generate_batch(
            [audio], target_voice_path, seed=seed, flow_steps=flow_steps
        )[0][None]

    def _pack_sources(self, audios: List):
        """Host-side packing: sources -> (int16 batch, n_toks, wav_bucket).

        int16 PCM because the tunneled host->device link runs at ~13 MB/s
        and a b32 float batch is ~20 MB. WAV sources ARE 16-bit PCM (librosa
        floats are n/32768), so scaling by 32768 recovers n exactly --
        lossless for real inputs; the device converts back inside the jit."""
        srcs = []
        max_samples = TOKEN_BUCKETS[-1] * 640  # largest token bucket (40 s @16k)
        for a in audios:
            wav = load_wav(a, S3_SR) if isinstance(a, (str, Path)) else np.asarray(a, np.float32)
            # _bucket clamps to buckets[-1]; truncate over-long sources so the
            # fixed-width row assignment cannot overflow (split longer audio
            # into <=40 s pieces upstream if full conversion is needed)
            srcs.append(pad_to_token_multiple(wav[:max_samples]))
        n_toks = [len(s) // 640 for s in srcs]
        wav_bucket = _bucket(max(n_toks), TOKEN_BUCKETS) * 640
        batch = np.zeros((len(srcs), wav_bucket), np.int16)
        for i, s in enumerate(srcs):
            batch[i, : len(s)] = np.clip(
                np.round(s * 32768.0), -32768, 32767
            ).astype(np.int16)
        return batch, np.array(n_toks, np.int32), wav_bucket

    def _upload_sources(self, packed):
        """Start the H2D transfer (jax device transfers are async: the
        returned arrays carry pending copies, letting an uploader thread
        overlap the next batch's ~MBs with the current batch's compute)."""
        batch, n_toks, wav_bucket = packed
        batch_in = jnp.asarray(batch)
        lens_in = jnp.asarray(n_toks)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dsh = NamedSharding(self.mesh, P("data"))
            batch_in, lens_in = jax.device_put(batch_in, dsh), jax.device_put(lens_in, dsh)
        return batch_in, lens_in, wav_bucket

    def _effective_flow_steps(self, flow_steps: Optional[int]) -> int:
        """Per-call CFM step-count override (quality tier; see pipeline/tts)."""
        if flow_steps is None:
            return self.s3gen_cfg.flow.n_timesteps
        if flow_steps < 1:
            raise ValueError(f"flow_steps must be >= 1, got {flow_steps}")
        return int(flow_steps)

    def generate_batch(self, audios: List = None, target_voice_path=None, seed: int = 0,
                       defer_collect: bool = False, _uploaded=None,
                       flow_steps: Optional[int] = None) -> List[np.ndarray]:
        """``defer_collect=True`` returns a device handle; ``collect`` it
        later (lets the host readback of batch N-1 overlap batch N's device
        work, same as the TTS pipeline). ``_uploaded``: pre-transferred
        sources from _upload_sources (the pipelined path's overlap).
        ``flow_steps`` overrides the CFM Euler step count per call (VC is
        flow-dominated: 4 steps measured +79% throughput @b8)."""
        if target_voice_path is not None:
            self.set_target_voice(target_voice_path)
        assert self.ref_dict is not None, "set_target_voice first or pass target_voice_path"

        if _uploaded is None:
            _uploaded = self._upload_sources(self._pack_sources(audios))
        batch_in, lens_in, wav_bucket = _uploaded

        b = batch_in.shape[0]
        n_steps = self._effective_flow_steps(flow_steps)
        key = ("vc", b, wav_bucket, self.ref_dict.prompt_token.shape[1],
               self.hift_bf16, n_steps)
        fn = self._jit.get(key)
        if fn is None:
            from dataclasses import replace

            cfg = self.s3gen_cfg
            if n_steps != cfg.flow.n_timesteps:
                cfg = replace(cfg, flow=replace(cfg.flow, n_timesteps=n_steps))
            hift_dtype = jnp.bfloat16 if self.hift_bf16 else None

            @jax.jit
            def run(p, wav_pcm, lens, ref, noise, rng):
                wav16 = wav_pcm.astype(jnp.float32) / 32768.0
                bb = wav16.shape[0]
                noise = jnp.broadcast_to(noise, (bb,) + noise.shape[1:])
                ref = RefDict(
                    *[
                        jnp.broadcast_to(x, (bb,) + x.shape[1:]) if x.shape[0] == 1 else x
                        for x in ref
                    ]
                )
                # mask pad-region mel keys: a row's tokens must not depend
                # on the longer rows it was batched with
                tokens, _ = s3_tokenize(
                    p["tokenizer"], cfg.tokenizer, wav16, wav_lens=lens * 640
                )
                return s3gen_wav(
                    p, cfg, tokens, lens, ref, noise, rng=rng,
                    hift_dtype=hift_dtype,
                )[:2]

            fn = run
            self._jit[key] = fn

        p_len = self.ref_dict.prompt_token.shape[1]
        total = 2 * (p_len + wav_bucket // 640)
        noise = self._cfm_noise[:, :total]
        ref_b = self.ref_dict
        wav, wav_lens = fn(
            self.s3gen_params,
            batch_in,
            lens_in,
            ref_b,
            noise,
            jax.random.PRNGKey(seed + 1),
        )
        key_wm = ("wm", wav.shape)
        wmk = self._jit.get(key_wm)
        if wmk is None:
            apply_in_graph = self.watermarker.apply_in_graph

            @jax.jit
            def wmk(w, pattern):
                # int16 PCM readback halves the device->host transfer
                # (~13 MB/s tunnel), same as the TTS pipeline
                y = apply_in_graph(w, pattern)
                return jnp.round(jnp.clip(y, -1.0, 1.0) * 32767.0).astype(jnp.int16)

            self._jit[key_wm] = wmk
        wav = wmk(wav, jnp.asarray(self.watermarker.band_pattern()))
        if defer_collect:
            return (wav, wav_lens)
        return self.collect((wav, wav_lens))

    def collect(self, handle) -> List[np.ndarray]:
        """Materialize a deferred generate_batch result (device -> host)."""
        wav, wav_lens = handle
        marked = np.asarray(wav).astype(np.float32) / 32767.0
        lens = np.asarray(wav_lens)
        return [marked[i, : int(lens[i])] for i in range(marked.shape[0])]

    def generate_batches_pipelined(self, batches: List[List], target_voice_path=None,
                                   seed: int = 0,
                                   flow_steps: Optional[int] = None) -> List[List[np.ndarray]]:
        """Convert several batches, overlapping (a) each batch's host
        collection AND (b) the NEXT batch's source upload with the current
        batch's device compute (r2 verdict #8: a b32 int16 source batch is
        ~10 MB of H2D on the ~13 MB/s tunnel -- serialized, that tax made
        b32 VC slower per chip than b8). An uploader thread keeps one
        packed+transferring batch in flight ahead of the dispatch loop."""
        from concurrent.futures import ThreadPoolExecutor

        if target_voice_path is not None:
            self.set_target_voice(target_voice_path)
        handles, out = [], []
        with ThreadPoolExecutor(1, thread_name_prefix="vc-upload") as ex:
            fut = ex.submit(lambda a=batches[0]: self._upload_sources(self._pack_sources(a)))
            for c in range(len(batches)):
                uploaded = fut.result()
                if c + 1 < len(batches):
                    fut = ex.submit(
                        lambda a=batches[c + 1]: self._upload_sources(self._pack_sources(a))
                    )
                handles.append(
                    self.generate_batch(seed=seed + c, defer_collect=True,
                                        _uploaded=uploaded, flow_steps=flow_steps)
                )
                if len(handles) > 1:
                    out.append(self.collect(handles.pop(0)))
        while handles:
            out.append(self.collect(handles.pop(0)))
        return out

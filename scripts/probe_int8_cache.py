"""Micro-probe: does this backend's Mosaic lower int8 KV-cache reads?

The flash-decode kernel's HBM traffic is dominated by bf16 cache tiles; an
int8 cache with per-token (lane-column) scales would halve it. Each case is
a minimal standalone pallas kernel compiled on the TPU, mirroring the exact
op shapes the (D, S)-layout kernel would need:

  i8_load_convert   load (D, SB) int8 block, convert to f32
  i8_dequant_matmul (1,D) @ [(D,SB) i8 -> f32 * (1,SB) scale]  (QK^T path)
  i8_pv             p(1,SB) * scale -> @ (D,SB)^T contraction  (PV path)
  i8_matmul_direct  mixed int8 x f32 dot (probably unsupported; info only)
  i8_store          f32 -> int8 cast + store (merge kernel write path)
  i8_sd_tail        (W, D) int8 tile load + convert (SD tail read)
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
except Exception:
    pass

SB = 128
D = 64
rng = np.random.default_rng(0)
K8 = jnp.asarray(rng.integers(-127, 128, (D, SB)), jnp.int8)
SC = jnp.asarray(rng.uniform(0.01, 0.02, (8, SB)), jnp.float32)  # row 0 used
Q = jnp.asarray(rng.standard_normal((8, D)), jnp.float32)  # row 0 used
KSD8 = jnp.asarray(rng.integers(-127, 128, (8, D)), jnp.int8)


def run_case(name, kernel, out_shape, out_dtype=jnp.float32):
    try:
        out = pl.pallas_call(
            kernel,
            grid=(2,),
            in_specs=[
                pl.BlockSpec((D, SB), lambda i: (0, 0)),
                pl.BlockSpec((8, SB), lambda i: (0, 0)),
                pl.BlockSpec((8, D), lambda i: (0, 0)),
                pl.BlockSpec((8, D), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec(out_shape, lambda i: tuple(0 for _ in out_shape)),
            out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
        )(K8, SC, Q, KSD8)
        out.block_until_ready()
        print(f"PASS {name}  sum={float(jnp.asarray(out, jnp.float32).sum()):.4f}",
              file=sys.stderr)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {msg}", file=sys.stderr)


def case_load_convert(k_ref, sc_ref, q_ref, t_ref, o_ref):
    o_ref[...] = k_ref[...].astype(jnp.float32)[:, :D] * 0.5


def case_dequant_matmul(k_ref, sc_ref, q_ref, t_ref, o_ref):
    kf = k_ref[...].astype(jnp.float32) * sc_ref[0:1, :]  # (D,SB)*(1,SB)
    q = q_ref[0:1, :]  # (1, D)
    qk = lax.dot_general(q, kf, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)  # (1, SB)
    o_ref[...] = jnp.zeros((1, D), jnp.float32) + jnp.sum(qk, axis=1, keepdims=True)


def case_pv(k_ref, sc_ref, q_ref, t_ref, o_ref):
    p = sc_ref[0:1, :]  # (1, SB) stand-in for softmax probs
    vf = k_ref[...].astype(jnp.float32)  # (D, SB)
    pv = lax.dot_general(p, vf, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)  # (1, D)
    o_ref[...] = pv


def case_matmul_direct(k_ref, sc_ref, q_ref, t_ref, o_ref):
    q = q_ref[0:1, :]
    qk = lax.dot_general(q, k_ref[...], (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    o_ref[...] = jnp.zeros((1, D), jnp.float32) + jnp.sum(qk, axis=1, keepdims=True)


def case_store(k_ref, sc_ref, q_ref, t_ref, o_ref):
    o_ref[...] = (sc_ref[...] * 100.0).astype(jnp.int8)


def case_sd_tail(k_ref, sc_ref, q_ref, t_ref, o_ref):
    kt = t_ref[...].astype(jnp.float32)  # (8, D) from int8
    q = q_ref[0:1, :]
    qk = lax.dot_general(q, kt, (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)  # (1, 8)
    o_ref[...] = jnp.zeros((1, D), jnp.float32) + jnp.sum(qk, axis=1, keepdims=True)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, file=sys.stderr)
    run_case("i8_load_convert", case_load_convert, (D, D))
    run_case("i8_dequant_matmul", case_dequant_matmul, (1, D))
    run_case("i8_pv", case_pv, (1, D))
    run_case("i8_matmul_direct", case_matmul_direct, (1, D))
    run_case("i8_store", case_store, (8, SB), jnp.int8)
    run_case("i8_sd_tail", case_sd_tail, (1, D))

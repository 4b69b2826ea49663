"""Micro-probe: which Mosaic op sequences lower on this backend. Each case
is a minimal pallas kernel compiled standalone on the TPU."""

import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
except Exception:
    pass

SB = 128
D = 64


def run_case(name, kernel, n_in=1, extra_scratch=()):
    try:
        x = jnp.asarray(np.random.default_rng(0).standard_normal((8, SB)), jnp.float32)
        v = jnp.asarray(np.random.default_rng(1).standard_normal((SB, D)), jnp.float32)
        out = pl.pallas_call(
            kernel,
            grid=(2,),
            in_specs=[
                pl.BlockSpec((8, SB), lambda i: (0, 0)),
                pl.BlockSpec((SB, D), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, D), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)] + list(extra_scratch),
        )(x, v)
        out.block_until_ready()
        print(f"PASS {name}", file=sys.stderr)
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL {name}: {msg}", file=sys.stderr)


# A: scalar sum of a (SB,) vector consumed ONLY by vector-scalar arithmetic
def case_a(x_ref, v_ref, o_ref, scr):
    p = x_ref[0]  # (SB,)
    m = jnp.max(p)
    e = jnp.exp(p - m)
    probs = e / jnp.sum(e)
    o_ref[...] = jnp.dot(probs[None, :], v_ref[...])


# B: scalar-from-reduction broadcast-stored into a (1, D) scratch
def case_b(x_ref, v_ref, o_ref, scr):
    p = x_ref[0]
    s = jnp.sum(p)
    scr[...] = jnp.zeros((1, D), jnp.float32) + s
    o_ref[...] = scr[...]


# C: sum via dot-with-ones -> (1, D) broadcast without scalar extraction
def case_c(x_ref, v_ref, o_ref, scr):
    p = x_ref[0]
    ones = jnp.ones((SB, D), jnp.float32)
    s_vec = jnp.dot(p[None, :], ones)  # (1, D), every entry = sum(p)
    scr[...] = s_vec
    o_ref[...] = scr[...] * 2.0


# D: scalar max broadcast-stored
def case_d(x_ref, v_ref, o_ref, scr):
    p = x_ref[0]
    m = jnp.max(p)
    scr[...] = jnp.full((1, D), m, jnp.float32)
    o_ref[...] = scr[...]


# E: scalar consumed by BOTH vector-scalar arith and broadcast store
def case_e(x_ref, v_ref, o_ref, scr):
    p = x_ref[0]
    m = jnp.max(p)
    e = jnp.exp(p - m)
    scr[...] = jnp.zeros((1, D), jnp.float32) + m
    o_ref[...] = jnp.dot(e[None, :], v_ref[...]) + scr[...]


# F: 2D-shaped reduction: (1, SB) row, sum with keepdims -> (1, 1) ... store
def case_f(x_ref, v_ref, o_ref, scr):
    p2 = x_ref[0:1, :]  # (1, SB)
    s = jnp.sum(p2, axis=1, keepdims=True)  # (1, 1)
    scr[...] = jnp.zeros((1, D), jnp.float32) + s  # broadcast (1,1)->(1,D)
    o_ref[...] = scr[...]


# G: max as (1,1) keepdims feeding vector arithmetic
def case_g(x_ref, v_ref, o_ref, scr):
    p2 = x_ref[0:1, :]  # (1, SB)
    m = jnp.max(p2, axis=1, keepdims=True)  # (1, 1)
    e = jnp.exp(p2 - m)  # (1, SB) minus broadcast (1,1)
    l = jnp.sum(e, axis=1, keepdims=True)  # (1, 1)
    scr[...] = jnp.zeros((1, D), jnp.float32) + m + l
    o_ref[...] = jnp.dot(e, v_ref[...]) / (jnp.zeros((1, D), jnp.float32) + l)


for name, k in [("A_round1_seq", case_a), ("B_sum_bcast_store", case_b),
                ("C_sum_via_dot", case_c), ("D_max_full_store", case_d),
                ("E_dual_consumer", case_e), ("F_keepdims_sum", case_f),
                ("G_keepdims_softmax", case_g)]:
    run_case(name, k)


# H: QK^T via dot_general contracting both last dims (transpose_rhs matmul),
#    then the full row-form online-softmax pipeline of the real kernel
def case_h(x_ref, v_ref, o_ref, scr):
    q2 = x_ref[0:1, 0:D]  # (1, D)
    k2 = v_ref[...]  # (SB, D)
    scores = jax.lax.dot_general(
        q2, k2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (1, SB)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    l = jnp.sum(e, axis=1, keepdims=True)
    pv = jnp.dot(e, v_ref[...])  # (1, D)
    m_prev = scr[...]
    m_new = jnp.maximum(m_prev, m)
    alpha = jnp.exp(m_prev - m_new)
    beta = jnp.exp(m - m_new)
    scr[...] = scr[...] * alpha + pv * beta + l
    o_ref[...] = scr[...]


# I: same but rhs is bf16 (cache dtype) with f32 accumulate
def case_i(x_ref, v_ref, o_ref, scr):
    q2 = x_ref[0:1, 0:D].astype(jnp.bfloat16)
    k2 = v_ref[...].astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        q2, k2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    e = jnp.exp(scores - jnp.max(scores, axis=1, keepdims=True))
    pv = jax.lax.dot_general(
        e.astype(jnp.bfloat16), k2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, SB) x (SB, D) -> (1, D)
    o_ref[...] = pv


run_case("H_dotgen_transpose_rhs", case_h)
run_case("I_bf16_dots", case_i)

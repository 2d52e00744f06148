"""Micro-benchmark of the pair_fast masked-SpGEMM stages on the TPU:
fill kernel alone, bitonic merge alone, lax.sort alone, full chain.
Times a 100-iteration device loop per stage (one jit, one sync)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pygb_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from functools import partial

from pygraphblas_tpu.core import spgemm as sg

E = 32768
W = 128
NNZ = 1 << 20

rng = np.random.RandomState(0)
a_cols = np.sort(rng.randint(0, 65536, NNZ).astype(np.int32))
a2 = jnp.asarray(a_cols.reshape(-1, 128))
ast = jnp.asarray(rng.randint(0, NNZ - 256, E).astype(np.int32))
wa = jnp.asarray(rng.randint(1, 40, E).astype(np.int32))
bst = jnp.asarray(rng.randint(0, NNZ - 256, E).astype(np.int32))
wb = jnp.asarray(rng.randint(1, 40, E).astype(np.int32))


def timeit(name, fn, iters=100):
    fn()  # compile
    t0 = time.perf_counter()
    r = fn()
    float(jnp.sum(r))
    dt = time.perf_counter() - t0
    print(f"{name:>24}: {dt * 1000 / iters:8.4f} ms/iter "
          f"({dt:6.3f}s / {iters})", flush=True)


@partial(jax.jit, static_argnames=("iters",))
def loop_fill(a2, ast, wa, bst, wb, iters):
    def body(i, acc):
        k = sg._pallas_fill_keys(a2, a2, ast + i, wa, bst, wb, W)
        return acc + k[:, 0].astype(jnp.int32)
    return jax.lax.fori_loop(0, iters, body, jnp.zeros(E, jnp.int32))


@partial(jax.jit, static_argnames=("iters",))
def loop_chain(a2, ast, wa, bst, wb, iters):
    def body(i, acc):
        c, cnt = sg._fill_sort_count_body(a2, a2, ast + i, wa, bst, wb,
                                          "int32", W)
        return acc + cnt.astype(jnp.int32)
    return jax.lax.fori_loop(0, iters, body, jnp.zeros(E, jnp.int32))


keys0 = sg._pallas_fill_keys(a2, a2, ast, wa, bst, wb, W)
keys0 = jnp.asarray(np.asarray(keys0))


@partial(jax.jit, static_argnames=("iters",))
def loop_merge(keys, iters):
    def body(i, acc):
        ks = sg._bitonic_merge(keys + i)
        return acc + ks[:, 0].astype(jnp.int32)
    return jax.lax.fori_loop(0, iters, body, jnp.zeros(E, jnp.int32))


@partial(jax.jit, static_argnames=("iters",))
def loop_sort(keys, iters):
    def body(i, acc):
        ks = jax.lax.sort(keys + i, dimension=1)
        return acc + ks[:, 0].astype(jnp.int32)
    return jax.lax.fori_loop(0, iters, body, jnp.zeros(E, jnp.int32))


@partial(jax.jit, static_argnames=("iters",))
def loop_count(keys, iters):
    def body(i, acc):
        ks = keys + i
        match = (ks[:, :-1] >> 1) == (ks[:, 1:] >> 1)
        return acc + jnp.sum(match, axis=1).astype(jnp.int32)
    return jax.lax.fori_loop(0, iters, body, jnp.zeros(E, jnp.int32))


print(f"E={E} W={W} nnz={NNZ} backend={jax.default_backend()}",
      flush=True)
timeit("fill kernel", lambda: loop_fill(a2, ast, wa, bst, wb, 100))
timeit("bitonic merge", lambda: loop_merge(keys0, 100))
timeit("lax.sort", lambda: loop_sort(keys0, 100))
timeit("adj count", lambda: loop_count(keys0, 100))
timeit("full chain", lambda: loop_chain(a2, ast, wa, bst, wb, 100))

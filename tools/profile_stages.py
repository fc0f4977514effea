"""Stage-level profile of the TPU encode pipeline (ubench slope method).

Times the matcher / walk / pack stages independently at the bench
shape (nb=16, S ~= 1 MiB).  The full-pipeline number comes from bench.py
(different inputs defeat the tunnel's dispatch memoization there); the
"everything else" share is full - (stages here).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from bench import make_corpus
from moonbit_flate_tpu.ops.pipeline import BLOCK, PAD
from moonbit_flate_tpu.ops import matcher as M
from moonbit_flate_tpu.ops import walk_pallas as W
from tools.ubench import slope

NB = 16
S = NB * BLOCK

corpus = make_corpus(total=S + PAD)
data = jnp.asarray(np.frombuffer(corpus[: S + PAD], np.uint8))
n = jnp.int32(S)


def t(name, fn, x0, n_hi=4):
    dt = slope(fn, x0, n_hi=n_hi, reps=2)
    print(f"{name:28s} {dt*1e3:9.2f} ms  ({S/dt/1e6:8.1f} MB/s)", flush=True)
    return dt


print(f"shape: S={S} bytes, backend={jax.default_backend()}", flush=True)

SE = S + 300


def _u32e(d):
    d32 = d.astype(jnp.uint32)
    return (d32[:SE] | (d32[1:SE+1] << 8) | (d32[2:SE+2] << 16)
            | (d32[3:SE+3] << 24))


def s_win(d):
    cand, ext = M._nearest_prev_windowed(_u32e(d), S)
    return d.at[0].set((cand[0] % 2).astype(jnp.uint8))


def s_z(d):
    z = M._small_period_lengths(d[:S], S)
    return d.at[0].set((z[0, 0] % 2).astype(jnp.uint8))


def s_fm(d):
    mlen, dist = M.find_matches(d, n)
    return d.at[0].set((mlen[0] % 2).astype(jnp.uint8))


t("nearest_prev windowed", s_win, data)
t("small_period_lengths", s_z, data)
t("find_matches total", s_fm, data)

mlen0, dist0 = jax.jit(M.find_matches, static_argnums=())(data, n)
S_pad = -(-S // W.CHUNK) * W.CHUNK
minfo0, grp0 = jax.jit(M.pack_match_info, static_argnums=(3,))(
    mlen0, dist0, jnp.int32(0), S_pad)
nbytes = W.HALO + S_pad + W.SLACK
pb = np.zeros(nbytes, np.uint8)
pb[W.HALO : W.HALO + S + PAD] = np.asarray(data)
words0 = jnp.asarray(pb.view("<i4"))


def s_walk(m):
    b, mo = W.walk_batch(grp0[None], m[None], words0[None],
                         jnp.zeros(1, jnp.int32), n.reshape(1))
    return m.at[0].set(mo[0, 0] % 2)


t("walk (pallas)", s_walk, minfo0)

from moonbit_flate_tpu.ops.pack import pack_units_dense

NU = (4 + 19 + 339) * NB + 2 * S + NB + 4
rng = np.random.default_rng(0)
vals = jnp.asarray(rng.integers(0, 255, NU, np.int32))
wids0 = jnp.asarray(rng.integers(0, 12, NU, np.int32))
max_bits = 8 * S + NB * 64 + 64
n_words = max_bits // 32 + 2


def s_pack(v):
    w, tb = pack_units_dense(v, wids0, n_words)
    return v.at[0].set(tb % 2)


t("pack (dense+pallas)", s_pack, vals)

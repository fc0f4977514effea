"""In-graph dynamic-header construction: codegen RLE + header units.

Vectorized reformulation of RFC 1951 §3.2.7 / the reference's
generate_codegen (huffman-bit-writer.mbt:241-330).  The sequential greedy
RLE has closed-form chunk boundaries — 16-chunks start at multiples of 6
within a nonzero run, 18-chunks at multiples of 138 within a zero run —
so every position of the 316-entry length array computes its own emission
(at most one codegen symbol + one repeat payload) independently.  The
host-path oracle (blocks/emitters.generate_codegen) is the differential
test target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SEQ_LEN = 286 + 30  # concatenated lit + dist code length arrays


def codegen_emissions(seq: jnp.ndarray, valid_len: jnp.ndarray):
    """Per-position codegen emission schedule for one block.

    seq: int32[316] concatenated code lengths (garbage past valid_len).
    Returns (sym[316], payload_val[316], payload_width[316], freq[19]):
    sym = -1 where the position emits nothing.
    """
    J = SEQ_LEN
    j = jnp.arange(J, dtype=jnp.int32)
    valid = j < valid_len
    prev = jnp.concatenate([jnp.full(1, -1, jnp.int32), seq[:-1]])
    is_start = valid & ((j == 0) | (seq != prev))
    # run id handling via segment scans
    start_idx = jnp.where(is_start, j, 0)
    run_start = jax.lax.associative_scan(jnp.maximum, start_idx)
    # run end: last valid index of the run
    nxt = jnp.concatenate([seq[1:], jnp.full(1, -1, jnp.int32)])
    is_end = valid & ((j == valid_len - 1) | (seq != nxt))
    end_idx = jnp.where(is_end, j, J)
    run_end = jax.lax.associative_scan(
        jnp.minimum, end_idx, reverse=True
    )
    run_len = run_end - run_start + 1
    v = seq[run_start]
    m = j - run_start

    # ---- nonzero runs: literal at m==0, 16-chunks at (m-1) % 6 == 0 ----
    c0_nz = run_len - 1
    t_end = c0_nz // 6 + ((c0_nz % 6) >= 3).astype(jnp.int32)
    mp = m - 1
    nz_lit_head = m == 0
    nz_chunk = (m >= 1) & (mp % 6 == 0) & (mp // 6 < t_end)
    nz_rep = jnp.minimum(6, c0_nz - mp)
    nz_tail = (m >= 1) & (mp >= 6 * t_end)

    # ---- zero runs: 18-chunks at m % 138 == 0, then one 17 or literals --
    c0_z = run_len
    rem0 = c0_z % 138
    consumed18 = c0_z - rem0 + jnp.where(rem0 >= 11, rem0, 0)
    z_chunk18 = (m % 138 == 0) & (m < consumed18)
    z_rep18 = jnp.minimum(138, c0_z - m)
    rem = c0_z - consumed18            # 0..10
    z_chunk17 = (rem >= 3) & (m == consumed18)
    z_tail = (rem < 3) & (m >= consumed18)

    is_zero = v == 0
    sym = jnp.full(J, -1, jnp.int32)
    sym = jnp.where(valid & ~is_zero & nz_lit_head, v, sym)
    sym = jnp.where(valid & ~is_zero & nz_chunk, 16, sym)
    sym = jnp.where(valid & ~is_zero & nz_tail, v, sym)
    sym = jnp.where(valid & is_zero & z_chunk18, 18, sym)
    sym = jnp.where(valid & is_zero & z_chunk17, 17, sym)
    sym = jnp.where(valid & is_zero & z_tail, 0, sym)

    pay_w = jnp.zeros(J, jnp.int32)
    pay_v = jnp.zeros(J, jnp.int32)
    pay_w = jnp.where(valid & ~is_zero & nz_chunk, 2, pay_w)
    pay_v = jnp.where(valid & ~is_zero & nz_chunk, nz_rep - 3, pay_v)
    pay_w = jnp.where(valid & is_zero & z_chunk18, 7, pay_w)
    pay_v = jnp.where(valid & is_zero & z_chunk18, z_rep18 - 11, pay_v)
    pay_w = jnp.where(valid & is_zero & z_chunk17, 3, pay_w)
    pay_v = jnp.where(valid & is_zero & z_chunk17, rem - 3, pay_v)

    freq = jnp.zeros(20, jnp.int32).at[jnp.where(sym >= 0, sym, 19)].add(
        (sym >= 0).astype(jnp.int32)
    )[:19]
    return sym, pay_v, pay_w, freq

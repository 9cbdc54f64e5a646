"""Device half of the two-pass inflate: LZ77 copy-resolve as a
pointer-doubling scan.

The host symbol-resolve pass (runtime/inflate.cpp) turns the DEFLATE
bitstream into token arrays — literal bytes and (length, distance)
back-references — without materializing the 32 KiB window.  This module
resolves the copies on device:

  1. token starts = exclusive cumsum(lens); each output byte finds its
     token with a vectorized binary search (searchsorted),
  2. every byte gets a source pointer: itself for literals, pos - dist
     inside a copy (RFC 1951 overlapping-copy semantics make that exact
     even when dist < len, because the chain pos -> pos-dist -> ... always
     terminates at an already-literal byte),
  3. pointer doubling (src = src[src]) collapses chains in O(log depth)
     full-lane gathers — a run-length chain of depth 100k resolves in 17
     rounds, not 100k steps.  A lax.while_loop exits as soon as the
     pointer field is a fixed point.

Batches concatenate: per-image token arrays appended in order keep every
back-reference inside its own image's output segment (dist never exceeds
bytes produced so far in that image), so ONE flat resolve covers the
whole batch.  Padding tokens (len 0) sort after every real output byte
and are never selected.

Reference semantics: std.compress.flate as used by the PNG decoder
(/root/reference/src/png/decoder.zig:513-518).
"""

from __future__ import annotations


def resolve_tokens_jnp(lens, dists, lits, out_len: int):
    """Resolve LZ77 tokens into the inflated byte stream, on device.

    lens/dists: int32[nt] (padded entries must have len 0); lits:
    uint8[nt]; out_len: static total inflated size.  Returns uint8[out_len].
    """
    import jax
    import jax.numpy as jnp

    cum = jnp.cumsum(lens)
    starts = cum - lens  # exclusive prefix: first output byte of each token
    pos = jnp.arange(out_len, dtype=lens.dtype)
    # Padded tokens have start == total == out_len > pos, never selected.
    tok = jnp.searchsorted(starts, pos, side="right").astype(pos.dtype) - 1
    d = dists[tok]
    src = jnp.where(d > 0, pos - d, pos)
    val = lits[tok]

    def cond(carry):
        return ~carry[1]

    def body(carry):
        s, _ = carry
        s2 = s[s]
        return s2, jnp.all(s2 == s)

    src, _ = jax.lax.while_loop(cond, body, (src, jnp.array(False)))
    return val[src]

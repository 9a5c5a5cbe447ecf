"""Distributed scan/shift toolbox: ops.scan.LocalScanOps over a mesh axis.

Each operation is the local op (ops/scan.py) plus ONE collective carry step,
so the sequence-sharded smoothing in parallel/global_pipeline.py reuses the
single-chip cluster maths of ops/smooth.py verbatim:

  * shifts exchange a k-element halo with the neighbouring shard (ppermute);
  * cummax / segmented scans all_gather one per-shard summary (d scalars or
    [d, C] tails) and fold the carry with a static loop over the d shards —
    the Blelloch cross-block step of ops.scan._seg_scan lifted to the mesh;
  * next_marked (the right-to-left keep-left scan that broadcasts each
    cluster's decision word) carries from the RIGHT: the first marked shard
    after mine supplies the value for my tail positions;
  * sums are psums.

Shards must hold CONTIGUOUS equal-length slices of the global array (the
exact-rebalanced sorted order produced by ctx.rebalance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bfqzip_tpu.ops import scan as _scan


class DistScanOps:
    """LocalScanOps interface over shard_map: `axis` names the mesh axis,
    `d` its size.  All methods run inside shard_map on [m]-shaped locals."""

    def __init__(self, axis: str, d: int):
        self.axis = axis
        self.d = d

    # -- helpers ----------------------------------------------------------
    def _me(self):
        return jax.lax.axis_index(self.axis)

    def _from_next(self, x):  # receive x from shard me+1 (last shard: zeros)
        return jax.lax.ppermute(x, self.axis,
                                [(i, i - 1) for i in range(1, self.d)])

    def _from_prev(self, x):  # receive x from shard me-1 (shard 0: zeros)
        return jax.lax.ppermute(x, self.axis,
                                [(i, i + 1) for i in range(self.d - 1)])

    # -- interface ---------------------------------------------------------
    def iota(self, m: int) -> jax.Array:
        return self._me().astype(jnp.int32) * m + jnp.arange(m, dtype=jnp.int32)

    def shift_prev(self, x, fill):
        last = self._from_prev(x[-1:])
        last = jnp.where(self._me() == 0, jnp.full((1,), fill, x.dtype), last)
        return jnp.concatenate([last, x[:-1]])

    def shift_next(self, x, fill):
        return self.shift_next_k(x, 1, fill)

    def shift_next_k(self, x, k: int, fill):
        head = self._from_next(x[:k])
        head = jnp.where(self._me() == self.d - 1,
                         jnp.full((k,), fill, x.dtype), head)
        return jnp.concatenate([x[k:], head])

    def cummax(self, x):
        local = jax.lax.cummax(x)
        totals = jax.lax.all_gather(local[-1], self.axis)  # [d]
        me = self._me()
        lo = jnp.iinfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf
        carry = jnp.asarray(lo, x.dtype)
        for t in range(self.d - 1):
            carry = jnp.where(t < me, jnp.maximum(carry, totals[t]), carry)
        return jnp.maximum(local, carry)

    def seg_scan(self, x, flag, combine, init):
        local = _scan._seg_scan(x, flag, combine, init)
        tail = local[..., -1]  # value at my last slot ([C] or scalar)
        anyf = jnp.any(flag)
        tails = jax.lax.all_gather(tail, self.axis)  # [d, ...]
        anyfs = jax.lax.all_gather(anyf, self.axis)  # [d]
        me = self._me()
        carry = jnp.full(tail.shape, init, x.dtype)
        for t in range(self.d - 1):
            nxt = jnp.where(anyfs[t], tails[t], combine(carry, tails[t]))
            carry = jnp.where(t < me, nxt, carry)
        # positions at/after my first flag are unaffected by the carry
        seen = jnp.cumsum(flag.astype(jnp.int32)) > 0
        carried = combine(carry[..., None] if x.ndim == 2 else carry, local)
        return jnp.where(seen, local, carried)

    def seg_cumsum(self, x, reset):
        return self.seg_scan(x, reset, jnp.add, 0)

    def seg_cummax(self, x, reset):
        return self.seg_scan(x, reset, jnp.maximum, 0)

    def seg_cumor(self, x, reset):
        return self.seg_scan(x, reset, jnp.bitwise_or, 0)

    def next_marked(self, x, mark, init=0):
        local = _scan.next_marked(x, mark, init)
        first = local[0]  # value at my first mark, valid iff anym
        anym = jnp.any(mark)
        firsts = jax.lax.all_gather(first, self.axis)  # [d]
        anyms = jax.lax.all_gather(anym, self.axis)  # [d]
        me = self._me()
        carry = jnp.asarray(init, x.dtype)
        for t in range(self.d - 1, 0, -1):  # nearest marked shard AFTER mine
            carry = jnp.where((t > me) & anyms[t], firsts[t], carry)
        # positions with a local mark at >= i keep the local value
        seen_right = jnp.cumsum(mark[::-1].astype(jnp.int32))[::-1] > 0
        return jnp.where(seen_right, local, carry)

    def sum(self, x):
        return jax.lax.psum(jnp.sum(x), self.axis)

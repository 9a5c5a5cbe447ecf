"""Profile smooth() sub-stages on TPU at 200K x 101bp."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from bfqzip_tpu import SmoothConfig, alphabet
from bfqzip_tpu.ops.suffix import build_ebwt

N, L = 100_000, 101
rng = np.random.default_rng(0)
bases = np.array([1,2,3,5], dtype=np.uint8)
seqs = jnp.asarray(bases[rng.integers(0,4,size=(N,L))])
quals = jnp.asarray((33+rng.integers(2,42,size=(N,L))).astype(np.uint8))
lengths = jnp.asarray(np.full(N,L,np.int32))
cfg = SmoothConfig()

def force(r):
    return np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])

ebwt = jax.jit(build_ebwt)(seqs, quals, lengths); force(ebwt)
bwt, qs, lcp, n, pre = ebwt.bwt, ebwt.qs, ebwt.lcp, ebwt.n, ebwt.pre
del ebwt, seqs, quals, lengths
n_pad = bwt.shape[0]
m = cfg.min_cluster

# stage A: predicates + run detection + cid
@jax.jit
def stageA(bwt, qs, lcp, n):
    pos = jnp.arange(n_pad, dtype=jnp.int32)
    valid = pos < n
    thr = (lcp >= cfg.k) & valid
    lcp_prev = jnp.concatenate([jnp.zeros((1,), lcp.dtype), lcp[:-1]])
    lcp_next = jnp.concatenate([lcp[1:], jnp.zeros((1,), lcp.dtype)])
    minima = (lcp < lcp_prev) & (lcp_next >= lcp) & (pos >= 1) & (pos <= n - 2)
    pred = thr & ~minima
    pred_prev = jnp.concatenate([jnp.zeros((1,), bool), pred[:-1]])
    pred_next = jnp.concatenate([pred[1:], jnp.zeros((1,), bool)])
    rs_mark = pred & ~pred_prev
    ext = pred
    for t in range(1, max(m - 1, 1)):
        ext = ext & jnp.concatenate([pred[t:], jnp.zeros((t,), bool)])
    elig_start = rs_mark & ext
    run_start = jax.lax.cummax(jnp.where(elig_start, pos, -1))
    in_run_elig = pred & (run_start >= 0) & (run_start <= pos)
    last_gap = jax.lax.cummax(jnp.where(~pred, pos, -1))
    in_run_elig = in_run_elig & (run_start > last_gap)
    open_mark = ~pred & jnp.concatenate([in_run_elig[1:], jnp.zeros((1,), bool)])
    in_cluster = in_run_elig | open_mark
    cid_all = jnp.cumsum(open_mark.astype(jnp.int32), dtype=jnp.int32) - 1
    close_mark = in_run_elig & ~pred_next
    return open_mark, close_mark, in_cluster, cid_all, pos

A = stageA(bwt, qs, lcp, n); force(A)
open_mark, close_mark, in_cluster, cid_all, pos = A
ncap = n_pad // max(m, 2) + 2
dump = ncap - 1

# stage B: the two [ncap] scatters
@jax.jit
def stageB(open_mark, close_mark, cid_all, pos):
    cm = jnp.where(close_mark, cid_all, dump)
    c_end = jnp.zeros((ncap,), jnp.int32).at[cm].set(pos)
    c_start = jnp.zeros((ncap,), jnp.int32).at[jnp.where(open_mark, cid_all, dump)].set(pos)
    return c_end, c_start

B = stageB(open_mark, close_mark, cid_all, pos); force(B)
c_end, c_start = B

# stage C: channel matrix + cumsum
@jax.jit
def stageC(bwt, qs, pre, in_cluster):
    qt = cfg.quality_threshold + 33
    mask_i = in_cluster.astype(jnp.int32)
    chans = []
    for code in (1,2,3,5,4):
        chans.append((bwt == code).astype(jnp.int32) * mask_i)
    for code in (1,2,3,5,4):
        chans.append(((bwt == code) & (qs >= qt)).astype(jnp.int32) * mask_i)
    for s in (1,2,3,5):
        for d in (1,2,3,5):
            chans.append(((bwt == s) & (pre == d)).astype(jnp.int32) * mask_i)
    X = jnp.stack(chans, axis=1)
    return jnp.cumsum(X, axis=0, dtype=jnp.int32)

inc = stageC(bwt, qs, pre, in_cluster); force(inc)

# stage D: row gather at c_end
@jax.jit
def stageD(inc, c_end):
    G = inc[c_end]
    return G - jnp.concatenate([jnp.zeros((1, G.shape[1]), jnp.int32), G[:-1]], axis=0)

S = stageD(inc, c_end); force(S)

# stage E: per-position gather word[cid]
word = jnp.asarray(rng.integers(0, 2**30, size=ncap).astype(np.int32))
cid = jnp.where(in_cluster, cid_all, dump)
@jax.jit
def stageE(word, cid):
    return word[cid]
w = stageE(word, cid); force(w)

def bench(name, fn, *a, reps=3):
    best=1e9
    for _ in range(reps):
        t=time.time(); force(fn(*a)); best=min(best,time.time()-t)
    print(f"{name}: {best*1e3:.0f} ms", flush=True)

bench("A predicates+runs+cid", stageA, bwt, qs, lcp, n)
bench("B 2x ncap scatters", stageB, open_mark, close_mark, cid_all, pos)
bench("C chan stack+cumsum [n,26]", stageC, bwt, qs, pre, in_cluster)
bench("D row gather inc[c_end]+diff", stageD, inc, c_end)
bench("E word[cid] gather", stageE, word, cid)

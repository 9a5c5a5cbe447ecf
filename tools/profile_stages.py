"""Per-stage TPU profiler: build_ebwt / smooth / invert at a given size.

Usage: python tools/profile_stages.py [N_READS] [READ_LEN]
"""
import time, sys, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from bfqzip_tpu import SmoothConfig, alphabet
from bfqzip_tpu.ops.suffix import build_ebwt
from bfqzip_tpu.ops.smooth import smooth
from bfqzip_tpu.ops.invert import invert_via_sa

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
L = int(sys.argv[2]) if len(sys.argv) > 2 else 101
rng = np.random.default_rng(0)
bases = np.array([1,2,3,5], dtype=np.uint8)
seqs = jnp.asarray(bases[rng.integers(0,4,size=(N,L))])
quals = jnp.asarray((33+rng.integers(2,42,size=(N,L))).astype(np.uint8))
lengths = jnp.asarray(np.full(N,L,np.int32))
cfg = SmoothConfig()

f_ebwt = jax.jit(build_ebwt)
def _smooth(ebwt):
    return smooth(ebwt, cfg, pre=ebwt.pre)
f_smooth = jax.jit(_smooth)
def _inv(ebwt, out):
    return invert_via_sa(ebwt.sa, ebwt.bwt, out.bwt_sub, out.qs, ebwt.n, N, L, binning=cfg.binning)
f_inv = jax.jit(_inv)

def force(r):
    return np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])

t0=time.time(); ebwt = f_ebwt(seqs, quals, lengths); force(ebwt)
print(f"ebwt compile+run {time.time()-t0:.0f}s", flush=True)
out = f_smooth(ebwt); force(out)
inv = f_inv(ebwt, out); force(inv)

def bench(fn, *a, reps=3):
    best = 1e9
    for _ in range(reps):
        t = time.time(); force(fn(*a)); best=min(best,time.time()-t)
    return best

tb = bench(f_ebwt, seqs, quals, lengths)
ts = bench(f_smooth, ebwt)
ti = bench(f_inv, ebwt, out)
tot = N*L
print(f"build_ebwt: {tb:.3f}s ({tot/tb/1e6:.1f} Mb/s)")
print(f"smooth:     {ts:.3f}s ({tot/ts/1e6:.1f} Mb/s)")
print(f"invert:     {ti:.3f}s ({tot/ti/1e6:.1f} Mb/s)")

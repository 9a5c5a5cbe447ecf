"""Device-mesh construction.

The reference has no distributed backend (SURVEY §2.3): its scale-out is
Python threads launching one subprocess per read block
(BFQzip_parallel.py:104-119).  Here scale-out is a jax.sharding.Mesh with two
axes:

  data — read blocks, the analog of BFQzip_parallel's FASTQ split: blocks are
         compressed independently (independent EBWTs, slight ratio cost —
         reference README.md:107)
  seq  — sequence/array sharding of a single EBWT across devices (global
         sorts via all-to-all, rank/LF via per-shard counts + prefix sums)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: Optional[Sequence[int]] = None, axis_names=("data", "seq")) -> Mesh:
    """Build a (data, seq) mesh over the available devices.

    Default: all devices on the data axis (block parallelism), seq=1.
    """
    devices = jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    dev_array = np.array(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)


def factor2(n: int):
    """Factor n into the most balanced (a, b) with a*b == n."""
    best = (n, 1)
    for a in range(1, int(n**0.5) + 1):
        if n % a == 0:
            best = (n // a, a)
    return best

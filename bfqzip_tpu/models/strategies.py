"""Smoothing-strategy registry.

The reference bakes its four quality-replacement strategies in at compile time
(-DM=0..3, src_int_mem/Makefile:12-16); here they are runtime values of
SmoothConfig.mode, implemented in ops/smooth.py.  This module only carries
the user-facing metadata.
"""

_NAMES = {
    0: "max_qs",       # highest QS in the cluster (bfq_int.cpp:342-353)
    1: "mean_error",   # Phred of the mean error probability (bfq_int.cpp:357-373)
    2: "constant",     # constant replacement value (bfq_int.cpp:467)
    3: "avg_qs",       # truncated average QS (bfq_int.cpp:323-338)
}


def newqs_name(mode: int) -> str:
    return _NAMES[mode]

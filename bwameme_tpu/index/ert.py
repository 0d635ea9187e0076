"""ERT (enumerated radix tree) seeding backend — TPU-native formulation.

The reference's ERT index (src/ertindex.cpp/h) is a 4^15-entry k-mer table of
byte offsets into serialized multi-level radix trees whose leaves carry
reference positions inline (src/ertindex.h:53-67); queries walk the trees
byte-wise (src/ertseeding.cpp:2935-3435). The trick is twofold: (1) the first
k levels of the descent are a single direct table lookup, and (2) the
traversal never touches a suffix array.

On TPU the natural representation of a radix subtree over suffixes is the
*contiguous interval of the sorted suffix-key array*: descending one level ==
narrowing the interval by one base, and the leaf payload == the SA slice.
So the TPU-native ERT is:

  kmer_table[4^K + 1]  (int32 prefix boundaries into the sorted key array)
      -- the enumerated root: one gather replaces the P-RMI model predict
  sorted 32-base keys + packed text (already index-resident)
      -- the radix trees: interval narrowing via the same masked binary
         search the learned backend uses for its last-mile

Queries therefore share the whole SMEM machinery (ops/sa_search.py,
seeding/engine.py) with `root="kmer"`; only the initial window differs. The
table is rebuilt from the keys at load time in O(n) (one bincount+cumsum),
mirroring the reference's runtime-index-build philosophy
(src/fastmap.cpp:477-617) instead of its tens-of-GB on-disk trees.
"""

from __future__ import annotations

import numpy as np


def pick_ert_bits(n_sa: int) -> int:
    """Root k-mer size (bases): aim for ~4 keys/slot like the reference's
    4^15 table over the 6G-suffix human genome (src/macro.h:184-186)."""
    k = int(np.ceil(np.log2(max(n_sa, 4)) / 2)) - 1
    return int(np.clip(k, 2, 15))


def build_kmer_table(key_hi: np.ndarray, bits: int) -> np.ndarray:
    """Prefix boundaries: table[m] = first key index whose top `bits` bases
    equal-or-exceed m; table[4^bits] = n. key_hi must be the sorted uint32
    plane of the first 16 suffix bases (bits <= 16)."""
    assert bits <= 16
    shift = np.uint32(32 - 2 * bits)
    ids = (key_hi >> shift).astype(np.int64)
    counts = np.bincount(ids, minlength=1 << (2 * bits))
    table = np.zeros((1 << (2 * bits)) + 1, dtype=np.int64)
    np.cumsum(counts, out=table[1:])
    return table.astype(np.int32)

"""Library convenience APIs (reference: src/bwamem_extra.cpp).

* ``align1`` — align one sequence and return its alignment regions, the
  analog of ``mem_align1`` (bwamem_extra.cpp:103-121): the one-call entry
  for library users who want regions rather than SAM text.
* ``reg2ovlp`` — convert regions to simple overlap hits, the analog of
  ``mem_reg2ovlp`` (bwamem_extra.cpp:59-79): whole-read-span hits used by
  fastmap-style consumers (qb/qe widened to the full read, strand folded).

XA-tag generation (``mem_gen_alt``) lives in align/alt.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from bwameme_tpu.align import chain as chain_mod
from bwameme_tpu.align import extend as extend_mod
from bwameme_tpu.align import finalize
from bwameme_tpu.index.packing import NT4_TABLE


@dataclasses.dataclass
class OvlpHit:
    rb: int
    re: int
    qb: int
    qe: int
    rid: int
    score: int
    is_rev: bool


def align1(idx, opt, seq: str, engine=None):
    """Align one sequence; returns the deduped, primary-marked region list
    (mem_align1 semantics: full kernel-1/2 pipeline, no SAM conversion)."""
    codes = NT4_TABLE[np.frombuffer(seq.encode(), dtype=np.uint8)]
    if engine is None:
        from bwameme_tpu.seeding.host_engine import HostSeedingEngine

        engine = HostSeedingEngine(idx, opt)
    smems = engine.sorted_smems(codes)
    sa_pos = getattr(engine, "sa_positions", idx.sa)
    chains = chain_mod.chain_seeds(opt, idx.bns, len(codes), smems, sa_pos)
    chains = chain_mod.filter_chains(opt, chains)
    chain_mod.filter_chained_seeds(opt, idx.bns, idx.text, codes, len(codes),
                                   chains)
    regs = extend_mod.extend_chains_batch(opt, idx.bns, idx.text, [codes],
                                          [chains])[0]
    regs = [r for r in regs if r.qe > r.qb]
    regs = finalize.sort_dedup_patch(opt, idx.bns, idx.text, codes, regs)
    return finalize.mark_primary(opt, regs, 0)


def reg2ovlp(bns, l_query: int, regs) -> list[OvlpHit]:
    """Regions -> whole-read overlap hits (mem_reg2ovlp semantics: the hit
    spans the full read projected onto the reference; strand folded)."""
    out = []
    for r in regs:
        if r.score < 0 or r.rid < 0:
            continue
        rb = r.rb - r.qb                      # extend to whole-read span
        re = r.re + (l_query - r.qe)
        pos_f, is_rev = bns.depos((rb + re) >> 1)
        out.append(OvlpHit(rb=rb, re=re, qb=0, qe=l_query, rid=r.rid,
                           score=r.score, is_rev=is_rev))
    return out

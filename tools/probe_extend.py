"""Measure the extension stage in isolation on the real chip: job-shape
distribution (qlen/tlen), current one-dispatch kernel time, and candidate
(T, Q)-bucketed sub-dispatch timings — the data for sizing the extension
tiles (the reference's analog is sortPairsLen lane-occupancy sorting,
src/bandedSWA.cpp:1909).

Usage: python tools/probe_extend.py [mbp] [n_reads]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".bench_cache",
                                              "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np


def main():
    mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    os.environ["BWAMEME_BENCH_MBP"] = str(mbp)
    os.environ["BWAMEME_BENCH_READS"] = str(n_reads)
    import bench
    import jax
    import jax.numpy as jnp

    from bwameme_tpu.align import chain as chain_mod, native
    from bwameme_tpu.pipeline import Aligner
    from bwameme_tpu.seeding.engine import DeviceSeedingEngine
    from bwameme_tpu.utils.config import MemOptions

    idx = bench.get_index()
    opt = MemOptions()
    rng = np.random.default_rng(7)
    reads = bench.make_reads(idx, rng)[:n_reads]
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    t0 = time.time()
    eng = DeviceSeedingEngine(idx, opt, lanes=n_reads)
    print(f"# engine: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    flat = eng.sorted_smems_batch_flat(reads)
    print(f"# seed(+compile): {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    flat = eng.sorted_smems_batch_flat(reads)
    seed_s = time.time() - t0
    print(f"# seed: {seed_s:.3f}s ({n_reads/seed_s:.0f} r/s)",
          file=sys.stderr)

    raw = chain_mod.chain_and_filter_raw(
        opt, idx.bns, reads, flat,
        getattr(eng, "sa_positions", idx.sa))
    lq = np.asarray([len(q) for q in reads], np.int32)
    ctg_off = np.ascontiguousarray([c.offset for c in idx.bns.contigs],
                                   np.int64)
    (chain_off, _pos, chain_rid, _alt, _w, _kept, chain_frac_rep,
     seed_off, seed_rbeg, seed_qbeg, seed_len, _n) = raw
    prep = native.extend_prepare_native(
        opt, idx.bns, lq, chain_off, chain_rid, chain_frac_rep, seed_off,
        seed_rbeg, seed_qbeg, seed_len, ctg_off)
    NL, NR, G = prep["n_left"], prep["n_right"], prep["n_regs"]
    out = {"n_reads": n_reads, "NL": int(NL), "NR": int(NR), "G": int(G)}
    for side, qk, tk in (("l", "l_qlen", "l_tlen"), ("r", "r_qlen",
                                                     "r_tlen")):
        n = NL if side == "l" else NR
        ql = np.asarray(prep[qk][:n])
        tl = np.asarray(prep[tk][:n])
        out[side] = {
            "qlen_pct": [int(np.percentile(ql, p)) for p in
                         (50, 90, 99, 100)] if n else [],
            "tlen_pct": [int(np.percentile(tl, p)) for p in
                         (50, 90, 99, 100)] if n else [],
        }
    print(json.dumps(out), file=sys.stderr)

    # ---- current production dispatch, timed ----
    from bwameme_tpu.align.extend import extend_flat_submit, extend_flat_finish

    tok = extend_flat_submit(opt, idx.bns, reads, raw, eng.di.text32)
    extend_flat_finish(tok)  # compile + retry ladder
    t0 = time.time()
    tok = extend_flat_submit(opt, idx.bns, reads, raw, eng.di.text32)
    regs = extend_flat_finish(tok)
    ext_s = time.time() - t0
    out["extend_s"] = round(ext_s, 4)
    out["extend_rps"] = round(n_reads / ext_s, 1)
    print(f"# extend: {ext_s:.3f}s ({n_reads/ext_s:.0f} r/s)",
          file=sys.stderr)

    # ---- raw kernel floor: one dispatch at various (T, Q) tiles over the
    # real job distribution (left side only, informational) ----
    from bwameme_tpu.ops.banded_sw import banded_sw_extend_batch

    ql = np.asarray(prep["l_qlen"][:NL], np.int32)
    tl = np.asarray(prep["l_tlen"][:NL], np.int32)
    B = len(ql)
    h0 = np.asarray(prep["reg_h0seed"][np.asarray(prep["l_reg"][:NL])],
                    np.int32)
    for (Tcap, Qcap) in ((384, 192), (128, 64), (64, 64), (256, 128)):
        sel = (tl <= Tcap) & (ql <= Qcap)
        nsel = int(sel.sum())
        if not nsel:
            continue
        q = np.zeros((nsel, Qcap), np.int32)
        t = np.zeros((nsel, Tcap), np.int32)
        rngl = np.random.default_rng(1)
        q[:, :] = rngl.integers(0, 4, (nsel, Qcap))
        t[:, :] = rngl.integers(0, 4, (nsel, Tcap))
        args = (jnp.asarray(q), jnp.asarray(t),
                jnp.asarray(ql[sel]), jnp.asarray(tl[sel]),
                jnp.asarray(h0[sel]), jnp.asarray(np.full(nsel, opt.w,
                                                          np.int32)),
                jnp.asarray(opt.mat.astype(np.int32)))
        kw = dict(o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                  e_ins=opt.e_ins, end_bonus=5, zdrop=opt.zdrop)
        r = banded_sw_extend_batch(*args, **kw)
        jax.block_until_ready(r)
        t0 = time.time()
        r = banded_sw_extend_batch(*args, **kw)
        jax.block_until_ready(r)
        dt = time.time() - t0
        print(f"# kernel T={Tcap} Q={Qcap}: {nsel} jobs in {dt*1e3:.1f}ms "
              f"({nsel/dt:.0f} jobs/s)", file=sys.stderr)
        out[f"kernel_T{Tcap}_Q{Qcap}"] = {"jobs": nsel,
                                          "ms": round(dt * 1e3, 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

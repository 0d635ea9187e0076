"""Command-line interface: ``bwameme index`` and ``bwameme mem``.

The analog of the reference binary's subcommand dispatch (src/main.cpp:55-137)
and the mem option surface (src/fastmap.cpp:1229-1374). Flags keep bwa-mem's
single-letter names so drivers/scripts written for bwa-mem/bwa-mem2/BWA-MEME
work unchanged.
"""

from __future__ import annotations

import argparse
import sys
import time

from bwameme_tpu import __version__


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="bwameme-tpu", add_help=False)
    p.add_argument("--help", action="help")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("index", help="build the learned (P-RMI) index", add_help=False)
    pi.add_argument("--help", action="help")
    pi.add_argument("fasta")
    pi.add_argument("-a", dest="algo",
                    choices=["meme", "mem2", "ert", "all"],
                    default="meme",
                    help="index type: meme = learned P-RMI (default), "
                    "mem2 = also build the FM-index, ert = also persist the "
                    "ERT k-mer root table (otherwise rebuilt at load in "
                    "O(n)), all = everything")
    pi.add_argument("-p", "--prefix", default=None, help="index prefix")
    pi.add_argument("--rmi-bits", type=int, default=None)
    pi.add_argument("--no-isa", action="store_true",
                    help="skip the inverse suffix array (MODE<3 semantics)")

    pv = sub.add_parser("version", help="print version and build configuration",
                        add_help=False)
    pv.add_argument("--help", action="help")

    pm = sub.add_parser("mem", help="align reads, print SAM on stdout", add_help=False)
    pm.add_argument("--help", action="help")
    pm.add_argument("prefix", help="index prefix (from `index`)")
    pm.add_argument("reads1")
    pm.add_argument("reads2", nargs="?", default=None)
    pm.add_argument("-t", type=int, default=1, help="threads (accepted for "
                    "compatibility; device batching replaces host threads)")
    pm.add_argument("-k", type=int, default=None, help="min seed length")
    pm.add_argument("-w", type=int, default=100, help="band width")
    pm.add_argument("-d", type=int, default=None, help="Z-dropoff")
    pm.add_argument("-r", type=float, default=None, help="reseed trigger")
    pm.add_argument("-c", type=int, default=500, help="max occurrences")
    pm.add_argument("-A", type=int, default=None, help="match score")
    pm.add_argument("-B", type=int, default=None, help="mismatch penalty")
    pm.add_argument("-O", type=int, default=None, help="gap open penalty")
    pm.add_argument("-E", type=int, default=None, help="gap extension penalty")
    pm.add_argument("-L", type=int, default=None, help="clipping penalty")
    pm.add_argument("-U", type=int, default=None, help="unpaired penalty")
    pm.add_argument("-T", type=int, default=None, help="min score to output")
    pm.add_argument("-K", type=int, default=None,
                    help="chunk size in bp (reproducibility knob)")
    pm.add_argument("-R", default=None, help="read group header line")
    pm.add_argument("-o", "-f", dest="outfile", default=None,
                    help="output SAM file (default: stdout)")
    pm.add_argument("-H", dest="hdr_insert", action="append", default=None,
                    help="insert STR to the SAM header (@-prefixed string "
                    "or a file of lines)")
    pm.add_argument("-C", dest="copy_comment", action="store_true",
                    help="append FASTA/FASTQ comment to SAM output")
    pm.add_argument("-x", dest="preset", default=None,
                    help="read type preset: pacbio, ont2d, intractg "
                    "(changes unset options; short-read tuning remains the "
                    "design point)")
    pm.add_argument("-I", dest="insert_spec", default=None,
                    help="mean[,std[,max[,min]]]: fix the FR insert-size "
                    "distribution instead of inferring it per chunk")
    pm.add_argument("-Y", action="store_true", help="use soft clipping for "
                    "supplementary alignments")
    pm.add_argument("-a", action="store_true", help="output all alignments")
    pm.add_argument("-5", dest="primary5", action="store_true",
                    help="always take the leftmost alignment as primary")
    pm.add_argument("-p", dest="smartpe", action="store_true",
                    help="smart pairing: reads1 is interleaved paired-end")
    pm.add_argument("-P", dest="nopairing", action="store_true",
                    help="skip pairing; mate rescue only")
    pm.add_argument("-S", dest="norescue", action="store_true",
                    help="skip mate rescue")
    pm.add_argument("-M", dest="nomulti", action="store_true",
                    help="mark shorter split hits as secondary")
    pm.add_argument("-q", dest="keepsuppmapq", action="store_true",
                    help="don't modify mapq of supplementary alignments")
    pm.add_argument("-V", dest="refhdr", action="store_true",
                    help="output the reference header in the XR tag")
    pm.add_argument("-j", dest="ignore_alt", action="store_true",
                    help="treat ALT contigs as part of the primary assembly")
    pm.add_argument("-s", dest="split_width", type=int, default=10,
                    help="reseed if there are fewer than INT hits")
    pm.add_argument("-D", dest="drop_ratio", type=float, default=0.50,
                    help="drop chains shorter than FLOAT of the longest")
    pm.add_argument("-W", dest="min_chain_weight", type=int, default=None,
                    help="discard chains with seeded bases shorter than INT")
    pm.add_argument("-m", dest="max_matesw", type=int, default=50,
                    help="perform at most INT rounds of mate rescue")
    pm.add_argument("-G", dest="max_chain_gap", type=int, default=10000,
                    help="max chaining gap")
    pm.add_argument("-N", dest="max_chain_extend", type=int,
                    default=1 << 30, help="max chain extension")
    pm.add_argument("-X", dest="mask_level", type=float, default=0.50,
                    help="mask level")
    pm.add_argument("-h", dest="xa_hits", default=None,
                    help="INT[,INT] max XA hits (non-ALT[,ALT])")
    pm.add_argument("-y", dest="max_mem_intv", type=int, default=20,
                    help="seed occurrence threshold for the 3rd round")
    pm.add_argument("-v", dest="verbose", type=int, default=3,
                    help="verbosity level")
    pm.add_argument("--engine", choices=["device", "host"], default="device")
    pm.add_argument("-7", dest="learned", action="store_true",
                    help="use the learned (P-RMI) seeding backend (default)")
    pm.add_argument("-Z", dest="ert", action="store_true",
                    help="use the ERT (k-mer-root) seeding backend")
    pm.add_argument("--backend", choices=["learned", "fmi", "ert"],
                    default="learned",
                    help="seeding backend: learned index (P-RMI, the -7 "
                    "path), FM-index (the reference's default backend), or "
                    "ERT (k-mer-root, the -Z path)")
    pm.add_argument("--batch", type=int, default=4096,
                    help="reads per device batch (4096 amortizes the "
                    "per-dispatch floor; 8192 measured flat)")
    pm.add_argument("--profile", dest="profile_dir", default=None,
                    metavar="DIR",
                    help="capture a jax.profiler trace of the run into DIR "
                    "(view with xprof/tensorboard)")
    pm.add_argument("--mode", type=int, choices=[1, 2, 3, 4], default=None,
                    help="HBM memory tier (reference MODE axis, "
                    "README.md:151-156): 4=fused rank rows (fastest, "
                    "32 B/suffix, sub-2^31 texts), 3=positions+ktext, "
                    "2=positions+rank keys, 1=positions only (smallest); "
                    "default auto")
    pm.add_argument("--shards", type=int, default=1,
                    help="shard the suffix-array index by key range over N "
                    "local devices (jax.sharding.Mesh; per-shard gathers "
                    "psum-combined — SURVEY.md §5 distributed backend); "
                    "1 = single device")
    pm.add_argument("--dp-shards", type=int, default=1,
                    help="data-parallel rows: shard read batches across N "
                    "dp rows of a 2-D dp x idx mesh (each row holds a full "
                    "index replica sharded over --shards idx devices; "
                    "parallel/dp.py); 1 = no data parallelism")
    return p


def cmd_index(args) -> int:
    from bwameme_tpu.index.build import build_from_fasta, save_index

    prefix = args.prefix or args.fasta
    t0 = time.time()
    idx = build_from_fasta(
        args.fasta, with_isa=not args.no_isa, rmi_bits=args.rmi_bits
    )
    print(f"[index] built in {time.time()-t0:.1f}s: l_pac={idx.l_pac} "
          f"n_sa={idx.n_sa} rmi_bits={idx.rmi_bits} max_err={idx.max_err}",
          file=sys.stderr)
    save_index(idx, prefix)
    print(f"[index] saved to {prefix}.meme/ (+ .pac/.ann/.amb)",
          file=sys.stderr)
    if args.algo in ("mem2", "all"):
        from bwameme_tpu.index.fmindex import (build_fm_index, save_fm_index,
                                               write_bwt_2bit_64)

        t0 = time.time()
        fm = build_fm_index(idx.bns.code)
        save_fm_index(prefix, fm)
        write_bwt_2bit_64(fm, prefix)
        print(f"[index] FM-index built in {time.time()-t0:.1f}s -> "
              f"{prefix}.fmi.npz + {prefix}.bwt.2bit.64", file=sys.stderr)
    if args.algo in ("ert", "all"):
        import numpy as np

        from bwameme_tpu.index.ert import build_kmer_table, pick_ert_bits

        t0 = time.time()
        bits = pick_ert_bits(idx.n_sa)
        tab = build_kmer_table(idx.key_hi, bits)
        np.savez(prefix + ".ert.npz", kmer_table=tab,
                 kmer_bits=np.int64(bits))
        print(f"[index] ERT k-mer root (K={bits}) built in "
              f"{time.time()-t0:.1f}s -> {prefix}.ert.npz", file=sys.stderr)
    return 0


def cmd_mem(args) -> int:
    from bwameme_tpu.index.build import load_index
    from bwameme_tpu.io import fastq, sam
    from bwameme_tpu.pipeline import Aligner
    from bwameme_tpu.utils.config import (
        MEM_F_ALL, MEM_F_KEEP_SUPP_MAPQ, MEM_F_NO_MULTI, MEM_F_NO_RESCUE,
        MEM_F_NOPAIRING, MEM_F_PE, MEM_F_PRIMARY5, MEM_F_REF_HDR,
        MEM_F_SMARTPE, MEM_F_SOFTCLIP, MemOptions,
    )
    from bwameme_tpu.utils.timer import StageTimer

    a_ = args.A if args.A is not None else 1
    opt = MemOptions(
        a=a_,
        b=args.B if args.B is not None else 4,
        o_del=args.O if args.O is not None else 6,
        o_ins=args.O if args.O is not None else 6,
        e_del=args.E if args.E is not None else 1,
        e_ins=args.E if args.E is not None else 1,
        w=args.w, zdrop=args.d if args.d is not None else 100,
        min_seed_len=args.k if args.k is not None else 19,
        split_factor=args.r if args.r is not None else 1.5,
        max_occ=args.c,
        pen_clip5=args.L if args.L is not None else 5,
        pen_clip3=args.L if args.L is not None else 5,
        pen_unpaired=args.U if args.U is not None else 17,
        T=args.T if args.T is not None else 30,
        split_width=args.split_width, drop_ratio=args.drop_ratio,
        min_chain_weight=(args.min_chain_weight
                          if args.min_chain_weight is not None else 0),
        max_matesw=args.max_matesw,
        max_chain_gap=args.max_chain_gap, max_chain_extend=args.max_chain_extend,
        mask_level=args.mask_level, max_mem_intv=args.max_mem_intv,
    )
    if args.preset:
        # read-type presets adjust UNSET options; update_a is skipped when
        # a preset is given (reference: src/fastmap.cpp:1398-1435)
        m = args.preset
        if m == "intractg":
            if args.O is None:
                opt.o_del = opt.o_ins = 16
            if args.B is None:
                opt.b = 9
            if args.L is None:
                opt.pen_clip5 = opt.pen_clip3 = 5
        elif m in ("pacbio", "pbref", "ont2d"):
            if args.O is None:
                opt.o_del = opt.o_ins = 1
            if args.E is None:
                opt.e_del = opt.e_ins = 1
            if args.B is None:
                opt.b = 1
            if args.r is None:
                opt.split_factor = 10.0
            if m == "ont2d":
                if args.min_chain_weight is None:
                    opt.min_chain_weight = 20
                if args.k is None:
                    opt.min_seed_len = 14
                if args.L is None:
                    opt.pen_clip5 = opt.pen_clip3 = 0
            else:
                if args.min_chain_weight is None:
                    opt.min_chain_weight = 40
                if args.k is None:
                    opt.min_seed_len = 17
                if args.L is None:
                    opt.pen_clip5 = opt.pen_clip3 = 0
        else:
            print(f"[mem] unknown read type '{m}'", file=sys.stderr)
            return 1
        from bwameme_tpu.utils.config import fill_scmat

        opt.mat = fill_scmat(opt.a, opt.b)
    elif args.A is not None:
        # -A rescales every *unset* penalty/threshold (reference:
        # src/fastmap.cpp:1126-1140 update_a)
        if args.B is None:
            opt.b *= opt.a
        if args.T is None:
            opt.T *= opt.a
        if args.O is None:
            opt.o_del *= opt.a
            opt.o_ins *= opt.a
        if args.E is None:
            opt.e_del *= opt.a
            opt.e_ins *= opt.a
        if args.d is None:
            opt.zdrop *= opt.a
        if args.L is None:
            opt.pen_clip5 *= opt.a
            opt.pen_clip3 *= opt.a
        if args.U is None:
            opt.pen_unpaired *= opt.a
        from bwameme_tpu.utils.config import fill_scmat

        opt.mat = fill_scmat(opt.a, opt.b)
    if args.xa_hits:
        parts = args.xa_hits.split(",")
        opt.max_XA_hits = int(parts[0])
        if len(parts) > 1:
            opt.max_XA_hits_alt = int(parts[1])
    if args.Y:
        opt.flag |= MEM_F_SOFTCLIP
    if args.a:
        opt.flag |= MEM_F_ALL
    if args.primary5:
        opt.flag |= MEM_F_PRIMARY5 | MEM_F_KEEP_SUPP_MAPQ
    if args.nopairing:
        opt.flag |= MEM_F_NOPAIRING
    if args.norescue:
        opt.flag |= MEM_F_NO_RESCUE
    if args.nomulti:
        opt.flag |= MEM_F_NO_MULTI
    if args.keepsuppmapq:
        opt.flag |= MEM_F_KEEP_SUPP_MAPQ
    if args.refhdr:
        opt.flag |= MEM_F_REF_HDR
    paired = args.reads2 is not None or args.smartpe
    if args.smartpe:
        opt.flag |= MEM_F_SMARTPE
    if paired:
        opt.flag |= MEM_F_PE

    from bwameme_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    timer = StageTimer()
    with timer.stage("index_load"):
        idx = load_index(args.prefix)
    if idx.n_sa >= 2**31:
        # human-scale texts need int64 device coordinates (wide mode);
        # flip x64 before any device program is traced
        import jax

        jax.config.update("jax_enable_x64", True)
        print(f"[mem] n_sa={idx.n_sa} >= 2^31: wide (int64) device "
              "coordinates enabled", file=sys.stderr)
    mesh = None
    dp_mesh = None
    if args.shards > 1 or args.dp_shards > 1:
        if args.backend == "fmi" or args.engine == "host":
            print("[mem] --shards/--dp-shards require the device engine "
                  "with the learned or ert backend", file=sys.stderr)
            return 1
        import jax
        import numpy as _np
        from jax.sharding import Mesh

        devs = jax.devices()
        need = args.shards * args.dp_shards
        if len(devs) < need:
            print(f"[mem] --dp-shards {args.dp_shards} x --shards "
                  f"{args.shards}: only {len(devs)} device(s) visible",
                  file=sys.stderr)
            return 1
        if args.dp_shards > 1:
            from bwameme_tpu.parallel.dp import make_dp_mesh

            dp_mesh = make_dp_mesh(args.dp_shards, args.shards, devs)
            print(f"[mem] 2-D mesh: {args.dp_shards} dp rows x "
                  f"{args.shards} idx shards ({devs[0].platform})",
                  file=sys.stderr)
        elif args.shards > 1:
            mesh = Mesh(_np.array(devs[: args.shards]), ("idx",))
            print(f"[mem] index sharded over {args.shards} devices "
                  f"({devs[0].platform})", file=sys.stderr)
    engine = None
    if args.ert:
        args.backend = "ert"
    if args.backend == "ert":
        import os

        from bwameme_tpu.seeding.engine import DeviceSeedingEngine

        if args.engine == "host":
            print("[mem] --backend ert requires the device engine (the "
                  "host oracle implements the learned/FMI contracts only)",
                  file=sys.stderr)
            return 1
        # honor a persisted k-mer root table (`index -a ert`) so the bit
        # width used at `mem` time matches what `index` chose
        ert_bits = 0
        if os.path.exists(args.prefix + ".ert.npz"):
            import numpy as np

            with np.load(args.prefix + ".ert.npz") as z:
                ert_bits = int(z["kmer_bits"])
        if os.path.exists(args.prefix + ".kmer_table"):
            # a reference-built ERT root (src/ertindex.cpp:823-914): its
            # interval payload is `.mlt_table` byte offsets (inapplicable —
            # the sorted key planes ARE our radix trees), but its k-mer
            # class/hit/LEP content must agree with this index; check it
            from bwameme_tpu.index.ert import (load_kmer_table,
                                               validate_reference_kmer_table)

            st = validate_reference_kmer_table(
                idx.key_hi, load_kmer_table(args.prefix + ".kmer_table"))
            print(f"[mem] reference .kmer_table validated: "
                  f"{st['present_checked']} present + "
                  f"{st['uniform_checked']} uniform k-mers, "
                  f"{st['mismatches']} mismatches", file=sys.stderr)
        if dp_mesh is not None:
            # each dp row sees 1/dp of every chunk
            row_lanes = -(-args.batch // args.dp_shards)

            def engine_factory(row_mesh, _eb=ert_bits):
                return DeviceSeedingEngine(idx, opt, root="kmer",
                                           ert_bits=_eb, mode=args.mode,
                                           lanes=row_lanes, mesh=row_mesh)
        else:
            engine = DeviceSeedingEngine(idx, opt, root="kmer",
                                         ert_bits=ert_bits, mode=args.mode,
                                         lanes=args.batch, mesh=mesh)
    elif args.backend == "fmi":
        import os

        from bwameme_tpu.seeding.fmi_engine import FmiDeviceEngine, FmiHostEngine

        fm = None
        if os.path.exists(args.prefix + ".fmi.npz"):
            from bwameme_tpu.index.fmindex import load_fm_index

            fm = load_fm_index(args.prefix)
        elif os.path.exists(args.prefix + ".bwt.2bit.64"):
            # a reference-built FM index loads directly (VERDICT #5)
            from bwameme_tpu.index.fmindex import read_bwt_2bit_64

            fm = read_bwt_2bit_64(args.prefix)
        if args.engine == "device":
            engine = FmiDeviceEngine(idx, opt, fm=fm)
        else:
            engine = FmiHostEngine(idx, opt, fm=fm)
    elif args.engine == "device":
        from bwameme_tpu.seeding.engine import DeviceSeedingEngine

        if dp_mesh is not None:
            row_lanes = -(-args.batch // args.dp_shards)

            def engine_factory(row_mesh):
                return DeviceSeedingEngine(idx, opt, mode=args.mode,
                                           lanes=row_lanes, mesh=row_mesh)
        else:
            engine = DeviceSeedingEngine(idx, opt, mode=args.mode,
                                         lanes=args.batch, mesh=mesh)
    rg_id = None
    rg_line = None
    if args.R:
        rg_line = args.R.replace("\\t", "\t")
        for f in rg_line.split("\t"):
            if f.startswith("ID:"):
                rg_id = f[3:]
    pes0 = None
    if args.insert_spec:
        import re as _re

        from bwameme_tpu.align.pairing import PeStat

        nums = [float(x) for x in _re.split(r"[^0-9.eE+-]+", args.insert_spec)
                if x]
        fr = PeStat(failed=0)
        fr.avg = nums[0]
        fr.std = nums[1] if len(nums) > 1 else fr.avg * 0.1
        fr.high = int(nums[2] + 0.499) if len(nums) > 2 else int(
            fr.avg + 4.0 * fr.std + 0.499)
        fr.low = int(nums[3] + 0.499) if len(nums) > 3 else max(
            int(fr.avg - 4.0 * fr.std + 0.499), 1)
        fr.low = max(fr.low, 1)
        pes0 = [PeStat(failed=1), fr, PeStat(failed=1), PeStat(failed=1)]
        print(f"[mem] fixed FR insert size: avg={fr.avg} std={fr.std} "
              f"range [{fr.low},{fr.high}]", file=sys.stderr)
    if dp_mesh is not None:
        from bwameme_tpu.parallel.dp import DataParallelAligner

        aligner = DataParallelAligner(idx, opt, mesh=dp_mesh,
                                      engine_factory=engine_factory,
                                      rg_id=rg_id, pes0=pes0,
                                      copy_comment=args.copy_comment)
    else:
        aligner = Aligner(idx, opt, seeding_engine=engine, rg_id=rg_id,
                          pes0=pes0, copy_comment=args.copy_comment)
    out = open(args.outfile, "w") if args.outfile else sys.stdout
    extra_hdr = None
    if args.hdr_insert:
        hdr_lines = []
        for h in args.hdr_insert:
            if h.startswith("@"):
                hdr_lines.append(h.replace("\\t", "\t"))
            else:
                with open(h) as f:
                    hdr_lines.extend(ln.rstrip("\n") for ln in f)
        extra_hdr = "\n".join(hdr_lines)
    pg = sam.make_pg_line(__version__, " ".join(sys.argv))
    out.write(sam.sam_header(idx.bns, rg_line=rg_line, pg_line=pg,
                             extra_hdr=extra_hdr))

    chunk_bp = args.K if args.K else 10_000_000 * max(args.t, 1)
    n = 0
    if args.profile_dir:
        import jax

        jax.profiler.start_trace(args.profile_dir)
    t0 = time.time()
    if args.ignore_alt:
        for c in idx.bns.contigs:
            c.is_alt = False
    for chunk in fastq.read_chunks(args.reads1, args.reads2, chunk_bp,
                                   keep_pairs=paired and args.reads2 is None):
        with timer.stage("align"):
            if paired:
                blocks = aligner.align_pairs(chunk)
            else:
                batches = (chunk[i: i + args.batch]
                           for i in range(0, len(chunk), args.batch))
                for blocks in aligner.align_stream(batches):
                    with timer.stage("write"):
                        out.writelines(blocks)
                blocks = []
        with timer.stage("write"):
            out.writelines(blocks)
        n += len(chunk)
        print(f"[mem] processed {n} reads ({n/(time.time()-t0):.0f} reads/s)",
              file=sys.stderr)
    timer.report(sys.stderr)
    if args.verbose >= 3:
        # fine-grained pipeline sub-stages (seed rounds, chain, extension,
        # finalize) — the display_stats analog; sub-stages overlap, so
        # percentages are of run wall-clock (reference: profiling.cpp:54)
        from bwameme_tpu.utils.timer import TPROF

        TPROF.report(sys.stderr, total=time.time() - t0,
                     label="pipeline sub-stages (of wall)")
    if args.profile_dir:
        import jax

        jax.profiler.stop_trace()
        print(f"[mem] jax profiler trace -> {args.profile_dir}",
              file=sys.stderr)
    if out is not sys.stdout:
        out.close()
    return 0


def cmd_version() -> int:
    """Version + runtime configuration (the analog of `bwa-meme version`,
    reference: src/main.cpp:104-135, which prints the mode and batch
    constants)."""
    import jax

    print(__version__)
    plats = ",".join(sorted({d.platform for d in jax.devices()})) or "none"
    print(f"* Backend: JAX {jax.__version__} ({plats}, "
          f"{jax.device_count()} device(s))", file=sys.stderr)
    print("* Index tiers: MODE3 when the ISA is built (default), "
          "MODE<3 with --no-isa", file=sys.stderr)
    return 0


def main(argv=None) -> int:
    import os

    # the container's sitecustomize may pin JAX_PLATFORMS to a remote TPU
    # plugin; BWAMEME_PLATFORM overrides it from inside the process (plain
    # env vars lose the race), e.g. =cpu for subprocess-driven tests
    plat = os.environ.get("BWAMEME_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    args = build_parser().parse_args(argv)
    if args.cmd == "index":
        return cmd_index(args)
    if args.cmd == "version":
        return cmd_version()
    return cmd_mem(args)


if __name__ == "__main__":
    sys.exit(main())

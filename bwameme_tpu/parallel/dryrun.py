"""Multi-chip dry run: compile + execute the full sharded pipeline step.

Used by __graft_entry__.dryrun_multichip(n): builds an n-device mesh with a
2D (dp, idx) layout — reads data-parallel on `dp`, the suffix-array index
sharded by key range on `idx` — and runs one seeding query batch plus one
data-parallel banded-SW extension batch on tiny shapes.
"""

from __future__ import annotations

import numpy as np


def run_dryrun(n_devices: int) -> None:
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()[:n_devices]
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}"
    )
    # 2D mesh: reads data-parallel x index sharded
    dp = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
    idxn = n_devices // dp
    mesh = Mesh(np.array(devices).reshape(dp, idxn), ("dp", "idx"))

    from bwameme_tpu.index import bntseq
    from bwameme_tpu.index.build import build_index
    from bwameme_tpu.parallel.sharded_index import ShardedIndex, make_sharded_search
    from bwameme_tpu.seeding.engine import DeviceSeedingEngine
    from bwameme_tpu.seeding.host_engine import HostSeedingEngine
    from bwameme_tpu.utils.config import MemOptions

    rng = np.random.default_rng(0)
    n = 4096
    code = rng.integers(0, 4, n).astype(np.uint8)
    bns = bntseq.BntSeq(
        l_pac=n, contigs=[bntseq.Contig("c", "", 0, n, 0)], ambs=[], code=code
    )
    idx = build_index(bns, rmi_bits=8)
    opt = MemOptions()

    # ---- sharded seeding query over the idx axis ----
    si = ShardedIndex.shard(idx, mesh, axis="idx")
    sa_query = make_sharded_search(si)

    eng = DeviceSeedingEngine(idx, opt)  # reuse its packing only
    reads = [idx.text[100:200].copy(), idx.text[700:810].copy()]
    qbuf, next_f, next_r = eng._prepare(reads)
    rows = np.array([0, 1, 2, 3], np.int32)          # fwd rows + rc rows
    pivots = np.array([0, 5, 2, 0], np.int32)
    vs = np.array([100, 105, 98, 110], np.int32)
    mlen, lb, cnt = sa_query(
        qbuf, jnp.asarray(rows), jnp.asarray(pivots), jnp.asarray(vs),
        jnp.ones(4, jnp.int32),
    )
    mlen = np.asarray(mlen)
    lb = np.asarray(lb)
    cnt = np.asarray(cnt)

    # cross-check vs the single-device host oracle
    host = HostSeedingEngine(idx, opt)
    for k in range(len(rows)):
        r = int(rows[k])
        codes = reads[r] if r < len(reads) else (
            np.where(reads[r - len(reads)] < 4, 3 - reads[r - len(reads)],
                     reads[r - len(reads)])[::-1]
        )
        pat = codes[int(pivots[k]): int(pivots[k]) + int(vs[k])]
        hl, hlb, hcnt = host.sa_query(pat, 1)
        assert (hl, hlb, hcnt) == (int(mlen[k]), int(lb[k]), int(cnt[k])), (
            k, (hl, hlb, hcnt), (int(mlen[k]), int(lb[k]), int(cnt[k]))
        )

    # ---- data-parallel extension step over the dp axis ----
    from bwameme_tpu.ops.banded_sw import banded_sw_extend_batch

    B, Q, T = 8 * dp, 32, 48
    q = rng.integers(0, 4, (B, Q)).astype(np.int32)
    t = np.concatenate([q, rng.integers(0, 4, (B, T - Q)).astype(np.int32)], axis=1)
    qlen = np.full(B, Q, np.int32)
    tlen = np.full(B, T, np.int32)
    h0 = np.full(B, 10, np.int32)
    ws = np.full(B, opt.w, np.int32)
    batch_shard = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    args = [
        jax.device_put(x, batch_shard) for x in (q, t, qlen, tlen, h0, ws)
    ] + [jax.device_put(opt.mat.astype(np.int32), repl)]
    out = banded_sw_extend_batch(
        *args, opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, 5, opt.zdrop
    )
    score = np.asarray(out["score"])
    assert (score == 10 + Q).all(), score  # perfect prefix extensions

    print(
        f"dryrun_multichip OK: mesh={dict(zip(mesh.axis_names, mesh.devices.shape))}, "
        f"sharded sa_query verified on {len(rows)} queries, "
        f"dp-sharded banded SW on {B} pairs"
    )

#!/bin/bash
# 100 Mbp bench once .bench_cache/bench_100mbp.meme.npz exists and the TPU
# tunnel is up. Writes /tmp/bench100.json + log.
cd /root/repo || exit 1
exec env BWAMEME_BENCH_MBP=100 BWAMEME_BENCH_READS=4096 \
    python bench.py > /tmp/bench100.json 2> /tmp/bench100.log

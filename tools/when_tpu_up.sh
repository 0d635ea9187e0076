#!/bin/bash
# Probe the TPU tunnel; when it initializes, run the round-2 measurement
# battery. Logs to /tmp/tpu_watch.log; results in /tmp/prof_r2.log,
# /tmp/bench8.json(+log), /tmp/bench100.json(+log).
cd /root/repo || exit 1
log() { echo "[$(date +%H:%M:%S)] $*" >> /tmp/tpu_watch.log; }
log "watch started"
while true; do
    if timeout 150 python -c "import jax; jax.devices()" 2>/dev/null; then
        log "TPU UP"
        break
    fi
    log "tpu down; sleeping"
    sleep 120
done
log "profile_seed 2048,4096 (8mbp, mode4)"
timeout 3000 python tools/profile_seed.py --batches 2048,4096 \
    > /tmp/prof_r2.log 2>&1
log "profile_seed rc=$?"
log "bench 8mbp"
timeout 3000 python bench.py > /tmp/bench8.json 2> /tmp/bench8.log
log "bench8 rc=$?"
log "bench 100mbp"
timeout 6000 env BWAMEME_BENCH_MBP=100 python bench.py \
    > /tmp/bench100.json 2> /tmp/bench100.log
log "bench100 rc=$?"
log "battery done"

#!/bin/bash
# Post-outage TPU measurement queue (round 3). Run ONCE when the tunneled
# backend answers again; stages run strictly sequentially (never two TPU
# processes at once — see BENCH.md round-3 outage note). Each stage uses
# bench.py's own wall-clock watchdog, so a mid-queue re-outage produces an
# error JSON line instead of a hang, and later stages still get a chance
# (their probe will fail fast once the first dispatch blocks... bench.py's
# watchdog kills the process after BENCH_TIMEOUT_S).
#
# Stage order = information value per on-chip minute:
#   1. all        five-config re-bench (first wall-clock with the round-3
#                 masked-position vocab heads + integer-threshold dropout)
#   2. dots b32   remat=dots headline A/B (compile-only says +2.6% FLOPs
#                 vs whole-block's +29%; REMAT_MEMORY.json)
#   3. b48/b64    batch sweep at the winning remat setting (both none+dots:
#                 memory headroom from dots may shift the optimum)
#   4. bert b512  bert_mlm fwd at 2x batch (62% sustained at b256 suggests
#                 underfill)
# Results land in /tmp/q_*.log; BENCH.md/BENCHMARKS.json are updated by hand
# from those logs (BENCHMARKS.json itself is rewritten only by stage 1).
set -u
export PYTHONPATH="/root/repo:/root/.axon_site"
cd /root/repo
Q=/tmp/tpu_queue.log
run() {
  local name="$1"; shift
  echo "$(date -u) START $name" >> "$Q"
  env "$@" python bench.py > "/tmp/q_${name}.log" 2>&1
  echo "$(date -u) DONE  $name rc=$? $(tail -c 400 /tmp/q_${name}.log | tr '\n' ' ')" >> "$Q"
}

run all             BENCH_MODE=all
run dots_b32        BENCH_MODE=vlmo_pretrain BENCH_REMAT=dots
run none_b48        BENCH_MODE=vlmo_pretrain BENCH_BATCH=48
run dots_b48        BENCH_MODE=vlmo_pretrain BENCH_BATCH=48 BENCH_REMAT=dots
run none_b64        BENCH_MODE=vlmo_pretrain BENCH_BATCH=64
run dots_b64        BENCH_MODE=vlmo_pretrain BENCH_BATCH=64 BENCH_REMAT=dots
run bert_b512       BENCH_MODE=bert_mlm BENCH_BATCH=512
echo "$(date -u) QUEUE COMPLETE" >> "$Q"

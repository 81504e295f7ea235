#!/bin/bash
# Alternating single-level scaling sampler (see BASELINE.md "protocol").
#
# Runs the headline CDC job at one CPU level per iteration, CPU-pinned,
# alternating 8 / 32, and appends one JSON line per run (plus the host
# 1-min load before/after) to $OUT. Respects /tmp/graft_busy: while that
# lockfile exists (held by the interactive session during its own heavy
# pytest/bench bursts) the sampler sleeps instead of running, so samples
# are never self-contaminated.
#
# Per-level BEST across many short runs is the estimator (interference
# only ever slows a run down); medians over clean consecutive windows
# are reported alongside in BASELINE.md.
set -u
OUT=${OUT:-/tmp/graft_sampler_r4.jsonl}
ITERS=${ITERS:-200}
cd /root/repo
for i in $(seq 1 "$ITERS"); do
    while [ -e /tmp/graft_busy ]; do sleep 20; done
    # 32-weighted: the 8-side healthy band re-establishes quickly (it
    # tolerates co-tenants on the other 24 cores); the 32-side needs a
    # whole-machine-quiet window, so probe it 3x as often.
    if [ $((i % 4)) -eq 1 ]; then ncpu=8; else ncpu=32; fi
    load_pre=$(cut -d' ' -f1 /proc/loadavg)
    line=$(RAY_GRAFT_CPUS=$ncpu GRAFT_HEADLINE_ONLY=1 GRAFT_BENCH_PASSES=2 \
        GRAFT_BENCH_EVENTS=16000000 \
        taskset -c 0-$((ncpu - 1)) python bench.py 2>/tmp/graft_sampler_err.log \
        | tail -1)
    load_post=$(cut -d' ' -f1 /proc/loadavg)
    ts=$(date +%s)
    echo "{\"i\": $i, \"ts\": $ts, \"ncpu\": $ncpu, \"load_pre\": $load_pre, \"load_post\": $load_post, \"r\": $line}" >> "$OUT"
done

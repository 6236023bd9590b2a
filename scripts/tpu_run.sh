#!/bin/bash
# Run a python script against the live TPU with wedge protection.
#
# The axon tunnel can wedge at PJRT init OR at (remote) compile: the
# process blocks on a futex with ~0 CPU growth and shrugs off SIGTERM.
# Watchdog: monitor combined stall — if neither the log grows nor the
# process accumulates CPU time for STALL_SECS, SIGKILL it and retry
# after a cooldown.
#
# Scripts should print progress (flush=True) regularly.
#
# usage: scripts/tpu_run.sh <script.py> [args...]
# env: TPU_RUN_TIMEOUT (default 540s), TPU_RUN_STALL (default 150s),
#      TPU_RUN_INIT_STALL (default 150s)
#
# Two-phase stall window: until the log shows real output (script
# banner past the jax warning), use the short INIT_STALL — init wedges
# show ~0 client CPU and no output.  After first output, use STALL —
# server-side mosaic compiles also show ~0 client CPU but are alive,
# so give them a longer leash.

set -u
LOG=$(mktemp)
trap 'rm -f "$LOG"' EXIT
STALL="${TPU_RUN_STALL:-150}"
INIT_STALL="${TPU_RUN_INIT_STALL:-150}"
TOTAL="${TPU_RUN_TIMEOUT:-540}"

cpu_ticks() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo ""; }

port_open() {  # the axon relay listens on 8082; refused = relay dead
  timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null
}

for attempt in 1 2 3 4 5 6; do
  if ! port_open; then
    # dead-relay mode: clients would hang forever in jax.devices();
    # wait for the relay instead of burning attempts
    echo "tpu_run: tunnel relay port closed; waiting (attempt $attempt)" >&2
    for _ in $(seq 1 10); do
      sleep 60
      port_open && break
    done
    if ! port_open; then
      echo "tpu_run: tunnel relay still down after 10 min; giving up" >&2
      exit 2
    fi
  fi
  : > "$LOG"
  python -u "$@" >"$LOG" 2>&1 &
  pid=$!

  start=$(date +%s)
  last_change=$start
  last_size=0
  last_cpu=0
  wedged=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 5
    now=$(date +%s)
    size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    cpu=$(cpu_ticks "$pid")
    # compare CPU against the PREVIOUS WINDOW (a wedged process still
    # trickles a few ticks/min, which must not reset the stall timer)
    if [ "$size" != "$last_size" ] || { [ -n "$cpu" ] && [ "$cpu" -gt $((last_cpu + 40)) ]; }; then
      last_change=$now
      last_size=$size
    fi
    last_cpu=${cpu:-$last_cpu}
    # init phase: no output beyond the jax platform warning yet
    if grep -qv "xla_bridge" "$LOG" 2>/dev/null && [ "$size" -gt 0 ]; then
      window="$STALL"
    else
      window="$INIT_STALL"
    fi
    if [ $((now - last_change)) -ge "$window" ] || [ $((now - start)) -ge "$TOTAL" ]; then
      wedged=1
      break
    fi
  done

  if [ "$wedged" = 0 ]; then
    wait "$pid"; rc=$?
    cat "$LOG"
    exit $rc
  fi

  cooldown=$((30 * attempt + 15))  # backoff: rapid reconnects worsen wedging
  echo "tpu_run: stalled (attempt $attempt); killing $pid, cooling down ${cooldown}s" >&2
  kill -9 "$pid" 2>/dev/null
  sleep "$cooldown"
done
echo "tpu_run: giving up after 6 attempts; last log:" >&2
cat "$LOG" >&2
exit 1

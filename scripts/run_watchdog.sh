#!/bin/bash
# Stale-log watchdog for long TPU runs through the remote tunnel.
#
# The axon tunnel dies mid-RPC every few hours (a stuck host transfer
# never returns — CONVERGENCE.md "Operational"); the runners checkpoint
# every eval, so the correct response is: kill the wedged process and
# relaunch with its resume flags.  This watches the run's log mtime and
# does exactly that, bounding a stall at ~$STALE_S instead of manual
# detection latency.
#
#   bash scripts/run_watchdog.sh PIDFILE LOGFILE STALE_S -- cmd args...
#
# The relaunch command should append to LOGFILE itself (>> inside) or we
# redirect for it; it must write its pid to PIDFILE via the caller
# convention: we relaunch `cmd args... >> LOGFILE 2>&1` and refresh
# PIDFILE ourselves.  Exits when the watched process exits cleanly.
set -u
PIDFILE="$1"; LOGFILE="$2"; STALE_S="$3"; shift 3
[ "$1" = "--" ] && shift
while true; do
  sleep 60
  pid=$(cat "$PIDFILE" 2>/dev/null) || exit 0
  if ! kill -0 "$pid" 2>/dev/null; then
    echo "[watchdog] pid $pid gone — run finished; exiting" >> "$LOGFILE"
    exit 0
  fi
  now=$(date +%s); mt=$(stat -c %Y "$LOGFILE" 2>/dev/null || echo "$now")
  if [ $((now - mt)) -ge "$STALE_S" ]; then
    echo "[watchdog] log stale $((now - mt))s — killing $pid, resuming" \
      >> "$LOGFILE"
    kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null; sleep 2
    "$@" >> "$LOGFILE" 2>&1 &
    echo $! > "$PIDFILE"
    echo "[watchdog] relaunched as $(cat "$PIDFILE")" >> "$LOGFILE"
  fi
done

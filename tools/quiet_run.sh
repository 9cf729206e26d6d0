#!/bin/bash
# Wait for 1-min load < $QUIET_THRESH (default 0.3), then exec the command.
T=${QUIET_THRESH:-0.3}
while :; do
  L=$(awk '{print $1}' /proc/loadavg)
  ok=$(python3 -c "print(1 if $L < $T else 0)")
  [ "$ok" = 1 ] && break
  sleep 15
done
echo "quiet_run: launching at load $(awk '{print $1}' /proc/loadavg): $*" >&2
exec "$@"

#!/bin/bash
# Wait for the axon TPU tunnel to come back (subprocess probe with a
# timeout — an in-process jax.devices() on a dead tunnel hangs forever),
# then run the round-5b chip measurement session. Probe every 5 minutes.
set -u
cd "$(dirname "$0")/.."
while true; do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "$(date -Is) tunnel up — starting chip_session_r5b" \
      >> /tmp/r5b_wait.log
    exec bash scripts/chip_session_r5b.sh
  fi
  echo "$(date -Is) tunnel still down" >> /tmp/r5b_wait.log
  sleep 300
done

#!/bin/bash
# Serial background-task queue for the single-CPU-core reference runs.
# Tasks are shell scripts in out/queue/, run in lexicographic order; each is
# moved to out/queue/done/ (or failed/) when finished. New tasks can be
# added while the runner is live; the runner exits when the queue is empty
# and out/queue/STOP exists.
set -u
cd "$(dirname "$0")/.."
Q=out/queue
mkdir -p $Q/done $Q/failed
while true; do
  task=$(ls $Q/*.sh 2>/dev/null | head -1)
  if [ -z "$task" ]; then
    [ -f $Q/STOP ] && break
    sleep 20
    continue
  fi
  name=$(basename "$task")
  echo "[queue $(date +%H:%M:%S)] start $name"
  if bash "$task" > "$Q/done/$name.log" 2>&1; then
    mv "$task" "$Q/done/$name"
    echo "[queue $(date +%H:%M:%S)] done $name"
  else
    mv "$task" "$Q/failed/$name"
    mv "$Q/done/$name.log" "$Q/failed/$name.log"
    echo "[queue $(date +%H:%M:%S)] FAILED $name"
  fi
done
echo "[queue] all tasks done"

#!/bin/bash
# Watchdog staged trainer for long runs on remote-attached (tunneled) TPU
# hosts.
#
# Why it exists (docs/WORKFLOW.md §4 "Long runs: stage the process"):
# long-lived training processes on a tunneled attach accumulate host RSS
# (~28 GB/h measured — native transfer-buffer growth outside Python's
# control) and occasionally wedge on the chip-claim futex.  Staging the run
# as a chain of short `--cont` processes bounds the leak, and this script
# adds the two survival mechanisms the plain loop lacks:
#
#   1. Wedge detection: a stage whose train.log has gone stale AND whose
#      process burns ~no CPU (compiles burn CPU; claim wedges futex-wait at
#      ~0%) for WEDGE_SAMPLES consecutive samples is killed by PID (never by
#      pattern) and retried from the last Orbax checkpoint.
#   2. Per-stage snapshots: each completed stage's exported G_latest.pth is
#      copied aside as a gate point — GAN training is not monotone, so the
#      final model should be gate-selected across snapshots with
#      tools/eval_set.py, not last-checkpoint-wins.
#
# Usage:
#   tools/staged_train.sh -c CONFIG.json -m MODEL_DIR 4100 4700 5300 ...
#
# Options (env or flags):
#   -c FILE      training config (required)
#   -m DIR       model/checkpoint dir (required)
#   -s DIR       snapshot dir for per-stage G_ep<N>.pth (default: MODEL_DIR)
#   ATTEMPTS     retries per stage before giving up            (default 6)
#   STALE_SECS   train.log age that arms the wedge detector    (default 300)
#   WEDGE_SAMPLES consecutive idle samples that trip it        (default 4)
#   POLL_SECS    watchdog sample interval                      (default 45)
#   CLAIM_SECS   wait between processes for axon claim release (default 75)
#
# Touch MODEL_DIR/STOP to stop cleanly between attempts; MODEL_DIR/DONE is
# created when every stage completed.  One TPU process at a time is the
# hard environment rule — never run two of these, or anything else
# TPU-touching, concurrently.
set -u

ATTEMPTS=${ATTEMPTS:-6}
STALE_SECS=${STALE_SECS:-300}
WEDGE_SAMPLES=${WEDGE_SAMPLES:-4}
POLL_SECS=${POLL_SECS:-45}
CLAIM_SECS=${CLAIM_SECS:-75}

CONFIG="" MODEL_DIR="" SNAP_DIR=""
while getopts "c:m:s:" opt; do
  case $opt in
    c) CONFIG=$OPTARG ;;
    m) MODEL_DIR=$OPTARG ;;
    s) SNAP_DIR=$OPTARG ;;
    *) exit 2 ;;
  esac
done
shift $((OPTIND - 1))
STAGES=("$@")

if [ -z "$CONFIG" ] || [ -z "$MODEL_DIR" ] || [ ${#STAGES[@]} -eq 0 ]; then
  echo "usage: $0 -c CONFIG.json -m MODEL_DIR [-s SNAP_DIR] EPOCHS..." >&2
  exit 2
fi
SNAP_DIR=${SNAP_DIR:-$MODEL_DIR}
mkdir -p "$MODEL_DIR" "$SNAP_DIR"

TOOLS_DIR=$(cd "$(dirname "$0")" && pwd)
LOG=$MODEL_DIR/staged_train.log
TLOG=$MODEL_DIR/train.log
echo "=== staged_train start $(date) stages: ${STAGES[*]} ===" >> "$LOG"

for EPOCHS in "${STAGES[@]}"; do
  DONE_STAGE=0
  for ATTEMPT in $(seq 1 "$ATTEMPTS"); do
    if [ -f "$MODEL_DIR/STOP" ]; then
      echo "STOP file -> exiting $(date)" >> "$LOG"
      exit 0
    fi
    python "$TOOLS_DIR/train.py" -c "$CONFIG" -m "$MODEL_DIR" \
      -n "$EPOCHS" --cont true \
      > "$MODEL_DIR/stage_${EPOCHS}_try${ATTEMPT}.log" 2>&1 &
    TPID=$!
    START=$(date +%s)
    echo "stage $EPOCHS attempt $ATTEMPT pid $TPID $(date)" >> "$LOG"
    WEDGED=0
    IDLE=0
    PREVCPU=0
    while kill -0 "$TPID" 2>/dev/null; do
      sleep "$POLL_SECS"
      # wedge = train.log stale AND the process burning ~no CPU, for
      # WEDGE_SAMPLES consecutive samples (compiles are log-stale but
      # CPU-hot; claim wedges are both stale and idle)
      CPU=$(awk '{print $14+$15}' "/proc/$TPID/stat" 2>/dev/null || echo 0)
      DELTA=$((CPU - PREVCPU)); PREVCPU=$CPU
      MT=$(stat -c %Y "$TLOG" 2>/dev/null || echo "$START")
      [ "$MT" -lt "$START" ] && MT=$START
      AGE=$(( $(date +%s) - MT ))
      if [ "$AGE" -gt "$STALE_SECS" ] && [ "$DELTA" -lt 100 ]; then
        IDLE=$((IDLE + 1))
      else
        IDLE=0
      fi
      if [ "$IDLE" -ge "$WEDGE_SAMPLES" ]; then
        echo "WEDGE: log stale ${AGE}s, cpu idle x${IDLE}; killing $TPID $(date)" >> "$LOG"
        kill "$TPID"; sleep 20
        kill -0 "$TPID" 2>/dev/null && kill -9 "$TPID"
        WEDGED=1
      fi
    done
    wait "$TPID"; RC=$?
    echo "stage $EPOCHS attempt $ATTEMPT rc=$RC wedged=$WEDGED $(date)" >> "$LOG"
    # a killed TPU process can hold the axon chip claim for minutes
    # (CLAUDE.md operational gotcha) — wait before the next process
    sleep "$CLAIM_SECS"
    if [ "$WEDGED" = "0" ] && [ "$RC" = "0" ]; then
      cp "$MODEL_DIR/G_latest.pth" "$SNAP_DIR/G_ep${EPOCHS}.pth" 2>>"$LOG" || true
      DONE_STAGE=1
      break
    fi
  done
  if [ "$DONE_STAGE" = "0" ]; then
    echo "stage $EPOCHS FAILED after $ATTEMPTS attempts $(date)" >> "$LOG"
    exit 1
  fi
done
echo "=== staged_train complete $(date) ===" >> "$LOG"
touch "$MODEL_DIR/DONE"

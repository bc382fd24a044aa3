#!/bin/bash
# Round-5 measured-runs chain (VERDICT r4 next #2), sequential on the one
# real chip. Arms run to --max-iters 32000 instances (2000 optimizer steps
# at b16) -- round4_runs.sh's "6000" was an instance/step unit slip; 2000
# steps reaches the strong-signal region of the r3 curve (mAP 0.054 at
# step 2500 vs 0.055 peak) within the round's chip budget. Each arm's
# evaluate.py --all-ckpts sweep runs right after it so curves land on
# disk before the next arm starts.
set -u
cd /root/repo

eval_one() {
  local name=$1 cfgfile=$2 outdir=$3
  echo "=== [$(date +%H:%M:%S)] evaluate $name" >&2
  timeout 2700 python evaluate.py -c "$cfgfile" \
    --ckpt "$outdir/ckpt" --all-ckpts --n-samples 100 \
    > "/root/runs/${name}.eval.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] evaluate $name rc=$?" >&2
  grep -E "mAP|step" "/root/runs/${name}.eval.log" | tail -20 >&2
}

train_one() {
  local name=$1 cfgfile=$2
  echo "=== [$(date +%H:%M:%S)] train $name" >&2
  timeout 4500 python train.py -c "$cfgfile" --max-iters 32000 \
    > "/root/runs/${name}.train.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] train $name rc=$?" >&2
  tail -2 "/root/runs/${name}.train.log" >&2
}

stage=${1-rest}
if [ "$stage" = "rest" ]; then
  eval_one  learn192       cfg/learnability_192.yaml      /root/runs/learn192
  train_one learn192_roisB cfg/learnability_roisB.yaml
  eval_one  learn192_roisB cfg/learnability_roisB.yaml    /root/runs/learn192_roisB
  train_one learn192_pol   cfg/learnability_polarity.yaml
  eval_one  learn192_pol   cfg/learnability_polarity.yaml /root/runs/learn192_pol
else
  # flagship: 608x1200 fts=1 with EARLY STOPPING governing (PATIENCE=8),
  # bounded by wall clock; evaluate whatever checkpoint history exists.
  timeout "${2-5400}" python train.py -c cfg/flagship_608.yaml \
    > /root/runs/flagship608.train.log 2>&1
  echo "=== flagship train rc=$?" >&2
  tail -3 /root/runs/flagship608.train.log >&2
  timeout 3000 python evaluate.py -c cfg/flagship_608.yaml \
    --ckpt /root/runs/flagship608/ckpt --all-ckpts --n-samples 64 \
    > /root/runs/flagship608.eval.log 2>&1
  echo "=== flagship eval rc=$?" >&2
  grep -E "mAP|step" /root/runs/flagship608.eval.log | tail -20 >&2
fi
echo "=== [$(date +%H:%M:%S)] chain $stage done" >&2

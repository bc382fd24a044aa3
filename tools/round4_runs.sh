#!/bin/bash
# Round-4 measured-runs chain (VERDICT r3 next #2/#3/#5), strictly
# sequential on the one real chip:
#   1. arm A  : cfg/learnability_192.yaml      (MAX_ROIS=256/MAX_DETS=128, quirk replicated)
#   2. arm B  : cfg/learnability_roisB.yaml    (MAX_ROIS=2304/MAX_DETS=512)
#   3. polarity: cfg/learnability_polarity.yaml (FIX_REGION_MASK_POLARITY=true)
#   4. flagship: cfg/flagship_608.yaml          (608x1200 fts=1, EARLY STOPPING governs)
# Each run is followed by its evaluate.py --all-ckpts mAP-vs-step sweep so
# curves land on disk before the next run starts. All output under
# /root/runs/<name>/; one summary line per stage to stdout.
set -u
cd /root/repo
export JAX_PLATFORMS=${JAX_PLATFORMS-}
unset JAX_PLATFORMS

run_one() {
  local name=$1 cfgfile=$2 iters=$3 outdir=$4 tbound=$5 ebound=$6
  echo "=== [$(date +%H:%M:%S)] train $name (bound ${tbound}s)" >&2
  if [ "$iters" = "inf" ]; then
    timeout "$tbound" python train.py -c "$cfgfile" \
      > "/root/runs/${name}.train.log" 2>&1
  else
    timeout "$tbound" python train.py -c "$cfgfile" --max-iters "$iters" \
      > "/root/runs/${name}.train.log" 2>&1
  fi
  echo "=== [$(date +%H:%M:%S)] train $name rc=$?" >&2
  tail -3 "/root/runs/${name}.train.log" >&2
  echo "=== [$(date +%H:%M:%S)] evaluate $name (bound ${ebound}s)" >&2
  timeout "$ebound" python evaluate.py -c "$cfgfile" \
    --ckpt "$outdir/ckpt" --all-ckpts --n-samples 100 \
    > "/root/runs/${name}.eval.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] evaluate $name rc=$?" >&2
  grep -E "mAP|step" "/root/runs/${name}.eval.log" | tail -30 >&2
}

# stage selection: "192" = the three A/B runs, "flagship" = the 608 run
# (run separately so bench work can use the chip in between).
stage=${1-192}
if [ "$stage" = "192" ]; then
  run_one learn192       cfg/learnability_192.yaml      6000 /root/runs/learn192       10800 5400
  run_one learn192_roisB cfg/learnability_roisB.yaml    6000 /root/runs/learn192_roisB 10800 5400
  run_one learn192_pol   cfg/learnability_polarity.yaml 6000 /root/runs/learn192_pol   10800 5400
else
  run_one flagship608    cfg/flagship_608.yaml          inf  /root/runs/flagship608    16200 7200
fi
echo "=== [$(date +%H:%M:%S)] chain $stage done" >&2

#!/usr/bin/env bash
# Resume the r6e 9.6M-skew sweep: the local[2] rep completed and is
# archived (BENCH/last_result_2_1.json, wall 1888.357 s, F1=1.0,
# external_cores_avg 0.06, epoch 22-23k MB/s at both ends) but the
# session restart killed the sweep before the local[8] rep ran.  The
# corpus is byte-identical (still in the tmpfs workdir), so running
# ONLY the missing rep and merging preserves the same-input contract.
# Mirrors scale_test.sh's COMMON confs and gate exactly.
set -euo pipefail
cd /root/repo
WORK=/dev/shm/scale_r6e
LOCALDIR=/dev/shm/spark-local-r6e
CKPT=/dev/shm/scale-ckpt-r6e
rm -rf "$CKPT/ckpt_8_1"
mkdir -p "$LOCALDIR" "$CKPT"

# same gate as scale_test.sh: load < 2.5 AND host-epoch parallel
# sha256 >= 12000 MB/s, fail closed after 3600 s
python - 2.5 12000 3600 <<'GATE'
import sys, time
from BENCH.sysload import cpu_calibration
loadgate, calgate = float(sys.argv[1]), float(sys.argv[2])
deadline = time.monotonic() + float(sys.argv[3])
while time.monotonic() < deadline:
    load = float(open("/proc/loadavg").read().split()[0])
    if load >= loadgate:
        time.sleep(15); continue
    cal = cpu_calibration()
    par = max(v for k, v in cal.items() if k.endswith("t_mb_s") and not k.startswith("sha256_1t"))
    if par < calgate:
        print(f"gate: load {load} OK but epoch {par} MB/s < {calgate}", file=sys.stderr)
        time.sleep(60); continue
    print(f"gate open: load {load}, epoch {par} MB/s", file=sys.stderr)
    break
else:
    print("gate TIMEOUT after 3600s - aborting, no rep started", file=sys.stderr)
    sys.exit(86)
GATE

echo "=== local[8] rep 1 (load: $(cut -d' ' -f1 /proc/loadavg)) ===" >&2
for TRY in 1 2; do
  if spark-submit --master "local[8]" \
      --conf spark.sql.shuffle.partitions=16 \
      --conf spark.ui.enabled=false \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.driver.memory=24g \
      --conf spark.sql.execution.arrow.pyspark.enabled=true \
      --conf spark.sql.execution.arrow.maxRecordsPerBatch=65536 \
      --conf spark.python.worker.faulthandler.enabled=true \
      --conf "spark.local.dir=$LOCALDIR" \
      --py-files "$WORK/pkg.zip" \
      BENCH/run_scaling.py \
      --corpus "$WORK/corpus.parquet" \
      --ckpt "$CKPT/ckpt_8_1" \
      --truth "$WORK/truth.parquet" \
      --out "$WORK/result_8_1.json" 2>/dev/null; then
    break
  elif [ "$TRY" = 2 ]; then
    echo "rep local[8] #1 failed twice - aborting" >&2
    exit 87
  else
    echo "rep local[8] #1 crashed (try $TRY) - retrying once" >&2
    rm -rf "$CKPT/ckpt_8_1"
  fi
done
rm -rf "$CKPT/ckpt_8_1"
cp "$WORK/result_8_1.json" BENCH/last_result_8_1.json

python - <<'EOF'
import json
r2 = json.load(open("/dev/shm/scale_r6e/result_2_1.json"))
r8 = json.load(open("/dev/shm/scale_r6e/result_8_1.json"))
speedup = r8["files_per_sec"] / r2["files_per_sec"]
out = {"local2": r2, "local8": r8,
       "speedup": round(speedup, 3),
       "scaling_efficiency": round(speedup / 4.0, 3),
       "note": "resumed sweep: local[2] rep from the same corpus/run "
               "(session restart killed the launcher between reps; "
               "corpus stayed byte-identical on tmpfs)"}
print(json.dumps(out, indent=1))
json.dump(out, open("BENCH/scaling_result_9.6M_skew_2v8_r6e.json", "w"), indent=1)
EOF
echo "RESUME SWEEP DONE" >&2

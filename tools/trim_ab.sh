#!/bin/bash
# TRIM/discard-tax A/B (SCALE.md r13 noise mechanism #1): runs
# SoakPipelineScale at 1M docs N times per arm, interleaved A B A B...
#   arm A = default spark.local.dir (/tmp, ext4 mounted with online
#           discard -> every shuffle/spill delete issues TRIM)
#   arm B = SPARK_GRAFT_LOCAL_DIR on tmpfs (/dev/shm, no TRIM)
# Per run it records the warm pass-2 TOTAL plus the host counters that
# identify the mechanism: /proc/diskstats discard completions +
# discard device-ms on the root disk, and /proc/stat system jiffies.
# Usage: tools/trim_ab.sh [rounds-per-arm (default 3)] [docs (default 1000000)]
set -u
ROUNDS=${1:-3}
DOCS=${2:-1000000}
DISK=vda
OUT=/tmp/trim_ab_results.tsv
echo -e "run\tarm\twall_s\tpass2_total_s\tdiscards\tdiscard_ms\tsys_jiffies\tall_jiffies" > $OUT

# /proc/diskstats with awk fields: $3=name, $15=discards completed,
# $18=ms spent discarding (verified against this kernel's layout)
read_discards() { awk -v d=$DISK '$3==d {print $15, $18}' /proc/diskstats; }
read_cpu() { awk '$1=="cpu" {print $4, $2+$3+$4+$5+$6+$7+$8}' /proc/stat; }

for i in $(seq 1 $ROUNDS); do
  for arm in A B; do
    rm -rf /dev/shm/graft-local; mkdir -p /dev/shm/graft-local
    d0=($(read_discards)); c0=($(read_cpu)); t0=$(date +%s.%N)
    if [ "$arm" = "B" ]; then
      env SPARK_DRIVER_MEM=48g SPARK_GRAFT_LOCAL_DIR=/dev/shm/graft-local \
        sbt -batch "runMain graft.SoakPipelineScale $DOCS" \
        > /tmp/trim_ab_${i}_${arm}.log 2>&1
    else
      env SPARK_DRIVER_MEM=48g \
        sbt -batch "runMain graft.SoakPipelineScale $DOCS" \
        > /tmp/trim_ab_${i}_${arm}.log 2>&1
    fi
    t1=$(date +%s.%N); d1=($(read_discards)); c1=($(read_cpu))
    wall=$(echo "$t1 - $t0" | bc)
    # the pass-2 TOTAL line is "[soak-scale] n= 1000000  TOTAL <s> s ..."
    # (field 5); the final summary line also contains TOTAL, so filter on n=
    total=$(grep ' TOTAL ' /tmp/trim_ab_${i}_${arm}.log | grep 'n=' | tail -1 | awk '{print $5}')
    echo -e "$i\t$arm\t$wall\t$total\t$((d1[0]-d0[0]))\t$((d1[1]-d0[1]))\t$((c1[0]-c0[0]))\t$((c1[1]-c0[1]))" >> $OUT
    tail -1 $OUT
  done
done
rm -rf /dev/shm/graft-local
echo "done -> $OUT"

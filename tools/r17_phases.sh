#!/bin/bash
# Round-17 measurement phases (VERDICT r16 items 1-4, 7-8 + the new
# JW auto-budget rule). Corpora: ScaleStress gen 10/100 from sf0.1
# (see r16_phase7.sh). Results recorded in SCALE.md round-17.
set -xeo pipefail
cd /root/repo
export SPARK_DRIVER_MEM=48g
M=2147483647

# 1. IVF×PQ sizing matrix (VERDICT r16 #1): shortlist sweep at both
#    geometries and codebooks, 1x + 10x, then the shipped auto rule
#    (k=0, ksub=0, shortlist=0) verified at 1x/10x/100x.
sbt -batch \
 "runMain graft.tools.ScaleStress pqrecall /root/testdata/sf0.1 8 4 8 16 60,100,200,400,800" \
 "runMain graft.tools.ScaleStress pqrecall /tmp/scale10x 8 4 8 16 60,100,200,400,800" \
 "runMain graft.tools.ScaleStress pqrecall /root/testdata/sf0.1 0 4 8 16 60,100,200,400,800" \
 "runMain graft.tools.ScaleStress pqrecall /tmp/scale10x 0 4 8 16 60,100,200,400,800" \
 "runMain graft.tools.ScaleStress pqrecall /root/testdata/sf0.1 0 4 8 256 60,100,200,400,800" \
 "runMain graft.tools.ScaleStress pqrecall /tmp/scale10x 0 4 8 256 60,100,200,400,800" \
 "runMain graft.tools.ScaleStress pqrecall /root/testdata/sf0.1 0 4 8 0 0" \
 "runMain graft.tools.ScaleStress pqrecall /tmp/scale10x 0 4 8 0 0" \
 "runMain graft.tools.ScaleStress pqrecall /tmp/scale100x 0 4 8 0 0"

# 2. Second decade for the shipped ANN rules + the full route table
#    (VERDICT r16 #3) — includes the shipped-defaults IVF×PQ line.
sbt -batch "runMain graft.tools.ScaleStress annrecall /tmp/scale100x"

# 3. JW budget dial (the r16 caveat, measured) + sampled-truth
#    estimator validation; then the shipped auto-budget verification
#    and the unbudgeted cost-cliff probe.
sbt -batch \
 "runMain graft.tools.ScaleStress jwrecall /tmp/scale10x 0 $M 64 512 75" \
 "runMain graft.tools.ScaleStress jwrecall /tmp/scale100x 0 $M 64 512 750" \
 "runMain graft.tools.ScaleStress jwrecall /tmp/scale100x 0 $M 64 1024 750" \
 "runMain graft.tools.ScaleStress jwrecall /tmp/scale100x 0 $M 64 2048 750" \
 "runMain graft.tools.ScaleStress jwrecall /tmp/scale100x 0 $M 64 4096 750" \
 "runMain graft.tools.ScaleStress jwrecall /tmp/scale100x 5 $M 64 512 750" \
 "runMain graft.tools.ScaleStress jwrecall /tmp/scale100x 5 $M 64 1024 750" \
 "runMain graft.tools.ScaleStress jwrecall /tmp/scale10x 0 $M 64 256 75" \
 "runMain graft.tools.ScaleStress jwrecall /tmp/scale10x 0 $M 64 128 75" \
 "runMain graft.tools.ScaleStress jwrecall /root/testdata/sf0.1 0 $M 64 128 1" \
 "runMain graft.tools.ScaleStress jwrecall /tmp/scale10x 0 $M 64 0 75" \
 "runMain graft.tools.ScaleStress jwrecall /tmp/scale100x 0 $M 64 0 750" \
 "runMain graft.tools.ScaleStress jwrecall /tmp/scale100x 0 $M 1000000 999999999999 750"

# 4. ErStore blocking-density knob (VERDICT r16 #2).
rm -rf /tmp/er1x /tmp/er10x
sbt -batch \
 "runMain graft.tools.ScaleStress eringest /root/testdata/sf0.1 /tmp/er1x coarse" \
 "runMain graft.tools.ScaleStress eringest /root/testdata/sf0.1 /tmp/er1x fine" \
 "runMain graft.tools.ScaleStress eringest /tmp/scale10x /tmp/er10x coarse" \
 "runMain graft.tools.ScaleStress eringest /tmp/scale10x /tmp/er10x fine"

# 5. q243 variance diagnosis (VERDICT r16 #4): warm in-JVM spread.
sbt -batch "runMain graft.tools.ScaleStress run q243_bootstrap_ci /root/testdata/sf0.1 /root/testdata/sf0.1 1 6"

# 6. Close gates: full suite, oracle board, two consecutive bench
#    boards (q243 within-1.5x acceptance), snapshot gate.
sbt -batch test 2>&1 | tee /tmp/r17_tests.log | tail -4
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_sf0.01"
python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_sf0.01
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench"
tools/snapshot_gate.sh

#!/bin/bash
# Round-16 phase 7: full test suite, then the independent VERDICT r15
# measurements (#2 annrecall 1x/10x, #3 storeingest 1x/10x store,
# #5 q243 at 100x + q274 true-pair count at 30x).
# -eo pipefail: a red test suite must STOP the measurement phases (ADVICE
# r16 — tail-truncating an unchecked pipe let failures scroll past); the
# full test log lands in /tmp/r16_tests.log instead of being cut to 5 lines.
set -xeo pipefail
cd /root/repo
export SPARK_DRIVER_MEM=48g
sbt -batch test 2>&1 | tee /tmp/r16_tests.log | tail -5
rm -rf /tmp/store1x /tmp/store10x
sbt -batch \
  "runMain graft.tools.ScaleStress annrecall /root/testdata/sf0.1" \
  "runMain graft.tools.ScaleStress annrecall /tmp/scale10x"
sbt -batch \
  "runMain graft.tools.ScaleStress storeingest /root/testdata/sf0.1 /tmp/store1x" \
  "runMain graft.tools.ScaleStress storeingest /tmp/scale10x /tmp/store10x"
sbt -batch \
  "runMain graft.tools.ScaleStress gen /root/testdata/sf0.1 /tmp/scale30x 30" \
  "runMain graft.tools.ScaleStress count q274_jw_join /tmp/scale30x"
sbt -batch \
  "runMain graft.tools.ScaleStress gen /root/testdata/sf0.1 /tmp/scale100x 100" \
  "runMain graft.tools.ScaleStress run q243_bootstrap_ci /root/testdata/sf0.1 /tmp/scale100x 100 2"

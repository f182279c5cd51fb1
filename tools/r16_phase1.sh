#!/bin/bash
# Round-16 measurement phase 1: 10x corpus + JW-family exponent/recall
# at the shipped (auto-gramLen) defaults. VERDICT r15 #1 done-criteria.
set -x
cd /root/repo
export SPARK_DRIVER_MEM=48g
sbt -batch \
  "runMain graft.tools.ScaleStress gen /root/testdata/sf0.1 /tmp/scale10x 10" \
  "runMain graft.tools.ScaleStress run q191_jaro_linkage,q234_reciprocal_match /root/testdata/sf0.1 /tmp/scale10x 10 2" \
  "runMain graft.tools.ScaleStress jwrecall /root/testdata/sf0.1 0" \
  "runMain graft.tools.ScaleStress jwrecall /tmp/scale10x 0"

#!/usr/bin/env bash
# Snapshot gate — run BEFORE any end-of-round (or sweep) commit.
#
# Round 11 lost its entire certification because the end-of-round
# snapshot committed 766 lines of never-compiled working-tree code with
# one type error (Eval.scala:1151): CORRECTNESS_r11.json came back empty
# and BENCH_r11.json rc=1. Invariant, per the round-11 verdict:
#
#   1. `sbt Test/compile` must pass on the exact tree being committed.
#   2. Round artifacts (CORRECTNESS_r*.json, BENCH_r*.json,
#      LEAKCHECK.json, BENCH_FULL.json) must be committed, not left
#      untracked/modified.
#
# Usage: tools/snapshot_gate.sh   (exits non-zero on any violation)
set -u
cd "$(git rev-parse --show-toplevel)"

fail=0

echo "[gate] sbt Test/compile ..."
if ! sbt -batch "Test/compile" >/tmp/snapshot_gate_compile.log 2>&1; then
  echo "[gate] FAIL: Test/compile is red — do NOT commit this tree."
  grep -E "\[error\]" /tmp/snapshot_gate_compile.log | head -20
  fail=1
else
  echo "[gate] Test/compile green."
fi

#   3. Inventory sync (the round-11 desync finding): every operator /
#      function / streaming source file must be mentioned in SURVEY.md
#      — code the checklist can't see is invisible to certification.
echo "[gate] SURVEY inventory ..."
allow="TypedAggregators|StreamDemo"   # internal helper / runnable demo
for f in $(ls src/main/scala/graft/operators src/main/scala/graft/functions \
    src/main/scala/graft/streaming 2>/dev/null \
    | grep '\.scala$' | sed 's/\.scala$//' | sort -u); do
  echo "$f" | grep -qE "^($allow)$" && continue
  if ! grep -q "$f" SURVEY.md; then
    echo "[gate] FAIL: $f.scala has no SURVEY.md mention — add a §2 row" \
         "(or revert the file)."
    fail=1
  fi
done
[ "$fail" -eq 0 ] && echo "[gate] inventory synced."

dirty=$(git status --porcelain -- 'CORRECTNESS_r*.json' 'BENCH_r*.json' \
  'BENCH_FULL.json' 'LEAKCHECK.json' 'VERDICT.md' 'ADVICE.md' 2>/dev/null)
if [ -n "$dirty" ]; then
  echo "[gate] FAIL: round artifacts untracked/modified — commit them:"
  echo "$dirty"
  fail=1
else
  echo "[gate] round artifacts clean."
fi

#   4. Certification-last (the round-13 ordering finding, third round
#      running: code landed AFTER the certification commit, so the
#      shipped tree was never gated as a whole). The gate stamps a
#      hash of every code file; the certification commit must include
#      tools/cert_stamp.txt AND be the last code-bearing commit of the
#      round. Any later code commit makes the committed stamp
#      mechanically stale — `tools/snapshot_gate.sh --check-stamp`
#      verifies HEAD, for the builder at round close and the judge at
#      review.
#      Hashed set (ADVICE r14): EVERY file under src (not just
#      .scala), build.sbt, and the tools harness itself (*.sh, *.py —
#      excluding the stamp file, which would be self-referential), so
#      a post-certification edit to the gate or bench/oracle tooling
#      also stales the stamp.
srchash=$( (find src -type f; find tools -type f \( -name '*.sh' -o -name '*.py' \); echo build.sbt) \
  | LC_ALL=C sort | xargs sha256sum | sha256sum | cut -c1-16)
if [ "${1:-}" = "--check-stamp" ]; then
  committed=$(git show HEAD:tools/cert_stamp.txt 2>/dev/null || echo none)
  if [ "$committed" = "$srchash" ] && \
     [ -z "$(git status --porcelain src build.sbt tools | grep -v 'tools/cert_stamp.txt')" ]; then
    echo "[gate] cert stamp current: HEAD code tree == certified tree ($srchash)."
    exit "$fail"
  else
    echo "[gate] FAIL: cert stamp stale (committed: $committed, tree: $srchash)" \
         "— code changed since the last certification; re-run gate+test+bench" \
         "and re-commit tools/cert_stamp.txt as part of the LAST code commit."
    exit 1
  fi
fi
if [ "$fail" -eq 0 ]; then
  echo "$srchash" > tools/cert_stamp.txt
  echo "[gate] cert stamp written ($srchash) — commit tools/cert_stamp.txt" \
       "WITH the certification; it must be the round's last code-bearing commit."
fi

if [ "$fail" -ne 0 ]; then
  echo "[gate] BLOCKED. Fix the above, or stash unfinished work" \
       "(git stash) instead of sweeping it into the snapshot."
  exit 1
fi
echo "[gate] OK to commit."

#!/bin/bash
# Calm bench record runs (BASELINE.md bookkeeping): waits for the 1-min
# load to settle, then runs the segmented bench at both SFs with the
# details redirected to the COMMITTED record files. Run alone on a calm
# box; the printed contract lines carry load_avg_start for adjudication.
#
# Staging state is EXPLICIT (ADVICE r13): committed records depend on
# whether the io/Staged bases are warm, so the script pins that state
# instead of inheriting whatever /tmp holds.
#   tools/bench_record.sh          # warm (default): untimed staging
#                                  # pre-pass per SF, then record
#   tools/bench_record.sh cold     # purge the stage root, then record
#                                  # (first callers pay staging in-band)
# The recorded JSON head carries staged_dirs (count of marker-complete
# stages at run start) so the state is adjudicable from the record file.
set -eu
cd "$(dirname "$0")/.."
MODE="${1:-warm}"
# Pin the stage root by EXPORTING it: Staged.root resolves the env var
# first (before the graft.stage.dir sysprop and java.io.tmpdir), so the
# JVM's staging, this script's cold purge, and the inspect count all
# agree on ONE directory — a non-/tmp tmpdir or a sysprop-pointed root
# can no longer make the purge miss the real staging dir (ADVICE r14).
STAGE_ROOT="${SPARK_GRAFT_STAGE_DIR:-/tmp}"
export SPARK_GRAFT_STAGE_DIR="$STAGE_ROOT"
# one consumer per staged base: q35 stages minhash3+jacc3, q54 stages
# simpairs+simcomp, q314 cosupply, q274 copurchase
STAGERS="q35_jaccard_pairs,q54_components,q314_modularity,q274_adamic_adar"
wait_calm() {
  for _ in $(seq 1 60); do
    l=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$l" 'BEGIN{exit !(l < 1.0)}' && return 0
    sleep 10
  done
  echo "WARN: load never settled below 1.0" >&2
}
prepare() { # $1 = sf dir
  if [ "$MODE" = cold ]; then
    # raw purge, deliberately STRONGER than Staged.vacuum(): vacuum only
    # reclaims stale-fingerprint dirs (the GC for accreting roots), while
    # a cold record must drop LIVE stages too so first callers pay the
    # staging write in-band
    rm -rf "$STAGE_ROOT"/graft_staged_*
  else
    # GC stale-fingerprint dirs first (Staged.vacuum wiring): the
    # staged_dirs count in the record head must mean LIVE stages
    tools/run.sh graft.io.StagedVacuum || true
    # untimed staging pre-pass: first-caller writes land OUTSIDE the
    # recorded run, so the record is reproducibly warm
    SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_ONLY="$STAGERS" \
      SPARK_GRAFT_BENCH_DETAILS=$(mktemp) \
      tools/run.sh graft.Bench >/dev/null 2>&1
  fi
  echo "staged dirs at record start: $(ls -d "$STAGE_ROOT"/graft_staged_* 2>/dev/null | wc -l) ($MODE)"
}
# Every attempt's detail file is also copied to a timestamped side file
# under the stage root: a later attempt in the same session overwrites
# the working-tree record files, and an UNCOMMITTED good attempt was
# lost exactly that way (round 15) — the side copies make any attempt
# promotable after the fact.
keep() { cp "$1" "$STAGE_ROOT/bench_attempt_$(date +%s)_$1" 2>/dev/null || true; }
echo "== sf0.001 record ($MODE)"
prepare /root/testdata/sf0.001
wait_calm
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
  SPARK_GRAFT_BENCH_DETAILS=bench_details.json \
  tools/run.sh graft.Bench 2>/dev/null | tail -1
keep bench_details.json
echo "== sf0.1 record ($MODE)"
prepare /root/testdata/sf0.1
wait_calm
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_DETAILS=bench_details_sf01.json \
  tools/run.sh graft.Bench 2>/dev/null | tail -1
keep bench_details_sf01.json

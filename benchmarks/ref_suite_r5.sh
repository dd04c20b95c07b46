#!/bin/bash
# Measure the REFERENCE's own unit-suite pass/fail behavior at all four
# parameter sets (CPU, AVX-512 SPQLIOS + VAES build), as the ground truth
# for the per-cell `match` field in the round-5 hardware matrix.
#
# test_functional_mv_bootstrap_UBR is compiled out for SET_1/SET_3: its
# hardcoded unfold=4 segfaults when 4 does not divide n (the reference's
# own comment, test/tests.c:34).  Logs land in benchmarks/ref_suite_r5/.
set -u
OUT=/root/repo/benchmarks/ref_suite_r5
mkdir -p "$OUT"

run_set () {  # run_set <name> <define-line> <drop_ubr>
  local name=$1 define=$2 drop_ubr=$3
  local bld=/tmp/ref_build_$name
  rm -rf "$bld"
  cp -r /root/reference "$bld"
  # swap the parameter #define (tests.c hardcodes `#define SET_2`)
  sed -i "s|^#define SET_2\$|$define|" "$bld/test/tests.c"
  if [ "$drop_ubr" = 1 ]; then
    sed -i 's|^  RUN_TEST(test_functional_mv_bootstrap_UBR);|  // UBR compiled out: hardcoded unfold=4 segfaults when 4 does not divide n|' "$bld/test/tests.c"
  fi
  ( cd "$bld" && timeout 3600 make test -B ) \
      > "$OUT/${name}.log" 2>&1
  echo "== $name rc=$? $(date)" >> "$OUT/driver.log"
}

run_set TFHEPP_L2 "// default TFHEpp L2" 0
run_set SET_1 "#define SET_1" 1
run_set SET_2 "#define SET_2" 0
run_set SET_3 "#define SET_3" 1
echo "REF SUITE DONE $(date)" >> "$OUT/driver.log"

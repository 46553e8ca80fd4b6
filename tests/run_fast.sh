#!/usr/bin/env bash
# Run the fast test gate as one pytest process PER FILE, sharing the
# persistent XLA compile cache. A single process running every file
# accumulates tens of GB of compiler/tracing heap (hundreds of compiled
# kernel programs), which slows Python tracing by an order of magnitude and
# has produced XLA:CPU segfaults; per-file processes keep each heap small
# while the disk cache keeps repeated programs warm.
#
# Every file runs under a hard wall-time cap (KZG_TPU_TEST_FILE_CAP_S,
# default 900 s — generous for a cold single-core compile, far above any
# warm-cache run): a file that exceeds it FAILS the gate with rc 124 instead
# of silently eating the CI budget (round-2 lesson: one file ran ~50 min).
set -u
cd "$(dirname "$0")/.."
cap="${KZG_TPU_TEST_FILE_CAP_S:-900}"
failed=0
results=()
for f in tests/test_*.py; do
  t0=$(date +%s)
  timeout "$cap" python -m pytest "$f" -q -m "not slow" "$@"
  rc=$?
  # rc 5 = every test in the file deselected by the marker filter — fine
  if [ $rc -eq 0 ] || [ $rc -eq 5 ]; then
    status=ok
  elif [ $rc -eq 124 ]; then
    status="FAIL(timeout>${cap}s)"
    failed=1
  else
    status=FAIL
    failed=1
  fi
  results+=("$(printf '%-32s %4ss %s' "$f" "$(( $(date +%s) - t0 ))" "$status")")
done
echo "==================== summary ===================="
printf '%s\n' "${results[@]}"
exit $failed

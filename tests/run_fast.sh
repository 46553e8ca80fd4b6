#!/usr/bin/env bash
# Run the fast test gate as one pytest process PER FILE, sharing the
# persistent XLA compile cache. A single process running every file
# accumulates tens of GB of compiler/tracing heap (hundreds of compiled
# kernel programs), which slows Python tracing by an order of magnitude and
# has produced XLA:CPU segfaults; per-file processes keep each heap small
# while the disk cache keeps repeated programs warm.
set -u
cd "$(dirname "$0")/.."
failed=0
results=()
for f in tests/test_*.py; do
  t0=$(date +%s)
  python -m pytest "$f" -q -m "not slow" "$@"
  rc=$?
  # rc 5 = every test in the file deselected by the marker filter — fine
  if [ $rc -eq 0 ] || [ $rc -eq 5 ]; then
    status=ok
  else
    status=FAIL
    failed=1
  fi
  results+=("$(printf '%-32s %4ss %s' "$f" "$(( $(date +%s) - t0 ))" "$status")")
done
echo "==================== summary ===================="
printf '%s\n' "${results[@]}"
exit $failed

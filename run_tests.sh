#!/bin/bash
# Full suite in TWO sequential pytest processes. One ~330-test process
# balloons to ~65 GB RSS and has segfaulted inside XLA compile late in
# the run (reproduced with a fresh compile cache); two halves stay
# small and run green (~8 + ~21 min warm on this 1-core host).
set -u
cd "$(dirname "$0")"
N=$(ls tests/test_*.py | wc -l)
HALF=$(( (N + 1) / 2 ))
FIRST=$(ls tests/test_*.py | head -"$HALF" | tr '\n' ' ')
SECOND=$(ls tests/test_*.py | tail -n +$(( HALF + 1 )) | tr '\n' ' ')
python -u -m pytest $FIRST -q "$@" || exit 1
exec python -u -m pytest $SECOND -q "$@"

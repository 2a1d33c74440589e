#!/bin/sh
# Execute every example end-to-end (doc-rot insurance; ~3-4 min total).
# Not part of the pytest suite on purpose: the examples are narratives,
# not assertions — this script only checks they still RUN.
#   sh tools/run_examples.sh [sf_dir]    (default /root/testdata/sf0.001)
set -e
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
for f in examples/*.py; do
  echo "== $f"
  case "$f" in
    *llm_pipeline.py) python "$f" "$SF" >/dev/null ;;
    *) python "$f" >/dev/null ;;
  esac
done
echo "all examples ran clean"

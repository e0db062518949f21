#!/bin/bash
# Serialized pinned hi-lo-hi bracket over the diagnostic 400k corpus.
# Usage: tools/bracket.sh [docs_dir] [n_docs]
# Prints the three BENCHBUILD_RESULT lines + derived efficiency.
set -u
PAGES=${1:-/dev/shm/graft-diag/pages400k}
NDOCS=${2:-400000}
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
W=/dev/shm/graft-bracket.$$
mkdir -p "$W"
trap 'rm -rf "$W"' EXIT
run() { # threads cpuset out
  taskset -c "$2" java -Xmx8g -XX:+UseParallelGC -cp "$CP" graft.BenchBuild "$1" "$PAGES" "$W/$3" "$NDOCS" 20000 2>/dev/null \
    | grep BENCHBUILD_RESULT
}
echo "== hi1 (4 cores) =="; H1=$(run 4 0-3 h1); echo "$H1"
echo "== lo  (1 core)  =="; L=$(run 1 0 lo);   echo "$L"
echo "== hi2 (4 cores) =="; H2=$(run 4 0-3 h2); echo "$H2"
python3 - "$H1" "$L" "$H2" <<'EOF'
import sys
v = [float(a.split()[1]) for a in sys.argv[1:4]]
hi = (v[0] + v[2]) / 2
print(f"lo={v[1]:.1f} hi_mean={hi:.1f} (hi1={v[0]:.1f} hi2={v[2]:.1f}) eff={hi/v[1]/4:.3f}")
EOF

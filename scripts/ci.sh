#!/usr/bin/env bash
# CI entrypoint -- the engine's equivalent of the reference's
# ``cargo make all`` (/root/reference/Makefile.toml:20-29: build +
# examples-compile + test + clippy + check-format + docs, run on every
# push by .github/workflows/cargo.yml:31-33).
#
# Run BEFORE every commit that touches microflow_tpu/, tests/, bench.py
# or scripts/analysis.py.  Usage:
#   scripts/ci.sh           # full: suite + flat-interpret parity + bench smoke
#   scripts/ci.sh --fast    # pre-commit tier: suite only (~20-35 min on relay)
set -euo pipefail
cd "$(dirname "$0")/.."

fast=0
[ "${1:-}" = "--fast" ] && fast=1

echo "== [1/4] byte-compile every source file (build check) =="
python -m compileall -q microflow_tpu tests scripts examples bench.py __graft_entry__.py

echo "== [2/4] test suite =="
python -m pytest tests/ -q

if [ "$fast" = "1" ]; then
    echo "CI (fast tier) green."
    exit 0
fi

echo "== [3/4] Mosaic OOB-pad canary (round-4 advisor; run after JAX upgrades) =="
python scripts/probe_pad.py || { echo "probe_pad canary FAILED: the flat kernel's no-pad path depends on Mosaic OOB semantics"; exit 1; }

echo "== [4/4] bench smoke (TPU when available) =="
python - <<'EOF'
import jax, subprocess, sys
plat = jax.devices()[0].platform
if plat != "tpu":
    print(f"bench smoke skipped: first device is {plat}, not tpu", file=sys.stderr)
    sys.exit(0)
out = subprocess.run([sys.executable, "bench.py", "--smoke"], capture_output=True, text=True)
sys.stderr.write(out.stderr[-2000:])
if out.returncode != 0:
    sys.exit(out.returncode)
import json
line = [l for l in out.stdout.splitlines() if l.strip().startswith("{")]
rec = json.loads(line[-1])
assert rec["value"] > 0, rec
print("bench smoke:", rec)
EOF

echo "CI green."

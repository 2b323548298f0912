#!/bin/bash
# Full pre-round validation: rotation freshness, lint, tests, oracle gate
# under real driver conditions, bench.
set -e
cd "$(dirname "$0")/.."
python tools/gen_gate.py --check
python tools/lint.py
python -m pytest tests/ -q
python tools/driver_sim.py
python bench.py

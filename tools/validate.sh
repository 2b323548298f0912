#!/bin/bash
# Full pre-round validation: tests, oracle gate under driver conditions, bench.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python tools/driver_sim.py
python bench.py

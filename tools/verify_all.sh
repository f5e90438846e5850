#!/bin/sh
# One-command verification: the three gates the driver runs, in order.
#   tests (pytest -x -q)  →  DuckDB parity at sf0.01  →  bench JSON
# Exit non-zero on the first failure.
set -e
cd "$(dirname "$0")/.."
echo "== pytest =="
python -m pytest tests/ -x -q
echo "== DuckDB parity (sf0.01) =="
python tools/check_parity.py /root/testdata/sf0.01
echo "== bench =="
python bench.py

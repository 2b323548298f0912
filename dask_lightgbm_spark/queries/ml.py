"""ML train/predict query surface (rows-only oracle; model training is not
SQL-expressible) — filled in incrementally."""

from __future__ import annotations

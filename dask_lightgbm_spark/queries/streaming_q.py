"""Structured-Streaming query surface — filled in incrementally."""

from __future__ import annotations

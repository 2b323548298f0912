"""Similarity-search query surface (SURVEY.md §7 M6) — filled in
incrementally; see registrations below."""

from __future__ import annotations

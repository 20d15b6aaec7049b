"""Deduplication operators (exact + near-dup families). SURVEY.md §2.10."""

from __future__ import annotations

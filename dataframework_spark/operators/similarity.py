"""Similarity search over embedding columns. SURVEY.md §2.10."""

from __future__ import annotations

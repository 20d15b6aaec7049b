"""Structured Streaming veneer (SURVEY.md §7 Phase 4)."""

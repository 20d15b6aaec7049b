"""Multimodal (binary) column plumbing. SURVEY.md §2.10."""

from __future__ import annotations

"""Text-analysis operators over the documents table. SURVEY.md §2.10."""

from __future__ import annotations

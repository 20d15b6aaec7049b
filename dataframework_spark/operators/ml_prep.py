"""Reference ML-preprocessing semantics (SURVEY.md §2.5-2.7) as Spark plans.

This is the part of the engine that reproduces Alrash/DataFramework's
signature operators — train/test split plans, CV fold assignment,
per-class centering, bias extension, hyperparameter grids — re-expressed
as window functions and aggregates over long-format DataFrames (one row
per sample, explicit ``label`` column) instead of per-class NumPy arrays.

Filled in incrementally; see functions below for file:line citations.
"""

from __future__ import annotations

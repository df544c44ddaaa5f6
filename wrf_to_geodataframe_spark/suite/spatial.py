"""Spatial suite (SURVEY.md §2.6, regrid pipeline) — filled in phase 2-3."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}

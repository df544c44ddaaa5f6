"""Relational core (SURVEY.md §2.3/§2.4/§2.7/§2.8) — filled in phase 1."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}

"""Training-data pipeline suite (dedup, similarity, text) — phase 5."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}

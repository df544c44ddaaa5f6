"""Structured Streaming operators (SURVEY.md §2.8 streaming row):

- ``resample`` — watermarked windowed A2 (daily min/max/mean).
- ``stateful`` — applyInPandasWithState custom operator w/ timeouts.
- ``dedup`` — dropDuplicates / dropDuplicatesWithinWatermark forms.
- ``join`` — stream-stream interval join, watermark-bounded state.
- ``decontam`` — stream-static benchmark-shingle join (+ windowed
  late-data form).
- ``urls`` — canonical-URL crawl-frontier dedup (shares
  functions/urls with the batch gate).
- ``curate`` — the full curation chain's micro-batch mirror
  (quality/repetition/PII/decontam stateless per-row, dedup the one
  stateful op; mixture sealed batch-side).
"""

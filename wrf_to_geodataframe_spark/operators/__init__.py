"""Composite operators (SURVEY.md §2): tessellation, resample, regrid,
spatial join, dedup, similarity — each a DataFrame→DataFrame transform."""

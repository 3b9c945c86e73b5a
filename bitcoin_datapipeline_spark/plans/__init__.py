"""Pipeline compositions — the reference's end-to-end service paths
(SURVEY.md §3) as declarative plans."""

"""Engine operators (SURVEY.md §2): seen-filter, frontier/priority,
politeness, expand/parse, plus training-data-pipeline operators
(dedup, similarity, text, multimodal)."""

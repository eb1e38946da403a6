"""Engine operators: merge/CDC kernel, diff/compare, dedup, similarity,
text analysis, sampling, anonymization, multimodal plumbing."""

"""Engine operators: merge/CDC kernel (SCD1 + SCD2), diff/compare, dedup
(exact / incremental / MinHash-LSH / SimHash / segment-level / semantic),
similarity + ANN, text analysis + quality gates, corpus curation,
funnels/cohorts, sketches, data layout (Z-order), table maintenance,
sampling, anonymization, multimodal plumbing."""

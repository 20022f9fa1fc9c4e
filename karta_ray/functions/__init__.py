"""Row-set functions for large-scale training-data pipelines: text
hashing/shingling, MinHash/SimHash sketches, language ID, quality
scoring, fingerprints. All vectorized numpy / Arrow, usable inside
map_batches."""

"""Engine-level operators: dataflow algebra, dedup, similarity, text, media."""

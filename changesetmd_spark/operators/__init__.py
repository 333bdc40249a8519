"""Engine operators: spatial joins, kNN, overlay, dedup, similarity,
text analytics, multimodal plumbing."""

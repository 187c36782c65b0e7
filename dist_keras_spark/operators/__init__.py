"""Engine operators: feature transformers, trainers, predictors,
evaluators, dedup, similarity search, as-of join, multimodal plumbing."""

"""CDC operators (dedup/ordering/merge) plus the training-data-pipeline
operator suite (text dedup, similarity search, text analysis, multimodal
plumbing) that makes the engine useful at 100 TB."""

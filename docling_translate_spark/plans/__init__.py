"""Session building and physical-plan tuning (AQE, skew, Arrow batches)."""

"""Ray Data stages: map_batches / groupby compositions over Arrow batches."""

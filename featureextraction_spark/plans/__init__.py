"""Query plans: multi-operator pipelines assembled from operators/functions."""

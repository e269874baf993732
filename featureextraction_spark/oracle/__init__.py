"""Single-node pandas/numpy oracles — the correctness reference the Spark
engine must match via numpy.allclose / exact equality (SURVEY.md §5)."""

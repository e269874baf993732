"""Job control: checkpoint manifest, lineage, resumable batch execution."""

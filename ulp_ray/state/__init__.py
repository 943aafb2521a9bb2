"""Run/lineage state: manifests and resume bookkeeping."""

"""Execution plumbing: checkpoint ledger, lineage + metrics tables."""

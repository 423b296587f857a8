"""Run-plan infrastructure: checkpoint/lineage/resume and metrics."""

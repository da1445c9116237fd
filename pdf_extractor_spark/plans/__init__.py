"""Plans: end-to-end pipeline drivers, lineage/checkpointing, operator catalog."""

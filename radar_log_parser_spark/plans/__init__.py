"""Plans: the stage graph, checkpointing, lineage and resume."""

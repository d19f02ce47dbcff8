"""Engine operators: relational/voxel/spatial/sampling (SURVEY.md §2)."""

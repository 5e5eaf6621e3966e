"""Asset I/O, procedural geometry, images, checkpoints, configuration."""

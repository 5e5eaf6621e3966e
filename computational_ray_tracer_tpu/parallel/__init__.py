"""Device-mesh sharding of ray wavefronts and distributed render/train steps."""

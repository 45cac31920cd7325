"""Device-mesh construction and ray-batch sharding."""

"""2D computational geometry: segment predicates, polygons, triangulation,
art-gallery visibility (parity with the reference's Geometry/ domain)."""

"""Dataset tooling: COLMAP interop, DTU/ETH3D converters, PLY visualization."""

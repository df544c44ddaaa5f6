"""Computational-geometry layer: numpy polygon kernels + the Voronoi
tessellation operator (driver-side and distributed tile+halo variants).
"""

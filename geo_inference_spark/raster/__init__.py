"""Raster tiling + Hann-overlap stitch engine (reference parity core).

Re-expresses the reference's dask ``map_overlap`` pipeline
(/root/reference/geo_inference/geo_inference.py:358-388,
/root/reference/geo_inference/geo_dask.py) as pure-numpy kernels
(kernels.py, windows.py) driven by an explicit Spark fragment
shuffle (operators/overlap.py).
"""

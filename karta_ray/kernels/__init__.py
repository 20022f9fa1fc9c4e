"""Stateless, vectorized numpy kernels.

Every function here is a pure function over numpy arrays (degrees for
lon/lat unless suffixed ``_rad``), suitable for use inside
``Dataset.map_batches(..., batch_format="pyarrow")`` transforms.
"""

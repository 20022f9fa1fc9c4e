"""Sources/sinks: ESRI ASCII grids, GeoTIFF (pure-Python codec),
shapefiles, GPX, GeoJSON fixtures, partitioned parquet writers."""

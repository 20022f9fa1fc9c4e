"""Sources/sinks: ESRI ASCII grids, GeoJSON fixtures, partitioned
parquet writers."""

"""Sources & sinks (SURVEY.md §2.1): NetCDF and Shapefile readers,
GeoPackage and NetCDF writers — implemented from the public format
specifications (no GDAL/xarray/netCDF4 in this container)."""

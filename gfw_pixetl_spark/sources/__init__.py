"""Pluggable raster sources and sinks for the tile pipeline."""

from .raster import GeoTIFFReader, SyntheticReader, WindowReader  # noqa: F401

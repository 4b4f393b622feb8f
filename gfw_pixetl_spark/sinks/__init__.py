"""Output sinks beyond the tile writer in ``plans/raster_pipe.py``
(S8-S10 live there, tied to the tile lifecycle). This package holds the
table-shaped sinks: size-targeted compaction for parquet stores."""

from .compaction import compact_to_files, estimate_row_bytes  # noqa: F401

"""Layer spec — the declarative IR of a job ("query").

Dataclass re-expression of the reference's pydantic ``LayerModel``
(``gfw_pixetl/models/pydantic.py:35-78``) with the same validation
surface: version regex, grid enum, data-type enum, resampling enum,
raster-requires-source_uri cross-check, multi-band nodata consistency.
No pydantic dependency — plain ``__post_init__`` validators.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .data_type import DATA_TYPE_NAMES, DataType, data_type_factory
from .grids import GRID_NAMES, Grid, grid_factory

VERSION_REGEX = re.compile(r"^v\d{1,8}(\.\d{1,3}){0,2}?$|^latest$")

SOURCE_TYPES = ("raster", "vector")
ORDERS = ("asc", "desc")
RASTERIZE_METHODS = ("value", "count")
RESAMPLING_METHODS = (
    "nearest", "bilinear", "cubic", "cubic_spline", "lanczos", "average",
    "mode", "gauss", "max", "min", "med", "q1", "q3", "sum", "rms",
)
# resampling kernels expressible as per-group aggregates on an aligned grid
AGGREGATING_RESAMPLING = (
    "average", "mode", "max", "min", "med", "q1", "q3", "sum", "rms",
)


@dataclass
class LayerModel:
    dataset: str
    version: str
    source_type: str
    pixel_meaning: str
    data_type: str
    grid: str
    nbits: int | None = None
    calc: str | None = None
    band_count: int = 1
    union_bands: bool = False
    no_data: int | float | list | None = None
    rasterize_method: str | None = None
    resampling: str = "nearest"
    source_uri: list[str] | None = None
    order: str | None = None
    symbology: dict | None = None
    compute_stats: bool = False
    compute_histogram: bool = False
    process_locally: bool = False
    photometric: str | None = None
    # destination formats (DstFormat, tiles/tile.py:83-102): "geotiff" is
    # the default; adding "gdal-geotiff" also writes the reference's
    # higher-compression secondary copy (utils/gdal.py:98-106)
    dst_formats: tuple = ("geotiff",)

    def __post_init__(self) -> None:
        if not VERSION_REGEX.match(self.version):
            raise ValueError(f"Invalid version: {self.version}")
        if self.source_type not in SOURCE_TYPES:
            raise ValueError(f"Invalid source_type: {self.source_type}")
        if self.data_type not in DATA_TYPE_NAMES:
            raise ValueError(f"Invalid data_type: {self.data_type}")
        if self.grid not in GRID_NAMES:
            raise ValueError(f"Invalid grid: {self.grid}")
        if self.resampling not in RESAMPLING_METHODS:
            raise ValueError(f"Invalid resampling: {self.resampling}")
        if self.order is not None and self.order not in ORDERS:
            raise ValueError(f"Invalid order: {self.order}")
        if (
            self.rasterize_method is not None
            and self.rasterize_method not in RASTERIZE_METHODS
        ):
            raise ValueError(f"Invalid rasterize_method: {self.rasterize_method}")
        # raster requires source_uri; vector must not have one (pydantic.py:63-69)
        if self.source_type == "raster" and not self.source_uri:
            raise ValueError("Raster source types require source_uri")
        if self.source_type != "raster" and self.source_uri:
            raise ValueError("Only raster source type require source_uri")
        # multi-band nodata list checks (pydantic.py:71-78)
        if isinstance(self.no_data, list):
            if len(self.no_data) != self.band_count:
                raise ValueError(
                    f"Length of no data list ({self.no_data}) must match "
                    f"band count ({self.band_count})."
                )
            if len(set(self.no_data)) != 1:
                raise ValueError("No data values must be the same for all bands")

    @property
    def grid_obj(self) -> Grid:
        return grid_factory(self.grid)

    @property
    def dtype_obj(self) -> DataType:
        return data_type_factory(self.data_type, self.nbits, self.no_data)

    @property
    def prefix(self) -> str:
        """Destination key scheme (``gfw_pixetl/layers.py:55-81``)."""
        srs = self.grid_obj.crs.replace(":", "-").lower()
        return (
            f"{self.dataset}/{self.version}/raster/{srs}/"
            f"{self.grid}/{self.pixel_meaning}"
        )


def layer_from_json(payload: dict) -> LayerModel:
    """Parse a reference-shaped layer-spec dict (the CLI JSON contract,
    ``gfw_pixetl/pixetl.py:49-55``)."""
    known = {f.name for f in LayerModel.__dataclass_fields__.values()}
    unknown = set(payload) - {f for f in known}
    if unknown:
        raise ValueError(f"Unknown layer fields: {sorted(unknown)}")
    return LayerModel(**payload)

"""Declared output pixel types (SURVEY §1.2).

Re-expresses ``gfw_pixetl/data_type.py:14-167``: the closed set of output
dtypes, per-type nodata validation, sub-byte nbits, and compression
defaults. ``boolean`` maps to uint8 + nbits=1 + CCITTFAX4 exactly like the
reference (``data_type.py:122-124``); multi-band nodata lists collapse to
their first value (``data_type.py:86-94``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

DATA_TYPE_NAMES = (
    "boolean", "uint8", "int8", "uint16", "int16", "uint32", "int32",
    "float16", "half", "float32", "single", "float64", "double",
)

# Spark SQL type for each physical dtype (pixel payloads travel as binary
# ndarrays, but scalar pixel columns use these).
TO_SPARK_TYPE = {
    "uint8": "smallint", "int8": "tinyint",
    "uint16": "int", "int16": "smallint",
    "uint32": "bigint", "int32": "int",
    "float16": "float", "float32": "float", "float64": "double",
}


@dataclass(frozen=True)
class DataType:
    data_type: str
    no_data: int | float | None
    nbits: int | None = None
    compression: str = "DEFLATE"

    @property
    def signed_byte(self) -> bool:
        return self.data_type == "int8"

    def has_no_data(self) -> bool:
        return self.no_data == 0 or bool(self.no_data) or (
            isinstance(self.no_data, float) and math.isnan(self.no_data)
        )

    def to_numpy(self) -> str:
        return self.data_type


def _validate_no_data(data_type: str, no_data, nbits) -> None:
    dtype = data_type.lower()
    if (dtype == "boolean" or nbits == 1) and (no_data != 0 and no_data is not None):
        raise ValueError(
            f"No data value {no_data} must be 0 or None for data type Boolean"
        )
    if "int" in dtype and no_data is not None:
        values = no_data if isinstance(no_data, list) else [no_data]
        for nd in values:
            if not isinstance(nd, int) or isinstance(nd, bool):
                raise ValueError(
                    f"No data value {nd} must be of type `int` or None "
                    f"for data type {dtype}"
                )
    if dtype in ("float16", "half", "float32", "single", "float64", "double"):
        values = no_data if isinstance(no_data, list) else [no_data]
        for nd in values:
            if nd is not None and not isinstance(nd, float):
                raise ValueError(
                    f"No data value {nd} must be of type `float` or None "
                    f"for data type {data_type}"
                )


def data_type_factory(
    data_type: str,
    nbits: int | None = None,
    no_data: int | float | list | None = None,
) -> DataType:
    """Build a validated DataType (``gfw_pixetl/data_type.py:112-149``).

    nbits only applies within its width class (1-7 for 8-bit types, 9-15
    for 16-bit, 17-31 for 32-bit); float16 always carries nbits=16.
    """
    dtype = data_type.lower()
    if dtype not in DATA_TYPE_NAMES:
        raise ValueError(f"Unknown data type {data_type}")
    _validate_no_data(dtype, no_data, nbits)
    # rasterio supports only one nodata value; lists collapse to first
    nd = no_data[0] if isinstance(no_data, list) else no_data

    _8 = nbits if nbits and nbits in range(1, 8) else None
    _16 = nbits if nbits and nbits in range(9, 16) else None
    _32 = nbits if nbits and nbits in range(17, 32) else None
    table: dict[str, DataType] = {
        "boolean": DataType("uint8", nd, 1, "CCITTFAX4"),
        "uint8": DataType("uint8", nd, _8),
        "int8": DataType("int8", nd, _8),
        "uint16": DataType("uint16", nd, _16),
        "int16": DataType("int16", nd, _16),
        "uint32": DataType("uint32", nd, _32),
        "int32": DataType("int32", nd, _32),
        "float16": DataType("float16", nd, 16),
        "half": DataType("float16", nd, 16),
        "float32": DataType("float32", nd),
        "single": DataType("float32", nd),
        "float64": DataType("float64", nd),
        "double": DataType("float64", nd),
    }
    return table[dtype]

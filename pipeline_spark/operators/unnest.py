"""`unnest` / `flattenField`: explode one array field in place.

Reference: util/pipeline/Unnest.java:25-77 and legacy
module/transform/UnnestTransform.java:26-202 — explode keeps sibling
fields; an empty/null array keeps the row with a null element
(→ ``explode_outer``).  Struct elements are flattened into top-level
fields when the array element is a struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module


def flatten_field(
    df: DataFrame,
    field: str,
    flatten_struct: bool = False,
    prefix: bool = False,
) -> DataFrame:
    """Explode an array field; the element keeps the field's name
    (reference: select/SelectFunction.java:263-276 createFlattenSchema and
    util/pipeline/Unnest.java:57-75 both map array<X> -> X under the same
    name).  ``flatten_struct=True`` additionally expands struct elements to
    top-level columns; ``prefix=True`` names them ``<field>_<sub>``
    (legacy UnnestTransform.java:26-202 path/prefix surface)."""
    dtype = df.schema[field].dataType
    if not isinstance(dtype, T.ArrayType):
        raise ValueError(f"flattenField '{field}' is not an array")
    others = [c for c in df.columns if c != field]
    out = df.select(*others, F.explode_outer(F.col(field)).alias(field))
    if flatten_struct and isinstance(dtype.elementType, T.StructType):
        inner = [
            F.col(f"{field}.{sub.name}").alias(
                f"{field}_{sub.name}" if prefix else sub.name
            )
            for sub in dtype.elementType.fields
        ]
        out = out.select(*others, *inner)
    return out


@module("unnest", kind=KIND_TRANSFORM)
def unnest_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p = ctx.params
    field = p.get("flattenField") or p.get("field") or p.get("path")
    if not field:
        raise ValueError("unnest requires flattenField (or legacy 'path')")
    # legacy UnnestTransform surface: 'path' always expands struct
    # elements, 'prefix' controls '<path>_' column naming
    legacy = bool(p.get("path")) and not (p.get("flattenField") or p.get("field"))
    return {"": flatten_field(
        ctx.input,
        field,
        flatten_struct=legacy or bool(p.get("flattenStruct", False)),
        prefix=bool(p.get("prefix", False)),
    )}

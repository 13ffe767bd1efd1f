"""Column-expression operator library (JVM-side, codegen-friendly).

Every function here returns a :class:`pyspark.sql.Column` built from
``pyspark.sql.functions`` — no Python row-at-a-time UDFs in the hot path.
"""

from .strings import (  # noqa: F401
    format_string_from_object,
    join_strings,
    stop_condition,
    text_replace,
    wrap_text,
)
from .json_path import json_path_scalar, json_path_array  # noqa: F401

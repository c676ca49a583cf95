"""Typed-table JSON query/validation ops (jmespath + JSON Schema).

The frame-mode kernels live in engine/processors_ext.py (JMESPathProc,
JSONSchemaProc — lib/processor/jmespath.go:142, lib/processor/jsonschema.go:168);
these are their vectorized siblings for typed DataFrames: Arrow-batched
pandas UDFs over a JSON string column. Trivial dot-path queries should use
``get_json_object``/``from_json`` (pure Catalyst) instead — these ops exist
for the query shapes Catalyst can't express (filters/projections/functions
inside the JMESPath language, draft-7 schema validation).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional, Union

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def jmespath_query(
    df: DataFrame,
    src_col: str,
    query: str,
    result_col: str = "result",
) -> DataFrame:
    """Append ``result_col`` = JSON-encoded result of the JMESPath query over
    the JSON document in ``src_col`` (NULL on parse/search failure). Decode
    with ``from_json``/``get_json_object``/casts downstream."""

    @pandas_udf("string")
    def run(s: pd.Series) -> pd.Series:
        import jmespath

        compiled = jmespath.compile(query)

        def one(v: Optional[str]) -> Optional[str]:
            if v is None:
                return None
            try:
                return json.dumps(
                    compiled.search(json.loads(v)), separators=(",", ":"), sort_keys=True
                )
            except Exception:
                return None

        return s.map(one)

    return df.withColumn(result_col, run(F.col(src_col)))


def json_schema_valid(
    df: DataFrame,
    src_col: str,
    schema: Union[str, Dict[str, Any]],
    result_col: str = "valid",
) -> DataFrame:
    """Append ``result_col`` = whether the JSON document in ``src_col``
    validates against the draft-7 schema (unparseable -> false)."""
    schema_json = json.dumps(schema) if not isinstance(schema, str) else schema

    @pandas_udf("boolean")
    def run(s: pd.Series) -> pd.Series:
        import jsonschema

        validator = jsonschema.Draft7Validator(json.loads(schema_json))

        def one(v: Optional[str]) -> bool:
            if v is None:
                return False
            try:
                doc = json.loads(v)
            except Exception:
                return False
            return not any(True for _ in validator.iter_errors(doc))

        return s.map(one)

    return df.withColumn(result_col, run(F.col(src_col)))

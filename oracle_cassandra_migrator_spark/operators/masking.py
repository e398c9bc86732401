"""PII masking/tokenization for migration pipelines.

The reference moves raw payment PII (card numbers, emails, phones —
verizon_table_migration_Rakesh_filters.json:59-82) verbatim; any
production migration needs a masking pass. Three standard primitives,
all JVM expressions:

- ``mask_keep_last``: redact all but the last N characters
  (card-number display form).
- ``surrogate_key_expr``: deterministic sha256 tokenization — the same
  input always maps to the same opaque token, so joins/dedup on the
  token still work across tables without exposing the value.
- ``null_out``: full suppression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mask_keep_last_expr(col: str, keep: int = 4, mask_char: str = "*") -> str:
    return (
        f"CASE WHEN length({col}) <= {keep} THEN {col} "
        f"ELSE concat(repeat('{mask_char}', length({col}) - {keep}), "
        f"substr({col}, length({col}) - {keep} + 1)) END"
    )


def surrogate_key_expr(col: str, salt: str = "ocm") -> str:
    """Deterministic, salted sha256 token (hex)."""
    return f"sha2(concat('{salt}:', {col}), 256)"


def mask_columns(df: DataFrame, spec: dict[str, dict]) -> DataFrame:
    """Apply a masking spec: {column: {"strategy": "mask_last"|"token"|
    "null", ...params}}. Unlisted columns pass through untouched."""
    out: list[Column] = []
    for name in df.columns:
        rule = spec.get(name)
        if rule is None:
            out.append(F.col(name))
        elif rule["strategy"] == "mask_last":
            out.append(F.expr(mask_keep_last_expr(
                name, rule.get("keep", 4), rule.get("mask_char", "*")))
                .alias(name))
        elif rule["strategy"] == "token":
            out.append(F.expr(surrogate_key_expr(
                name, rule.get("salt", "ocm"))).alias(name))
        elif rule["strategy"] == "null":
            out.append(F.lit(None).cast(df.schema[name].dataType).alias(name))
        else:
            raise ValueError(f"unknown masking strategy {rule['strategy']!r}")
    return df.select(*out)

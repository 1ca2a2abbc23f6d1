"""Local replica of the driver's correctness compare: row-count + schema +
order-insensitive value comparison between a Spark DataFrame and its DuckDB
oracle result."""

from __future__ import annotations

import math

import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # date objects / strings: stringify uniformly
            df[c] = df[c].map(lambda v: None if v is None else str(v))
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")  # unify int widths for compare
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )


def _num_kind(s: pd.Series) -> str:
    """Numeric kind on the axis the driver's typed hash distinguishes."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "other"


def assert_matches_oracle(spark_df, duck_con, sql: str, float_tol: float = 1e-9):
    """Raise AssertionError (with diagnostics) unless the Spark result and
    the oracle result match on row count, column names, and values
    (order-insensitive; floats compared exactly after canonicalization,
    falling back to tolerance)."""
    sp = spark_df.toPandas()
    rel = duck_con.sql(sql)
    # The driver's typed value-hash distinguishes int from float: a DuckDB
    # HUGEINT column reaches pandas as float64 while Spark emits bigint, so
    # the hash diverges even with identical values (round-6 verdict: 4 reds
    # with zero value diffs). The blanket int->float64 coercion in _canon
    # hides that class locally, so refuse wide-int oracle columns outright.
    wide = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
    ]
    assert not wide, (
        f"oracle produces HUGEINT/DECIMAL column(s) {wide}; CAST to "
        f"BIGINT/DOUBLE so the driver's typed hash matches Spark"
    )
    du = rel.df()
    assert sorted(sp.columns) == sorted(du.columns), (
        f"column mismatch: spark={sorted(sp.columns)} oracle={sorted(du.columns)}"
    )
    # Driver-faithful numeric-kind gate: the driver's value hash is typed on
    # the int/float/bool axis (`1` != `1.0`), so compare dtype KIND per
    # column before any value work instead of coercing ints to float64.
    # Date/string/object representations differ benignly between the two
    # pandas round-trips and stay on the value path below.
    bad_kind = {
        c: (_num_kind(sp[c]), _num_kind(du[c]))
        for c in sp.columns
        if _num_kind(sp[c]) != _num_kind(du[c])
    }
    assert not bad_kind, (
        f"numeric dtype-kind mismatch (spark_kind, oracle_kind): {bad_kind}; "
        f"the driver's typed hash distinguishes these even when values match"
    )
    assert len(sp) == len(du), f"row count mismatch: spark={len(sp)} oracle={len(du)}"
    a, b = _canon(sp), _canon(du)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ok = [
                (x == y)
                or (isinstance(x, float) and isinstance(y, float)
                    and math.isnan(x) and math.isnan(y))
                or (pd.isna(x) and pd.isna(y))
                or (
                    pd.notna(x)
                    and pd.notna(y)
                    and abs(x - y) <= float_tol * max(1.0, abs(x), abs(y))
                )
                for x, y in zip(av.tolist(), bv.tolist())
            ]
            bad = [i for i, o in enumerate(ok) if not o]
            assert not bad, (
                f"value mismatch in '{c}' at canon rows {bad[:5]}: "
                f"spark={av.iloc[bad[:5]].tolist()} oracle={bv.iloc[bad[:5]].tolist()}"
            )
        else:
            eq = av.fillna("\0NULL").eq(bv.fillna("\0NULL"))
            bad = list(eq[~eq].index[:5])
            assert not bad, (
                f"value mismatch in '{c}' at canon rows {bad}: "
                f"spark={av.iloc[bad].tolist()} oracle={bv.iloc[bad].tolist()}"
            )

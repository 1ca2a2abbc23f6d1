"""Per-group model fit/predict via applyInPandas (SURVEY.md §2.10 UD1-UD3).

The reference fans out per-market Prophet fits over a ThreadPoolExecutor
(server/forecast_utils.py:21-139, 69-82); here the fan-out IS the cluster:
``groupBy(keys).applyInPandas(fit)`` runs one model per group on whatever
executor holds the group — the idiomatic Spark shape for thousands of
independent small models.

The model interface is pluggable (UD1): ``linear_forecast`` ships a
deterministic OLS linear-trend model with **integer-cent exact sums**, so
its predictions are reproducible bit-for-bit and checkable against a pure
SQL oracle — something Prophet can never be (SURVEY §7.4 item 6). Prophet
(or any heavier model) drops into the same ``fit_fn`` slot behind an
import-guard; correctness tests never depend on it.

Horizon logic (UD2, forecast_utils.py:37-42) is a plain parameter here:
periods are supplied by the caller; the reference's `(today - max(ds)) +
365` calc is a one-line datediff the caller can apply.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _ols_forecast_pdf(
    pdf: pd.DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    horizon: int,
) -> pd.DataFrame:
    """Integer-cent OLS: all sums are exact int64, the slope/intercept are
    single IEEE divisions — bit-reproducible across engines and runs."""
    pdf = pdf.sort_values(order_col)
    yc = np.round(pdf[value_col].to_numpy() * 100.0).astype("int64")
    n = len(yc)
    x = np.arange(n, dtype="int64")
    sx, sx2 = int(x.sum()), int((x * x).sum())
    sy, sxy = int(yc.sum()), int((x * yc).sum())
    den = n * sx2 - sx * sx
    slope_c = 0.0 if den == 0 else float(n * sxy - sx * sy) / float(den)
    intercept_c = (float(sy) - slope_c * float(sx)) / float(n)
    ts = np.arange(n, n + horizon, dtype="int64")
    yhat_c = intercept_c + slope_c * ts.astype("float64")
    yhat = np.floor((yhat_c / 100.0) * 100.0 + 0.5) / 100.0  # det_round(…, 2)
    return pd.DataFrame(
        {
            group_col: pdf[group_col].iloc[0],
            "t": ts.astype("int32"),
            "yhat": yhat,
        }
    )


def forecast_with(
    series: DataFrame,
    group_col: str,
    fit_predict,
    schema: str,
) -> DataFrame:
    """UD1 pluggable per-group model slot: any `fit_predict(pdf) -> pdf`
    runs once per group on the executor holding it. `linear_forecast` and
    `prophet_forecast` are specializations; drop in any model the same way.
    """
    return series.groupBy(group_col).applyInPandas(fit_predict, schema=schema)


def prophet_forecast(
    series: DataFrame,
    group_col: str,
    ds_col: str,
    y_col: str,
    horizon: int = 365,
    cache_dir: str | None = None,
    model_factory=None,
) -> DataFrame:
    """The reference's Prophet fit/predict (forecast_utils.py:21-34: weekly
    + yearly seasonality, no daily), distributed per group. Prophet is an
    optional dependency — importing it happens inside the UDF so the module
    (and every correctness test) loads without it; outputs are
    nondeterministic and excluded from oracle checks by design
    (SURVEY §7.4 item 6).

    ``cache_dir`` is the reference's model cache for exactly this heavy
    path (forecast_utils.py:142-168): predictions are stored keyed by
    md5(group) and reused while the group's series is unchanged (same
    staleness rule as ``linear_forecast`` — the fingerprint is (row count,
    max ds)). Point it at a shared filesystem on a cluster so re-runs skip
    refitting unchanged series. ``model_factory`` overrides the model
    constructor (tests inject a deterministic fake; default builds the
    reference's Prophet config)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        def run(frame_pdf: pd.DataFrame) -> pd.DataFrame:
            if model_factory is not None:
                m = model_factory()
            else:
                from prophet import Prophet  # optional dep, executor-side

                m = Prophet(
                    weekly_seasonality=True, yearly_seasonality=True,
                    daily_seasonality=False,
                )
            frame = frame_pdf.rename(columns={ds_col: "ds", y_col: "y"})[
                ["ds", "y"]
            ]
            m.fit(frame)
            future = m.make_future_dataframe(periods=horizon)
            fc = m.predict(future)[["ds", "yhat", "yhat_lower", "yhat_upper"]]
            fc[group_col] = frame_pdf[group_col].iloc[0]
            return fc[[group_col, "ds", "yhat", "yhat_lower", "yhat_upper"]]

        if cache_dir is None:
            return run(pdf)
        import hashlib
        import json
        import os

        group = str(pdf[group_col].iloc[0])
        key = hashlib.md5(group.encode()).hexdigest()
        path = os.path.join(cache_dir, f"prophet_{key}.json")
        fingerprint = [int(len(pdf)), str(pdf[ds_col].max())]
        if os.path.exists(path):
            with open(path) as f:
                cached = json.load(f)
            if cached["fingerprint"] == fingerprint:
                out = pd.DataFrame(cached["result"])
                out["ds"] = pd.to_datetime(out["ds"])
                return out
        out = run(pdf)
        store = out.copy()
        store["ds"] = store["ds"].astype(str)
        os.makedirs(cache_dir, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {"fingerprint": fingerprint, "result": store.to_dict("list")}, f
            )
        os.replace(tmp, path)  # atomic publish; concurrent fitters race benignly
        return out

    return forecast_with(
        series,
        group_col,
        fit,
        schema=(
            f"{group_col} string, ds timestamp, yhat double, "
            "yhat_lower double, yhat_upper double"
        ),
    )


def linear_forecast(
    series: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    horizon: int = 6,
    cache_dir: str | None = None,
) -> DataFrame:
    """Forecast `horizon` future points per group from a linear trend.

    Input: one row per (group, time step); output: (group, t, yhat) where
    t continues the 0-based step index past the observed range.

    ``cache_dir`` enables the reference's model cache (UD3,
    forecast_utils.py:14-18,142-168): fitted predictions are stored keyed
    by md5(group) and invalidated when the group's series grows (same
    staleness rule as the reference: cached horizon must start past the
    current max step). Point it at a shared filesystem on a cluster.
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        if cache_dir is None:
            return _ols_forecast_pdf(pdf, group_col, order_col, value_col, horizon)
        import hashlib
        import json
        import os

        group = str(pdf[group_col].iloc[0])
        key = hashlib.md5(group.encode()).hexdigest()
        path = os.path.join(cache_dir, f"{key}.json")
        fingerprint = [int(len(pdf)), int(pd.to_numeric(pdf[order_col]).max())]
        if os.path.exists(path):
            with open(path) as f:
                cached = json.load(f)
            if cached["fingerprint"] == fingerprint:
                return pd.DataFrame(cached["result"]).astype(
                    {group_col: "object", "t": "int32", "yhat": "float64"}
                )
        out = _ols_forecast_pdf(pdf, group_col, order_col, value_col, horizon)
        os.makedirs(cache_dir, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(
                {"fingerprint": fingerprint, "result": out.to_dict("list")}, f
            )
        os.replace(tmp, path)  # atomic publish; concurrent fitters race benignly
        return out

    return series.groupBy(group_col).applyInPandas(
        fit, schema=f"{group_col} string, t int, yhat double"
    )

"""Exact DataFrame comparison helpers (the local stand-in for the driver's
row-count + schema + value-hash gate)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), "<null>")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_frames_exact(sp: pd.DataFrame, du: pd.DataFrame, name: str = "") -> None:
    assert sorted(sp.columns) == sorted(du.columns), \
        f"{name}: columns {sorted(sp.columns)} vs {sorted(du.columns)}"
    assert len(sp) == len(du), f"{name}: row count {len(sp)} vs {len(du)}"
    a, b = canon(sp), canon(du)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        # The driver's value hash is dtype-sensitive: an int64 column on one
        # side and float64 on the other fails even when every value matches
        # (e.g. DuckDB SUM(BIGINT) -> HUGEINT -> float64).  Gate on dtype KIND
        # before comparing values so the local harness catches what the
        # driver catches.
        ak = "f" if av.dtype.kind == "f" else (
            "b" if av.dtype.kind == "b" else (
                "i" if av.dtype.kind in "iu" else "O"))
        bk = "f" if bv.dtype.kind == "f" else (
            "b" if bv.dtype.kind == "b" else (
                "i" if bv.dtype.kind in "iu" else "O"))
        assert ak == bk, (
            f"{name}.{c}: dtype-kind mismatch spark={av.dtype} vs "
            f"oracle={bv.dtype} (driver hash is type-sensitive)")
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = np.asarray(av, dtype=np.float64)
            bv = np.asarray(bv, dtype=np.float64)
            an, bn = np.isnan(av), np.isnan(bv)
            assert (an == bn).all(), f"{name}.{c}: NaN placement differs"
            ok = np.where(an, True, av.view(np.int64) == bv.view(np.int64))
            assert ok.all(), (
                f"{name}.{c}: {int((~ok).sum())} float mismatches; "
                f"first: {av[~ok][:3]} vs {bv[~ok][:3]}")
        elif av.dtype.kind == "b" or bv.dtype.kind == "b":
            assert (av.astype(bool) == bv.astype(bool)).all(), f"{name}.{c}"
        else:
            assert (av == bv).all(), (
                f"{name}.{c}: {(av != bv).sum()} mismatches; "
                f"first: {av[av != bv][:3]} vs {bv[av != bv][:3]}")
